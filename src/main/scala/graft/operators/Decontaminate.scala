package graft.operators

import graft.functions.TextFunctions.shingleHashesFused
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Benchmark decontamination — the training-data hygiene step that removes
  * corpus documents overlapping an evaluation set (n-gram collision rule, as
  * in GPT-3/PaLM data curation: a training doc is contaminated if it shares
  * any n-gram with a benchmark doc).
  *
  * Scale design: the benchmark side is SMALL (eval sets are thousands of
  * docs) — its distinct shingle hashes are broadcast, so contamination
  * detection is a map-side LEFT SEMI join on the exploded corpus shingles:
  * the 100 TB corpus never shuffles, and the corpus scan streams through
  * one codegen stage (fused shingle kernel → explode → broadcast semi join
  * → distinct ids). Shingles are 64-bit xxhash64 values: a false
  * contamination needs a 64-bit collision (~1e-9 across a 10⁶×10⁵ hash
  * cross-set), so the string-shingle DuckDB oracle matches exactly.
  */
object Decontaminate {

  /** Ids of corpus documents sharing at least one n-gram with the benchmark. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
                      benchmark: DataFrame, bTextCol: String, n: Int): DataFrame = {
    val corpusShingles = corpus
      .select(col(idCol), explode(shingleHashesFused(col(textCol), n)).as("__h"))
    val benchShingles = benchmark
      .select(explode(shingleHashesFused(col(bTextCol), n)).as("__h"))
      .distinct()
    corpusShingles
      .join(broadcast(benchShingles), Seq("__h"), "left_semi")
      .select(idCol).distinct()
  }

  /** Corpus minus contaminated documents. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, bTextCol: String, n: Int): DataFrame =
    corpus.join(contaminatedIds(corpus, idCol, textCol, benchmark, bTextCol, n),
      Seq(idCol), "left_anti")
}
