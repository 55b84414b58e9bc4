package graft.operators

import graft.functions.TextFunctions.{shingleHashesFused, shingleHashesPoly}
import graft.functions.expressions.PolyHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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

  /** Bloom-filter bit positions of the benchmark's n-gram hashes: `kHash`
    * affine probes per gram ([[PolyHash]] family), positions in [0, mBits).
    * Bounded by mBits, so collecting them driver-side is a parameter fetch
    * (like IVF centroids), not a data-plane collect.
    */
  private def bloomPositions(benchmark: DataFrame, bTextCol: String,
                             n: Int, mBits: Int, kHash: Int): Array[Long] =
    benchmark
      .select(explode(shingleHashesPoly(col(bTextCol), n)).as("__g"))
      .select(explode(array((0 until kHash).map(j => bloomPos(col("__g"), j, mBits)): _*)).as("__p"))
      .distinct()
      .collect().map(_.getLong(0))

  private def bloomPos(gram: Column, j: Int, mBits: Int): Column =
    ((lit(PolyHash.a(j)) * gram + lit(PolyHash.b(j))) % lit(PolyHash.P)) % lit(mBits.toLong)

  /** Decontamination via a BROADCAST Bloom filter, audited against the exact
    * n-gram join (Bloom & Burton, "Space/time trade-offs in hash coding with
    * allowable errors", CACM 1970): the benchmark's gram set is folded into
    * an mBits-bit filter, and each corpus document probes the filter with its
    * own grams — a contaminated doc has some gram with all `kHash` bits set.
    *
    * The 100 TB story: the corpus side is a PURE MAP — no join, no shuffle,
    * no exploded gram rows; the filter is mBits/8 bytes broadcast once
    * (vs. broadcasting the full benchmark gram set, mBits-independent). The
    * output audits the filter per doc: `bloom_hit` (filter fired) next to
    * `exact_hit` (true n-gram collision, [[contaminatedIds]] semantics over
    * the same poly-hash grams) — bloom_hit=1/exact_hit=0 rows are the false
    * positives, whose rate the (mBits, kHash) sizing controls. A Bloom filter
    * never produces false NEGATIVES, so exact_hit=1 ⇒ bloom_hit=1
    * (property-tested) and dropping on bloom_hit is always safe-side.
    *
    * Every probe is modular arithmetic in the PolyHash family, so the filter
    * CONTENTS are SQL-expressible and the whole audit is oracle-checked (q84).
    */
  def bloomAudit(corpus: DataFrame, idCol: String, textCol: String,
                 benchmark: DataFrame, bTextCol: String, n: Int,
                 mBits: Int = 65536, kHash: Int = 4): DataFrame = {
    require(mBits >= 64 && kHash >= 1, s"need mBits >= 64 and kHash >= 1, got $mBits/$kHash")
    val words = new Array[Long]((mBits + 63) / 64)
    bloomPositions(benchmark, bTextCol, n, mBits, kHash).foreach { p =>
      words(p.toInt >> 6) |= 1L << (p.toInt & 63)
    }
    val bits = typedLit(words.toSeq)
    def bitSet(p: Column): Column =
      call_function("shiftright",
        element_at(bits, (p / 64L).cast("int") + 1), (p % 64L).cast("int"))
        .bitwiseAND(1L) === 1L
    val gramHit: Column => Column =
      g => (0 until kHash).map(j => bitSet(bloomPos(g, j, mBits))).reduce(_ && _)
    val flagged = corpus.select(col(idCol),
      exists(shingleHashesPoly(col(textCol), n), gramHit).cast("long").as("bloom_hit"))
    val exactIds = corpus
      .select(col(idCol), explode(shingleHashesPoly(col(textCol), n)).as("__g"))
      .join(broadcast(benchmark.select(explode(shingleHashesPoly(col(bTextCol), n)).as("__g")).distinct()),
        Seq("__g"), "left_semi")
      .select(col(idCol)).distinct().withColumn("__e", lit(1L))
    flagged.join(exactIds, Seq(idCol), "left")
      .select(col(idCol), col("bloom_hit"), coalesce(col("__e"), lit(0L)).as("exact_hit"))
  }
}
