package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching by edit distance — the entity-resolution step that
  * collapses name variants ("red wiget" / "red widget") before joining
  * vendor catalogs or deduplicating record sets.
  *
  * Classic two-phase shape: (1) canonicalize to the DISTINCT value
  * dictionary (one hash shuffle, bounded by distinct cardinality — the raw
  * table never self-joins); (2) block candidate pairs on a cheap key (first
  * whitespace token) and verify with `levenshtein` inside the block. Both
  * Spark and DuckDB implement the textbook Wagner–Fischer distance, so the
  * whole match — candidates AND distances — is oracle-checkable.
  *
  * Blocking is the standard recall trade: a pair whose FIRST tokens differ
  * is never compared even if the full-string distance is within `maxDist`
  * (e.g. "red bolt" / "reds bolt"). State the block key in the report; add
  * a second pass with a different key when that recall matters.
  */
object FuzzyJoin {

  /** Distinct-value variant pairs: (name_a, name_b, dist) with
    * `name_a < name_b`, same first-token block, and
    * `levenshtein(name_a, name_b) <= maxDist`.
    */
  def nameVariants(df: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val names = df.select(col(nameCol).as("name")).distinct()
      .withColumn("__blk", substring_index(col("name"), " ", 1))
    val a = names.select(col("name").as("name_a"), col("__blk"))
    val b = names.select(col("name").as("name_b"), col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b")
  }
}
