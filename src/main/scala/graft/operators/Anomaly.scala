package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Count-based anomaly detection with EXACT arithmetic: z-scores over
  * per-bucket event counts where mean and variance come from integer sums
  * (S1 = Σc, S2 = Σc²) instead of a streaming moments aggregate — so the
  * result is independent of partitioning and aggregation order, and the
  * DuckDB oracle reproduces every double bit-for-bit (the textbook
  * n·S2 − S1² sample-variance identity; sums < 2⁵³ stay exact in the final
  * double conversions, which holds to ~10⁸ buckets of ~10⁵ events).
  *
  * Plan shape: one partial-aggregated count shuffle on the bucket key, a
  * broadcast single-row stats join — the classic two-pass anomaly scan.
  */
object Anomaly {

  /** Per-bucket count + z-score + anomaly flag (|z| > zMax). Buckets with
    * undefined variance (fewer than 2 buckets, or all counts equal) yield
    * null z and flag 0 rather than NaN/∞.
    */
  def countZScores(df: DataFrame, bucket: Column, zMax: Double = 3.0,
                   roundTo: Int = 4): DataFrame = {
    val counts = df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val stats = counts.agg(
      count(lit(1)).cast("long").as("__k"),
      sum("n_events").cast("long").as("__s1"),
      sum(col("n_events") * col("n_events")).cast("long").as("__s2"))
    val varNum = (col("__k") * col("__s2") - col("__s1") * col("__s1")).cast("double")
    val den    = (col("__k") * (col("__k") - lit(1L))).cast("double")
    val std    = sqrt(varNum / den)
    val z      = floorRound(
      (col("n_events") * col("__k") - col("__s1")).cast("double") /
        (col("__k").cast("double") * std), roundTo)
    counts.crossJoin(broadcast(stats))
      .withColumn("z", when(col("__k") > 1 && varNum > 0, z))
      .withColumn("is_anomaly", coalesce((abs(col("z")) > zMax).cast("long"), lit(0L)))
      .select("bucket", "n_events", "z", "is_anomaly")
      .orderBy("bucket")
  }
}
