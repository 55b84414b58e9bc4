package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Physical-layout planning — the operators that decide how 100 TB lands on
  * disk. Neither is a query over the data so much as a query over the
  * data's SHAPE: [[compactionPlan]] groups small files into target-size
  * writes (the small-files problem every long-running ingest accumulates),
  * [[zorderAudit]] measures how much a space-filling-curve sort would
  * tighten per-block min/max ranges (the statistic data-skipping prunes by).
  */
object Layout {

  /** Compaction plan: within each partition, walk files in `orderCol` order
    * accumulating `sizeCol`, and open a new output bin every time the
    * cumulative size crosses a `targetBytes` boundary — i.e. bin k holds the
    * files whose exclusive prefix sum lies in [k·target, (k+1)·target).
    * Returns one row per planned bin: file count, total bytes, fill ratio.
    *
    * This is the planner of an Iceberg/Delta-style `OPTIMIZE`: deterministic
    * (no bin-packing heuristic drift between runs), and distributed — the
    * running sum is windowed PER PARTITION KEY, so planning parallelizes
    * across partitions and never needs a global sort. Bins can exceed
    * `targetBytes` by at most one file, the standard contiguous-coalesce
    * trade that preserves file order within a bin (cheap rewrite, stable
    * time-locality).
    */
  def compactionPlan(df: DataFrame, partCol: String, orderCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(sizeCol)).over(w).cast("long"))
      // exclusive prefix sum div target; quotient < 2^53 so the double
      // division truncates exactly like integer division (mirrored as // in
      // the oracle)
      .withColumn("bin",
        ((col("__cum") - col(sizeCol).cast("long")).cast("double") / targetBytes)
          .cast("long"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum(col(sizeCol)).cast("long").as("bin_bytes"))
      .withColumn("fill",
        floorRound(col("bin_bytes").cast("double") / targetBytes, 4))
      .orderBy(col(partCol), col("bin"))
  }

  /** 32-bit Morton (Z-order) code: bit i of `x` lands at position 2i, bit i
    * of `y` at 2i+1, over the low 16 bits of each. Pure shifts and masks —
    * mirrored literally in DuckDB SQL ([[zValue16Sql]]).
    */
  def zValue16(x: Column, y: Column): Column = {
    val xm = pmod(x.cast("long"), lit(65536L))
    val ym = pmod(y.cast("long"), lit(65536L))
    (0 until 16).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: + is |
  }

  /** DuckDB mirror of [[zValue16]] — keep token-for-token in sync. */
  def zValue16Sql(xExpr: String, yExpr: String): String = {
    val xm = s"((($xExpr) % 65536 + 65536) % 65536)"
    val ym = s"((($yExpr) % 65536 + 65536) % 65536)"
    (0 until 16).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) + ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Data-skipping effectiveness audit: lay the table out in row-key order vs
    * Z-order over (`xCol`, `yCol`), cut each layout into blocks of
    * `blockRows`, and report the average per-block min/max span of each
    * dimension. Small spans = tight zone maps = point/range predicates prune
    * most blocks; the natural layout is tight in at most one dimension, the
    * Z-order layout is balanced-tight in both. One output row per layout.
    *
    * The audit ranks rows with an exact distributed row number (range
    * partition + within-partition sort + zipWithIndex — see
    * [[blockZoneMaps]]); a production Z-order WRITE of 100 TB is the same
    * `repartitionByRange(zValue16(...))` + per-partition local sort.
    */
  /** (k, x, y, z) projection shared by the layout audits. */
  private def withZ(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame =
    df.select(col(keyCol).as("k"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("z", zValue16(col("x"), col("y")))

  /** Per-block (min, max) zone maps of both dimensions under a total order —
    * block i = rows [i·blockRows, (i+1)·blockRows) of the sort.
    *
    * The global row rank is computed DISTRIBUTED in one consistent lineage:
    * range-partition on the sort key (explicit partition count — no runtime
    * rewrite), sort within partitions, then `zipWithIndex` — Spark computes
    * the per-partition offsets itself with a bounded count job (one long per
    * partition) over the SAME RDD instance, whose range boundaries are
    * sampled exactly once at construction. No persist, no cache-lifetime
    * invariant, nothing left cached. (Two rejected variants: a persist()-
    * based one collected offsets in a separate job against the CacheManager
    * entry and silently mis-ranked if the cache was dropped between plan
    * construction and execution; an in-plan two-branch one was defeated by
    * column pruning, which splits the canonical exchange so each branch
    * re-samples its own range boundaries.) `order` must be a total order
    * (the callers tie-break on the unique key) — ranks are then exact and
    * identical to a global `row_number`.
    */
  private def blockZoneMaps(z: DataFrame, layout: String, order: Seq[Column],
                            blockRows: Int): DataFrame = {
    val spark = z.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = z.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("__blk", LongType, nullable = false))
    // zipWithIndex is 0-based and partition-ordered = exact global row_number - 1
    val withBlk = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i / blockRows) },
      schema)
    withBlk.groupBy("__blk")
      .agg(min("x").cast("long").as("mnx"), max("x").cast("long").as("mxx"),
        min("y").cast("long").as("mny"), max("y").cast("long").as("mxy"))
      .withColumn("layout", lit(layout))
  }

  def zorderAudit(df: DataFrame, keyCol: String, xCol: String, yCol: String,
                  blockRows: Int): DataFrame = {
    require(blockRows >= 2, s"blockRows must be >= 2, got $blockRows")
    val z = withZ(df, keyCol, xCol, yCol)
    def audit(layout: String, order: Seq[Column]): DataFrame =
      blockZoneMaps(z, layout, order, blockRows)
        .select(col("layout"), (col("mxx") - col("mnx")).as("xs"),
          (col("mxy") - col("mny")).as("ys"))
        .groupBy("layout")
        .agg(count(lit(1)).cast("long").as("n_blocks"),
          sum("xs").cast("long").as("sx"), sum("ys").cast("long").as("sy"))
        .select(col("layout"), col("n_blocks"),
          // exact integer sums divided once — no accumulation-order drift
          floorRound(col("sx").cast("double") / col("n_blocks").cast("double"), 4)
            .as("avg_x_span"),
          floorRound(col("sy").cast("double") / col("n_blocks").cast("double"), 4)
            .as("avg_y_span"))
    audit("natural", Seq(col("k")))
      .unionAll(audit("zorder", Seq(col("z"), col("k"))))
      .orderBy("layout")
  }

  /** Data-skipping simulation — what [[zorderAudit]]'s spans MEAN for a scan:
    * for a deterministic set of point probes on `xCol` (distinct values with
    * x % probeMod == 0), the fraction of `blockRows`-row blocks a zone-map
    * check (probe ∉ [min, max]) would skip, under the natural key order vs
    * the Z-order. One row per layout: blocks, probes, and the average skip
    * fraction — an exact integer count ratio, divided once.
    *
    * The blocks × probes cross join is zone-map METADATA sized (n/blockRows
    * rows × a sampled probe set), never the data — at 100 TB this is the
    * planner-side pruning estimate, not a scan.
    */
  def pruningSim(df: DataFrame, keyCol: String, xCol: String, yCol: String,
                 blockRows: Int, probeMod: Long): DataFrame = {
    require(blockRows >= 2 && probeMod >= 1,
      s"need blockRows >= 2 and probeMod >= 1, got $blockRows/$probeMod")
    val z = withZ(df, keyCol, xCol, yCol)
    val probes = z.filter(col("x") % probeMod === 0).select(col("x").as("p")).distinct()
    val maps = blockZoneMaps(z, "natural", Seq(col("k")), blockRows)
      .unionByName(blockZoneMaps(z, "zorder", Seq(col("z"), col("k")), blockRows))
    maps.crossJoin(broadcast(probes))
      .groupBy("layout")
      .agg(countDistinct(col("__blk")).cast("long").as("n_blocks"),
        countDistinct(col("p")).cast("long").as("n_probes"),
        sum(when(col("p") < col("mnx") || col("p") > col("mxx"), 1L).otherwise(0L))
          .cast("long").as("__skipped"))
      .withColumn("skip_frac",
        floorRound(col("__skipped").cast("double") /
          (col("n_blocks") * col("n_probes")).cast("double"), 6))
      .select("layout", "n_blocks", "n_probes", "skip_frac")
      .orderBy("layout")
  }
}
