package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of join — for every left row, the most recent right row with the same
  * key and `rightTime <= leftTime`. An operator Spark's built-ins lack as a
  * single node; rather than a custom `SparkPlan`, it composes as
  * union → single window over (key, time) → filter (builder-prompt preference
  * (a): compose existing ops when semantics allow):
  *
  *   1. tag both inputs and union them (right rows sort BEFORE left rows at
  *      equal timestamps => inclusive `<=` semantics);
  *   2. one window partitioned by key, ordered by (time, tag, tiebreak):
  *      `last(rightCol, ignoreNulls)` over unbounded-preceding rows carries
  *      the latest right values forward;
  *   3. keep only left rows.
  *
  * Cost at scale: ONE shuffle on the key (the window), versus the naive
  * range-join which explodes to O(|L|·|R|) per key. Exactly the plan a
  * native as-of SparkPlan would produce.
  */
object AsOfJoin {

  /** `rightCols` are carried from the right side (null when no right row is
    * at-or-before the left row). `tieCol` breaks equal timestamps
    * deterministically within each side.
    *
    * The right columns travel as ONE struct so the whole matched row is
    * carried atomically — per-column carry with ignoreNulls would backfill a
    * genuinely-null right column from an OLDER right row, mixing rows.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTimeCol: String, rightTimeCol: String,
           rightCols: Seq[String], tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq

    val rStruct = struct(rightCols.map(col): _*)
    val taggedRight = right.select(
      Seq(col(keyCol), col(rightTimeCol).as("__t"), lit(0).as("__is_l"), col(tieCol).as("__tie"),
        rStruct.as("__r")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(leftTimeCol).as("__t"), lit(1).as("__is_l"), col(tieCol).as("__tie"),
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r")) ++
        leftCols.filterNot(_ == keyCol).map(col): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__is_l"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .select(
        (Seq(col(keyCol), col("__is_l")) ++
          leftCols.filterNot(_ == keyCol).map(col) ++
          rightCols.map(c => col("__last_r").getField(c).as(s"asof_$c"))): _*)
      .filter(col("__is_l") === 1)
      .drop("__is_l")
  }
}
