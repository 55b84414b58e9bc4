package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality validation — the expectations/Deequ pattern
  * (Schelter et al., "Automating large-scale data quality verification",
  * VLDB 2018): a constraint suite evaluated against a table produces a
  * machine-checkable report row per constraint (violation count, fraction,
  * threshold, pass), the gate every production ingest runs before publishing
  * a snapshot.
  *
  * Scale shape: ALL row-level and uniqueness constraints for a table are
  * computed in ONE aggregation pass over it (violations are exact integer
  * sums of 0/1 indicators; uniqueness is `count(*) − countDistinct(keys)`);
  * each referential constraint adds one broadcast anti-join count (the dim
  * side broadcasts, the fact side never shuffles). The collected metrics are
  * bounded parameter data — one long per constraint, never a data-plane
  * collect. Fractions are floor-rounded so the report is oracle-checkable
  * (q137).
  */
object Validate {

  /** A constraint whose violations are countable row-by-row in the single
    * aggregation pass. `violations` is a 0/1 indicator column; NULL is a
    * violation for range/set membership (a null can't be proven in-range).
    */
  sealed trait RowCheck { def name: String; def violations: Column; def threshold: Double }

  final case class NotNull(colName: String, threshold: Double = 0.0) extends RowCheck {
    val name = s"not_null:$colName"
    def violations: Column = when(col(colName).isNull, 1L).otherwise(0L)
  }
  final case class InRange(colName: String, lo: Double, hi: Double,
                           threshold: Double = 0.0) extends RowCheck {
    val name = s"range:$colName"
    def violations: Column =
      when(col(colName).isNull || col(colName) < lo || col(colName) > hi, 1L).otherwise(0L)
  }
  final case class InSet(colName: String, values: Seq[String],
                         threshold: Double = 0.0) extends RowCheck {
    val name = s"set:$colName"
    def violations: Column =
      when(col(colName).isNull || !col(colName).isin(values: _*), 1L).otherwise(0L)
  }

  /** Key-uniqueness constraint; violations = rows beyond one per distinct
    * key. Key columns are assumed non-null (pair with [[NotNull]] — Spark's
    * countDistinct skips rows with a null key column).
    */
  final case class UniqueKey(cols: Seq[String], threshold: Double = 0.0) {
    val name = s"unique:${cols.mkString("+")}"
  }

  /** Referential constraint: every fact `colName` value exists in
    * `dim.dimCol`. Violations = dangling fact rows (broadcast anti-join).
    */
  final case class ForeignKey(colName: String, dim: DataFrame, dimCol: String,
                              threshold: Double = 0.0) {
    val name = s"fk:$colName->$dimCol"
  }

  /** Evaluate a constraint suite against `df`; returns one report row per
    * constraint: (check, violations, total, viol_frac, threshold, pass).
    * `table` prefixes the check names so suites over several tables union
    * into one report.
    */
  def validate(table: String, df: DataFrame,
               rowChecks: Seq[RowCheck] = Nil,
               uniques: Seq[UniqueKey] = Nil,
               fks: Seq[ForeignKey] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniques.nonEmpty || fks.nonEmpty, "empty constraint suite")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs =
      Seq(count(lit(1)).cast("long").as("__n")) ++
      // coalesce: sum over an EMPTY table is NULL, which would flow into the
      // report as a boxed null Long and break the row encoder
      rowChecks.map(c => coalesce(sum(c.violations), lit(0L)).cast("long").as(c.name)) ++
      uniques.map(u =>
        (count(lit(1)) - countDistinct(col(u.cols.head), u.cols.tail.map(col): _*))
          .cast("long").as(u.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val fkViolations = fks.map { f =>
      f.name -> df.select(col(f.colName))
        .join(broadcast(f.dim.select(col(f.dimCol))), col(f.colName) === col(f.dimCol), "left_anti")
        .count()
    }
    val rows =
      rowChecks.map(c => (s"$table/${c.name}", row.getAs[Long](c.name), c.threshold)) ++
      uniques.map(u => (s"$table/${u.name}", row.getAs[Long](u.name), u.threshold)) ++
      fkViolations.zip(fks).map { case ((nm, v), f) => (s"$table/$nm", v, f.threshold) }
    rows.toDF("check", "violations", "threshold")
      .withColumn("total", lit(n))
      // empty table: fraction undefined (NULL), constraints pass vacuously
      .withColumn("viol_frac",
        when(col("total") > 0,
          floorRound(col("violations").cast("double") / col("total").cast("double"), 6)))
      .withColumn("pass",
        (col("total") === 0 || col("viol_frac") <= col("threshold")).cast("long"))
      .select("check", "violations", "total", "viol_frac", "threshold", "pass")
  }
}
