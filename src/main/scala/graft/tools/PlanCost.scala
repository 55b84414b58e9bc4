package graft.tools

import graft.operators.AnnIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Scratch measurement harness (not product surface): the planning-cost
  * curve behind the CentroidArgmin kernel (r17 verdict task 1). Builds the
  * IVF cell-argmin column two ways over the same synthetic corpus —
  *
  *  - LITERAL: the pre-r18 formulation, nlist·dim centroid literals baked
  *    into `array_min(array(struct(lit(c2) − 2·dot(v, array(lit…)), i)))`
  *    (reconstructed here verbatim, kept ONLY as the measurement baseline);
  *  - KERNEL: [[AnnIndex.argminCell]], the centroid matrix as one codegen
  *    reference object.
  *
  * For each nlist ∈ {32, 256, 1024} (dim 64; production dim is 1536 — 24×
  * more literal nodes still) it prints analyzed-plan expression-node count,
  * wall-ms to produce the executed plan, and wall-ms of a first action
  * (includes codegen) — the blowup curve vs the kernel's flat line.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions.dotFused
    import spark.implicits._

    val dim = 64
    val rows = (0L until 1000L).map(i =>
      (i, Seq.tabulate(dim)(d => ((i * 31 + d * 17 + 5) % 1003 - 501).toDouble)))
      .toDF("id", "v").cache()
    rows.count()

    def centsOf(nlist: Int): Array[Array[Double]] =
      Array.tabulate(nlist)(i =>
        Array.tabulate(dim)(d => ((i.toLong * 97 + d * 13 + 7) % 1003 - 501).toDouble))

    def literalArgmin(vec: Column, cents: Array[Array[Double]]): Column =
      array_min(array(cents.toSeq.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - lit(2.0) * dotFused(vec, array(c.toSeq.map(lit): _*))).as("d"),
          lit(i).as("i"))
      }: _*)).getField("i")

    println(f"${"variant"}%-8s ${"nlist"}%6s ${"exprNodes"}%10s ${"planMs"}%8s ${"actionMs"}%9s")
    for (nlist <- Seq(32, 256, 1024); variant <- Seq("literal", "kernel")) {
      val cents = centsOf(nlist)
      val t0 = System.nanoTime()
      val col0 = if (variant == "literal") literalArgmin($"v", cents)
                 else AnnIndex.argminCell($"v", cents)
      val df = rows.select($"id", col0.as("cell"))
      val exprNodes = df.queryExecution.analyzed.expressions
        .map(e => e.collect { case x => x }.size).sum
      df.queryExecution.executedPlan
      val tPlanned = System.nanoTime()
      df.agg(sum("cell")).head() // includes whole-stage codegen + execution
      val tActed = System.nanoTime()
      println(f"$variant%-8s $nlist%6d $exprNodes%10d ${(tPlanned - t0) / 1e6}%8.0f ${(tActed - tPlanned) / 1e6}%9.0f")
    }
    spark.stop()
  }
}
