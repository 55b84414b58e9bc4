package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the product surface): times the
  * stages of the MinHash-LSH pipeline in isolation to localize hotspots.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = graft.Tables.documents(spark, dir)
    time("warmup count")(docs.count())
    val base = docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
      .withColumn("__th", transform(col("__toks"), t => xxhash64(t)))
    time("tokens+hash")(base.write.mode("overwrite").format("noop").save())
    val n = 3
    val cnt = size(col("__th")) - (n - 1)
    val sh = base.withColumn("hs",
        when(cnt >= 1, sort_array(array_distinct(transform(sequence(lit(1), cnt),
          i => xxhash64((0 until n).map(k => element_at(col("__th"), i + k)): _*)))))
        .otherwise(array().cast("array<long>")))
      .filter(size(col("hs")) > 0).select(col("doc_id"), col("hs"))
    time("shingles(sorted,distinct)")(sh.write.mode("overwrite").format("noop").save())
    val shRaw = base.withColumn("hs",
        when(cnt >= 1, transform(sequence(lit(1), cnt),
          i => xxhash64((0 until n).map(k => element_at(col("__th"), i + k)): _*)))
        .otherwise(array().cast("array<long>")))
      .filter(size(col("hs")) > 0).select(col("doc_id"), col("hs"))
    time("shingles(raw)")(shRaw.write.mode("overwrite").format("noop").save())
    // fused kernel equivalence + timing
    val shFused = docs.select(col("doc_id"),
        graft.functions.TextFunctions.shingleHashesFused(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
    time("shingles(fused)")(shFused.write.mode("overwrite").format("noop").save())
    val diff = sh.withColumnRenamed("hs", "hs_old")
      .join(shFused.withColumnRenamed("hs", "hs_new"), Seq("doc_id"), "full")
      .filter(not(col("hs_old") <=> col("hs_new")))
      .count()
    println(s"[prof] fused-vs-HOF mismatch rows: $diff")
    import graft.functions.TextFunctions.minhashSignatureFromHashes
    val sig = sh.withColumn("sig", minhashSignatureFromHashes(col("hs"), 32))
    time("minhash sig")(sig.write.mode("overwrite").format("noop").save())
    time("sig cache materialize") {
      val c = sig.cache(); c.write.mode("overwrite").format("noop").save()
    }
    // q22c stage profile
    val simDf = docs.select(col("doc_id"), graft.functions.TextFunctions.simhash64(col("text")).as("sim"))
    time("simhash(fused)")(simDf.write.mode("overwrite").format("noop").save())
    val simHof = docs.select(col("doc_id"), graft.functions.TextFunctions.simhash64Hof(col("text")).as("sim"))
    time("simhash(hof)")(simHof.write.mode("overwrite").format("noop").save())
    time("full q22c")(graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 8).write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    time("full q22b (cache warm)")(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 16, 0.5).write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    time("full q22b (cold)")(graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 16, 0.5).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
