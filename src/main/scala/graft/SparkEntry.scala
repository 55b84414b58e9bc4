package graft

import graft.functions.VectorFunctions
import graft.operators.TopK
import graft.queries.{Q, Registry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2), one named DataFrame query
  * per operator; `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry. Definitions live in `graft.queries.*`.
  */
object SparkEntry {

  /** Flagship: top-10 cosine neighbors of vector 0, joined back to the
    * document corpus — scan + vector math + top-k + join in one plan
    * (SURVEY §7 step 0). Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") === 0)
      .select(VectorFunctions.asDouble(col("embedding"))).head().getSeq[Double](0)
    TopK.topK(emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", qv, k = 10)
      .join(Tables.documents(spark, dir), col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("score"), col("lang"),
        substring(col("text"), 1, 40).as("snippet"))
      .orderBy(desc("score"), col("vec_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
