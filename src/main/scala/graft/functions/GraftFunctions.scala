package graft.functions

import graft.functions.expressions.{CosineSimilarity, DotProduct, MinHashSignature, SortedIntersectionCount}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration of the native graft kernels, so they are callable from
  * `spark.sql` text as well as the Column API:
  *
  *   SELECT graft_cosine(a, b), graft_dot(a, b),
  *          graft_sorted_intersect_count(ha, hb), graft_minhash(hs, 32) ...
  */
object GraftFunctions {

  private[graft] def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private[graft] def arity2(name: String, es: Seq[Expression]): Unit =
    require(es.length == 2, s"$name expects exactly 2 arguments, got ${es.length}")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      es => { arity2("graft_cosine", es); CosineSimilarity(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      es => { arity2("graft_dot", es); DotProduct(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      es => { arity2("graft_sorted_intersect_count", es); SortedIntersectionCount(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => { arity2("graft_minhash", es); MinHashSignature(es.head, intLit(es(1), "numHashes")) }, "scala_udf")
  }
}
