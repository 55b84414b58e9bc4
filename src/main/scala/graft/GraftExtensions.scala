package graft

import graft.functions.GraftFunctions.{arity2, intLit}
import graft.functions.expressions.{CosineSimilarity, DotProduct, MinHashSignature, SortedIntersectionCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of the native graft kernels, for
  * config-driven wiring:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * (In-process sessions can use [[graft.functions.GraftFunctions.register]]
  * instead, which targets an already-created session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[CosineSimilarity]),
      (es: Seq[Expression]) => { arity2("graft_cosine", es); CosineSimilarity(es.head, es(1)) }))
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[DotProduct]),
      (es: Seq[Expression]) => { arity2("graft_dot", es); DotProduct(es.head, es(1)) }))
    e.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count", classOf[SortedIntersectionCount]),
      (es: Seq[Expression]) => { arity2("graft_sorted_intersect_count", es); SortedIntersectionCount(es.head, es(1)) }))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[MinHashSignature]),
      (es: Seq[Expression]) => { arity2("graft_minhash", es)
        MinHashSignature(es.head, intLit(es(1), "graft_minhash numHashes")) }))
  }
}
