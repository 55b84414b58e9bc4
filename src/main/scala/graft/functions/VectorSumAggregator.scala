package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]`): element-wise vector sum
  * with a count, yielding the mean vector per group — the UDAF form of the
  * relational centroid (q23). Partial aggregation comes for free from the
  * Aggregator contract (`reduce` map-side, `merge` across partitions), so a
  * per-label centroid over 100 TB of embeddings shuffles one (dim+1)-double
  * buffer per group per partition, not the vectors.
  */
object VectorSumAggregator {

  final case class Buf(sum: Array[Double], n: Long)

  /** Mean vector per group; empty groups yield an empty array. */
  def meanVector: Aggregator[Seq[Double], Buf, Seq[Double]] =
    new Aggregator[Seq[Double], Buf, Seq[Double]] {
      override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

      override def reduce(b: Buf, v: Seq[Double]): Buf =
        if (b.n == 0L) Buf(v.toArray, 1L)
        else {
          require(v.length == b.sum.length,
            s"vector length mismatch in group: ${v.length} vs ${b.sum.length}")
          var i = 0
          val s = b.sum
          while (i < s.length) { s(i) += v(i); i += 1 }
          Buf(s, b.n + 1)
        }

      override def merge(a: Buf, b: Buf): Buf =
        if (a.n == 0L) b
        else if (b.n == 0L) a
        else {
          require(a.sum.length == b.sum.length,
            s"vector length mismatch in group: ${a.sum.length} vs ${b.sum.length}")
          var i = 0
          val s = a.sum
          while (i < s.length) { s(i) += b.sum(i); i += 1 }
          Buf(s, a.n + b.n)
        }

      override def finish(b: Buf): Seq[Double] =
        if (b.n == 0L) Seq.empty else b.sum.map(_ / b.n).toSeq

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
}
