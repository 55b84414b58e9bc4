package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k (score, id) aggregation — the pre-reduce that makes a kNN
  * join shuffle O(k · partitions · queries) instead of O(corpus · queries).
  *
  * The window formulation (`row_number() OVER (PARTITION BY query ORDER BY
  * score DESC)` then `rn <= k`) must shuffle EVERY scored candidate row
  * before it can discard any. As a TypedImperativeAggregate this runs inside
  * ObjectHashAggregate with a partial (map-side) pass: each input partition
  * reduces to at most k entries per query BEFORE the exchange, and the final
  * pass merges the per-partition top-k lists. Ordering matches the window
  * formulation exactly: score descending, id ascending on ties.
  *
  * Output: `array<struct<score double, id bigint>>`, sorted, length ≤ k —
  * posexplode downstream to recover (rank, score, id) rows.
  */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // update() casts to Double/Long — declare it so a SQL call with e.g. a
  // FLOAT score or INT id is coerced (or rejected) at analysis, not a
  // ClassCastException at execution
  // (Seq[DataType] <: Seq[AbstractDataType]; AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  // (score desc, id asc): true when a ranks strictly better than b
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Keep the buffer's k best; amortized: let it grow to 4k, then compact. */
  private def compact(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(better).take(k)
      buf.clear(); buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN scores are skipped: `better` would not be a strict weak order with
    // NaN in play (TimSort can throw on an intransitive comparator), and a
    // NaN similarity is never a meaningful neighbor (knnJoin also filters
    // them before the aggregate — this guard covers direct SQL use)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(better).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf) // shuffle at most k entries
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_topk_pairs"
}
