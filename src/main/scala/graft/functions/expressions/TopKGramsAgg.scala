package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k (count, w1, w2) aggregation — [[TopKPairsAgg]]'s sibling for
  * string-keyed co-occurrence tables. A `row_number() OVER (PARTITION BY g
  * ORDER BY n DESC) <= k` window must shuffle the ENTIRE count table (vocab²
  * rows for skip-gram pairs) into one task per group before discarding all
  * but k rows; as a TypedImperativeAggregate this runs inside
  * ObjectHashAggregate with a partial (map-side) pass, so each input
  * partition forwards at most k entries per group and the exchange moves
  * O(k · partitions · groups) rows. Ordering matches the window formulation
  * exactly: n descending, then (w1, w2) ascending in binary (UTF8_BINARY)
  * order — the same collation `ORDER BY` uses.
  *
  * Output: `array<struct<n bigint, w1 string, w2 string>>`, sorted, length
  * ≤ k — posexplode downstream to recover (rank, n, w1, w2) rows.
  */
case class TopKGramsAgg(
    n: Expression,
    w1: Expression,
    w2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, UTF8String, UTF8String)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(n, w1, w2)
  // update() casts to Long/UTF8String — declare it so a SQL call with an INT
  // count or non-string key is coerced (or rejected) at analysis, not a
  // ClassCastException at execution
  // (Seq[DataType] <: Seq[AbstractDataType]; AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(LongType, StringType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("n", LongType), StructField("w1", StringType),
      StructField("w2", StringType))),
    containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Long, UTF8String, UTF8String)] =
    ArrayBuffer.empty

  // (n desc, w1 asc, w2 asc): true when a ranks strictly better than b
  @inline private def better(a: (Long, UTF8String, UTF8String),
                             b: (Long, UTF8String, UTF8String)): Boolean =
    if (a._1 != b._1) a._1 > b._1
    else {
      val c1 = a._2.compareTo(b._2)
      c1 < 0 || (c1 == 0 && a._3.compareTo(b._3) < 0)
    }

  /** Keep the buffer's k best; amortized: let it grow to 4k, then compact. */
  private def compact(buf: ArrayBuffer[(Long, UTF8String, UTF8String)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(better).take(k)
      buf.clear(); buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Long, UTF8String, UTF8String)],
                      input: InternalRow): ArrayBuffer[(Long, UTF8String, UTF8String)] = {
    val c = n.eval(input)
    val a = w1.eval(input)
    val b = w2.eval(input)
    if (c != null && a != null && b != null) {
      // clone: the input UTF8Strings may point into a reused row buffer
      buf += ((c.asInstanceOf[Long],
        a.asInstanceOf[UTF8String].clone(), b.asInstanceOf[UTF8String].clone()))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, UTF8String, UTF8String)],
                     other: ArrayBuffer[(Long, UTF8String, UTF8String)]): ArrayBuffer[(Long, UTF8String, UTF8String)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, UTF8String, UTF8String)]): Any = {
    val top = buf.sortWith(better).take(k)
    new GenericArrayData(top.map { case (c, a, b) => InternalRow(c, a, b) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, UTF8String, UTF8String)]): Array[Byte] = {
    compact(buf) // shuffle at most k entries
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (c, a, b) =>
      out.writeLong(c)
      val ab = a.getBytes; out.writeInt(ab.length); out.write(ab)
      val bb = b.getBytes; out.writeInt(bb.length); out.write(bb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, UTF8String, UTF8String)] = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val m   = in.readInt()
    val buf = ArrayBuffer.empty[(Long, UTF8String, UTF8String)]
    var i = 0
    while (i < m) {
      val c  = in.readLong()
      val la = in.readInt(); val ab = new Array[Byte](la); in.readFully(ab)
      val lb = in.readInt(); val bb = new Array[Byte](lb); in.readFully(bb)
      buf += ((c, UTF8String.fromBytes(ab), UTF8String.fromBytes(bb)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKGramsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKGramsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(n = newChildren(0), w1 = newChildren(1), w2 = newChildren(2))

  override def prettyName: String = "graft_topk_grams"
}
