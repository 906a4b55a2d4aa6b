package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate` (Misra/Gries, "Finding repeated elements",
  * 1982; merge rule from Agarwal et al., "Mergeable summaries", PODS'12).
  *
  * Fixed memory: at most `k` counters per partial buffer, so a 100 TB
  * token stream aggregates with map-side partials of bounded size — the
  * deterministic-guarantee alternative to count-min (q91): for stream
  * length N, every item with true count > N/(k+1) is GUARANTEED present,
  * and each reported estimate is an UNDERCOUNT by at most N/(k+1).
  * Which *non*-heavy items survive depends on processing order, so
  * catalog entries must only assert the order-independent guarantees
  * (presence + bounds), never the raw candidate set.
  *
  * Buffer is a plain string→count map, serialized with length-prefixed
  * UTF-8; eval returns array<struct<term string, est long>> sorted by
  * (est desc, term) for stable display.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries k must be >= 1, got $k")

  // SQL-registered: misuse (non-string child) must fail at analysis, not
  // as a runtime ClassCastException in update()'s UTF8String cast
  override def checkInputDataTypes(): TypeCheckResult =
    // isInstanceOf, not ==: collated StringType (Spark 4) is still a
    // string and update()'s UTF8String cast handles it
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a STRING column, got ${child.dataType.simpleString}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def offer(buf: mutable.HashMap[String, Long], s: String, c: Long): Unit = {
    buf.get(s) match {
      case Some(v) => buf.update(s, v + c)
      case None if buf.size < k => buf.update(s, c)
      case None =>
        // decrement-all by the smaller of c and the min counter, repeat
        // until the item is absorbed or dropped — batched form of the
        // classic one-at-a-time decrement
        var rem = c
        while (rem > 0 && !buf.contains(s) && buf.size >= k) {
          val dec = math.min(rem, buf.values.min)
          rem -= dec
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val nv = buf(key) - dec
            if (nv <= 0) dead += key else buf.update(key, nv)
          }
          dead.foreach(buf.remove)
          if (buf.size < k && rem > 0) buf.update(s, rem)
        }
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => offer(buf, s, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}
