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

/** Compactor-hierarchy quantile sketch state: level h holds items of
  * weight 2^h; a level reaching capacity `k` sorts, promotes every other
  * item (alternating even/odd starts per level) to level h+1 with
  * doubled weight, and keeps the largest item back when the count is
  * odd. Each compaction of items at weight w perturbs ANY rank query by
  * at most w (the standard mergeable-summaries compaction lemma), so
  * `err` — the sum of compacted weights — is a worst-case rank-error
  * bound that holds for every input order, partitioning, and merge
  * order. Total weight (`n`) is preserved exactly by compaction.
  *
  * Weighted insert places one copy of the value at each set bit of the
  * weight (weight = Σ 2^b), which is exact — re-ingesting a sketch's
  * own (value, weight) items therefore IS sketch merge, the property
  * the streaming store rides. */
private[graft] final class KllState(val k: Int) {
  var n: Long = 0L
  var err: Long = 0L
  val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Long]]
  val toggles = mutable.ArrayBuffer.empty[Boolean]

  private def ensureLevel(h: Int): Unit =
    while (levels.size <= h) {
      levels += mutable.ArrayBuffer.empty[Long]
      toggles += false
    }

  /** Insert one item at level h (weight 2^h), cascading compactions. */
  def insertAt(v: Long, h: Int): Unit = {
    ensureLevel(h)
    levels(h) += v
    n += (1L << h)
    var i = h
    while (i < levels.size && levels(i).size >= k) {
      compact(i)
      i += 1
    }
  }

  /** Insert with arbitrary positive weight: one copy per set bit. */
  def insert(v: Long, w: Long): Unit = {
    // every entry point enforces the invariant, not just the Catalyst
    // update() path — a w <= 0 would decompose across bit 63 and wrap
    // n/err instead of failing
    require(w > 0, s"kll insert weight must be positive, got $w")
    var b = 0
    var rem = w
    while (rem != 0L) {
      if ((rem & 1L) == 1L) insertAt(v, b)
      rem >>>= 1
      b += 1
    }
  }

  private def compact(h: Int): Unit = {
    val sorted = levels(h).toArray
    java.util.Arrays.sort(sorted)
    val m = sorted.length / 2
    // alternate the kept parity per level so consecutive compactions at
    // the same level push rank estimates in opposite directions (the
    // recorded `err` bound never relies on this — it is a worst-case
    // sum — but alternation keeps the realized error far inside it)
    val off = if (toggles(h)) 1 else 0
    toggles(h) = !toggles(h)
    ensureLevel(h + 1)
    val up = levels(h + 1)
    var i = 0
    while (i < m) {
      up += sorted(2 * i + off)
      i += 1
    }
    levels(h).clear()
    // odd count: the largest item stays at this level, error-free
    if (sorted.length % 2 == 1) levels(h) += sorted(sorted.length - 1)
    err += (1L << h)
  }

  def mergeIn(o: KllState): Unit = {
    err += o.err
    var h = 0
    while (h < o.levels.size) {
      val buf = o.levels(h)
      var i = 0
      while (i < buf.size) { insertAt(buf(i), h); i += 1 }
      h += 1
    }
  }

  /** All (value, weight) items, sorted by (value, weight). */
  def items: Array[(Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    var h = 0
    while (h < levels.size) {
      val w = 1L << h
      levels(h).foreach(v => out += ((v, w)))
      h += 1
    }
    out.sortInPlace().toArray
  }
}

/** KLL-style mergeable quantile sketch as a native Catalyst
  * `TypedImperativeAggregate` (compactor hierarchy after Karnin/Lang/
  * Liberty FOCS'16 with MRL-style fixed per-level capacity; merge rule
  * from Agarwal et al., "Mergeable summaries", PODS'12) — the missing
  * member of the engine's fixed-memory sketch family next to
  * Misra–Gries (heavy hitters), Count–Min (frequencies) and HLL
  * (distincts): dataset-card latency/length quantiles over 100 TB with
  * `k × ~log(N/k)` longs per partial buffer and map-side partials.
  *
  * `kll_sketch(value, weight, k)` over BIGINT values and positive
  * BIGINT weights. Eval returns `struct<n, err_bound,
  * items array<struct<v, w>>>`:
  *  - `n` is the EXACT total weight (compaction preserves weight);
  *  - for every x, |Σ_{items v ≤ x} w − true_rank(x)| ≤ `err_bound`,
  *    for ANY processing/merge order — which multiset of items
  *    survives IS order-dependent (as in every compaction sketch), so
  *    catalog entries pin only these order-independent guarantees,
  *    exactly the q173/q272 Misra–Gries discipline. Compaction itself
  *    is deterministic given a level's multiset (sort by value; equal
  *    values are interchangeable in rank space, so no tie-break is
  *    needed beyond the value order).
  */
case class KllSketch(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8 && k <= (1 << 16), s"kll_sketch k must be in [8, 65536], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch requires a BIGINT value column, got ${child.dataType.simpleString}")
    else if (weight.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch requires a BIGINT weight, got ${weight.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("v", LongType, nullable = false),
        StructField("w", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) {
        val wl = w.asInstanceOf[Long]
        require(wl > 0L, s"kll_sketch weight must be positive, got $wl")
        buf.insert(v.asInstanceOf[Long], wl)
      }
    }
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllState): Any =
    new GenericInternalRow(Array[Any](
      buf.n,
      buf.err,
      new GenericArrayData(buf.items.map { case (v, w) =>
        new GenericInternalRow(Array[Any](v, w))
      }.toArray[Any])))

  override def serialize(buf: KllState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeLong(buf.err)
    out.writeInt(buf.levels.size)
    var h = 0
    while (h < buf.levels.size) {
      out.writeBoolean(buf.toggles(h))
      val lvl = buf.levels(h)
      out.writeInt(lvl.size)
      lvl.foreach(out.writeLong)
      h += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new KllState(k)
    buf.n = in.readLong()
    buf.err = in.readLong()
    val nLevels = in.readInt()
    var h = 0
    while (h < nLevels) {
      val toggle = in.readBoolean()
      val sz = in.readInt()
      val lvl = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < sz) { lvl += in.readLong(); i += 1 }
      buf.levels += lvl
      buf.toggles += toggle
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "kll_sketch"
}
