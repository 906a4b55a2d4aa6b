package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** As-of join as a first-class operator: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` (SURVEY §7 / builder preference (c)),
  * alongside the composition-based [[graft.operators.AsOfJoin]].
  *
  * Physical algorithm: both children are hash-clustered on the key
  * columns and sorted by (keys..., ts) — declared via
  * requiredChildDistribution / requiredChildOrdering, so
  * EnsureRequirements plans the exchanges and sorts (AQE-visible,
  * reusable) — then a single streaming merge pass per partition holds the
  * latest right row per key with rightTs <= leftTs. One shuffle per side,
  * no per-key window buffers: at 100 TB this is the same cost class as a
  * sort-merge join, with O(1) state per partition instead of the
  * union+window's per-key running state.
  *
  * Child contract (arranged by [[AsOfJoinApi.asofJoinExec]]): each
  * child's first `numKeys` output columns are the join keys (any
  * orderable types, same types both sides), the next column is the event
  * time as bigint, and the rest are payload. Output = left payload ++
  * nullable right payload. Right side should be unique per (keys, ts).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan, numKeys: Int)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output.drop(numKeys + 1) ++
      right.output.drop(numKeys + 1).map(_.withNullability(true))
  // the merge consumes the (keys, ts) columns even though they're not in
  // the output — without this, ColumnPruning strips them from the children
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, nk) => AsOfJoinExec(planLater(l), planLater(r), nk) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan, numKeys: Int)
    extends BinaryExecNode {

  private def tsIdx = numKeys

  override def output: Seq[Attribute] =
    left.output.drop(numKeys + 1) ++
      right.output.drop(numKeys + 1).map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(left.output.take(numKeys)),
    ClusteredDistribution(right.output.take(numKeys)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    left.output.take(numKeys + 1).map(SortOrder(_, Ascending)),
    right.output.take(numKeys + 1).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val nk = numKeys
    val ti = tsIdx
    val rightArity = right.output.size
    val leftSchema = left.output
    val rightSchema = right.output
    val outputAttrs = output
    val keyTypes = left.output.take(nk).map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind right attrs as nullable: unmatched left rows read the
      // null-filled row, and a non-nullable binding would skip the null
      // check and fabricate zeros
      val proj = UnsafeProjection.create(
        outputAttrs, leftSchema ++ rightSchema.map(_.withNullability(true)))
      // key comparison via projected key rows + a natural ascending
      // ordering over the key types — this is what generalizes the merge
      // beyond single-bigint keys (strings, composites, dates, ...)
      val lKeyProj = UnsafeProjection.create(leftSchema.take(nk), leftSchema)
      val rKeyProj = UnsafeProjection.create(rightSchema.take(nk), rightSchema)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var heldKey: InternalRow = null
      var heldRow: InternalRow = null
      // NULL keys/timestamps never match (SQL join semantics): right rows
      // with NULLs are discarded up front; left rows with NULLs emit a
      // null payload. UnsafeRow stores 0 behind a null bit, so skipping
      // the check would fabricate matches against key/epoch 0. NULLs sort
      // first under the required ASC ordering, so draining them preserves
      // the merge invariant.
      def anyNull(r: InternalRow): Boolean = {
        var i = 0
        while (i <= ti) { if (r.isNullAt(i)) return true; i += 1 }
        false
      }
      lIter.map { l =>
        if (anyNull(l)) proj(joined(l, nullRight))
        else {
          val lk = lKeyProj(l)
          val lt = l.getLong(ti)
          // consume right rows with (rkeys, rt) <= (lkeys, lt)
          // lexicographically; remember the last one whose key matches
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            if (anyNull(r)) { rBuf.next() }
            else {
              val cmp = keyOrd.compare(rKeyProj(r), lk)
              if (cmp < 0 || (cmp == 0 && r.getLong(ti) <= lt)) {
                val consumed = rBuf.next()
                if (cmp == 0) {
                  // UnsafeRow buffers are reused by the child iterators
                  heldRow = consumed.copy()
                  heldKey = rKeyProj(heldRow).copy()
                }
              } else advance = false
            }
          }
          if (heldKey != null && keyOrd.compare(heldKey, lk) == 0) {
            proj(joined(l, heldRow))
          } else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Session wiring + Dataset-level API for the custom operator. */
object AsOfJoinApi {

  /** For `spark.sql.extensions=graft.plans.GraftExtensions` users. */
  def install(spark: SparkSession): Unit =
    Bridge.addStrategy(spark, AsOfJoinStrategy)

  /** As-of join via the custom operator, single key column. */
  def asofJoinExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      payloadPrefix: String): DataFrame =
    asofJoinExec(left, right, Seq(key), leftTs, rightTs, payload, payloadPrefix)

  def asofJoinExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    asofJoinExec(left, right, Seq(key), leftTs, rightTs, payload, "asof_")

  /** As-of join via the custom operator. Same contract as
    * [[graft.operators.AsOfJoin]]: latest right payload with
    * rightTs <= leftTs per key tuple. Keys keep their native types
    * (any orderable type, multi-column supported); the right side's key
    * columns are cast to the left's types so the merge comparator sees
    * one schema. */
  def asofJoinExec(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      payloadPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val spark = left.sparkSession
    install(spark)
    // timestamps order by microseconds; cast-to-long would truncate to
    // seconds and break sub-second as-of semantics
    def tsAsLong(df: DataFrame, c: String) =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case _ => col(c).cast("long")
      }
    val keyTypes = keys.map(k => left.schema(k).dataType)
    val lShaped = left.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"_k$i") } ++
        Seq(tsAsLong(left, leftTs).as("_t")) ++
        left.columns.toSeq.map(col): _*)
    val rShaped = right.select(
      keys.zip(keyTypes).zipWithIndex.map { case ((k, dt), i) =>
        col(k).cast(dt).as(s"_k$i")
      } ++
        Seq(tsAsLong(right, rightTs).as("_t")) ++
        payload.map(p => col(p).as(s"$payloadPrefix$p")): _*)
    Bridge.ofRows(
      spark,
      AsOfJoinNode(
        Bridge.logicalPlan(lShaped), Bridge.logicalPlan(rShaped), keys.size))
  }
}

/** `SparkSessionExtensions` entry point (builder `.withExtensions` or the
  * `spark.sql.extensions` conf): the as-of join strategy plus the
  * Hive header-skip rewrite rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(session => ResolveHeaderSkipTextTables(session))
  }
}
