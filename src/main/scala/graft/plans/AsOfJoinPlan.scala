package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** As-of join as a first-class operator: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` (SURVEY §7 / builder preference (c)),
  * alongside the composition-based [[graft.operators.AsOfJoin]].
  *
  * Physical algorithm: both children are hash-clustered on the key and
  * sorted by (key, ts) — declared via requiredChildDistribution /
  * requiredChildOrdering, so EnsureRequirements plans the exchanges and
  * sorts (AQE-visible, reusable) — then a single streaming merge pass per
  * partition holds the latest right row per key with rightTs <= leftTs.
  * One shuffle per side, no per-key window buffers: at 100 TB this is
  * the same cost class as a sort-merge join, with O(1) state per
  * partition instead of the union+window's per-key running state.
  *
  * Child contract (arranged by [[AsOfJoinApi.asofJoinExec]]): each
  * child's first two output columns are (key: bigint, ts: bigint-or-
  * timestamp); the rest are payload. Output = left payload ++ nullable
  * right payload. Right side should be unique per (key, ts).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output.drop(2) ++ right.output.drop(2).map(_.withNullability(true))
  // the merge consumes the (key, ts) columns even though they're not in
  // the output — without this, ColumnPruning strips them from the children
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r) => AsOfJoinExec(planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output.drop(2) ++ right.output.drop(2).map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output.head)),
    ClusteredDistribution(Seq(right.output.head)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending), SortOrder(left.output(1), Ascending)),
    Seq(SortOrder(right.output(0), Ascending), SortOrder(right.output(1), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val rightArity = right.output.size
    val leftSchema = left.output
    val rightSchema = right.output
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind right attrs as nullable: unmatched left rows read the
      // null-filled row, and a non-nullable binding would skip the null
      // check and fabricate zeros
      val proj = UnsafeProjection.create(
        outputAttrs, leftSchema ++ rightSchema.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var heldKey = 0L
      var hasHeld = false
      var heldRow: InternalRow = null
      // NULL keys/timestamps never match (SQL join semantics): right rows
      // with NULLs are discarded up front; left rows with NULLs emit a
      // null payload. UnsafeRow stores 0 behind a null bit, so skipping
      // the check would fabricate matches against key/epoch 0. NULLs sort
      // first under the required ASC ordering, so draining them preserves
      // the merge invariant.
      def rightInvalid(r: InternalRow): Boolean = r.isNullAt(0) || r.isNullAt(1)
      lIter.map { l =>
        if (l.isNullAt(0) || l.isNullAt(1)) proj(joined(l, nullRight))
        else {
          val lk = l.getLong(0)
          val lt = l.getLong(1)
          // consume right rows with (rk, rt) <= (lk, lt) lexicographically;
          // remember the last one whose key matches the current left key
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            if (rightInvalid(r)) { rBuf.next() }
            else {
              val rk = r.getLong(0)
              if (rk < lk || (rk == lk && r.getLong(1) <= lt)) {
                val consumed = rBuf.next()
                if (rk == lk) {
                  heldKey = rk
                  heldRow = consumed.copy() // UnsafeRow buffers are reused
                  hasHeld = true
                }
              } else advance = false
            }
          }
          if (hasHeld && heldKey == lk) proj(joined(l, heldRow))
          else proj(joined(l, nullRight))
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

  /** As-of join via the custom operator. Same contract as
    * [[graft.operators.AsOfJoin]]: latest right payload with
    * rightTs <= leftTs per key. */
  def asofJoinExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      payloadPrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // timestamps order by microseconds; cast-to-long would truncate to
    // seconds and break sub-second as-of semantics
    def tsAsLong(df: DataFrame, c: String) =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case _ => col(c).cast("long")
      }
    val lShaped = left.select(
      col(key).cast("long").as("_k") +:
        tsAsLong(left, leftTs).as("_t") +:
        left.columns.toSeq.map(col): _*)
    val rShaped = right.select(
      col(key).cast("long").as("_k") +:
        tsAsLong(right, rightTs).as("_t") +:
        payload.map(p => col(p).as(s"$payloadPrefix$p")): _*)
    Bridge.ofRows(
      spark,
      AsOfJoinNode(Bridge.logicalPlan(lShaped), Bridge.logicalPlan(rShaped)))
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
