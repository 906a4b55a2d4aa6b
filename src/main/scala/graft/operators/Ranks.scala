package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranks and running sums — the scale-safe
  * restatement of `Window.orderBy(...)` with no partition spec, whose
  * single-partition WindowExec is the classic 100 TB straggler (every
  * row through one task).
  *
  * The pattern is [[Packing]]'s bucketed prefix-sum, completed so that
  * NO single-partition window remains anywhere in the plan: bucket the
  * rows by a RANGE key that coarsens the global order (same bucket ⇒
  * contiguous run of the total order), rank locally per bucket (keyed
  * window — parallel), and add each bucket's base offset, computed from
  * the bucket-total table by a broadcast triangular join (bucket totals
  * are |buckets| rows, so the O(B²) join is trivial — and visible in the
  * plan as a broadcast join, not a WindowExec). Results are
  * BIT-IDENTICAL to the single-partition window: only the execution
  * shape changes.
  */
object Ranks {

  /** EXCLUSIVE cumulative base per bucket over an arbitrary
    * (bucket, total) table: for each bucket, the summed total of all
    * STRICTLY SMALLER buckets — the broadcast triangular join that
    * replaces `sum(total) over (order by bucket rows between unbounded
    * preceding and -1)` with no WindowExec at all. `totals` must be one
    * row per bucket. */
  def cumulativeBases(
      totals: DataFrame,
      bucketCol: String,
      totalCol: String,
      out: String): DataFrame =
    totals.select(col(bucketCol))
      .join(
        broadcast(totals.select(
          col(bucketCol).as("_rk_b2"), col(totalCol).as("_rk_n2"))),
        col("_rk_b2") < col(bucketCol), "left")
      .groupBy(col(bucketCol))
      .agg(coalesce(sum(col("_rk_n2")), lit(0L)).as(out))

  /** Cumulative base offset per bucket: for each bucket, the total
    * weight of all STRICTLY SMALLER buckets. `totals` must be one row
    * per bucket with columns (_rk_bucket, _rk_n). */
  private def bucketBases(totals: DataFrame): DataFrame =
    cumulativeBases(totals, "_rk_bucket", "_rk_n", "_rk_base")

  /** Exact global `row_number() over (order by orderCols)` as column
    * `out`. `bucket` must coarsen the order: rows in a smaller bucket
    * precede every row of a larger one (e.g. `value div span` for an
    * ascending value order, `-(value div span)` for descending). */
  def globalRowNumber(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      out: String): DataFrame = {
    val withB = df.withColumn("_rk_bucket", bucket)
    val inBucket = Window.partitionBy(col("_rk_bucket")).orderBy(orderCols: _*)
    val totals = withB.groupBy(col("_rk_bucket")).agg(count(lit(1)).as("_rk_n"))
    withB
      .withColumn("_rk_local", row_number().over(inBucket).cast("long"))
      .join(broadcast(bucketBases(totals)), Seq("_rk_bucket"))
      .withColumn(out, col("_rk_base") + col("_rk_local"))
      .drop("_rk_bucket", "_rk_local", "_rk_base")
  }

  /** Exact INCLUSIVE global running sum of `weight` over
    * `order by orderCols`, as column `out` — the distributed form of
    * `sum(w) over (order by v rows unbounded preceding)`. Same bucket
    * contract as [[globalRowNumber]]. */
  def globalRunningSum(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      weight: Column,
      out: String): DataFrame = {
    val withB = df.withColumn("_rk_bucket", bucket)
    val inBucket = Window.partitionBy(col("_rk_bucket")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = withB.groupBy(col("_rk_bucket")).agg(sum(weight).as("_rk_n"))
    withB
      .withColumn("_rk_local", sum(weight).over(inBucket))
      .join(broadcast(bucketBases(totals)), Seq("_rk_bucket"))
      .withColumn(out, col("_rk_base") + col("_rk_local"))
      .drop("_rk_bucket", "_rk_local", "_rk_base")
  }

  /** Exact `ntile(n)` bucket for 1-based global rank `rank` of `total`
    * rows — Spark's own NTile arithmetic (first `total mod n` buckets
    * get the extra row), restated on a precomputed distributed rank so
    * no single-partition window is needed. */
  def ntileOfRank(rank: Column, total: Column, n: Int): Column = {
    val idiv = org.apache.spark.sql.graftbridge.Bridge.integralDivide _
    val base = idiv(total.cast("long"), lit(n.toLong))
    val rem = total.cast("long") % lit(n.toLong)
    val bigSpan = rem * (base + lit(1L))
    when(rank <= bigSpan, idiv(rank - 1, base + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(rank - bigSpan - 1, base) + lit(1L))
  }
}
