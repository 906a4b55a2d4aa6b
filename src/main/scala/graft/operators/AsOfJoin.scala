package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTs <= leftTs`.
  *
  * Implemented by composition (SURVEY §7 preference (a)): tag both sides,
  * union, and carry the last non-null right payload forward with a window —
  * a single shuffle on the key, no per-row point lookups. At scale this is
  * one hash-partition + per-key sort (same cost class as a sort-merge
  * join); skewed keys are handled by AQE. A dedicated `SparkPlan` doing a
  * merge-zip of co-partitioned sorted sides is the (c)-level upgrade if the
  * union window ever shows up hot.
  *
  * Right side should be unique per (key, ts) — pre-aggregate if not —
  * otherwise "latest" among equal timestamps is ambiguous.
  */
object AsOfJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      payloadPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payStruct = struct(payload.map(col): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType

    val l = left.select(
      col(key).as("_k"),
      col(leftTs).as("_t"),
      lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_lrow"),
      lit(null).cast(payType).as("_rpay"))
    val r = right.select(
      col(key).as("_k"),
      col(rightTs).as("_t"),
      lit(0).as("_side"),
      lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
      payStruct.as("_rpay"))

    // Right rows sort before left rows at equal timestamps (<= semantics).
    val w = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l
      .unionByName(r)
      .withColumn("_pay", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val outCols: Seq[Column] =
      leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        payload.map(p => col(s"_pay.$p").as(s"$payloadPrefix$p"))
    joined.select(outCols: _*)
  }
}
