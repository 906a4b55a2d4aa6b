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
      payloadPrefix: String): DataFrame =
    apply(left, right, Seq(key), leftTs, rightTs, payload, payloadPrefix)

  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame =
    apply(left, right, Seq(key), leftTs, rightTs, payload, "asof_")

  /** Multi-key variant: the as-of match requires equality on every key
    * column (any equatable types), latest right ts <= left ts. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      payloadPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val leftCols = left.columns.toSeq
    val payStruct = struct(payload.map(col): _*)
    val payType = right.select(payStruct.as("p")).schema("p").dataType
    val keyAliases = keys.zipWithIndex.map { case (k, i) => s"_k$i" }

    val l = left.select(
      keys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTs).as("_t"),
        lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lrow"),
        lit(null).cast(payType).as("_rpay")): _*)
    // NULL keys/timestamps never match (SQL join semantics, same contract
    // as AsOfJoinExec and DuckDB ASOF): right rows with a NULL key/ts are
    // dropped up front — otherwise Window.partitionBy groups NULL keys
    // together and a NULL ts sorts first, seeding last(_rpay) with a row
    // that should never be attachable.
    val r = right
      .filter(
        keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .select(
        keys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
          col(rightTs).as("_t"),
          lit(0).as("_side"),
          lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
          payStruct.as("_rpay")): _*)

    // Right rows sort before left rows at equal timestamps (<= semantics).
    val w = Window
      .partitionBy(keyAliases.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Left rows with NULL key/ts bypass payload pickup explicitly (they
    // also happen to sort before any valid right row, but the contract
    // should not hinge on NULLS FIRST ordering).
    val leftInvalid =
      keyAliases.map(col(_).isNull).reduce(_ || _) || col("_t").isNull
    val joined = l
      .unionByName(r)
      .withColumn(
        "_pay",
        when(leftInvalid, lit(null).cast(payType))
          .otherwise(last(col("_rpay"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)

    val outCols: Seq[Column] =
      leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        payload.map(p => col(s"_pay.$p").as(s"$payloadPrefix$p"))
    joined.select(outCols: _*)
  }
}
