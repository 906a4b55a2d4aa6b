package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ/dbt-test/expectations
  * pattern): each check reduces to a violation COUNT over one scan or
  * one keyed aggregate, so a full constraint suite on 100 TB costs a
  * handful of aggregates — never a row-by-row validator. The report is
  * (check_name, n_violations, pass), the shape a pipeline gate consumes.
  */
object Quality {

  /** A row-level check: `violation` is true on rows that FAIL it. */
  final case class RowCheck(name: String, violation: Column)

  /** All row-level checks in ONE scan: each check is a conditional
    * count-aggregate, so adding a check adds a column, not a pass. The
    * single aggregate row is unpivoted to per-check rows with one
    * `stack()` projection — a structural guarantee, not one that
    * depends on the optimizer reusing an exchange across union
    * branches. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val agg = df.agg(
      sum(when(checks.head.violation, 1L).otherwise(0L)).as("c0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"c${i + 1}")
      }: _*)
    val pairs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.name), coalesce(col(s"c$i"), lit(0L)))
    }
    agg.select(stack((lit(checks.size) +: pairs): _*)
      .as(Seq("check_name", "n_violations")))
  }

  /** Uniqueness: violations = surplus rows beyond one per key
    * (`Σ max(cnt - 1, 0)`). One keyed aggregate. */
  def uniqueCheck(df: DataFrame, keyCols: Seq[String], name: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
      .agg(coalesce(sum(col("_cnt") - 1), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential integrity: child keys with no parent (left-anti count).
    * NULL child keys are orphans of the null check, not this one. */
  def referentialCheck(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      name: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Assemble a full report: (check_name, n_violations, pass), one row per
    * check, union of the per-family aggregates. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .select(col("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
}
