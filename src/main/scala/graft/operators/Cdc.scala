package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: merge a change batch (upserts +
  * deletes keyed on id) into a dimension snapshot as SCD type-2 history
  * (Kimball's slowly-changing-dimension pattern): updated/deleted rows
  * are CLOSED (`valid_to` set, no longer current) rather than
  * overwritten, and upserts open a new row at the batch version — so
  * every historical state stays queryable "as of" any version.
  *
  * This is the MERGE INTO (WHEN MATCHED / NOT MATCHED) action expressed
  * as plain DataFrame composition: one full-outer join of snapshot ×
  * changes on the id, then per-branch row emission. One shuffle on the
  * id key; output is snapshot + changed-row history, never quadratic.
  */
object Cdc {

  /** Apply `changes` (columns: idCol, `op` ∈ {upsert, delete}, valueCols)
    * to `snapshot` (columns: idCol, valueCols; all rows version
    * `fromVersion`, open). Emits the full SCD2 table: (idCol, version,
    * valueCols…, valid_from, valid_to NULL-if-open, is_current). */
  def scd2Apply(
      snapshot: DataFrame,
      changes: DataFrame,
      idCol: String,
      valueCols: Seq[String],
      fromVersion: Long = 1L,
      newVersion: Long = 2L): DataFrame = {
    require(newVersion > fromVersion, "newVersion must exceed fromVersion")
    val s = snapshot.select(
      col(idCol),
      struct(valueCols.map(col): _*).as("_sv"))
    val c = changes.select(
      col(idCol),
      col("op"),
      struct(valueCols.map(col): _*).as("_cv"))
    val j = s.join(c, Seq(idCol), "full_outer")

    // surviving version-1 rows: untouched stay open; changed/deleted close
    val v1 = j.filter(col("_sv").isNotNull)
      .select(
        col(idCol),
        lit(fromVersion).as("version"),
        col("_sv").as("_v"),
        lit(fromVersion).as("valid_from"),
        when(col("op").isNotNull, lit(newVersion)).otherwise(lit(null).cast("long"))
          .as("valid_to"),
        col("op").isNull.as("is_current"))
    // new version rows: every upsert (update of an existing id or insert)
    val v2 = j.filter(col("op") === "upsert")
      .select(
        col(idCol),
        lit(newVersion).as("version"),
        col("_cv").as("_v"),
        lit(newVersion).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    v1.unionByName(v2)
      .select(
        Seq(col(idCol), col("version")) ++
          valueCols.map(vc => col(s"_v.$vc").as(vc)) ++
          Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Time travel over an SCD2 history: the value snapshot visible "as
    * of" `version` — rows whose validity interval contains it. Applied
    * at `fromVersion` this reconstructs the pre-change snapshot exactly
    * (the q132 oracle is that equality). */
  def snapshotAsOf(history: DataFrame, version: Long): DataFrame =
    history
      .filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("version", "valid_from", "valid_to", "is_current")

  /** Incremental additive-aggregate maintenance: fold a delta batch's
    * partial aggregates into a stored materialized view whose metrics are
    * all SUM-decomposable (counts, micro-unit sums). The base table is
    * never rescanned — the delta is aggregated and merged with the
    * MV-sized table in one keyed shuffle, which is the entire point of
    * maintaining the MV at 100 TB. Both inputs must carry exactly
    * (keys ++ addCols); result = recompute over base ∪ delta, exactly,
    * because integer addition is associative/commutative. */
  def mergeAggDelta(
      mv: DataFrame,
      deltaAgg: DataFrame,
      keys: Seq[String],
      addCols: Seq[String]): DataFrame = {
    val cols = keys ++ addCols
    mv.select(cols.map(col): _*)
      .unionByName(deltaAgg.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(addCols.head)).as(addCols.head),
        addCols.tail.map(a => sum(col(a)).as(a)): _*)
  }
}
