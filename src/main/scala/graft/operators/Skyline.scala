package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The skyline operator (Börzsönyi/Kossmann/Stocker, "The Skyline
  * Operator", ICDE 2001): rows not dominated in a maximize-both
  * 2-D criteria space — q dominates p when q.x ≥ p.x, q.y ≥ p.y and at
  * least one is strict. The multi-criteria "best trade-offs" filter
  * (price vs recency, quality vs length) a NOT EXISTS self-join states
  * in O(n²); this computes it in aggregate + window form:
  *
  *  - per distinct x keep only max(y) — among equal x, anything below
  *    the max is dominated (x ties, y strict);
  *  - over the per-x maxima sorted by x descending, a row survives iff
  *    its y strictly exceeds the running max of all STRICTLY larger x
  *    (equality loses: the larger-x point dominates with x strict);
  *  - join survivors back: every original row at a surviving (x, max-y)
  *    coordinate is in the skyline (exact coordinate duplicates don't
  *    dominate each other, so all of them survive).
  *
  * Criteria must be integer-valued (cast dates to days, money to
  * cents): the ROWS-frame running max needs "strictly larger x" =
  * "previous row in x-desc order", which value-ties would break — so
  * x ties are collapsed by the aggregate FIRST, making the frame
  * correct by construction.
  *
  * Scale shape: one groupBy(x) aggregate (map-side combined), one
  * unpartitioned ordered window over the |distinct x| maxima table —
  * the irreducible sequential scan of sort-first skyline, but over the
  * aggregated maxima (≪ corpus), not the rows — and one broadcast join
  * back (the frontier is skyline-sized). No self-join, no n².
  */
object Skyline {

  /** 2-D maximize-maximize skyline. Returns the input rows (all
    * columns) that lie on the Pareto frontier of (xCol, yCol). */
  def skyline2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol).as("_sky_x"))
      .agg(max(col(yCol)).as("_sky_my"))
    val wRun = Window.orderBy(col("_sky_x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("_sky_run", max(col("_sky_my")).over(wRun))
      .filter(col("_sky_run").isNull || col("_sky_my") > col("_sky_run"))
      .select(col("_sky_x"), col("_sky_my"))
    df.join(
        broadcast(frontier),
        df(xCol) === frontier("_sky_x") && df(yCol) === frontier("_sky_my"))
      .drop("_sky_x", "_sky_my")
  }
}
