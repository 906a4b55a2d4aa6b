package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{broadcast => bcast}

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

  /** d-dimensional maximize-all skyline (d ≥ 2) via grid partition-and-
    * prune (the partitioned skyline of Börzsönyi et al. §5, in keyed-
    * aggregate form). [[skyline2]]'s aggregate+window trick is
    * structurally 2-D — "strictly better on the other axis" needs a
    * single running max — so d ≥ 3 (price × recency × priority) takes a
    * different shape:
    *
    *  1. distinct coordinate vectors (duplicates collapse — exact ties
    *     never dominate each other, so they stand or fall together);
    *  2. each vector lands in a grid cell (per-dim integer bucket from
    *     the observed min/max, `gridBits` bits per dim); the per-cell
    *     (componentwise min, componentwise max) summary is a keyed
    *     aggregate — at most 2^(d·gridBits) rows no matter the corpus;
    *  3. CELL prune (driver, on the bounded summary): cell b drops
    *     entirely when some pruner cell c has min(c) ≥ max(b) on all
    *     dims, strict on one — every point of c then dominates every
    *     point of b. Pruners are the ≤ `maxCornerTerms` Pareto-maximal
    *     min-corners with the largest coordinate sums — a sound subset
    *     (pruning only certifies dominance) that keeps the driver pass
    *     O(|cells|·|pruners|), not |cells|²;
    *  4. POINT prune: a point p is dominated outright when some pruner
    *     min-corner ≥ p (strict somewhere) — every point of that cell
    *     beats p. The pruner corners are inlined as one codegen'd
    *     boolean — no join. p's own cell can never satisfy it (its
    *     min ≤ p).
    *  5. exact refinement: the surviving near-frontier band self-joins
    *     (broadcast, LEFT ANTI on the dominance predicate). Dominance
    *     is transitive, so testing against survivors only is exact —
    *     every true skyline point survives the prunes and eliminates
    *     whatever it dominates.
    *
    * The only corpus-sized ops are the distinct, the cell aggregate,
    * and the pruning scan; the quadratic step runs on the pruned band
    * only. Driver state is the cell summary (≤ 2^(d·gridBits) rows —
    * `require`d ≤ 2^18) and its pairwise prune; anti-correlated data
    * where the band stays huge makes ANY exact skyline output-bound —
    * the contract is the standard one.
    *
    * Criteria must be integer-valued non-null columns (cast dates to
    * days, money to cents), all maximized (negate to minimize). Returns
    * the input rows (all columns) on the Pareto frontier. */
  def skylineN(
      df: DataFrame,
      cols: Seq[String],
      gridBits: Int = 3,
      maxCornerTerms: Int = 64): DataFrame = {
    val d = cols.size
    require(d >= 2, s"skylineN needs >= 2 criteria, got $d")
    require(gridBits >= 1 && d * gridBits <= 18,
      s"d*gridBits must be <= 18 (cell summary stays driver-sized); got $d*$gridBits")
    val coords = df.select(cols.map(c => col(c).cast("long").as(c)): _*).distinct()
    val boundExprs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val bounds = coords.agg(boundExprs.head, boundExprs.tail: _*).head()
    if (bounds.isNullAt(0)) return df.limit(0) // empty input: empty frontier
    val g = 1L << gridBits
    val (lo, w) = (0 until d).map { i =>
      val (l, h) = (bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
      (l, (h - l) / g + 1L) // (h-lo)/w <= g-1 by construction
    }.unzip
    // `div`, not `/`: Column./ on longs is double division
    val keyExpr = (0 until d).map { i =>
      expr(s"((`${cols(i)}` - ${lo(i)}L) div ${w(i)}L)") * lit(1L << (gridBits * i))
    }.reduce(_ + _)
    val cells = coords.withColumn("_sky_cell", keyExpr)
    val summaryExprs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")))
    val summary = cells.groupBy(col("_sky_cell"))
      .agg(summaryExprs.head, summaryExprs.tail: _*)
      .collect()
      .map { r =>
        (r.getLong(0),
          (0 until d).map(i => r.getLong(1 + 2 * i)).toArray,   // mn
          (0 until d).map(i => r.getLong(2 + 2 * i)).toArray)   // mx
      }
    def dominates(a: Array[Long], b: Array[Long]): Boolean = {
      var i = 0; var strict = false
      while (i < d) {
        if (a(i) < b(i)) return false
        if (a(i) > b(i)) strict = true
        i += 1
      }
      strict
    }
    // bounded pruner set: the maxCornerTerms min-corners with the
    // largest coordinate sums (the widest pruners), reduced to their
    // own Pareto-maximal subset. Any SUBSET of pruners is sound — they
    // only ever certify dominance — so both driver passes below run at
    // O(|cells|·|P|·d) instead of the naive O(|cells|²·d), which at the
    // require-sanctioned 2^18 cells would be ~10^11 comparisons of
    // driver stall; the cap also bounds the inlined codegen boolean.
    val pruners = {
      val top = summary.map(_._2).sortBy(c => -c.sum).take(maxCornerTerms)
      top.filterNot(c => top.exists(c2 => dominates(c2, c)))
    }
    val survivingCells = summary.collect {
      case (key, _, mx) if !pruners.exists(p => dominates(p, mx)) => key
    }.toSeq
    val corners = pruners
    val cornerDominated: Column =
      if (corners.isEmpty) lit(false)
      else corners.map { c =>
        (0 until d).map(i => lit(c(i)) >= col(cols(i))).reduce(_ && _) &&
          (0 until d).map(i => lit(c(i)) > col(cols(i))).reduce(_ || _)
      }.reduce(_ || _)
    val band = cells
      .filter(col("_sky_cell").isInCollection(survivingCells))
      .filter(!cornerDominated)
      .drop("_sky_cell")
    val q = band.select(cols.map(c => col(c).as(s"_q_$c")): _*)
    val domPred =
      cols.map(c => col(s"_q_$c") >= col(c)).reduce(_ && _) &&
        cols.map(c => col(s"_q_$c") > col(c)).reduce(_ || _)
    val frontier = band.join(bcast(q), domPred, "left_anti")
    df.join(
      bcast(frontier.select(cols.map(c => col(c).as(s"_f_$c")): _*)),
      cols.map(c => df(c).cast("long") === col(s"_f_$c")).reduce(_ && _))
      .drop(cols.map(c => s"_f_$c"): _*)
  }
}
