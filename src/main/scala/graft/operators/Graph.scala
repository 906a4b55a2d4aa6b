package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames.
  *
  * Complements [[Dedup.resolveDuplicateGroups]]/[[resolveDuplicateGroupsStar]]
  * (connected components): where CC answers "which nodes form one group",
  * PageRank ranks nodes WITHIN the graph — e.g. scoring documents by
  * link/citation structure to pick canonical survivors or weight training
  * data (the original use: Page/Brin/Motwani/Winograd, "The PageRank
  * citation ranking", 1999).
  */
object Graph {

  /** Fixed-iteration PageRank with deterministic integer arithmetic.
    *
    * Ranks are parts-per-million longs; one step is
    * `p'(v) = floor((1-d)*1e6) + (d_num * Σ_{u→v} (p(u) div deg(u))) div d_den`
    * with damping d = d_num/d_den. Every operation is 64-bit integer
    * division/addition, so the result is bit-identical in every engine —
    * which is what makes an ITERATIVE graph computation oracle-checkable
    * at all (float PageRank diverges across engines by summation order).
    * A fixed iteration count rather than an epsilon keeps the oracle a
    * straight-line unrolled query.
    *
    * `edges` must have (src, dst) columns; ranks flow src → dst. Nodes
    * are every id appearing on either side; dangling nodes (no out-edges)
    * keep receiving the teleport term but contribute nothing — the
    * standard simplification when ranking within dedup/link graphs.
    *
    * Scale shape per iteration: one join of the rank table against the
    * (static, cached) out-degree-annotated edge list keyed on src, one
    * sum-aggregate keyed on dst — the canonical two-shuffle PageRank
    * round. Lineage is truncated per round (`localCheckpoint`), the edge
    * list is computed once; no driver-side data beyond the loop counter.
    *
    * Durability: `localCheckpoint` blocks are executor-local and
    * unreplicated — fine single-node, but on a large cluster losing one
    * executor mid-iteration kills the query unrecoverably (lineage is
    * truncated by design). `checkpointEvery = k > 0` swaps in RELIABLE
    * `checkpoint()` for the static edge structures and for every k-th
    * round's ranks (intermediate rounds keep the cheap local variant),
    * bounding replay after an executor loss to < k rounds re-derived
    * from durable storage. The caller must have set
    * `sparkContext.setCheckpointDir` to a fault-tolerant path (HDFS/S3)
    * first. Default 0 = all-local, the right choice on local[N] where
    * executor loss means JVM loss anyway. Both checkpoint flavors
    * preserve physical partitioning (`LogicalRDD` carries it), so the
    * exchange-free join layout below survives the swap — spec-pinned
    * bit-identical ranks either way.
    *
    * `personalizeTo = Some(seeds)` (a one-column `node` frame) runs the
    * personalized variant: teleport mass lands only on the seed set, so
    * ranks measure proximity/endorsement relative to the seeds (the
    * recommendation form). Same plan, same integer arithmetic — the
    * seed flag rides the node list.
    */
  def pagerank(
      edges: DataFrame,
      iterations: Int = 3,
      dampingNum: Long = 850,
      dampingDen: Long = 1000,
      assumeDistinctEdges: Boolean = false,
      checkpointEvery: Int = 0,
      personalizeTo: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1 && dampingNum >= 0 && dampingNum <= dampingDen)
    require(checkpointEvery >= 0, "checkpointEvery: 0 = off, k > 0 = reliable every k rounds")
    // static structures: durable once if the knob is on (they are read
    // every round — losing them loses ALL rounds, so they always merit
    // the reliable write when one is available)
    def durable(df: DataFrame): DataFrame =
      if (checkpointEvery > 0) df.checkpoint() else df.localCheckpoint()
    // a duplicated edge would double-count its contribution every round;
    // producers that already emit distinct pairs (coOccurrenceEdges) skip
    // the defensive dedup — it is a full shuffle of the edge list.
    // Materialize the edge list ONCE before fanning out: deg, the
    // deg-annotated join, and the node set all consume it, and an
    // expensive upstream (a pair-generating self-join) would otherwise
    // re-execute for each.
    val e0 = edges.select(col("src"), col("dst"))
    val e = durable(if (assumeDistinctEdges) e0 else e0.distinct())
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // localCheckpoint preserves output partitioning, so laying the edge
    // list out hashed-by-src ONCE makes every iteration's contribution
    // join exchange-free on this side; ranks likewise stay hashed by
    // node across iterations. Per round only the groupBy(dst) shuffles —
    // one exchange per iteration instead of three, the difference
    // between O(iters) and O(3·iters) network passes on a 100 TB edge
    // list.
    lazy val withDegL = durable(e.join(deg, "src").repartition(col("src")))
    // personalized variant (teleport mass lands ONLY on the seed set —
    // "rank relative to these nodes", the recommendation/endorsement
    // form): the node list carries a 0/1 seed flag that gates both the
    // initial mass and the per-round teleport term. The default is
    // every node seeded (is_seed = 1), which reduces to standard
    // PageRank term-for-term. Ranks are unnormalized ppm (each seed
    // gets the full teleport constant) — proportional to the
    // probability form, and exactly integer-reproducible.
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    lazy val nodesL = durable((personalizeTo match {
      case Some(sd) =>
        nodes0.join(
            sd.select(col("node")).distinct().withColumn("is_seed", lit(1L)),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      case None => nodes0.withColumn("is_seed", lit(1L))
    }).repartition(col("node")))
    // the two static structures both read the checkpointed edge list and
    // are mutually independent — materialize them overlapped (guide §2.6)
    val Seq(withDeg, nodes) =
      graft.core.Par.run[DataFrame](Seq(() => withDegL, () => nodesL))
    val teleport = (1000000L * (dampingDen - dampingNum)) / dampingDen
    var ranks = nodes.select(
      col("node"), (col("is_seed") * lit(1000000L)).as("p"))
    // the last eagerly-truncated generation still referenced by `ranks` —
    // its blocks may only be dropped once a NEWER truncation (which no
    // longer reads them) has materialized
    var lastTrunc: DataFrame = null
    for (iter <- 1 to iterations) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("p div deg")).as("in_sum")) // integer division, stays long
      val next = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(
          col("node"),
          // `div`, not `/`: Column./ on longs is double division in Spark
          expr(s"($teleport * is_seed) + ($dampingNum * coalesce(in_sum, CAST(0 AS BIGINT))) div $dampingDen")
            .as("p"))
      // Truncation policy (guide §5): `ranks` is referenced exactly ONCE
      // per round, so the un-truncated logical plan grows LINEARLY — a
      // per-round eager localCheckpoint bought nothing but a blocking job
      // and block-manager churn per round (the q117 residual). The local
      // flavor now truncates every 3rd round only (and never on the last
      // — the caller's action materializes it), so a 3-iteration PageRank
      // is ONE job; the co-partitioned exchange-free join layout is
      // static within a plan, checkpointed or not. The reliable flavor
      // keeps its contract: durable restart point every k-th round.
      ranks =
        if (checkpointEvery > 0 && iter % checkpointEvery == 0) next.checkpoint()
        else if (checkpointEvery > 0) next.localCheckpoint()
        else if (iter % 3 == 0 && iter < iterations) next.localCheckpoint()
        else next
      // the superseded generation's blocks are dead the moment a NEWER
      // truncation materializes (both flavors are eager) — drop them
      // now, not at session teardown, so k rounds never pin k
      // generations of rank RDDs in executor memory (and, reliable
      // flavor, k generations of checkpoint dirs on durable storage).
      // Targeted through the frame's own LogicalRDD; a context-global
      // sweep would corrupt concurrent queries. Only when the new ranks
      // IS truncated: an un-truncated ranks still reads lastTrunc.
      if (ranks ne next) {
        if (lastTrunc != null)
          org.apache.spark.sql.graftbridge.Bridge.dropCheckpoint(lastTrunc)
        lastTrunc = ranks
      }
    }
    ranks.select(col("node"), col("p").as("rank_ppm"))
  }

  /** Co-occurrence edge list from a grouped item table: every ordered
    * pair of distinct items sharing a group key (e.g. parts bought in the
    * same order → the co-purchase graph). Pair space is quadratic in
    * GROUP size only — groups are bounded (an order has a handful of
    * items), never corpus-quadratic.
    *
    * Shape: one groupBy collecting each group's item set, then a double
    * explode — measured ~2× faster than the equivalent keyed self-join
    * (one shuffle instead of two + no hash probe). The per-group set
    * lives in executor memory, which the bounded-group contract already
    * implies; a group too big to collect is a group whose pair list is
    * too big to emit. */
  def coOccurrenceEdges(
      df: DataFrame,
      groupCol: String,
      itemCol: String): DataFrame = {
    val groups = df.groupBy(col(groupCol).as("g"))
      .agg(collect_set(col(itemCol)).as("items"))
    groups.select(explode(col("items")).as("src"), col("items"))
      .select(col("src"), explode(col("items")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Per-node triangle counts via degree orientation (the MapReduce
    * triangle algorithm of Suri & Vassilvitskii, WWW'11): orient every
    * undirected edge from its lower endpoint to its higher endpoint
    * under the total order (degree, id), enumerate wedges at each apex,
    * and close them against the oriented edge set. Orientation bounds
    * every out-degree by O(√m), so the wedge table — the only
    * intermediate — is O(m^1.5) worst case and far smaller on real
    * degree-skewed graphs, where the naive apex-side wedge count is
    * quadratic in the hub degree. All three steps are keyed
    * joins/aggregations (apex; then the (x, y) closing pair) — no
    * nested loop anywhere, so the plan survives a 100× edge count by
    * adding shuffle volume, not asymptotics.
    *
    * `edges` must be distinct (src, dst) pairs, symmetric (both
    * directions present, as [[coOccurrenceEdges]] emits) or already
    * canonical with src < dst. Each triangle is counted once per
    * member node. Returns the `topK` (node, n_triangles), count desc
    * then node asc — deterministic. */
  def triangleCounts(edges: DataFrame, topK: Int): DataFrame = {
    val und = edges.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val e = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uLower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e.select(
      when(uLower, col("u")).otherwise(col("v")).as("a"),
      when(uLower, col("v")).otherwise(col("u")).as("b"),
      when(uLower, col("dv")).otherwise(col("du")).as("degb"))
    val e1 = oriented.select(col("a"), col("b").as("x"), col("degb").as("dx"))
    val e2 = oriented.select(col("a"), col("b").as("y"), col("degb").as("dy"))
    val wedge = e1.join(e2, "a")
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tri = wedge
      .join(oriented.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      .select(col("a"), col("x"), col("y"))
    tri.select(explode(array(col("a"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(topK)
  }

  /** Deterministic fixed-length random walks — the DeepWalk/node2vec
    * corpus-generation step (Perozzi et al., KDD'14) that turns a graph
    * into training sequences for embedding models. One walk per seed
    * node; at step i the walk at `walk_id` moves to neighbor number
    * `hash64("walk:<id>:step:<i>") mod degree` in the dst-sorted
    * adjacency — md5-derived, so the "randomness" is reproducible in
    * any engine (and oracle-checkable) while mixing well across walks
    * and steps. Walks at a node with no out-edges stop (inner join).
    *
    * Scale shape: the adjacency index is one per-src window (bounded by
    * max degree per task), built once; each step is two keyed joins of
    * the frontier (|seeds| rows) against degree and adjacency — walk
    * length L costs L frontier-sized joins, never a corpus-sized
    * shuffle. Long walks accumulate an L-deep frontier lineage and an
    * L-wide union: `checkpointEvery = k > 0` truncates both every k
    * steps (the accumulated output first — capturing all prior steps —
    * then the live frontier, superseded blocks dropped in-loop), using
    * the same reliable-vs-local flavor switch as [[labelPropagation]];
    * spec-pinned bit-identical to the knob-off plan. Returns
    * (walk_id, step, node) for steps 0..walkLength. */
  /** k-core peeling (fixed rounds): repeatedly drop nodes with degree
    * < k and the edges touching them — the standard "keep the dense
    * core" filter for web/link graphs (spam and long-tail fringe live
    * outside the core; Seidman 1983). `edges` must be symmetric
    * distinct pairs ([[coOccurrenceEdges]] shape), so degree = out-edge
    * count and the peel is one groupBy + two semi-join restrictions per
    * round — all keyed on node id, never pairwise. A FIXED round count
    * keeps the result deterministic and oracle-checkable (each round is
    * one unrollable aggregate); [[kcore]] is the fixpoint production
    * form, spec-pinned equal on converged inputs. Lineage is truncated
    * per round (`localCheckpoint`) so the self-referencing plan stays
    * linear. Returns the surviving (node, deg) after `rounds` rounds. */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
    var prevCheckpointed: DataFrame = null
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src"))
      val next = e.join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      if (prevCheckpointed != null)
        org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(prevCheckpointed)
      prevCheckpointed = next
      e = next
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  /** Fixpoint k-core: [[kcorePeel]]'s production form — peel until a
    * round removes nothing. A node in the edge list always has ≥ 1
    * edge, so "no node removed" ⟺ "edge count unchanged", and the
    * count rides each round's own materialization via `Observation` —
    * no extra comparison job per round (the CC resolver's convergence
    * pattern). Not oracle-unrollable (round count is data-dependent),
    * which is why the catalog entry pins the fixed-round form; the spec
    * pins this one equal to a deep fixed-round peel. */
  def kcore(edges: DataFrame, k: Int, maxIterations: Int = 50): DataFrame = {
    var e = edges.select(col("src"), col("dst")).localCheckpoint()
    var prevEdges = e.count()
    var converged = prevEdges == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src"))
      val obs = new org.apache.spark.sql.Observation(
        s"kcore_${k}_round_${iter}_${java.util.UUID.randomUUID().toString.take(8)}")
      val next = e.join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select(col("src"), col("dst"))
        .observe(obs, count(lit(1)).as("n_edges"))
        .localCheckpoint()
      val n = obs.get("n_edges").asInstanceOf[Long]
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(e)
      e = next
      converged = n == prevEdges
      prevEdges = n
      iter += 1
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  def randomWalks(
      edges: DataFrame,
      seeds: DataFrame,
      walkLength: Int,
      salt: String = "walk",
      checkpointEvery: Int = 0): DataFrame = {
    require(checkpointEvery >= 0,
      "checkpointEvery: 0 = off, k > 0 = truncate lineage every k steps")
    import org.apache.spark.sql.expressions.Window
    val adj = edges.select(col("src"), col("dst"))
    val indexed = adj.withColumn("nidx",
      row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))))
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var cur = seeds.select(
      col("node").cast("long").as("walk_id"),
      lit(0L).as("step"),
      col("node").cast("long").as("node"))
    var out = cur
    var lastOutCp: DataFrame = null
    for (i <- 1 to walkLength) {
      val pick = graft.functions.Functions.hash64(
        concat(lit(s"$salt:"), col("walk_id").cast("string"), lit(s":step:$i")))
      cur = cur
        .join(deg.withColumnRenamed("src", "node"), "node")
        .withColumn("nidx", pick % col("deg") + 1)
        .join(indexed.withColumnRenamed("src", "node"), Seq("node", "nidx"))
        .select(col("walk_id"), lit(i.toLong).as("step"), col("dst").as("node"))
      out = out.unionAll(cur)
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < walkLength) {
        // one checkpoint, not two: out's eager materialization already
        // contains the step-i frontier (cur is its tail), so the live
        // frontier is re-derived as a filter OVER the materialized
        // blocks — checkpointing cur separately would recompute the
        // same frontier join a second time from pre-checkpoint lineage
        val outCp = checkpointDf(out)
        if (lastOutCp != null)
          org.apache.spark.sql.graftbridge.Bridge.dropCheckpoint(lastOutCp)
        lastOutCp = outCp
        out = outCp
        cur = outCp.filter(col("step") === i.toLong)
          .select(col("walk_id"), col("step"), col("node"))
      }
    }
    out
  }

  /** Synchronous label-propagation community detection (Raghavan/Albert/
    * Kumara, Phys. Rev. E 2007), determinized: every node starts labeled
    * with its own id; each round it adopts the label MOST FREQUENT among
    * its neighbors, ties broken toward the smallest label. A fixed round
    * count (not convergence) keeps the computation a straight-line plan
    * an oracle can unroll; the mode update (vs min-label, which is just
    * the naive connected-components step [[Dedup.resolveDuplicateGroups]]
    * already owns) is what makes this COMMUNITY detection — dense
    * regions lock onto one label while sparse bridges don't flood.
    *
    * `edges` must be distinct symmetric (src, dst) pairs. The argmax is
    * a min-struct over (-count, label) — one expression, no window, so
    * each round is exactly two shuffles: the rank-table join keyed on
    * src and the (node, label) count keyed on dst. All-integer, so the
    * result is engine-bit-identical.
    *
    * Lineage: `checkpointEvery = 0` (default) keeps the plan purely
    * declarative — the oracle-unrollable form, right for the shallow
    * fixed-round catalog entry. Deep propagation on a big graph needs
    * `checkpointEvery = k > 0`: every k-th round's label table is
    * checkpointed (lineage truncated, superseded blocks dropped
    * in-loop as [[pagerank]] does) — RELIABLE `checkpoint()` when the
    * SparkContext has a checkpoint dir configured (pagerank's
    * executor-loss durability semantics on a real cluster), the
    * executor-local `localCheckpoint()` otherwise (the right choice on
    * local[N], where executor loss means JVM loss anyway). Both
    * flavors preserve results bit-for-bit — spec-pinned. */
  def labelPropagation(
      edges: DataFrame,
      rounds: Int,
      checkpointEvery: Int = 0): DataFrame = {
    require(checkpointEvery >= 0,
      "checkpointEvery: 0 = off, k > 0 = truncate lineage every k rounds")
    val e = edges.select(col("src"), col("dst"))
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var lastCp: DataFrame = null
    for (r <- 1 to rounds) {
      labels = e.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("negc"), col("label").as("l"))).as("t"))
        .select(col("node"), col("t.l").as("label"))
      // r < rounds: a final-round checkpoint would pay an extra eager
      // materialization (and, reliable-flavor, leave never-superseded
      // files) that truncates lineage nothing will ever extend —
      // randomWalks' i < walkLength guard, same rationale
      if (checkpointEvery > 0 && r % checkpointEvery == 0 && r < rounds) {
        val cp = checkpointDf(labels)
        if (lastCp != null)
          org.apache.spark.sql.graftbridge.Bridge.dropCheckpoint(lastCp)
        lastCp = cp
        labels = cp
      }
    }
    labels
  }

  /** Synchronous fixed-round Louvain phase-1 (Blondel/Guillaume/
    * Lambiotte/Lefebvre, "Fast unfolding of communities in large
    * networks", J. Stat. Mech. 2008): every node starts in its own
    * community; each round it moves to the candidate community C
    * (neighbor communities ∪ its current one) maximizing the modularity
    * gain. The classic gain of moving i into C is
    * `ΔQ ∝ w_iC − deg_i·Σtot(C∖{i})/(2m)`; multiplying through by
    * `2m` gives the all-integer objective
    * `f(C) = 2m·w_iC − deg_i·Σtot(C∖{i})`
    * which preserves the argmax exactly, so the per-node choice — ties
    * toward the smallest community label — is engine-bit-identical and
    * the oracle can unroll each round relationally. This is what
    * completes the graph family past label propagation (q255): LPA's
    * plain neighbor-majority vote has known degeneracies (it floods
    * across sparse bridges and can collapse everything to one label);
    * the degree-penalty term is exactly what stops hub-adjacent flood.
    *
    * Synchronous update (all nodes move simultaneously per round) is
    * the standard distributed formulation; a FIXED round count — not
    * convergence — keeps the computation a straight-line plan (the
    * q255 discipline).
    *
    * `edges` must be distinct symmetric (src, dst) pairs with no
    * self-loops ([[coOccurrenceEdges]] shape); edge weights are 1, so
    * `deg` is the out-row count and `2m = Σ deg`. Overflow headroom:
    * `2m·w_iC` needs `2m · max_deg < 2^63` — fine to ~10^12 directed
    * edges with 10^6-degree hubs; past that, scale weights down first.
    *
    * Scale shape per round: one (label, deg) aggregate for Σtot (≤
    * #communities rows), one (dst, label) count keyed on the corpus
    * edges, a keyed join against the broadcast-or-shuffled Σtot table,
    * and one per-node min-struct argmax — three keyed shuffles, no
    * pairwise work, same cost class as a PageRank round. Deep runs take
    * the same `checkpointEvery` lineage knob as [[labelPropagation]].
    * Returns (node, community). */
  def louvainRounds(
      edges: DataFrame,
      rounds: Int,
      checkpointEvery: Int = 0,
      w2mKnown: Option[Long] = None): DataFrame =
    louvainWeightedImpl(
      edges.select(col("src"), col("dst"), lit(1L).as("w")),
      rounds, checkpointEvery, w2mKnown)

  /** Weighted [[louvainRounds]] — the form phase-2 contraction needs:
    * `edges` is (src, dst, w) symmetric rows with positive integer
    * weights, and MAY carry (node, node, w) self-loop rows as
    * [[contractCommunities]] emits them (a super-node's internal
    * weight). Self-loops count toward strength and Σtot (they are the
    * community's own mass) but never toward the w_iC move scores —
    * exactly the standard Louvain treatment, so running this on a
    * contracted graph continues the SAME modularity objective the
    * level-1 rounds optimized. */
  def louvainRoundsWeighted(
      edges: DataFrame,
      rounds: Int,
      checkpointEvery: Int = 0,
      w2mKnown: Option[Long] = None): DataFrame =
    louvainWeightedImpl(
      edges.select(col("src"), col("dst"), col("w")),
      rounds, checkpointEvery, w2mKnown)

  /** Leiden refinement phase (Traag, Waltman & van Eck 2019 §A2, as
    * deterministic fixed-round local moves): re-partition each
    * [[louvainRounds]] community FROM SINGLETONS, with moves proposed
    * only across intra-community edges while degrees, Σtot and 2m — the
    * modularity bookkeeping — stay those of the FULL graph. A community
    * that is internally well-connected re-merges; a badly-connected one
    * (two dense parts joined by a thin bridge — the published defect
    * Louvain's greedy phase 1 creates and contraction then freezes)
    * cannot re-merge across the bridge, because the singleton restart
    * only accumulates sub-communities reachable through positive-gain
    * intra-edges. Contracting on the REFINED partition
    * ([[contractCommunities]] takes it as-is) is exactly what prevents
    * Leiden's guarantee-breaking super-nodes.
    *
    * Deterministic variant: same integer gain
    * `2m·w_iC − deg_i·Σtot(C∖{i})` and smallest-label tie-breaks as
    * [[louvainRounds]], iterated `rounds` times — every round is the
    * same unrollable relational statement, restricted to the
    * intra-community edge subset.
    *
    * `edges` is (src, dst[, w]) symmetric; `labels` is (node, community)
    * covering every node. Returns (node, community) — the REFINED
    * partition, which never crosses a phase-1 boundary.
    *
    * Scale shape: one two-sided keyed join builds the intra-edge subset
    * once; each round then costs exactly a [[louvainRounds]] round on
    * that subset (keyed joins + community-sized aggregates), and the
    * subset only shrinks relative to the input graph. */
  def leidenRefine(
      edges: DataFrame,
      labels: DataFrame,
      rounds: Int,
      checkpointEvery: Int = 0,
      w2mKnown: Option[Long] = None): DataFrame = {
    val w = if (edges.columns.contains("w")) col("w") else lit(1L)
    val e = edges.select(col("src"), col("dst"), w.as("w"))
    val intra = e
      .join(labels.select(col("node").as("src"), col("community").as("csrc")), "src")
      .join(labels.select(col("node").as("dst"), col("community").as("cdst")), "dst")
      .filter(col("csrc") === col("cdst"))
      .select(col("src"), col("dst"), col("w"))
    louvainWeightedImpl(e, rounds, checkpointEvery, w2mKnown,
      moveEdges = Some(intra))
  }

  private def louvainWeightedImpl(
      e: DataFrame,
      rounds: Int,
      checkpointEvery: Int,
      w2mKnown: Option[Long],
      moveEdges: Option[DataFrame] = None): DataFrame = {
    require(checkpointEvery >= 0,
      "checkpointEvery: 0 = off, k > 0 = truncate lineage every k rounds")
    // strength includes self-loop weight (a contracted community's
    // internal mass); 2m = total weight. A caller that already knows
    // the total (edges.count() for weight-1 graphs — q280 shares it
    // with modularityByCommunity) passes it to skip the job.
    val deg = e.groupBy(col("src").as("node")).agg(sum(col("w")).as("deg"))
    val w2m = w2mKnown.getOrElse(deg.agg(sum(col("deg"))).head().getLong(0))
    var labels = deg.select(col("node"), col("node").as("label"))
    var lastCp: DataFrame = null
    // move candidates may be a SUBSET of the graph (Leiden refinement
    // restricts proposals to intra-community edges) while deg/Σtot/2m —
    // the modularity bookkeeping — always come from the full graph
    val me = moveEdges.getOrElse(e)
    for (r <- 1 to rounds) {
      val sumtot = labels.join(deg, "node")
        .groupBy(col("label")).agg(sum(col("deg")).as("stot"))
      // self-loops never generate move candidates: w_iC sums edges to
      // OTHER nodes in C (for C = cur, the node's own self-mass is
      // already counted by deg/Σtot, not by w_i,cur)
      val wic = me.filter(col("src") =!= col("dst"))
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum(col("w")).as("wic"))
      val cur = labels.select(col("node"), col("label").as("cur"))
      // candidates: neighbor communities plus the node's own (with
      // w_iC = 0 when no neighbor shares it — staying must always be
      // on the menu or an isolated-in-community node has no row)
      val cand = wic.join(cur, "node")
        .unionByName(cur.select(col("node"), col("cur").as("label"),
          lit(0L).as("wic"), col("cur")))
        .groupBy(col("node"), col("label"), col("cur"))
        .agg(max(col("wic")).as("wic"))
      val scored = cand.join(sumtot, "label").join(deg, "node")
        // Σtot(C∖{i}): subtract own degree only when already in C
        .withColumn("f",
          lit(w2m) * col("wic") - col("deg") *
            (col("stot") -
              when(col("label") === col("cur"), col("deg")).otherwise(lit(0L))))
      labels = scored.groupBy(col("node"))
        .agg(min(struct((-col("f")).as("negf"), col("label").as("l"))).as("t"))
        .select(col("node"), col("t.l").as("label"))
      if (checkpointEvery > 0 && r % checkpointEvery == 0 && r < rounds) {
        val cp = checkpointDf(labels)
        if (lastCp != null)
          org.apache.spark.sql.graftbridge.Bridge.dropCheckpoint(lastCp)
        lastCp = cp
        labels = cp
      }
    }
    labels.select(col("node"), col("label").as("community"))
  }

  /** Louvain phase-2 graph contraction (Blondel et al. 2008 §2): each
    * community becomes one super-node; inter-community weights sum into
    * one (cA, cB, w) row per direction and intra-community weight
    * becomes the (c, c, w) self-loop — so total weight 2m and every
    * super-node strength are preserved EXACTLY (strength(c) =
    * Σ_{i∈c} strength(i)), which is what makes running
    * [[louvainRoundsWeighted]] on the contracted graph a continuation
    * of the same modularity objective. `edges` may itself be weighted
    * ((src, dst, w), e.g. an earlier contraction) or plain (src, dst);
    * `labels` is (node, community) covering every endpoint.
    *
    * Scale shape: two keyed joins against the label table + one
    * (community, community) aggregate — output is super-graph-sized,
    * and each further level shrinks it again; the whole multi-level
    * pipeline never shuffles more than the current level's edge list. */
  def contractCommunities(edges: DataFrame, labels: DataFrame): DataFrame = {
    val w = if (edges.columns.contains("w")) col("w") else lit(1L)
    edges.select(col("src"), col("dst"), w.as("w"))
      .join(labels.select(col("node").as("src"), col("community").as("cs")), "src")
      .join(labels.select(col("node").as("dst"), col("community").as("cd")), "dst")
      .groupBy(col("cs").as("src"), col("cd").as("dst"))
      .agg(sum(col("w")).as("w"))
  }

  /** Exact integer modularity per community — the quality score a
    * community detection (q255 LPA, q278 Louvain) is tuned by. Newman's
    * Q = Σ_C [w_in(C)/2m − (Σtot(C)/2m)²] multiplied through by (2m)²
    * gives the per-community BIGINT contribution
    * `contrib(C) = 2m·w_in_dir(C) − Σtot(C)²`
    * (w_in_dir = DIRECTED intra-community edge count = 2·undirected, so
    * the /2m and the doubled count cancel exactly), with
    * Q = Σ contrib / (2m)² — numerator and denominator both exact, so
    * the score is engine-bit-identical and needs no float anywhere.
    * Overflow headroom: the BINDING product is 2m·w_in_dir (w_in_dir ≤
    * Σtot ≤ 2m, so it dominates Σtot² whenever communities are smaller
    * than the graph) — exactness needs 2m·max_C Σtot(C) < 2^63, e.g.
    * 2m ≤ 10^11 with communities holding ≤ 10^7 edge-ends. Past that,
    * scale weights down first.
    *
    * Scale shape: two keyed joins of the edge list against the label
    * table (src side, dst side) + one count per community, and one
    * (label, deg) aggregate — community-sized output, no pairwise work.
    * `edges` must be distinct symmetric pairs ([[coOccurrenceEdges]]
    * shape); `labels` is (node, community)-shaped with every edge
    * endpoint labeled. Returns one row per community:
    * (community, csize, w_in_dir, stot, contrib). */
  def modularityByCommunity(
      edges: DataFrame,
      labels: DataFrame,
      w2mKnown: Option[Long] = None): DataFrame = {
    // weighted when edges carry a `w` column (the contracted-graph
    // shape, self-loops included) — weight-1 otherwise. Because
    // contraction preserves strengths and total weight exactly, the
    // modularity of a partition P on G EQUALS the modularity of the
    // singleton partition on the contracted graph G/P (spec-pinned):
    // multi-level quality is scored consistently at every level.
    val wc = if (edges.columns.contains("w")) col("w") else lit(1L)
    val e = edges.select(col("src"), col("dst"), wc.as("w"))
    val l = labels.select(col("node"), col("community"))
    val deg = e.groupBy(col("src").as("node")).agg(sum(col("w")).as("deg"))
    val w2m = w2mKnown.getOrElse(deg.agg(sum(col("deg"))).head().getLong(0))
    val byC = l.join(deg, "node")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("csize"), sum(col("deg")).as("stot"))
    val win = e
      .join(l.select(col("node").as("src"), col("community").as("cs")), "src")
      .join(l.select(col("node").as("dst"), col("community").as("cd")), "dst")
      .filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("community"))
      .agg(sum(col("w")).as("w_in_dir"))
    byC.join(win, Seq("community"), "left")
      .select(col("community"), col("csize"),
        coalesce(col("w_in_dir"), lit(0L)).as("w_in_dir"), col("stot"),
        (lit(w2m) * coalesce(col("w_in_dir"), lit(0L)) -
          col("stot") * col("stot")).as("contrib"))
  }

  /** Reliable `checkpoint()` when the context has a checkpoint dir
    * (fault-tolerant truncation on a cluster), `localCheckpoint()`
    * otherwise — the shared flavor switch for the iterative operators'
    * `checkpointEvery` knobs. Superseded state is dropped in-loop via
    * [[org.apache.spark.sql.graftbridge.Bridge.dropCheckpoint]] — both
    * the block-manager blocks and, reliable flavor, the checkpoint
    * FILES on durable storage, so deep runs hold at most one live
    * checkpoint generation per truncated frame. */
  private def checkpointDf(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
