package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, LayeredAnn, Similarity}

/** STREAMING maintenance of the LAYERED (HNSW-style) graph-ANN store —
  * the composition [[IndexCdc]] left open: [[IndexCdc.start]] maintains
  * only a flat level-0 graph, so under a CDC feed a layered index's
  * UPPER layers go stale (deleted ids linger as layer nodes, upserted
  * ids with level ≥ 1 never join their layers) and the descent degrades
  * exactly when the index churns. Here the whole layer stack is one
  * co-committed store and every batch maintains every level:
  *
  *  1. DELETE: tombstoned out of the level-0 graph AND out of every
  *     layer subgraph it belongs to (level is a pure hash of the id —
  *     [[LayeredAnn.levelColumn]] — so membership needs no lookup);
  *  2. REPAIR: per LAYER first (each layer is its own small graph whose
  *     lists the deletes degraded; gated by the same queue-depth
  *     threshold, seeded from the stack's top entry — a max-level node
  *     belongs to every layer, so the entry is a member wherever it
  *     walks), then level-0, whose degraded nodes descend the
  *     just-repaired stack for their per-query seeds
  *     ([[AnnIndex.repairGraphSeeded]]);
  *  3. INSERT: each upsert DESCENDS the stack once (the HNSW insert
  *     walk): per layer one seeded beam search against the PRE-insert
  *     layer graph, whose top-m per query both seeds the next layer
  *     down and — for upserts whose level reaches this layer — supplies
  *     the top-layerK adjacency linked in by the reverse-patch re-cut
  *     (the [[AnnIndex.insertBatch]] pattern applied per layer); the
  *     level-0 fold-in is [[AnnIndex.insertBatchSeeded]] from the
  *     descent's final seeds. Serve, repair and insert thus all consume
  *     the same descent, and upper-layer structure stays live under
  *     churn instead of freezing at build time.
  *
  * A batch of upserts larger than `rebuildFraction` of the survivors
  * rebuilds level-0 AND every layer over survivors ∪ batch (the
  * [[IndexCdc.start]] guard lifted to the whole stack — membership
  * changes invalidate layer subgraphs the same way).
  *
  * The store is ONE versioned dir holding `graph` (level-0), `vecs`,
  * `levels` (id → level) and `layer_1..cap`, co-committed through the
  * sketch stores' crash-safe write-aside swap ([[DocStreams
  * .recoverStore]]/[[DocStreams.swapStore]]) — a crash replays the
  * checkpointed batch against the complete PRE-batch stack (the layers
  * must never version separately from the base graph: a descent over
  * mixed versions would seed from nodes the base no longer holds).
  * Replay is deterministic (spec-locked, the [[IndexCdc]] discipline).
  *
  * Scale shape: layer l holds ~n/4^l nodes, so the whole stack adds
  * ~n/3 edge volume; every maintenance stage is keyed semi-joins and
  * beam-sized seeded searches (per layer: |queue|- or |batch|-sized
  * query tables against a geometrically smaller graph); the driver
  * scalars per batch are the bounded counts (removed/upserts/queue
  * depths) plus the descent's two scalars (max level, top entry id). */
object LayeredCdc {

  /** Seed the layered store: level-0 NN-Descent graph, the id → level
    * map, and one per-layer subgraph for levels 1..cap, committed as
    * one swappable artifact. No-op if a committed store exists. */
  def initLayeredStore(
      spark: SparkSession,
      storeDir: String,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      k: Int,
      rounds: Int,
      layerK: Int,
      layerRounds: Int,
      initBuckets: Int): Unit = {
    val (fs, current) = DocStreams.recoverStore(spark, storeDir)
    if (!fs.exists(current)) {
      val lv = emb.select(col(idCol), col(vecCol),
        LayeredAnn.levelColumn(col(idCol), cap).as("level")).localCheckpoint()
      val next = new org.apache.hadoop.fs.Path(s"$storeDir/next_init")
      // the seed stack's parts all derive from the checkpointed lv and
      // land in distinct files — overlapped (guide §2.6)
      graft.core.Par.exec(Seq[() => Unit](
        () => Similarity.nnDescent(lv.select(col(idCol), col(vecCol)),
            idCol, vecCol, k, rounds, initBuckets)
          .write.mode("overwrite").parquet(s"$next/graph"),
        () => lv.select(col(idCol), col(vecCol))
          .write.mode("overwrite").parquet(s"$next/vecs"),
        () => lv.select(col(idCol), col("level"))
          .write.mode("overwrite").parquet(s"$next/levels")) ++
        (1 to cap).map(l => () =>
          layerBuild(spark, lv.filter(col("level") >= l)
              .select(col(idCol), col(vecCol)), idCol, vecCol,
              layerK, layerRounds, initBuckets)
            .write.mode("overwrite").parquet(s"$next/layer_$l")))
      IndexCdc.writeMarker(fs, next, -1L)
      IndexCdc.writeFootprint(fs, next, lv.count())
      DocStreams.swapStore(fs, storeDir, next, batchId = -1L)
    }
  }

  /** A layer's subgraph: NN-Descent over its members, or the typed
    * empty graph when fewer than two nodes populate it (a thin layer is
    * valid — descent keeps its seed). */
  private def layerBuild(
      spark: SparkSession,
      members: DataFrame,
      idCol: String,
      vecCol: String,
      layerK: Int,
      layerRounds: Int,
      initBuckets: Int): DataFrame =
    if (members.limit(2).count() < 2) IndexCdc.emptyGraph(spark)
    else Similarity.nnDescent(members, idCol, vecCol,
      layerK, layerRounds, initBuckets)

  /** Drain a CDC stream (`op` STRING ∈ upsert|delete, `idCol`, `vecCol`)
    * into the layered store. */
  def startLayered(
      cdc: DataFrame,
      storeDir: String,
      checkpointDir: String,
      idCol: String,
      vecCol: String,
      cap: Int,
      k: Int,
      layerK: Int,
      m: Int,
      descBeam: Int,
      descRounds: Int,
      beam: Int,
      searchRounds: Int,
      repairThreshold: Long,
      rebuildFraction: Double = 0.25,
      rebuildRounds: Int = 4,
      rebuildBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeLayeredCdcBatch(batch, batchId, storeDir, idCol, vecCol,
          cap, k, layerK, m, descBeam, descRounds, beam, searchRounds,
          repairThreshold, rebuildFraction, rebuildRounds, rebuildBuckets)
      }
      .start()

  private[graft] def mergeLayeredCdcBatch(
      batch: DataFrame,
      batchId: Long,
      storeDir: String,
      idCol: String,
      vecCol: String,
      cap: Int,
      k: Int,
      layerK: Int,
      m: Int,
      descBeam: Int,
      descRounds: Int,
      beam: Int,
      searchRounds: Int,
      repairThreshold: Long,
      rebuildFraction: Double = 0.25,
      rebuildRounds: Int = 4,
      rebuildBuckets: Int = 16): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    require(m >= 1 && descBeam >= math.max(m, layerK) && beam >= k)
    val (fs, current) = DocStreams.recoverStore(spark, storeDir)
    require(fs.exists(current),
      s"layered index store $storeDir must be initialized " +
        "(initLayeredStore) before CDC")
    // replay skip: a crash AFTER the swap but BEFORE the streaming
    // checkpoint commits re-delivers the batch — against the POST-batch
    // stack the reverse-patch re-cut is not idempotent (evicted survivor
    // edges would be lost for good), so a committed batch id short-
    // circuits (the mergeShardedCdcBatch / mergeShardedLayeredCdcBatch
    // discipline; a pre-marker store reads Long.MinValue and applies)
    if (IndexCdc.appliedBatch(fs, current) >= batchId) return
    val graph = spark.read.parquet(s"$current/graph")
    val vecs = spark.read.parquet(s"$current/vecs")
    val lvCol = LayeredAnn.levelColumn(col(idCol), cap)
    val dels = batch.filter(col("op") === "delete").select(col(idCol))
    val ups = batch.filter(col("op") === "upsert")
      .select(col(idCol), col(vecCol)).localCheckpoint()
    val removed = dels.unionByName(ups.select(col(idCol))).distinct()
    val remaining = vecs.join(removed, Seq(idCol), "left_anti").localCheckpoint()
    // three independent bounded counts — overlapped (guide §2.6)
    val Seq(nVecs, nUpserts, nRemaining) = graft.core.Par.run(Seq(
      () => vecs.count(), () => ups.count(), () => remaining.count()))
    val nRemoved = nVecs - nRemaining
    // surviving member sets per layer (level is the pure id hash)
    val remLv = remaining.withColumn("level", lvCol).localCheckpoint()
    def memOf(l: Int): DataFrame = remLv.filter(col("level") >= l)
      .select(col(idCol), col(vecCol))
    // per-node re-cut as the fused keyed aggregate (Similarity.topNAgg):
    // every input below unions pairwise-(q_id, n_id)-disjoint rank-cut
    // legs, so set-dedup is a no-op and the aggregate IS the window
    def recut(edges: DataFrame, kk: Int): DataFrame =
      Similarity.topNAgg(edges.select(col("q_id"), col("n_id"), col("d2")),
        Seq("q_id"), "d2", "n_id", kk, rank = true)
    var g0: DataFrame = null
    val outLayers = new Array[DataFrame](cap + 1) // 1..cap used
    if (nRemaining == 0L || (nUpserts > 0 &&
        nUpserts.toDouble > rebuildFraction * math.max(nRemaining, 1L))) {
      // the stack-wide rebuild guard: a swamping (or fully draining)
      // batch invalidates level-0 AND every layer subgraph
      val all = remaining.unionByName(ups)
        .withColumn("level", lvCol).localCheckpoint()
      // level-0 and the cap layer rebuilds are mutually independent
      // NN-Descent runs over the checkpointed membership — overlap them
      // (guide §2.6); content is per-build deterministic either way
      val builds = graft.core.Par.run[DataFrame](
        (() =>
          if (nRemaining + nUpserts == 0L) IndexCdc.emptyGraph(spark)
          else Similarity.nnDescent(all.select(col(idCol), col(vecCol)),
            idCol, vecCol, k, rebuildRounds, rebuildBuckets)) +:
        (1 to cap).map(l => () => layerBuild(spark,
          all.filter(col("level") >= l).select(col(idCol), col(vecCol)),
          idCol, vecCol, layerK, rebuildRounds, rebuildBuckets)))
      g0 = builds.head
      for (l <- 1 to cap) outLayers(l) = builds(l)
    } else {
      // ---- 1. tombstone the whole stack — the level-0 and per-layer
      // keyed semi-join snapshots are mutually independent: overlap
      // their materialization (guide §2.6)
      val tomb = graft.core.Par.run[DataFrame](
        (() => AnnIndex.survivingEdges(graph, remaining, idCol)
          .select(col("q_id"), col("n_id"), col("d2")).localCheckpoint()) +:
        (1 to cap).map(l => () => AnnIndex.survivingEdges(
            spark.read.parquet(s"$current/layer_$l"), memOf(l), idCol)
          .select(col("q_id"), col("n_id"), col("d2")).localCheckpoint()))
      g0 = tomb.head
      for (l <- 1 to cap) outLayers(l) = tomb(l)
      // the stack's two driver scalars: max populated surviving level
      // and its lowest id — the descent entry (a member of EVERY layer
      // at or below its own level). One ordered limit-1 job instead of
      // two aggregates: the (level DESC, id ASC) head IS
      // (max level, min id at that level).
      val entryRow = remLv.orderBy(col("level").desc, col(idCol).asc)
        .select(col("level"), col(idCol)).limit(1).head()
      val maxL = entryRow.getInt(0)
      val entry = entryRow.getLong(1)
      def queueDepth(g: DataFrame, members: DataFrame, kk: Int): Long =
        members.select(col(idCol).as("id"))
          .join(g.groupBy(col("q_id").as("id")).agg(count(lit(1)).as("n")),
            Seq("id"), "left")
          .filter(coalesce(col("n"), lit(0L)) < kk).count()
      if (nRemoved > 0) {
        // ---- 2. layer repairs (top entry seeds every queue node) ------
        // each layer's gate + repair touches only ITS subgraph and
        // member set: mutually independent — overlap them (guide §2.6)
        val repairedLayers = graft.core.Par.run[(Int, Option[DataFrame])](
          (1 to math.min(maxL, cap)).map(l => () => {
            val mem = memOf(l).localCheckpoint()
            if (queueDepth(outLayers(l), mem, layerK) >= repairThreshold)
              l -> Some(AnnIndex.repairGraphSeeded(outLayers(l), mem,
                  idCol, vecCol, layerK,
                  queries => queries.select(col(idCol).as("q_id"))
                    .withColumn("n_id", lit(entry)),
                  descBeam, descRounds)
                .select(col("q_id"), col("n_id"), col("d2")).localCheckpoint())
            else l -> None
          }))
        for ((l, r) <- repairedLayers; g <- r) outLayers(l) = g
        // ---- 3. level-0 repair: degraded nodes DESCEND the repaired
        // stack for their per-query seeds -------------------------------
        if (queueDepth(g0, remaining, k) >= repairThreshold)
          g0 = AnnIndex.repairGraphSeeded(g0, remaining, idCol, vecCol, k,
              queries => {
                var seeds = queries.select(col(idCol).as("q_id"))
                  .withColumn("n_id", lit(entry))
                for (l <- math.min(maxL, cap) to 1 by -1)
                  seeds = Similarity.graphSearchTopKSeeded(outLayers(l),
                      memOf(l), queries, seeds, idCol, vecCol,
                      descBeam, descRounds, m)
                    .select(col("q_id"), col("n_id")).localCheckpoint()
                seeds
              },
              beam, searchRounds)
            .select(col("q_id"), col("n_id"), col("d2")).localCheckpoint()
      }
      if (nUpserts > 0) {
        // ---- 4. the HNSW insert walk: ONE descent per batch — each
        // layer's search both seeds the next layer down and supplies
        // the adjacency for the upserts that link at this layer -------
        val upsLv = ups.withColumn("level", lvCol).localCheckpoint()
        var seeds = ups.select(col(idCol).as("q_id"))
          .withColumn("n_id", lit(entry))
        for (l <- cap to 1 by -1) {
          // search the PRE-insert layer graph (batch-blind, as at level
          // 0). A layer ABOVE the surviving stack's max level has no
          // members and an empty graph — the search still scores the
          // entry seed (its vector row stands in for the member map),
          // so an upsert whose hash level reaches such a layer LINKS to
          // the entry instead of entering it isolated, and the
          // pass-down seeds stay the entry row — exactly the walk the
          // q344 oracle's unconditional per-layer link CTEs replay
          val mem =
            if (l <= maxL) memOf(l)
            else remaining.filter(col(idCol) === entry)
              .select(col(idCol), col(vecCol))
          val found = Similarity.graphSearchTopKSeeded(outLayers(l),
              mem, ups, seeds, idCol, vecCol,
              descBeam, descRounds, descBeam).localCheckpoint()
          val linkers = upsLv.filter(col("level") >= l)
            .select(col(idCol).as("q_id"))
          val adj = recut(found.select(col("q_id"), col("n_id"), col("d2"))
              .join(linkers, Seq("q_id"), "left_semi"), layerK)
            .select(col("q_id").as("id"), col("n_id").as("nbr"), col("d2"))
          // the layer's link-in re-cut and the next layer's seeds both
          // derive from the checkpointed `found` and are independent of
          // each other — overlap them (guide §2.6)
          val Seq(newLayer, newSeeds) = graft.core.Par.run[Option[DataFrame]](Seq(
            () =>
              if (adj.isEmpty) None
              else {
                val rev = adj.select(col("nbr").as("id"), col("id").as("nbr"),
                  col("d2"))
                Some(recut(
                  outLayers(l).select(col("q_id").as("id"),
                      col("n_id").as("nbr"), col("d2"))
                    .unionByName(rev).unionByName(adj)
                    .select(col("id").as("q_id"), col("nbr").as("n_id"),
                      col("d2")),
                  layerK)
                  .select(col("q_id"), col("n_id"), col("d2"))
                  .localCheckpoint())
              },
            () => Some(recut(found, m).select(col("q_id"), col("n_id"))
              .localCheckpoint())))
          newLayer.foreach(outLayers(l) = _)
          seeds = newSeeds.get
        }
        g0 = AnnIndex.insertBatchSeeded(g0, remaining, ups, idCol, vecCol,
            k, seeds, beam, searchRounds)
          .select(col("q_id"), col("n_id"), col("d2"))
      }
    }
    // ---- commit: one co-versioned swap of the whole stack. The
    // cap + 3 part writes land in distinct dirs under the same next_
    // staging root — mutually independent, overlapped (guide §2.6);
    // the swap below waits for all of them either way ----------------
    val outVecs = remaining.unionByName(ups)
    val next = new org.apache.hadoop.fs.Path(s"$storeDir/next_$batchId")
    val g0Final = g0
    graft.core.Par.exec(Seq[() => Unit](
      () => recut(g0Final.select(col("q_id"), col("n_id"), col("d2")), k)
        .write.mode("overwrite").parquet(s"$next/graph"),
      () => outVecs.write.mode("overwrite").parquet(s"$next/vecs"),
      () => outVecs.select(col(idCol), lvCol.as("level"))
        .write.mode("overwrite").parquet(s"$next/levels")) ++
      (1 to cap).map(l => () =>
        recut(outLayers(l).select(col("q_id"), col("n_id"), col("d2")), layerK)
          .write.mode("overwrite").parquet(s"$next/layer_$l")))
    IndexCdc.writeMarker(fs, next, batchId)
    IndexCdc.writeFootprint(fs, next, nRemaining + nUpserts)
    DocStreams.swapStore(fs, storeDir, next, batchId)
  }

  /** Serve top-k from the layered store: descend the stored stack
    * ([[LayeredAnn.descendSeeds]]'s walk over the LIVE layers), then the
    * seeded level-0 beam search — the read path whose staleness the CDC
    * maintenance above exists to prevent. */
  def searchTopK(
      spark: SparkSession,
      storeDir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      m: Int,
      descBeam: Int,
      descRounds: Int,
      beam: Int,
      rounds: Int,
      k: Int): DataFrame = {
    val (fs, current) = DocStreams.recoverStore(spark, storeDir)
    require(fs.exists(current), s"layered index store $storeDir is empty")
    val vecs = spark.read.parquet(s"$current/vecs")
    val lv = spark.read.parquet(s"$current/levels")
    val maxL = lv.agg(max(col("level"))).head().getInt(0)
    val entry = lv.filter(col("level") === maxL)
      .agg(min(col(idCol))).head().getLong(0)
    var seeds = queries.select(col(idCol).as("q_id"))
      .withColumn("n_id", lit(entry))
    for (l <- math.min(maxL, cap) to 1 by -1) {
      val members = vecs.join(
        lv.filter(col("level") >= l).select(col(idCol)), idCol)
      seeds = Similarity.graphSearchTopKSeeded(
          spark.read.parquet(s"$current/layer_$l"), members, queries, seeds,
          idCol, vecCol, descBeam, descRounds, m)
        .select(col("q_id"), col("n_id")).localCheckpoint()
    }
    Similarity.graphSearchTopKSeeded(spark.read.parquet(s"$current/graph"),
      vecs, queries, seeds, idCol, vecCol, beam, rounds, k)
  }
}
