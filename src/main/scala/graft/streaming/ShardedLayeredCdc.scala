package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, LayeredAnn, Similarity}

/** STREAMING maintenance of the SHARDED-AND-LAYERED graph-ANN store —
  * the last cell of the lifecycle matrix: [[IndexCdc]] maintains flat
  * per-cell stores (q322) and [[LayeredCdc]] one layered store (q344),
  * but the per-cell layer stacks the layered × sharded serving path
  * reads ([[AnnIndex.shardedLayeredSearchTopK]], q345) had no
  * maintenance — under churn each probed cell's descent would degrade
  * exactly like the single layered store's. Here every quantizer cell
  * is a complete layered store (level-0 graph, vecs, levels,
  * layer_1..cap) committed through its own crash-safe write-aside swap
  * with the [[IndexCdc]] `applied_batch` replay-skip marker and
  * swap-time footprint manifest, and a CDC batch applies the FULL
  * [[LayeredCdc.mergeLayeredCdcBatch]] composition per touched cell:
  * route by the carried Debezium image, tombstone every level, repair
  * layers then level-0 (the level-0 queue descending the repaired
  * stack), and fold upserts in with one HNSW insert walk per batch.
  *
  * The COMPUTE is cell-keyed end to end, the q322 discipline: every
  * CDC op belongs to exactly ONE cell, so the union of the touched
  * cells' graphs behaves per query exactly like that query's own
  * cell's graph (edges are intra-cell; a seeded beam search cannot
  * leave its component), and the keyed tombstones, per-cell entry
  * table, grouped queue-depth aggregates, shared descent loops, and
  * single partitioned stage write make Spark jobs per batch
  * independent of the touched-cell count — per-cell work survives only
  * in the marker reads, the guard-exception rebuilds, and the pure
  * file-rename swap loop. Semantics are spec-locked equal to applying
  * [[LayeredCdc.mergeLayeredCdcBatch]] to each touched cell's store in
  * isolation.
  *
  * Scale shape: per-batch cost is the batch's cell footprint times the
  * layered maintenance shapes (keyed semi-joins, beam-sized seeded
  * searches over layers holding ~|cell|/4^l nodes); untouched and
  * already-committed cells are never opened; the driver artifacts are
  * the touched-cell id set, the per-cell count/queue-depth maps
  * (bounded by the footprint), and the cap-bounded layer loop. */
object ShardedLayeredCdc {

  private def cellDir(storeDir: String, cell: Long): String =
    s"$storeDir/cell_$cell"

  /** The (max populated level, top entry id) descent metadata of one
    * cell's membership-with-levels table — what every commit path
    * persists into the cell's swap manifest ([[IndexCdc.writeEntryMeta]]).
    * One bounded driver row (the cell's own membership), None when the
    * cell is empty. */
  private def entryMetaOf(
      lv: DataFrame, idCol: String): Option[(Int, Long)] =
    lv.orderBy(col("level").desc, col(idCol).asc)
      .select(col("level"), col(idCol)).limit(1).collect().headOption
      .map(r => (r.getInt(0), r.getLong(1)))

  /** Seed the store: one complete layered store per quantizer cell
    * (marker −1, footprint = member count). No-op per cell if a
    * committed store exists. */
  def initShardedLayeredStore(
      spark: SparkSession,
      storeDir: String,
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      cap: Int,
      graphK: Int,
      graphRounds: Int,
      layerK: Int,
      layerRounds: Int,
      initBuckets: Int): Unit = {
    require(nCells >= 1 && cap >= 1)
    val a = assigned.localCheckpoint()
    // per-cell seeds are independent stores under distinct dirs —
    // overlapped (guide §2.6), per-cell content unchanged
    graft.core.Par.exec((0L until nCells.toLong).map(c => () => {
      val dir = cellDir(storeDir, c)
      val (fs, current) = DocStreams.recoverStore(spark, dir)
      if (!fs.exists(current)) {
        val lv = a.filter(col("cell") === c)
          .select(col(idCol), col(vecCol),
            LayeredAnn.levelColumn(col(idCol), cap).as("level"))
          .localCheckpoint()
        val n = lv.count()
        val next = new org.apache.hadoop.fs.Path(s"$dir/next_init")
        graft.core.Par.exec(Seq[() => Unit](
          () => {
            val g0 =
              if (n == 0L) IndexCdc.emptyGraph(spark)
              else Similarity.nnDescent(lv.select(col(idCol), col(vecCol)),
                idCol, vecCol, graphK, graphRounds, initBuckets)
            g0.write.mode("overwrite").parquet(s"$next/graph")
          },
          () => lv.select(col(idCol), col(vecCol))
            .write.mode("overwrite").parquet(s"$next/vecs"),
          () => lv.select(col(idCol), col("level"))
            .write.mode("overwrite").parquet(s"$next/levels")) ++
          (1 to cap).map(l => () => {
            val members = lv.filter(col("level") >= l)
              .select(col(idCol), col(vecCol))
            val g =
              if (members.limit(2).count() < 2) IndexCdc.emptyGraph(spark)
              else Similarity.nnDescent(members, idCol, vecCol,
                layerK, layerRounds, initBuckets)
            g.write.mode("overwrite").parquet(s"$next/layer_$l")
          }))
        IndexCdc.writeMarker(fs, next, -1L)
        IndexCdc.writeFootprint(fs, next, n)
        IndexCdc.writeEntryMeta(fs, next, entryMetaOf(lv, idCol))
        DocStreams.swapStore(fs, dir, next, batchId = -1L)
      }
    }))
  }

  /** Drain a CDC stream (`op` STRING ∈ upsert|delete, `idCol`,
    * `vecCol`) into the sharded-layered store. */
  def startShardedLayered(
      cdc: DataFrame,
      storeDir: String,
      checkpointDir: String,
      cents: DataFrame,
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
        mergeShardedLayeredCdcBatch(batch, batchId, storeDir, cents,
          idCol, vecCol, cap, k, layerK, m, descBeam, descRounds,
          beam, searchRounds, repairThreshold,
          rebuildFraction, rebuildRounds, rebuildBuckets)
      }
      .start()

  /** The live store restricted to `cells`: one part of each named
    * cell's store, `cell` re-attached. PATH-scoped — only the named
    * cells' directories are ever opened. */
  def shardedLayeredStorePart(
      spark: SparkSession,
      storeDir: String,
      cells: Seq[Long],
      part: String): DataFrame =
    cells.map { c =>
      spark.read.parquet(s"${cellDir(storeDir, c)}/current/$part")
        .withColumn("cell", lit(c))
    }.reduce(_ unionByName _)

  private[graft] def mergeShardedLayeredCdcBatch(
      batch: DataFrame,
      batchId: Long,
      storeDir: String,
      cents: DataFrame,
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
    val lvCol = LayeredAnn.levelColumn(col(idCol), cap)
    // route by the carried image (after for upserts, BEFORE for deletes)
    val routed = batch
      .select(col("op"), col(idCol), col(vecCol),
        Similarity.ivfCellColumn(col(vecCol), cents).cast("long").as("cell"))
      .localCheckpoint()
    val touched = routed.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val curByCell: Map[Long, org.apache.hadoop.fs.Path] = touched.map { c =>
      val (_, current) = DocStreams.recoverStore(spark, cellDir(storeDir, c))
      require(fs.exists(current),
        s"sharded-layered store $storeDir has no committed cell $c " +
          "(initShardedLayeredStore must seed every quantizer cell)")
      c -> current
    }.toMap
    // replay skip: committed cells must not re-apply (driver file reads)
    val applySet = touched.filter(c =>
      IndexCdc.appliedBatch(fs, curByCell(c)) < batchId)
    if (applySet.isEmpty) return
    val inCells = (cs: Seq[Long]) => col("cell")
      .isInCollection(cs.map(java.lang.Long.valueOf))
    // ONE keyed read per store part over the apply-set cells
    val vecs = shardedLayeredStorePart(spark, storeDir, applySet, "vecs")
    val b = routed.filter(inCells(applySet))
    val ups = b.filter(col("op") === "upsert")
      .select(col("cell"), col(idCol), col(vecCol)).localCheckpoint()
    val removed = b.select(col("cell"), col(idCol)).distinct()
    val remaining = vecs
      .join(removed, Seq("cell", idCol), "left_anti")
      .select(col("cell"), col(idCol), col(vecCol)).localCheckpoint()
    // per-cell stats: two grouped aggregates + manifest reads (no jobs)
    def cellCounts(df: DataFrame): Map[Long, Long] = df.groupBy(col("cell"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRem = cellCounts(remaining).withDefaultValue(0L)
    val nUps = cellCounts(ups).withDefaultValue(0L)
    val nPrev = applySet.map(c =>
      c -> IndexCdc.cellFootprint(spark, fs, curByCell(c))).toMap
    // the cell-LOCAL stack-wide rebuild guard classes
    val drained = applySet.filter(c => nRem(c) == 0L)
    val rebuilds = applySet.filter(c => nRem(c) > 0L && nUps(c) > 0L &&
      nUps(c).toDouble > rebuildFraction * nRem(c))
    val incr = applySet.filterNot(c =>
      drained.contains(c) || rebuilds.contains(c))
    // per-(cell, node) re-cut as the fused keyed aggregate — the
    // LayeredCdc.recut rationale with cell riding the key
    def recutCell(edges: DataFrame, kk: Int): DataFrame =
      Similarity.topNAgg(
        edges.select(col("cell"), col("q_id"), col("n_id"), col("d2")),
        Seq("cell", "q_id"), "d2", "n_id", kk, rank = true)
    // accumulated outputs, all (cell, q_id, n_id, d2)
    var outG0: DataFrame = null
    val outL = new Array[DataFrame](cap + 1)
    def acc(cur: DataFrame, add: DataFrame): DataFrame =
      if (cur == null) add else cur.unionByName(add)
    // ---- incremental cells: one keyed pipeline ----------------------
    if (incr.nonEmpty) {
      val rem = remaining.filter(inCells(incr))
      val remIds = rem.select(col("cell"), col(idCol).as("id"))
      val remLv = rem.withColumn("level", lvCol).localCheckpoint()
      def memOf(l: Int): DataFrame = remLv.filter(col("level") >= l)
      def keyedSurviving(graphs: DataFrame, ids: DataFrame): DataFrame =
        graphs
          .join(ids.select(col("cell"), col("id").as("q_id")),
            Seq("cell", "q_id"), "left_semi")
          .join(ids.select(col("cell"), col("id").as("n_id")),
            Seq("cell", "n_id"), "left_semi")
          .select(col("cell"), col("q_id"), col("n_id"), col("d2"))
      // 1. tombstone the whole stack, keyed — the level-0 and per-layer
      // snapshots are mutually independent: overlap them (guide §2.6)
      val tomb = graft.core.Par.run[DataFrame](
        (() => keyedSurviving(
          shardedLayeredStorePart(spark, storeDir, incr, "graph"), remIds)
          .localCheckpoint()) +:
        (1 to cap).map(l => () => keyedSurviving(
          shardedLayeredStorePart(spark, storeDir, incr, s"layer_$l"),
          memOf(l).select(col("cell"), col(idCol).as("id")))
          .localCheckpoint()))
      var g0 = tomb.head
      val lg = new Array[DataFrame](cap + 1)
      for (l <- 1 to cap) lg(l) = tomb(l)
      // per-cell stack height + top entry: ONE grouped table
      val entries = remLv.groupBy(col("cell")).agg(max(col("level")).as("ml"))
        .join(remLv, Seq("cell"))
        .filter(col("level") === col("ml"))
        .groupBy(col("cell"), col("ml")).agg(min(col(idCol)).as("n_id"))
        .localCheckpoint()
      val cellOf = remIds.unionByName(
        ups.filter(inCells(incr)).select(col("cell"), col(idCol).as("id")))
      def attachCell(df: DataFrame): DataFrame = df
        .select(col("q_id"), col("n_id"), col("d2"))
        .join(cellOf.select(col("cell"), col("id").as("q_id")), Seq("q_id"))
        .select(col("cell"), col("q_id"), col("n_id"), col("d2"))
      // entry seeds: each (cell-tagged) query walks in from ITS cell's
      // top entry — the union-graph search is then confined to the
      // query's own cell by connectivity
      def entrySeeds(queries: DataFrame): DataFrame = queries
        .join(entries.select(col("cell"), col("n_id")), Seq("cell"))
        .select(col("id").as("q_id"), col("n_id"))
      def queueDepths(g: DataFrame, members: DataFrame, kk: Int): Map[Long, Long] =
        members.select(col("cell"), col(idCol).as("id"))
          .join(g.groupBy(col("cell"), col("q_id").as("id"))
            .agg(count(lit(1)).as("n")), Seq("cell", "id"), "left")
          .filter(coalesce(col("n"), lit(0L)) < kk)
          .groupBy(col("cell")).agg(count(lit(1)).as("qd")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // one shared descent over the (post-repair) layer stacks: cells
      // whose stack is shorter than the layer pass their seeds through
      def descend(queries: DataFrame, qCells: DataFrame): DataFrame = {
        var seeds = qCells.join(entries.select(col("cell"), col("n_id")),
            Seq("cell"))
          .select(col("q_id"), col("cell"), col("n_id")).localCheckpoint()
        for (l <- cap to 1 by -1) {
          val act = entries.filter(col("ml") >= l).select(col("cell"))
          val sAct = seeds.join(act, Seq("cell"), "left_semi")
          val sPass = seeds.join(act, Seq("cell"), "left_anti")
          val found = Similarity.graphSearchTopKSeeded(
            lg(l).select(col("q_id"), col("n_id"), col("d2")),
            memOf(l).select(col(idCol), col(vecCol)), queries,
            sAct.select(col("q_id"), col("n_id")), idCol, vecCol,
            descBeam, descRounds, m)
          seeds = found.select(col("q_id"), col("n_id"))
            .join(cellOf.select(col("cell"), col("id").as("q_id")),
              Seq("q_id"))
            .select(col("q_id"), col("cell"), col("n_id"))
            .unionByName(sPass).localCheckpoint()
        }
        seeds
      }
      val delCells = incr.filter(c => nPrev(c) - nRem(c) > 0L)
      if (delCells.nonEmpty) {
        // 2. layer repairs: gate per (layer, cell) from ONE grouped
        // queue-depth aggregate, repair the gated cells' union with
        // per-cell entry seeds. Each layer's gate + repair touches only
        // ITS subgraph union — mutually independent, overlapped
        // (guide §2.6)
        val repairedLayers = graft.core.Par.run[(Int, Option[DataFrame])](
          (1 to cap).map(l => () => {
            val qd = queueDepths(lg(l), memOf(l), layerK)
            val repairCells = delCells.filter(c =>
              qd.getOrElse(c, 0L) >= repairThreshold)
            if (repairCells.isEmpty) l -> None
            else {
              val gRep = lg(l).filter(inCells(repairCells))
              val memRep = memOf(l).filter(inCells(repairCells))
              val repaired = AnnIndex.repairGraphSeeded(
                gRep.select(col("q_id"), col("n_id"), col("d2")),
                memRep.select(col(idCol), col(vecCol)), idCol, vecCol, layerK,
                queries => entrySeeds(queries.select(col(idCol))
                  .join(cellOf.withColumnRenamed("id", idCol), Seq(idCol))
                  .select(col("cell"), col(idCol).as("id"))),
                descBeam, descRounds)
              l -> Some(lg(l).filter(!inCells(repairCells))
                .unionByName(attachCell(repaired)).localCheckpoint())
            }
          }))
        for ((l, r) <- repairedLayers; g <- r) lg(l) = g
        // 3. level-0 repairs: the gated cells' queue DESCENDS the
        // repaired stacks for its per-query seeds
        val qd0 = queueDepths(g0, rem, k)
        val repairCells0 = delCells.filter(c =>
          qd0.getOrElse(c, 0L) >= repairThreshold)
        if (repairCells0.nonEmpty) {
          val gRep = g0.filter(inCells(repairCells0))
          val remRep = rem.filter(inCells(repairCells0))
          val repaired = AnnIndex.repairGraphSeeded(
            gRep.select(col("q_id"), col("n_id"), col("d2")),
            remRep.select(col(idCol), col(vecCol)), idCol, vecCol, k,
            queries => descend(queries,
              queries.select(col(idCol).as("q_id"))
                .join(cellOf.select(col("cell"), col("id").as("q_id")),
                  Seq("q_id")))
              .select(col("q_id"), col("n_id")),
            beam, searchRounds)
          g0 = g0.filter(!inCells(repairCells0))
            .unionByName(attachCell(repaired)).localCheckpoint()
        }
      }
      // nUps is the per-cell upsert count map — deriving the gate from
      // it is the same truth value as counting ups∩incr, minus one job
      if (incr.exists(c => nUps(c) > 0L)) {
        // 4. the HNSW insert walk, shared across cells: one descent per
        // batch whose per-layer search both seeds the next layer and
        // links the upserts whose hash level reaches it
        val upsIncr = ups.filter(inCells(incr)).localCheckpoint()
        val upsLv = upsIncr.withColumn("level", lvCol)
        var seeds = upsIncr.select(col(idCol).as("q_id"), col("cell"))
          .join(entries.select(col("cell"), col("n_id")), Seq("cell"))
          .select(col("q_id"), col("cell"), col("n_id")).localCheckpoint()
        for (l <- cap to 1 by -1) {
          // a cell whose surviving stack is SHORTER than this layer has
          // no members and an empty subgraph there — its entry's vector
          // row stands in for the member map, so the search still
          // scores that cell's entry seed: an upsert whose hash level
          // reaches the layer LINKS to its cell's entry instead of
          // entering it isolated, and its pass-down seed stays the
          // entry row (the walk the q349 oracle's unconditional
          // per-(cell, layer) link CTEs replay)
          val shortEntryVecs = rem
            .join(entries.filter(col("ml") < l)
                .select(col("cell"), col("n_id").as(idCol)),
              Seq("cell", idCol), "left_semi")
            .select(col(idCol), col(vecCol))
          val found = Similarity.graphSearchTopKSeeded(
            lg(l).select(col("q_id"), col("n_id"), col("d2")),
            memOf(l).select(col(idCol), col(vecCol))
              .unionByName(shortEntryVecs),
            upsIncr.select(col(idCol), col(vecCol)),
            seeds.select(col("q_id"), col("n_id")), idCol, vecCol,
            descBeam, descRounds, descBeam).localCheckpoint()
          val linkers = upsLv.filter(col("level") >= l)
            .select(col(idCol).as("q_id"))
          val adj = recutCell(
            attachCell(found.select(col("q_id"), col("n_id"), col("d2"))
              .join(linkers, Seq("q_id"), "left_semi")), layerK)
            .select(col("cell"), col("q_id").as("id"), col("n_id").as("nbr"),
              col("d2"))
          // the layer's link-in re-cut and the next layer's seeds both
          // derive from the checkpointed `found` — overlap (guide §2.6)
          val Seq(newLayer, newSeeds) =
            graft.core.Par.run[Option[DataFrame]](Seq(
              () =>
                if (adj.isEmpty) None
                else {
                  val rev = adj.select(col("cell"), col("nbr").as("id"),
                    col("id").as("nbr"), col("d2"))
                  Some(recutCell(
                    lg(l).select(col("cell"), col("q_id").as("id"),
                        col("n_id").as("nbr"), col("d2"))
                      .unionByName(rev).unionByName(adj)
                      .select(col("cell"), col("id").as("q_id"),
                        col("nbr").as("n_id"), col("d2")),
                    layerK)
                    .select(col("cell"), col("q_id"), col("n_id"), col("d2"))
                    .localCheckpoint())
                },
              () => Some(Similarity.topNAgg(
                  found.select(col("q_id"), col("n_id"), col("d2")),
                  Seq("q_id"), "d2", "n_id", m)
                .select(col("q_id"), col("n_id"))
                .join(cellOf.select(col("cell"), col("id").as("q_id")),
                  Seq("q_id"))
                .select(col("q_id"), col("cell"), col("n_id"))
                .localCheckpoint())))
          newLayer.foreach(lg(l) = _)
          seeds = newSeeds.get
        }
        val inserted = AnnIndex.insertBatchSeeded(
          g0.select(col("q_id"), col("n_id"), col("d2")),
          rem.select(col(idCol), col(vecCol)),
          upsIncr.select(col(idCol), col(vecCol)), idCol, vecCol, k,
          seeds.select(col("q_id"), col("n_id")), beam, searchRounds)
        g0 = attachCell(inserted)
      }
      outG0 = acc(outG0, g0)
      for (l <- 1 to cap) outL(l) = acc(outL(l), lg(l))
    }
    // ---- guard-exception cells: per-cell stack rebuilds — each cell's
    // 1 + cap NN-Descent builds are independent of every other cell's
    // (and of each other): run them overlapped (guide §2.6) and fold
    // the results in deterministic (cell, level) order afterwards -----
    val rebuilt: Seq[(Long, Seq[DataFrame])] = graft.core.Par.run(
      (drained ++ rebuilds).map(c => () => {
        val all = remaining.filter(col("cell") === c)
          .unionByName(ups.filter(col("cell") === c))
          .withColumn("level", lvCol).localCheckpoint()
        val stack = graft.core.Par.run[DataFrame](
          (() =>
            if (nRem(c) + nUps(c) == 0L) IndexCdc.emptyGraph(spark)
            else Similarity.nnDescent(all.select(col(idCol), col(vecCol)),
              idCol, vecCol, k, rebuildRounds, rebuildBuckets)) +:
          (1 to cap).map(l => () => {
            val members = all.filter(col("level") >= l)
              .select(col(idCol), col(vecCol))
            if (members.limit(2).count() < 2) IndexCdc.emptyGraph(spark)
            else Similarity.nnDescent(members, idCol, vecCol,
              layerK, rebuildRounds, rebuildBuckets)
          }))
        c -> stack
      }))
    for ((c, stack) <- rebuilt) {
      outG0 = acc(outG0, stack.head.select(col("q_id"), col("n_id"), col("d2"))
        .withColumn("cell", lit(c)))
      for (l <- 1 to cap)
        outL(l) = acc(outL(l), stack(l)
          .select(col("q_id"), col("n_id"), col("d2"))
          .withColumn("cell", lit(c)))
    }
    // ---- commit: one partitioned stage write per part, then pure
    // file renames into each cell's next_ dir and the crash-safe swap
    val outVecs = remaining.unionByName(ups)
    val stage = new org.apache.hadoop.fs.Path(s"$storeDir/stage_$batchId")
    if (fs.exists(stage)) fs.delete(stage, true)
    val outG0Final = outG0
    // the cap + 3 partitioned stage writes land in distinct dirs and the
    // manifest aggregate below reads only checkpointed inputs — all
    // mutually independent: overlap them (guide §2.6). entryByCell is
    // the per-cell descent-entry metadata (max populated level, top
    // entry) for the swap manifests: ONE grouped aggregate over the
    // post-batch membership (bounded by the touched cells), persisted
    // beside the applied-batch marker so a live-store server seeds its
    // descents from driver file reads instead of re-aggregating levels
    // per batch
    val lvAll = outVecs.select(col("cell"), col(idCol), lvCol.as("level"))
    var entryByCell: Map[Long, (Int, Long)] = Map.empty
    graft.core.Par.exec(Seq[() => Unit](
      () => recutCell(outG0Final.select(col("cell"), col("q_id"), col("n_id"),
          col("d2")), k)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$stage/graph"),
      () => outVecs.select(col("cell"), col(idCol), col(vecCol))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$stage/vecs"),
      () => outVecs.select(col("cell"), col(idCol), lvCol.as("level"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$stage/levels"),
      () => entryByCell = lvAll
        .groupBy(col("cell")).agg(max(col("level")).as("ml"))
        .join(lvAll, Seq("cell")).filter(col("level") === col("ml"))
        .groupBy(col("cell"), col("ml")).agg(min(col(idCol)).as("nid"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    ) ++ (1 to cap).map(l => () =>
      recutCell(outL(l).select(col("cell"), col("q_id"), col("n_id"),
          col("d2")), layerK)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$stage/layer_$l")))
    val parts = Seq("graph", "vecs", "levels") ++ (1 to cap).map(l => s"layer_$l")
    for (c <- applySet) {
      val next = new org.apache.hadoop.fs.Path(
        s"${cellDir(storeDir, c)}/next_$batchId")
      if (fs.exists(next)) fs.delete(next, true)
      fs.mkdirs(next)
      for (part <- parts) {
        val src = new org.apache.hadoop.fs.Path(s"$stage/$part/cell=$c")
        val dst = new org.apache.hadoop.fs.Path(next, part)
        if (fs.exists(src)) fs.rename(src, dst)
        else {
          val empty = part match {
            case "vecs" => vecs.limit(0).select(col(idCol), col(vecCol))
            case "levels" => vecs.limit(0)
              .select(col(idCol), lvCol.as("level"))
            case _ => IndexCdc.emptyGraph(spark)
          }
          empty.write.mode("overwrite").parquet(dst.toString)
        }
      }
      IndexCdc.writeMarker(fs, next, batchId)
      IndexCdc.writeFootprint(fs, next, nRem(c) + nUps(c))
      IndexCdc.writeEntryMeta(fs, next, entryByCell.get(c))
      DocStreams.swapStore(fs, cellDir(storeDir, c), next, batchId)
    }
    fs.delete(stage, true)
  }

  /** Per-cell GROWTH report for the sharded-LAYERED store — the
    * [[graft.operators.AnnIndex.shardGrowthReport]] analog the owner of
    * this store's CDC pipeline watches, extended with the stack shape
    * the flat report has no notion of: per cell the member count (off
    * the swap-time footprint manifest — nCells driver file reads, zero
    * Spark jobs), corpus share in ppm, level-0 edge volume and
    * degraded-list count, the max POPULATED level (a cell whose upper
    * layers drained serves through a shorter descent), the total layer
    * edge volume, and the action the share band implies — the verdicts
    * [[rebalanceShardedLayeredStore]] consumes. Scale shape: decisions
    * and shares from the manifests; the stats are three grouped
    * aggregates over path-scoped reads of exactly these cells' parts. */
  def growthReport(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      k: Int,
      cap: Int,
      splitPpm: Long,
      mergePpm: Long): DataFrame = {
    require(splitPpm > mergePpm && mergePpm >= 0 && cap >= 1)
    val cells = cents.select(col("cent_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val counts = cells.map { c =>
      val (_, cur) = DocStreams.recoverStore(spark, cellDir(storeDir, c))
      require(fs.exists(cur),
        s"sharded-layered store $storeDir has no committed cell $c")
      c -> IndexCdc.cellFootprint(spark, fs, cur)
    }.toMap
    val total = math.max(counts.values.sum, 1L)
    import spark.implicits._
    // counts, shares and verdicts are manifest-derived driver rows
    // (≤ nCells); only the edge/level stats touch stored data
    val mem = cells.map { c =>
      val n = counts(c)
      val sp = n * 1000000L / total
      val rec = if (sp > splitPpm) "split"
        else if (sp < mergePpm) "merge" else "healthy"
      (c, n, sp, rec)
    }.toDF("cell", "n_members", "share_ppm", "recommendation")
    val deg = shardedLayeredStorePart(spark, storeDir, cells, "graph")
      .groupBy(col("cell"), col("q_id")).agg(count(lit(1)).as("n"))
    val eg = deg.groupBy(col("cell"))
      .agg(sum(col("n")).as("n_edges"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_degraded"))
    val ml = shardedLayeredStorePart(spark, storeDir, cells, "levels")
      .groupBy(col("cell")).agg(max(col("level")).as("max_level"))
    val le = (1 to cap)
      .map(l => shardedLayeredStorePart(spark, storeDir, cells, s"layer_$l"))
      .reduce(_ unionByName _)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_layer_edges"))
    mem.join(eg, Seq("cell"), "left").join(ml, Seq("cell"), "left")
      .join(le, Seq("cell"), "left")
      .select(col("cell"), col("n_members"), col("share_ppm"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("n_degraded"), lit(0L)).as("n_degraded"),
        coalesce(col("max_level"), lit(-1)).cast("long").as("max_level"),
        coalesce(col("n_layer_edges"), lit(0L)).as("n_layer_edges"),
        col("recommendation"))
  }

  /** REBALANCE the sharded-layered store —
    * [[IndexCdc.rebalanceShardedStore]]'s decision + two-phase-commit
    * core ([[IndexCdc.rebalanceCore]]: share-band classification off
    * the footprint manifests, sub-centroid picks, member reassignment,
    * merge-target argmax, marker/footprint inheritance, staged writes,
    * phase-2 swaps) applied to per-cell LAYERED stores: every affected
    * cell's staged artifact is the COMPLETE stack — level-0 NN-Descent
    * graph, vecs, the hash-deterministic levels table, and one subgraph
    * per layer 1..cap rebuilt over the post-rebalance membership
    * (membership changes invalidate layer subgraphs exactly the way
    * they invalidate level-0; the build guards match
    * [[initShardedLayeredStore]], so a rebuilt cell is bit-identical to
    * a fresh seed of its new membership). Untouched cells are neither
    * read nor rewritten beyond their footprint manifests. */
  def rebalanceShardedLayeredStore(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      k: Int,
      graphRounds: Int,
      layerK: Int,
      layerRounds: Int,
      initBuckets: Int,
      splitPpm: Long,
      mergePpm: Long,
      rebalanceId: Long): (DataFrame, DataFrame) = {
    require(cap >= 1)
    val lvCol = LayeredAnn.levelColumn(col(idCol), cap)
    IndexCdc.rebalanceCore(spark, storeDir, cents, idCol, vecCol,
      splitPpm, mergePpm, rebalanceId) { (next, members) =>
      val lv = members.select(col(idCol), col(vecCol))
        .withColumn("level", lvCol).localCheckpoint()
      // the staged stack's parts — level-0 build+write, vecs, levels,
      // each layer's build+write, and the descent-entry manifest — all
      // derive from the checkpointed lv and land in distinct files
      // under next_: mutually independent, overlapped (guide §2.6)
      graft.core.Par.exec(Seq[() => Unit](
        () => {
          val g0 =
            if (lv.isEmpty) IndexCdc.emptyGraph(spark)
            else Similarity.nnDescent(lv.select(col(idCol), col(vecCol)),
              idCol, vecCol, k, graphRounds, initBuckets)
          g0.write.mode("overwrite").parquet(s"$next/graph")
        },
        () => lv.select(col(idCol), col(vecCol))
          .write.mode("overwrite").parquet(s"$next/vecs"),
        () => lv.select(col(idCol), col("level"))
          .write.mode("overwrite").parquet(s"$next/levels"),
        // rebuilt membership → rebuilt descent metadata: the swap
        // manifest must never outlive the stack it describes
        () => IndexCdc.writeEntryMeta(
          next.getFileSystem(spark.sparkContext.hadoopConfiguration),
          next, entryMetaOf(lv, idCol))) ++
        (1 to cap).map(l => () => {
          val m = lv.filter(col("level") >= l).select(col(idCol), col(vecCol))
          val g =
            if (m.limit(2).count() < 2) IndexCdc.emptyGraph(spark)
            else Similarity.nnDescent(m, idCol, vecCol, layerK, layerRounds,
              initBuckets)
          g.write.mode("overwrite").parquet(s"$next/layer_$l")
        }))
    }
  }

  /** Post-CDC MAINTENANCE WINDOW for the sharded-layered store — the
    * [[IndexCdc.maintenanceWindow]] gate ([[IndexCdc.maintenanceCore]]:
    * drifted footprints off the swap-time manifests, zero Spark jobs
    * when nothing fires) over [[rebalanceShardedLayeredStore]]: the CDC
    * stream drains continuously, and the periodic job rebuilds affected
    * cells' complete layer stacks only if some cell left the
    * [mergePpm, splitPpm] band, reporting every cell either way. */
  def maintenanceWindowLayered(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      k: Int,
      graphRounds: Int,
      layerK: Int,
      layerRounds: Int,
      initBuckets: Int,
      splitPpm: Long,
      mergePpm: Long,
      rebalanceId: Long): (DataFrame, DataFrame) =
    IndexCdc.maintenanceCore(spark, storeDir, cents, splitPpm, mergePpm)(
      rebalanceShardedLayeredStore(spark, storeDir, cents, idCol, vecCol,
        cap, k, graphRounds, layerK, layerRounds, initBuckets,
        splitPpm, mergePpm, rebalanceId))
}
