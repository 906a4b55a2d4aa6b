package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AnnIndex

/** STREAMING maintenance of the persisted graph-ANN index — the one
  * lifecycle stage the batch entries (build q282 → serve q290 → insert
  * q291 → delete q300 → repair q301) left offline, and the artifact a
  * production vector service actually runs: a CDC feed of upserts and
  * deletes applied per micro-batch to the stored index.
  *
  * Per batch, in deterministic order:
  *
  *  1. DELETE: the batch's delete ids — plus upsert ids, since an
  *     upsert REPLACES any existing vector — are tombstoned out of the
  *     store ([[AnnIndex.survivingEdges]]: two keyed semi-joins);
  *  2. REPAIR: if the batch deleted anything and the post-delete
  *     degraded queue (degree < k) is at least `repairThreshold`, run
  *     the maintenance window now ([[AnnIndex.repairGraph]] — beam
  *     search over the degraded closure, per-node top-k re-cut).
  *     Insert-only batches never enter the repair path: inserts can
  *     only add edges, so they cannot create repair debt;
  *  3. INSERT: the batch's upsert vectors fold in via
  *     [[AnnIndex.insertBatch]] (the HNSW pattern — search the stored
  *     graph, link, patch reverse edges).
  *
  * The store is TWO co-committed parquet tables under one versioned
  * dir — `current/graph` (q_id, n_id, d2, rank) and `current/vecs`
  * (the surviving id → vector map the searches need) — swapped
  * atomically by the sketch stores' crash-safe write-aside protocol
  * ([[DocStreams.recoverStore]]/[[DocStreams.swapStore]]): at every
  * instant a complete (graph, vecs) pair exists under exactly one of
  * `current`/`prev_*`, and a crash mid-swap replays the checkpointed
  * batch against the recovered PRE-batch store — the graph update is
  * not idempotent the way a sketch merge is, so replay-safety comes
  * from replaying against the same input, which is deterministic
  * (spec-locked: re-running a batch on the recovered store reproduces
  * the identical post-batch store).
  *
  * Scale shape: every stage is the batch operators' own — keyed
  * semi-joins over the k·n edge table, beam-sized search tables, one
  * per-node top-k window; the corpus is touched only through keyed
  * vector lookups, and the store is read and swapped, never rebuilt.
  * The two driver-side scalars per batch (rows removed, queue depth)
  * are bounded aggregates, not data collections.
  */
object IndexCdc {

  /** Seed the store with a base (graph, vecs) pair — the offline build
    * a CDC consumer starts from. No-op if a committed store exists. */
  def initStore(
      spark: SparkSession,
      storeDir: String,
      graph: DataFrame,
      vecs: DataFrame): Unit = {
    val (fs, current) = DocStreams.recoverStore(spark, storeDir)
    if (!fs.exists(current)) {
      val next = new org.apache.hadoop.fs.Path(s"$storeDir/next_init")
      graph.write.mode("overwrite").parquet(s"$next/graph")
      vecs.write.mode("overwrite").parquet(s"$next/vecs")
      DocStreams.swapStore(fs, storeDir, next, batchId = -1L)
    }
  }

  /** Drain a CDC stream (`op` STRING ∈ upsert|delete, `idCol`,
    * `vecCol`) into the store.
    *
    * `rebuildFraction` guards [[AnnIndex.insertBatch]]'s deliberate
    * batch-blindness (new vectors link only to EXISTING nodes — the
    * standard bulk-insert approximation, recall-gated at ~10% batches):
    * for a batch of upserts larger than this fraction of the surviving
    * corpus the approximation stops being one (a big batch's vectors
    * are mostly each other's true neighbors, and none of those edges
    * can exist), so the merge REBUILDS the graph over survivors ∪ batch
    * instead — the fold-into-the-next-rebuild policy made explicit and
    * automatic, spec-locked equal to a fresh build. */
  def start(
      cdc: DataFrame,
      storeDir: String,
      checkpointDir: String,
      idCol: String,
      vecCol: String,
      k: Int,
      entryIds: Seq[Long],
      beam: Int,
      searchRounds: Int,
      repairThreshold: Long,
      rebuildFraction: Double = 0.25,
      rebuildRounds: Int = 4,
      rebuildBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCdcBatch(batch, batchId, storeDir, idCol, vecCol,
          k, entryIds, beam, searchRounds, repairThreshold,
          rebuildFraction, rebuildRounds, rebuildBuckets)
      }
      .start()

  private[graft] def mergeCdcBatch(
      batch: DataFrame,
      batchId: Long,
      storeDir: String,
      idCol: String,
      vecCol: String,
      k: Int,
      entryIds: Seq[Long],
      beam: Int,
      searchRounds: Int,
      repairThreshold: Long,
      rebuildFraction: Double = 0.25,
      rebuildRounds: Int = 4,
      rebuildBuckets: Int = 16): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val (fs, current) = DocStreams.recoverStore(spark, storeDir)
    require(fs.exists(current),
      s"index store $storeDir must be initialized (initStore) before CDC")
    val graph = spark.read.parquet(s"$current/graph")
    val vecs = spark.read.parquet(s"$current/vecs")
    val dels = batch.filter(col("op") === "delete").select(col(idCol))
    val ups = batch.filter(col("op") === "upsert")
      .select(col(idCol), col(vecCol)).localCheckpoint()
    // upsert replaces: drop existing state for upserted ids too
    val removed = dels.unionByName(ups.select(col(idCol))).distinct()
    val remaining = vecs.join(removed, Seq(idCol), "left_anti").localCheckpoint()
    // three independent bounded counts — overlapped (guide §2.6)
    val Seq(nVecs, nUpserts, nRemaining) = graft.core.Par.run(Seq(
      () => vecs.count(), () => ups.count(), () => remaining.count()))
    val nRemoved = nVecs - nRemaining
    var g = AnnIndex.survivingEdges(graph, remaining, idCol)
    if (nUpserts > 0 && nUpserts.toDouble > rebuildFraction * math.max(nRemaining, 1L)) {
      // batch too large for the insert approximation (its vectors are
      // mostly each other's true neighbors and insertBatch can never
      // link new→new): rebuild over survivors ∪ batch
      g = graft.operators.Similarity.nnDescent(
        remaining.unionByName(ups), idCol, vecCol,
        k, rebuildRounds, rebuildBuckets)
    } else {
      if (nRemoved > 0) {
        val queueDepth = remaining.select(col(idCol).as("id"))
          .join(g.groupBy(col("q_id").as("id")).agg(count(lit(1)).as("n")),
            Seq("id"), "left")
          .filter(coalesce(col("n"), lit(0L)) < k).count()
        if (queueDepth >= repairThreshold)
          g = AnnIndex.repairGraph(g, remaining, idCol, vecCol,
            k, entryIds, beam, searchRounds)
      }
      if (nUpserts > 0)
        g = AnnIndex.insertBatch(g, remaining, ups, idCol, vecCol,
          k, entryIds, beam, searchRounds)
    }
    // canonical stored shape: rank = position in the node's list (kept
    // lists have gaps after a delete-only batch). Lists are ≤ k rows
    // each (every producer above is a rank-cut), so the re-rank is the
    // fused keyed aggregate — no sort of the k·n edge table
    val outGraph = graft.operators.Similarity.topNAgg(
      g.select(col("q_id"), col("n_id"), col("d2")),
      Seq("q_id"), "d2", "n_id", k, rank = true)
    val outVecs = remaining.unionByName(ups)
    // write-then-swap: a crash mid-write must not destroy the only copy;
    // the two part writes are independent — overlapped (guide §2.6)
    val next = new org.apache.hadoop.fs.Path(s"$storeDir/next_$batchId")
    graft.core.Par.exec(Seq(
      () => outGraph.write.mode("overwrite").parquet(s"$next/graph"),
      () => outVecs.write.mode("overwrite").parquet(s"$next/vecs")))
    DocStreams.swapStore(fs, storeDir, next, batchId)
  }

  // --------------------------------------------------------------------
  // SHARDED-store CDC — the [[mergeCdcBatch]] lifecycle composed with
  // the cell-partitioned index ([[graft.operators.AnnIndex
  // .buildOrLoadSharded]]'s shape, held as one swappable store PER CELL):
  // a batch's upserts and deletes route to their coarse-quantizer cells
  // and the delete → threshold-repair → insert merge applies per TOUCHED
  // cell only. Untouched cells' partitions are never read or rewritten —
  // the partition-level analog of "read and swapped, never rebuilt" —
  // which is what keeps per-batch maintenance cost proportional to the
  // batch's cell footprint, not the corpus, at 100 TB.
  //
  // Routing contract (the Debezium-style CDC image discipline): every
  // row carries the vector it routes by — an upsert its AFTER image, a
  // delete its BEFORE image (the stored copy's vector, which is what a
  // CDC producer's before-image field holds). An update that MOVES a
  // vector across cells must therefore arrive as delete(before) +
  // upsert(after) — exactly how a Debezium update event splits — so the
  // old copy is tombstoned in its old cell and the new one links in its
  // new cell; a same-cell update may arrive as a bare upsert (replace).
  //
  // Crash safety is per cell: each cell store commits through the
  // sketch stores' write-aside swap, and carries an `applied_batch`
  // marker INSIDE the swapped dir, so a crash between two cells' swaps
  // replays the checkpointed batch with already-committed cells SKIPPED
  // (the graph update is not idempotent — re-applying a batch to a
  // post-batch cell would degrade reverse-patched lists) and unapplied
  // cells re-derived deterministically from their pre-batch stores.
  // --------------------------------------------------------------------

  private def cellDir(storeDir: String, cell: Long): String =
    s"$storeDir/cell_$cell"

  private val markerFile = "applied_batch"

  /** Per-cell member-count manifest, written at swap time beside the
    * applied-batch marker: the maintenance jobs (growth shares,
    * rebalance decisions, the window's fire test) need only each cell's
    * FOOTPRINT, and a manifest written by the job that already knows
    * the count turns "one Spark job per cell per window" into "nCells
    * driver-side file reads" — zero jobs, the shape that holds when a
    * window watches thousands of cells. */
  private val footprintFile = "n_vecs"

  /** Per-cell descent-entry manifest for LAYERED cell stores, written at
    * swap time beside the applied-batch marker and footprint: the
    * (max populated level, top entry id) pair a layered serve descends
    * from. Persisting it with every swap is what lets a LIVE-store
    * server ([[AnnServing.serveLiveShardedLayeredTopK]]) seed its
    * descents with nCells driver file reads — zero Spark jobs — instead
    * of re-aggregating each probed cell's levels per micro-batch, and
    * what keeps the metadata fresh under CDC churn (a build-time-only
    * table would go stale the first time a batch deleted a cell's top
    * entry). Content is `ml,n_id`, or the literal `none` for a cell
    * swapped in empty. */
  private val entryFile = "entry"

  private[graft] def writeEntryMeta(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      meta: Option[(Int, Long)]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, entryFile), true)
    try out.write(meta.fold("none") { case (ml, id) => s"$ml,$id" }
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** The cell's persisted descent-entry metadata: outer None if the
    * manifest is absent (a store written before it existed — the caller
    * derives from the levels part instead); Some(None) for an empty
    * cell; Some(Some((ml, nId))) otherwise. */
  private[graft] def readEntryMeta(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Option[(Int, Long)]] = {
    val p = new org.apache.hadoop.fs.Path(dir, entryFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
        finally in.close()
      if (txt == "none") Some(None)
      else {
        val Array(ml, id) = txt.split(",")
        Some(Some((ml.toInt, id.toLong)))
      }
    }
  }

  private def writeLongFile(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      name: String,
      v: Long): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readLongFile(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      name: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim.toLong)
      finally in.close()
    }
  }

  private[streaming] def writeMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      batchId: Long): Unit =
    writeLongFile(fs, dir, markerFile, batchId)

  private[streaming] def writeFootprint(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      n: Long): Unit =
    writeLongFile(fs, dir, footprintFile, n)

  /** The live cell's member count: the manifest if present (no Spark
    * job), else one parquet count over the cell's vecs (a store written
    * before the manifest existed). */
  private[graft] def cellFootprint(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      current: org.apache.hadoop.fs.Path): Long =
    readLongFile(fs, current, footprintFile)
      .getOrElse(spark.read.parquet(s"$current/vecs").count())

  /** The batch id committed in this cell's live store, or Long.MinValue
    * if the marker is absent (a pre-CDC seed without one). */
  private[graft] def appliedBatch(
      fs: org.apache.hadoop.fs.FileSystem,
      current: org.apache.hadoop.fs.Path): Long = {
    val p = new org.apache.hadoop.fs.Path(current, markerFile)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .trim.toLong
      finally in.close()
    }
  }

  private[streaming] def emptyGraph(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("q_id", LongType), StructField("n_id", LongType),
        StructField("d2", LongType), StructField("rank", IntegerType))))
  }

  /** Seed the sharded store: one NN-Descent subgraph + member-vector map
    * per cell, each committed as its own swappable (graph, vecs) pair
    * with marker batch −1. `assigned` is (idCol, vecCol, cell) — the
    * [[graft.operators.Similarity.ivfAssign]] assignment of the base
    * corpus. No-op per cell if a committed store exists. */
  def initShardedStore(
      spark: SparkSession,
      storeDir: String,
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      graphK: Int,
      graphRounds: Int,
      initBuckets: Int): Unit = {
    require(nCells >= 1)
    val a = assigned.localCheckpoint()
    // per-cell seeds are independent stores under distinct dirs —
    // overlapped (guide §2.6), per-cell content unchanged
    graft.core.Par.exec((0L until nCells.toLong).map(c => () => {
      val dir = cellDir(storeDir, c)
      val (fs, current) = DocStreams.recoverStore(spark, dir)
      if (!fs.exists(current)) {
        val members = a.filter(col("cell") === c).select(col(idCol), col(vecCol))
        val n = members.count()
        val g =
          if (n == 0L) emptyGraph(spark)
          else graft.operators.Similarity.nnDescent(
            members, idCol, vecCol, graphK, graphRounds, initBuckets)
        val next = new org.apache.hadoop.fs.Path(s"$dir/next_init")
        graft.core.Par.exec(Seq(
          () => g.write.mode("overwrite").parquet(s"$next/graph"),
          () => members.write.mode("overwrite").parquet(s"$next/vecs")))
        writeMarker(fs, next, -1L)
        writeFootprint(fs, next, n)
        DocStreams.swapStore(fs, dir, next, batchId = -1L)
      }
    }))
  }

  /** Read the live sharded store restricted to `cells` — the graphs of
    * exactly those cells' stores, `cell` re-attached as a column.
    * Reads are PATH-scoped: only the named cells' directories are ever
    * opened (stronger than partition pruning — untouched cells don't
    * even reach the file index). */
  def shardedStoreGraph(
      spark: SparkSession,
      storeDir: String,
      cells: Seq[Long]): DataFrame =
    cells.map { c =>
      spark.read.parquet(s"${cellDir(storeDir, c)}/current/graph")
        .withColumn("cell", lit(c))
    }.reduce(_ unionByName _)

  /** Member vectors of `cells`' live stores, `cell` attached. */
  def shardedStoreVecs(
      spark: SparkSession,
      storeDir: String,
      cells: Seq[Long]): DataFrame =
    cells.map { c =>
      spark.read.parquet(s"${cellDir(storeDir, c)}/current/vecs")
        .withColumn("cell", lit(c))
    }.reduce(_ unionByName _)

  /** Drain a CDC stream (`op` STRING ∈ upsert|delete, `idCol`, `vecCol`)
    * into the SHARDED store. Per micro-batch, per TOUCHED cell:
    * delete/replace tombstoning, threshold-gated repair, HNSW-pattern
    * insert, with the [[start]] rebuild-fraction guard applied PER CELL
    * (a batch can swamp one small cell while being a rounding error for
    * the rest — the guard must see the cell-local ratio). Entry points
    * for the per-cell searches are the cell's `entriesPerCell` lowest
    * surviving ids — the [[graft.operators.AnnIndex.cellEntryPoints]]
    * serving discipline, so maintenance and serving walk in from the
    * same nodes. */
  def startSharded(
      cdc: DataFrame,
      storeDir: String,
      checkpointDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      entriesPerCell: Int,
      beam: Int,
      searchRounds: Int,
      repairThreshold: Long,
      rebuildFraction: Double = 0.25,
      rebuildRounds: Int = 4,
      rebuildBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeShardedCdcBatch(batch, batchId, storeDir, cents, idCol, vecCol,
          k, entriesPerCell, beam, searchRounds, repairThreshold,
          rebuildFraction, rebuildRounds, rebuildBuckets)
      }
      .start()

  /** REBALANCE the sharded store — the operation the per-cell growth
    * report ([[graft.operators.AnnIndex.shardGrowthReport]]) recommends,
    * closing the sharded lifecycle loop (seed → CDC → report →
    * rebalance): CDC drift makes cells grow apart, and this maintenance
    * job re-quantizes exactly the cells whose share left the
    * [mergePpm, splitPpm] band, touching nothing else.
    *
    *  - SPLIT (share > splitPpm, ≥ 2 members): the cell re-quantizes
    *    into two — sub-centroid A is its lowest member id's vector,
    *    sub-centroid B the member LEAST cosine-similar to A (the
    *    2-point k-center seed; ties to the lower id), members reassigned
    *    by the [[graft.operators.Similarity.ivfAssign]] rule (rounded
    *    cosine, ties to the lower cell id). The lo half keeps the cell
    *    id; the hi half gets the next unused id (max cent_id + 1, in
    *    split-cell order).
    *  - MERGE (share < mergePpm): the cell folds into its most
    *    cosine-similar sibling among the cells doing neither (ties to
    *    the lower id); its own store is emptied (tombstoned) and its
    *    centroid dropped from the returned quantizer, so routing never
    *    probes it again.
    *  - Every cell whose membership changed gets a fresh cell-local
    *    NN-Descent subgraph (membership changes invalidate a subgraph
    *    the way the rebuild-fraction guard says batch inserts do);
    *    every other cell's store is neither read nor rewritten beyond
    *    its swap-time footprint manifest (the member count).
    *
    * Commit is TWO-PHASE over the write-aside swap: every affected
    * cell's `next_` pair is fully written before the first swap (a
    * merge target's union must read its source's pre-rebalance vecs
    * even when the source empties in the same rebalance, and a crash
    * in phase 1 leaves every live store untouched), then each cell
    * swaps atomically — at every instant a complete store exists under
    * `current`/`prev_*`, with superseded prevs pruned once the swap
    * commits (the sketch stores' protocol). CDC markers are
    * preserved — split halves inherit the split cell's applied-batch
    * marker, a merge target the max of its own and its source's.
    * Returns (report, newCents): the report is
    * one row per post-rebalance cell — (cell, n_members, action ∈
    * kept | split_lo | split_hi | merge_target | merged_away) — and
    * `newCents` is the updated (cent_id, cent_vec) quantizer serving
    * and CDC route by from now on.
    *
    * Scale shape: decisions derive from the per-cell footprint
    * manifests (driver file reads, zero jobs) and the
    * bounded centroid matrix (both ≤ nCells driver rows); data moves
    * only through the affected cells' keyed reassignment and their
    * cell-local rebuilds. */
  def rebalanceShardedStore(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      graphRounds: Int,
      initBuckets: Int,
      splitPpm: Long,
      mergePpm: Long,
      rebalanceId: Long): (DataFrame, DataFrame) = {
    def buildGraph(members: DataFrame): DataFrame =
      if (members.isEmpty) emptyGraph(spark)
      else graft.operators.Similarity.nnDescent(
        members, idCol, vecCol, k, graphRounds, initBuckets)
    rebalanceCore(spark, storeDir, cents, idCol, vecCol,
      splitPpm, mergePpm, rebalanceId) { (next, members) =>
      // the graph build+write and the member write are independent
      graft.core.Par.exec(Seq(
        () => buildGraph(members).write.mode("overwrite")
          .parquet(s"$next/graph"),
        () => members.write.mode("overwrite").parquet(s"$next/vecs")))
    }
  }

  /** The rebalance DECISION + two-phase-commit core shared by the flat
    * sharded store (above) and the sharded-LAYERED store
    * ([[ShardedLayeredCdc.rebalanceShardedLayeredStore]]): share-band
    * classification off the footprint manifests, sub-centroid picks,
    * member reassignment, merge-target argmax, marker/footprint
    * inheritance, the staged `next_` writes and the phase-2 swaps —
    * everything except WHAT a cell's staged artifact contains. `stage`
    * writes an affected cell's data parts from its post-rebalance
    * member set into the given `next_` dir (the core then writes the
    * inherited marker + footprint and swaps); membership can be empty
    * (a merged-away cell) and the callback must write a complete,
    * typed, servable store either way. */
  private[streaming] def rebalanceCore(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      splitPpm: Long,
      mergePpm: Long,
      rebalanceId: Long)(
      stage: (org.apache.hadoop.fs.Path, DataFrame) => Unit): (DataFrame, DataFrame) = {
    require(splitPpm > mergePpm && mergePpm >= 0)
    import graft.functions.Functions.cosineSim
    val centArr: Array[(Long, Seq[Float])] = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    require(centArr.nonEmpty, "rebalance requires a non-empty quantizer")
    val cells = centArr.map(_._1)
    def current(c: Long): org.apache.hadoop.fs.Path = {
      val (fs, cur) = DocStreams.recoverStore(spark, cellDir(storeDir, c))
      require(fs.exists(cur),
        s"sharded index store $storeDir has no committed cell $c")
      cur
    }
    val curPaths = cells.map(c => c -> current(c)).toMap
    val manifestFs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-cell member counts: the swap-time manifest — nCells driver
    // file reads, ZERO Spark jobs (parquet fallback only for stores
    // written before the manifest existed); untouched cells' DATA is
    // never opened by this job
    val counts: Map[Long, Long] =
      cells.map(c => c -> cellFootprint(spark, manifestFs, curPaths(c))).toMap
    val total = math.max(counts.values.sum, 1L)
    def share(c: Long): Long = counts(c) * 1000000L / total
    val splits = cells.filter(c => share(c) > splitPpm && counts(c) >= 2)
    val merges = cells.filter(c => share(c) < mergePpm)
    val pool = cells.filterNot(c => splits.contains(c) || merges.contains(c))
    require(merges.isEmpty || pool.nonEmpty,
      "every cell is splitting or merging — no merge target exists; " +
        "widen the [mergePpm, splitPpm] band")
    // merge targets: most-similar pool centroid, rounded cosine, tie to
    // the lower id — a bounded (|merges| × |pool|) driver artifact
    val centDf = cents.localCheckpoint()
    val targetOf: Map[Long, Long] = if (merges.isEmpty) Map.empty else
      centDf.filter(col("cent_id").isInCollection(merges))
        .select(col("cent_id").as("m_id"), col("cent_vec").as("m_vec"))
        .crossJoin(centDf.filter(col("cent_id").isInCollection(pool))
          .select(col("cent_id").as("t_id"), col("cent_vec").as("t_vec")))
        .select(col("m_id"), col("t_id"),
          round(cosineSim(col("m_vec"), col("t_vec")), 6).as("c"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (m, rs) =>
          m -> rs.map(r => (r.getLong(1), r.getDouble(2)))
            .minBy { case (t, c) => (-c, t) }._1
        }
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two-phase commit: ALL next_ dirs are fully written (phase 1)
    // before the first swap (phase 2) — a merge target's union must
    // read its source's pre-rebalance vecs even when the source's own
    // store swaps in the same rebalance (lazy reads + an eager swap
    // would otherwise see the emptied source), and a crash in phase 1
    // leaves every live store untouched.
    // Phase 1 is DEFERRED-then-OVERLAPPED (guide §2.6): the decision
    // loop below stays sequential (split ids must assign
    // deterministically in cell order), but each affected cell's
    // staging action — member reads/reassignment, stack build, part
    // writes, marker + footprint — touches only that cell's own next_
    // dir, so the actions are mutually independent and run on a small
    // pool. Report/centroid CONTENT is computed exactly as before
    // (both outputs are ordered by cell/cent_id on return, so
    // accumulation order never mattered).
    def stageOne(c: Long, members: DataFrame, marker: Long,
        nVecs: Long): (Long, org.apache.hadoop.fs.Path) = {
      val next = new org.apache.hadoop.fs.Path(
        s"${cellDir(storeDir, c)}/next_rebalance_$rebalanceId")
      stage(next, members)
      writeMarker(fs, next, marker)
      writeFootprint(fs, next, nVecs)
      (c, next)
    }
    // each staging thunk returns (swaps, report rows, new centroids)
    type StageOut = (Seq[(Long, org.apache.hadoop.fs.Path)],
      Seq[(Long, Long, String)], Seq[(Long, Seq[Float])])
    val thunks = scala.collection.mutable.ArrayBuffer.empty[() => StageOut]
    val report = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val newCents = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var nextId = cells.max + 1
    val mergedInto: Map[Long, Seq[Long]] =
      targetOf.toSeq.groupBy(_._2).map { case (t, ms) => t -> ms.map(_._1).sorted }
    for ((c, cvec) <- centArr) {
      if (splits.contains(c)) {
        val hiId = nextId
        nextId += 1
        thunks += (() => {
          val members = spark.read.parquet(s"${curPaths(c)}/vecs").localCheckpoint()
          val a = members.orderBy(col(idCol)).limit(1)
            .select(col(vecCol)).collect()(0).getSeq[Float](0)
          val b = members
            .select(col(idCol), col(vecCol),
              round(cosineSim(col(vecCol), lit(a.toArray)), 6).as("c"))
            .orderBy(col("c").asc, col(idCol).asc).limit(1)
            .select(col(vecCol)).collect()(0).getSeq[Float](0)
          val subCents = graft.operators.Similarity.ivfCentroids(
            spark.createDataFrame(java.util.List.of(
                org.apache.spark.sql.Row(c, a), org.apache.spark.sql.Row(hiId, b)),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("cent_id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("cent_vec",
                  org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.FloatType))))),
            "cent_id", "cent_vec", Seq(c, hiId))
          val reassigned = graft.operators.Similarity
            .ivfAssign(members, idCol, vecCol, subCents).localCheckpoint()
          val lo = reassigned.filter(col("cell") === c).select(col(idCol), col(vecCol))
          val hiM = reassigned.filter(col("cell") === hiId).select(col(idCol), col(vecCol))
          val marker = appliedBatch(fs, curPaths(c))
          val loN = lo.count()
          // the two halves' stage writes are themselves independent
          val swaps = graft.core.Par.run(Seq(
            () => stageOne(c, lo, marker, loN),
            () => stageOne(hiId, hiM, marker, counts(c) - loN)))
          (swaps,
            Seq((c, loN, "split_lo"), (hiId, counts(c) - loN, "split_hi")),
            Seq((c, a), (hiId, b)))
        })
      } else if (merges.contains(c)) {
        thunks += (() => {
          val marker = appliedBatch(fs, curPaths(c))
          val swap = stageOne(c,
            spark.read.parquet(s"${curPaths(c)}/vecs").limit(0)
              .select(col(idCol), col(vecCol)), marker, 0L)
          (Seq(swap), Seq((c, 0L, "merged_away")), Seq.empty)
        })
      } else if (mergedInto.contains(c)) {
        thunks += (() => {
          val sources = mergedInto(c)
          val union = (c +: sources)
            .map(x => spark.read.parquet(s"${curPaths(x)}/vecs"))
            .reduce(_ unionByName _)
          val marker = (c +: sources).map(x => appliedBatch(fs, curPaths(x))).max
          val n = counts(c) + sources.map(counts).sum
          val swap = stageOne(c, union, marker, n)
          (Seq(swap), Seq((c, n, "merge_target")), Seq((c, cvec)))
        })
      } else {
        // untouched: neither read (beyond the footprint manifest) nor
        // rewritten
        report += ((c, counts(c), "kept"))
        newCents += ((c, cvec))
      }
    }
    val staged = graft.core.Par.run(thunks.toSeq)
    val pendingSwaps = staged.flatMap(_._1)
    staged.foreach { case (_, rows, cs) => report ++= rows; newCents ++= cs }
    // phase 2: every next_ dir is complete — swap them in
    for ((c, next) <- pendingSwaps)
      DocStreams.swapStore(fs, cellDir(storeDir, c), next, rebalanceId)
    import spark.implicits._
    val reportDf = report.toSeq.toDF("cell", "n_members", "action")
    val centsDf = newCents.toSeq.toDF("cent_id", "cent_vec")
      .select(col("cent_id"), col("cent_vec").cast("array<float>").as("cent_vec"))
    (reportDf.orderBy(col("cell")), centsDf.orderBy(col("cent_id")))
  }

  /** Post-CDC MAINTENANCE WINDOW for the sharded store — the composition
    * of [[startSharded]] (drift in) and [[rebalanceShardedStore]] (drift
    * out), run the way production actually sequences them: the CDC
    * stream drains continuously, and a periodic maintenance job reads
    * the drifted per-cell footprints ([[graft.operators.AnnIndex
    * .shardGrowthReport]]'s share rule over the LIVE stores' swap-time
    * footprint manifests — driver file reads, zero Spark jobs) and rebalances only if some cell left the
    * [mergePpm, splitPpm] band — otherwise it touches nothing and
    * reports every cell "kept". Returns the [[rebalanceShardedStore]]
    * report either way (the no-op case synthesized from the manifest
    * counts alone), so the operator's readout is identical whether or
    * not the window fired. */
  def maintenanceWindow(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      graphRounds: Int,
      initBuckets: Int,
      splitPpm: Long,
      mergePpm: Long,
      rebalanceId: Long): (DataFrame, DataFrame) =
    maintenanceCore(spark, storeDir, cents, splitPpm, mergePpm)(
      rebalanceShardedStore(spark, storeDir, cents, idCol, vecCol,
        k, graphRounds, initBuckets, splitPpm, mergePpm, rebalanceId))

  /** The maintenance-window GATE shared by the flat and layered sharded
    * stores: read the drifted per-cell footprints off the swap-time
    * manifests (nCells driver file reads, ZERO Spark jobs per window;
    * parquet-count fallback only for pre-manifest stores), fire the
    * given by-name `rebalance` only if some cell left the [mergePpm,
    * splitPpm] band, and synthesize the all-"kept" report from the
    * manifest counts alone otherwise — the readout is identical
    * whether or not the window fired. */
  private[streaming] def maintenanceCore(
      spark: SparkSession,
      storeDir: String,
      cents: DataFrame,
      splitPpm: Long,
      mergePpm: Long)(
      rebalance: => (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val cells = cents.select(col("cent_id")).collect().map(_.getLong(0)).sorted
    val counts = cells.map { c =>
      val (fs, cur) = DocStreams.recoverStore(spark, cellDir(storeDir, c))
      require(fs.exists(cur),
        s"sharded index store $storeDir has no committed cell $c")
      c -> cellFootprint(spark, fs, cur)
    }.toMap
    val total = math.max(counts.values.sum, 1L)
    val out = cells.exists { c =>
      val share = counts(c) * 1000000L / total
      share > splitPpm && counts(c) >= 2 || share < mergePpm
    }
    if (out) rebalance
    else {
      import spark.implicits._
      (cells.map(c => (c, counts(c), "kept")).toSeq
        .toDF("cell", "n_members", "action").orderBy(col("cell")),
        cents.orderBy(col("cent_id")))
    }
  }

  /** Apply one CDC batch to the sharded store — CELL-KEYED: the
    * delete → threshold-repair → insert compute for EVERY touched cell
    * runs as one keyed plan (`cell` rides the tombstone semi-joins, the
    * entry-point window, the queue-depth aggregate, and the beam
    * searches — the [[graft.operators.AnnIndex.shardedSearchWithEntries]]
    * serving precedent), so Spark jobs per batch no longer grow with
    * the touched-cell count: a batch touching five hundred cells plans
    * the same fixed statement as one touching four. Per-cell work
    * survives only where it is inherently per-cell — the replay-skip
    * marker reads, the guard-EXCEPTION rebuilds (a cell the batch
    * drains or swamps gets its own NN-Descent, bounded by the guard),
    * and the crash-safe swap+marker loop, whose Spark side is one
    * partitioned stage write (two jobs total) that each cell's
    * `next_` dir is then assembled from by pure file renames.
    *
    * Semantics are bit-identical to applying the single-store
    * [[mergeCdcBatch]] lifecycle per cell in ascending cell order:
    * ids are unique across cells and edges intra-cell, so the keyed
    * joins and windows decompose exactly into the per-cell ones, and
    * a beam search seeded inside a cell can only walk that cell's
    * subgraph (connectivity confines it — the same argument
    * [[graft.operators.Similarity.keyedGraphSearchTopK]] makes). */
  private[graft] def mergeShardedCdcBatch(
      batch: DataFrame,
      batchId: Long,
      storeDir: String,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      entriesPerCell: Int,
      beam: Int,
      searchRounds: Int,
      repairThreshold: Long,
      rebuildFraction: Double = 0.25,
      rebuildRounds: Int = 4,
      rebuildBuckets: Int = 16): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // route every op by its carried image (after for upserts, before for
    // deletes) — one zero-shuffle expression, no store read
    val routed = batch
      .select(col("op"), col(idCol), col(vecCol),
        graft.operators.Similarity.ivfCellColumn(col(vecCol), cents)
          .cast("long").as("cell"))
      .localCheckpoint()
    // the batch's cell footprint: the ONLY corpus-derived driver
    // artifact, bounded by nCells — and the bound on everything below
    // (untouched cells are never opened)
    val touched = routed.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    // replay skip: a crash between two cells' swaps re-runs the batch;
    // cells that already committed it must not apply it twice (the
    // reverse-patch re-cut is not idempotent). Marker + footprint reads
    // are driver-side file reads — no jobs.
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val curByCell: Map[Long, org.apache.hadoop.fs.Path] = touched.map { c =>
      val (_, current) = DocStreams.recoverStore(spark, cellDir(storeDir, c))
      require(fs.exists(current),
        s"sharded index store $storeDir has no committed cell $c " +
          "(initShardedStore must seed every quantizer cell before CDC)")
      c -> current
    }.toMap
    val applySet = touched.filter(c => appliedBatch(fs, curByCell(c)) < batchId)
    if (applySet.isEmpty) return
    val inCells = (cs: Seq[Long]) => col("cell")
      .isInCollection(cs.map(java.lang.Long.valueOf))
    // ONE keyed read of the apply-set cells' stores — committed and
    // untouched cells' files are never opened
    val vecs = shardedStoreVecs(spark, storeDir, applySet)
    val b = routed.filter(inCells(applySet))
    val ups = b.filter(col("op") === "upsert")
      .select(col("cell"), col(idCol), col(vecCol)).localCheckpoint()
    // upsert replaces: drop existing state for upserted ids too (keyed
    // by the cell each op ROUTED to — the Debezium image discipline)
    val removed = b.select(col("cell"), col(idCol)).distinct()
    val remaining = vecs
      .join(removed, Seq("cell", idCol), "left_anti")
      .select(col("cell"), col(idCol), col(vecCol)).localCheckpoint()
    // per-cell stats: TWO grouped aggregates (not 3 counts × cells);
    // pre-batch footprints come from the swap-time manifests (no jobs)
    def cellCounts(df: DataFrame): Map[Long, Long] = df.groupBy(col("cell"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRem = cellCounts(remaining).withDefaultValue(0L)
    val nUps = cellCounts(ups).withDefaultValue(0L)
    val nPrev = applySet.map(c =>
      c -> cellFootprint(spark, fs, curByCell(c))).toMap
    // guard classification, per cell (the cell-LOCAL ratio — a batch
    // can swamp one small cell while being a rounding error elsewhere)
    val drained = applySet.filter(c => nRem(c) == 0L)
    val rebuilds = applySet.filter(c => nRem(c) > 0L && nUps(c) > 0L &&
      nUps(c).toDouble > rebuildFraction * nRem(c))
    val incr = applySet.filterNot(c =>
      drained.contains(c) || rebuilds.contains(c))
    // ---- incremental cells: one cell-keyed pipeline ----------------
    val incrOut: Option[DataFrame] = if (incr.isEmpty) None else {
      val rem = remaining.filter(inCells(incr))
      val remIds = rem.select(col("cell"), col(idCol).as("id"))
      // keyed tombstone: both endpoints survive, cell-keyed semi-joins
      var g = shardedStoreGraph(spark, storeDir, incr)
        .join(remIds.select(col("cell"), col("id").as("q_id")),
          Seq("cell", "q_id"), "left_semi")
        .join(remIds.select(col("cell"), col("id").as("n_id")),
          Seq("cell", "n_id"), "left_semi")
        .select(col("cell"), col("q_id"), col("n_id"), col("d2"))
        .localCheckpoint()
      // per-cell entry points: ONE windowed table over the survivors
      // (the cellEntryPoints discipline), not a collect per cell
      val entries = graft.operators.AnnIndex.cellEntryPoints(
        rem.select(col("cell"), col(idCol)), idCol, entriesPerCell)
        .localCheckpoint()
      // id → cell map (each id lives in exactly one cell — the routing
      // invariant): re-attaches cell to the AnnIndex helpers' output
      val cellOf = remIds.unionByName(
        ups.filter(inCells(incr)).select(col("cell"), col(idCol).as("id")))
      def attachCell(df: DataFrame): DataFrame = df
        .select(col("q_id"), col("n_id"), col("d2"))
        .join(cellOf.select(col("cell"), col("id").as("q_id")), Seq("q_id"))
        .select(col("cell"), col("q_id"), col("n_id"), col("d2"))
      // entry seeds for a (cell-tagged) query set: each query walks in
      // from ITS cell's entry points — seeded search over the union
      // graph equals the per-cell fixed-entry search because edges are
      // intra-cell (connectivity confines each query to its own cell)
      def entrySeeds(queries: DataFrame): DataFrame = queries
        .join(entries, Seq("cell"))
        .select(col("id").as("q_id"), col("n_id"))
      // repair gate: ONE grouped queue-depth aggregate over the
      // tombstoned graph, gated per cell — only cells the batch
      // actually deleted from can have repair debt
      val delCells = incr.filter(c => nPrev(c) - nRem(c) > 0L)
      val repairCells: Seq[Long] =
        if (delCells.isEmpty) Seq.empty
        else {
          val deg = g.groupBy(col("cell"), col("q_id").as("id"))
            .agg(count(lit(1)).as("n"))
          val qd = remIds.join(deg, Seq("cell", "id"), "left")
            .filter(coalesce(col("n"), lit(0L)) < k)
            .groupBy(col("cell")).agg(count(lit(1)).as("qd")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          delCells.filter(c => qd.getOrElse(c, 0L) >= repairThreshold)
        }
      if (repairCells.nonEmpty) {
        val gRep = g.filter(inCells(repairCells))
        val remRep = rem.filter(inCells(repairCells))
        val repaired = graft.operators.AnnIndex.repairGraphSeeded(
          gRep.select(col("q_id"), col("n_id"), col("d2")),
          remRep.select(col(idCol), col(vecCol)), idCol, vecCol, k,
          queries => entrySeeds(queries.select(col(idCol))
            .join(cellOf.withColumnRenamed("id", idCol), Seq(idCol))
            .select(col("cell"), col(idCol).as("id"))),
          beam, searchRounds)
        g = g.filter(!inCells(repairCells)).unionByName(attachCell(repaired))
      }
      val insCells = incr.filter(c => nUps(c) > 0L)
      if (insCells.nonEmpty) {
        val gIns = g.filter(inCells(insCells))
        val upsIns = ups.filter(inCells(insCells))
        val inserted = graft.operators.AnnIndex.insertBatchSeeded(
          gIns.select(col("q_id"), col("n_id"), col("d2")),
          rem.filter(inCells(insCells)).select(col(idCol), col(vecCol)),
          upsIns.select(col(idCol), col(vecCol)), idCol, vecCol, k,
          entrySeeds(upsIns.select(col("cell"), col(idCol).as("id"))),
          beam, searchRounds)
        g = g.filter(!inCells(insCells)).unionByName(attachCell(inserted))
      }
      Some(g)
    }
    // ---- guard-exception cells: per-cell NN-Descent (bounded by the
    // cells the batch drains or swamps, not the touched-cell count);
    // the per-cell builds are mutually independent — overlapped
    // (guide §2.6), results folded in the same deterministic order ----
    val built: Seq[DataFrame] = graft.core.Par.run(
      (drained ++ rebuilds).map(c => () => {
        val upsC = ups.filter(col("cell") === c).select(col(idCol), col(vecCol))
        val remC = remaining.filter(col("cell") === c)
          .select(col(idCol), col(vecCol))
        val g =
          if (nRem(c) == 0L && nUps(c) == 0L) emptyGraph(spark)
          else if (nRem(c) == 0L)
            // fully drained: nothing to repair or link against
            graft.operators.Similarity.nnDescent(
              upsC, idCol, vecCol, k, rebuildRounds, rebuildBuckets)
          else
            // swamped: the insert approximation's blind spot (new→new
            // edges can never exist) is closed by a full rebuild
            graft.operators.Similarity.nnDescent(
              remC.unionByName(upsC), idCol, vecCol,
              k, rebuildRounds, rebuildBuckets)
        g.select(col("q_id"), col("n_id"), col("d2")).withColumn("cell", lit(c))
      }))
    // canonical stored shape: rank = position in the node's list; the
    // (cell, q_id)-keyed fused aggregate decomposes into the per-cell
    // per-node re-cuts (lists are ≤ k rows, cells disjoint — no sort)
    val outGraph = graft.operators.Similarity.topNAgg(
      (incrOut.toSeq ++ built)
        .map(_.select(col("cell"), col("q_id"), col("n_id"), col("d2")))
        .reduce(_ unionByName _),
      Seq("cell", "q_id"), "d2", "n_id", k, rank = true)
    val outVecs = remaining.unionByName(ups)
    // ONE partitioned stage write per table (two jobs, not two × cells),
    // then each cell's next_ dir is assembled by pure file renames and
    // committed through the crash-safe write-aside swap
    val stage = new org.apache.hadoop.fs.Path(s"$storeDir/stage_$batchId")
    if (fs.exists(stage)) fs.delete(stage, true) // a replayed batch's leftover
    // the two partitioned stage writes are independent — overlapped
    graft.core.Par.exec(Seq(
      () => outGraph.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$stage/graph"),
      () => outVecs.select(col("cell"), col(idCol), col(vecCol))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$stage/vecs")))
    for (c <- applySet) {
      val next = new org.apache.hadoop.fs.Path(
        s"${cellDir(storeDir, c)}/next_$batchId")
      if (fs.exists(next)) fs.delete(next, true)
      fs.mkdirs(next)
      for (part <- Seq("graph", "vecs")) {
        val src = new org.apache.hadoop.fs.Path(s"$stage/$part/cell=$c")
        val dst = new org.apache.hadoop.fs.Path(next, part)
        if (fs.exists(src)) fs.rename(src, dst)
        else {
          // a partition with zero rows writes no stage subdir (a cell
          // drained to nothing, or a lone survivor with no edges):
          // materialize the typed empty table
          val empty =
            if (part == "graph") emptyGraph(spark)
            else vecs.limit(0).select(col(idCol), col(vecCol))
          empty.write.mode("overwrite").parquet(dst.toString)
        }
      }
      writeMarker(fs, next, batchId)
      writeFootprint(fs, next, nRem(c) + nUps(c))
      DocStreams.swapStore(fs, cellDir(storeDir, c), next, batchId)
    }
    fs.delete(stage, true)
  }
}
