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
    val nRemoved = vecs.count() - remaining.count()
    val nUpserts = ups.count()
    val nRemaining = remaining.count()
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
    // lists have gaps after a delete-only batch; re-rank is one keyed
    // window over the k·n edge table)
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("d2").asc, col("n_id"))
    val outGraph = g.select(col("q_id"), col("n_id"), col("d2"))
      .withColumn("rank", row_number().over(wTop))
    val outVecs = remaining.unionByName(ups)
    // write-then-swap: a crash mid-write must not destroy the only copy
    val next = new org.apache.hadoop.fs.Path(s"$storeDir/next_$batchId")
    outGraph.write.mode("overwrite").parquet(s"$next/graph")
    outVecs.write.mode("overwrite").parquet(s"$next/vecs")
    DocStreams.swapStore(fs, storeDir, next, batchId)
  }
}
