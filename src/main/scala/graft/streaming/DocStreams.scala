package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Streaming document-pipeline stages. The per-document scoring
  * operators (quality classifier, PII redaction, language ID, …) are
  * pure column expressions, so they run UNCHANGED on a stream — same
  * code, same plan fragment, no state store. That is the deployment
  * story for a live ingest feed: the batch-validated gates apply to the
  * stream without a reimplementation, and their verdicts stay
  * bit-identical to the batch oracle because nothing depends on
  * micro-batch boundaries.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Quality gate on a document stream: keep documents whose classifier
    * logit clears 0, carrying the logit for downstream routing. */
  def qualityGate(
      docs: DataFrame,
      weights: Seq[(String, Double)],
      intercept: Double): DataFrame =
    TextAnalysis.qualityClassifier(docs, "doc_id", "text", weights, intercept)
      .filter(col("keep"))

  /** Drain helper mirroring [[EventStreams.runToMemory]] for document
    * directories. */
  def runToMemory(
      spark: SparkSession,
      dir: String,
      transform: DataFrame => DataFrame,
      queryName: String): DataFrame =
    EventStreams.drainToTable(spark, transform(readStream(spark, dir)), queryName)

  /** Streaming Count-Min maintenance: each micro-batch's sketch is ADDED
    * cell-wise into a parquet store — CM sketches are linear, so the
    * running store equals the batch sketch of everything seen, exactly
    * (no approximation is introduced by splitting the stream; the only
    * error is the sketch's own collision mass). The store is rewritten
    * per batch, but it is `depth × width` rows however much data has
    * flowed — rewriting ~1k rows per batch is the cheapest possible
    * "update", and any engine can read the store directly. Heavy-hitter
    * monitoring over a live feed without ever shuffling the corpus. */
  def startCountMin(
      docs: DataFrame,
      sketchStoreDir: String,
      checkpointDir: String,
      depth: Int = 4,
      width: Int = 256): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCountMinBatch(batch, batchId, sketchStoreDir, depth, width)
      }
      .start()

  private[graft] def mergeCountMinBatch(
      batch: DataFrame,
      batchId: Long,
      sketchStoreDir: String,
      depth: Int,
      width: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val delta = TextAnalysis.countMinSketch(batch, "doc_id", "text", depth, width)
    val (fs, current) = recoverStore(spark, sketchStoreDir)
    val merged =
      if (fs.exists(current))
        spark.read.parquet(current.toString).unionByName(delta)
          .groupBy(col("r"), col("cell")).agg(sum(col("cnt")).as("cnt"))
      else delta
    // write-then-swap: a crash mid-write must not destroy the only copy
    val next = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/next_$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    swapStore(fs, sketchStoreDir, next, batchId)
  }

  /** Crash-safe store read: the swap protocol below renames the live
    * store ASIDE (`prev_<batchId>`) before promoting the new one, so at
    * every instant a complete copy exists under exactly one of
    * `current` / `prev_*`. If `current` is missing (a crash landed
    * between the two renames), the newest `prev_` IS the pre-batch
    * store — promote it back and proceed; the checkpointed batch then
    * replays against it, which the callers' merge semantics absorb
    * (HLL register max is idempotent; Count-Min re-adds a delta that
    * never committed). Returns the filesystem and the `current` path
    * (which may still not exist on the very first batch). */
  private[streaming] def recoverStore(
      spark: SparkSession,
      storeDir: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val current = new org.apache.hadoop.fs.Path(s"$storeDir/current")
    val fs = current.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(current)) {
      val prevs = listPrev(fs, storeDir)
      if (prevs.nonEmpty) {
        val newest = prevs.maxBy(p => p.getName.stripPrefix("prev_").toLong)
        fs.rename(newest, current)
      }
    }
    (fs, current)
  }

  /** Promote `next` to `<storeDir>/current` with no window in which no
    * complete store exists: rename the old current aside
    * (`prev_<batchId>`), rename next into place, THEN delete every
    * superseded `prev_`. The former delete-then-rename swap had a crash
    * window (after the delete, before the rename) that silently dropped
    * all earlier registers on replay — [[recoverStore]] closes it from
    * the read side. */
  private[streaming] def swapStore(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: String,
      next: org.apache.hadoop.fs.Path,
      batchId: Long): Unit = {
    val current = new org.apache.hadoop.fs.Path(s"$storeDir/current")
    if (fs.exists(current)) {
      val prev = new org.apache.hadoop.fs.Path(s"$storeDir/prev_$batchId")
      if (fs.exists(prev)) fs.delete(prev, true) // a replayed batch's leftover
      fs.rename(current, prev)
    }
    fs.rename(next, current)
    listPrev(fs, storeDir).foreach(p => fs.delete(p, true))
  }

  private def listPrev(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: String): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("prev_") &&
        p.getName.stripPrefix("prev_").forall(_.isDigit))
  }

  /** Streaming HyperLogLog maintenance: each micro-batch's shingle
    * registers ([[TextAnalysis.hllRegisters]]) are MAX-merged cell-wise
    * into a parquet store — live distinct counting over an ingest feed
    * with a ≤2^p-row running summary. Where the Count-Min store relies
    * on linearity (adds — so a REPLAYED batch double-counts unless
    * delivery is exactly-once), register max is idempotent and
    * commutative: replaying or reordering batches cannot change
    * `max_rho`, so the distinct estimate is exact-sketch-correct under
    * at-least-once delivery too. (`n_hashed` is additive diagnostics
    * only and does not share that guarantee.) The store swap itself is
    * crash-safe: [[recoverStore]]/`swapStore` keep a complete copy under
    * `current` or `prev_*` at every instant, so a crash anywhere in the
    * merge replays the batch against the pre-batch registers rather
    * than an empty store. */
  def startHll(
      docs: DataFrame,
      sketchStoreDir: String,
      checkpointDir: String,
      p: Int = 6): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeHllBatch(batch, batchId, sketchStoreDir, p)
      }
      .start()

  /** Streaming KLL quantile maintenance — the third member of the
    * sketch-store triad (CMS: linear adds; HLL: idempotent max; KLL:
    * weighted re-ingest merge): each micro-batch's `n_chars` values are
    * folded into a parquet store holding the running sketch's (v, w)
    * items plus one meta row carrying the accumulated rank-error bound.
    * A KLL item re-ingests as an exact merge (weight decomposes into
    * set bits — see [[graft.functions.KllSketch]]), so after any number
    * of batches the store IS a valid sketch of everything seen, with
    * `err = Σ` per-merge compaction errors (the guarantee is additive —
    * Round10Spec pins the re-ingest equivalence). Replay semantics
    * match CMS, not HLL: an at-least-once REPLAYED batch re-adds its
    * rows and inflates `n`; the store itself stays crash-atomic via the
    * shared [[recoverStore]]/`swapStore` protocol. Store size is
    * k·levels items however much data has flowed. */
  def startKll(
      docs: DataFrame,
      sketchStoreDir: String,
      checkpointDir: String,
      k: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeKllBatch(batch, batchId, sketchStoreDir, k)
      }
      .start()

  private[graft] def mergeKllBatch(
      batch: DataFrame,
      batchId: Long,
      sketchStoreDir: String,
      k: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    import spark.implicits._
    val raw = batch.select(col("n_chars").cast("long").as("v"), lit(1L).as("w"))
    val (fs, current) = recoverStore(spark, sketchStoreDir)
    // prior err rides the meta row (w = 0, excluded from re-ingest);
    // the agg is one head() over a sketch-sized store — bounded
    val (input, priorErr) =
      if (fs.exists(current)) {
        val st = spark.read.parquet(current.toString)
        val pe = st.agg(coalesce(sum(col("err")), lit(0L))).head().getLong(0)
        (raw.unionByName(st.filter(col("w") > 0).select(col("v"), col("w"))), pe)
      } else (raw, 0L)
    // collect the one-row sketch ONCE (bounded: k·levels items). A
    // union referencing the uncached aggregate twice would execute the
    // nondeterministic-merge-order aggregation twice — the items rows
    // and the err meta row could then come from two different
    // compaction histories, and the stored err would no longer bound
    // the stored items' rank error.
    val skRow = input.agg(
        graft.functions.Functions.kllSketch(col("v"), col("w"), k).as("sk"))
      .select(col("sk.err_bound"), col("sk.items")).head()
    val items = skRow.getSeq[org.apache.spark.sql.Row](1)
      .map(it => (it.getLong(0), it.getLong(1), 0L))
    val merged = (items :+ ((0L, 0L, skRow.getLong(0) + priorErr)))
      .toDF("v", "w", "err")
    val next = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/next_$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    swapStore(fs, sketchStoreDir, next, batchId)
  }

  /** Streaming Theta/KMV maintenance — the fourth sketch-store member
    * (CMS: linear adds; HLL: idempotent max; KLL: weighted re-ingest;
    * Theta: idempotent k-smallest): each micro-batch's shingle KMV
    * sample is union-merged into a parquet store by EXACT KMV
    * composition (any of the k smallest of A∪B is in some side's k
    * smallest — [[graft.operators.ThetaSketch.union]]), so after any
    * number of batches the store IS the batch sketch of everything
    * seen, bit-identically. Like HLL register max — and unlike the
    * linear CMS add — min-k over a distinct union is idempotent and
    * commutative, so replayed or reordered batches cannot change the
    * sample: correct under at-least-once delivery. Store size is ≤ k
    * rows however much data has flowed; the swap is the shared
    * crash-safe [[recoverStore]]/`swapStore` protocol. */
  def startTheta(
      docs: DataFrame,
      sketchStoreDir: String,
      checkpointDir: String,
      k: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeThetaBatch(batch, batchId, sketchStoreDir, k)
      }
      .start()

  private[graft] def mergeThetaBatch(
      batch: DataFrame,
      batchId: Long,
      sketchStoreDir: String,
      k: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val delta = graft.operators.ThetaSketch.sketch(
      batch.select(explode(
        graft.functions.Functions.wordShingles(col("text"), 3)).as("g")),
      col("g"), k)
    val (fs, current) = recoverStore(spark, sketchStoreDir)
    val merged =
      if (fs.exists(current))
        graft.operators.ThetaSketch.union(
          spark.read.parquet(current.toString), delta, k)
      else delta
    val next = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/next_$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    swapStore(fs, sketchStoreDir, next, batchId)
  }

  private[graft] def mergeHllBatch(
      batch: DataFrame,
      batchId: Long,
      sketchStoreDir: String,
      p: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val delta = TextAnalysis.hllRegisters(
      batch.select(explode(
        graft.functions.Functions.wordShingles(col("text"), 3)).as("g")),
      col("g"), p)
    val (fs, store) = recoverStore(spark, sketchStoreDir)
    val merged =
      if (fs.exists(store))
        spark.read.parquet(store.toString).unionByName(delta)
          .groupBy(col("bucket"))
          .agg(max(col("max_rho")).as("max_rho"),
            sum(col("n_hashed")).as("n_hashed"))
      else delta
    val next = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/next_$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    swapStore(fs, sketchStoreDir, next, batchId)
  }
}
