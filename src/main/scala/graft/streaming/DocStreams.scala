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

  private[streaming] def mergeCountMinBatch(
      batch: DataFrame,
      batchId: Long,
      sketchStoreDir: String,
      depth: Int,
      width: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val delta = TextAnalysis.countMinSketch(batch, "doc_id", "text", depth, width)
    val p = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/current")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(p))
        spark.read.parquet(p.toString).unionByName(delta)
          .groupBy(col("r"), col("cell")).agg(sum(col("cnt")).as("cnt"))
      else delta
    // write-then-swap: a crash mid-write must not destroy the only copy
    val next = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/next_$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(next, p)
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
    * only and does not share that guarantee.) */
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
    val store = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/current")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(store))
        spark.read.parquet(store.toString).unionByName(delta)
          .groupBy(col("bucket"))
          .agg(max(col("max_rho")).as("max_rho"),
            sum(col("n_hashed")).as("n_hashed"))
      else delta
    val next = new org.apache.hadoop.fs.Path(s"$sketchStoreDir/next_$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    if (fs.exists(store)) fs.delete(store, true)
    fs.rename(next, store)
  }
}
