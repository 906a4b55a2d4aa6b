package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Continuous-ingest near-duplicate detection: the streaming face of
  * [[graft.operators.Dedup.minhashLshIncremental]].
  *
  * Each micro-batch of documents is MinHash-signed ONCE; the batch is
  * band-joined against the persistent signature store (and itself) to
  * emit (new x corpus) and (new x new) near-dup pairs, then its
  * signatures are appended to the store. This is the daily/streaming
  * ingest shape at 100 TB: per batch the work is linear in the batch
  * plus the band-bucket collisions — the historical corpus is never
  * re-signed, and (corpus x corpus) pairs are never recomputed.
  *
  * State lives in plain parquet (signature store + pair log), not the
  * streaming state store: signatures must outlive any single query and
  * be readable by batch jobs (backfills, group resolution), and parquet
  * append is atomic-enough per micro-batch since `foreachBatch` runs
  * batches sequentially.
  */
object IngestDedup {

  /** Process one batch: emit near-dup pairs against the store + itself,
    * then record the batch's signatures. Both writes go to a
    * `batch_id=N` subdirectory with overwrite semantics, so an
    * at-least-once redelivery of the same micro-batch (crash between
    * writes and checkpoint commit) replaces its own output instead of
    * appending duplicates — the standard foreachBatch idempotence
    * pattern. Exposed for batch callers and tests; [[start]] wires it to
    * a stream. */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      sigStoreDir: String,
      pairLogDir: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): Unit = {
    if (batch.isEmpty) return
    val newSigs = Dedup
      .minhashSignatures(batch, idCol, textCol, shingleN, numHashes)
      .localCheckpoint()
    // only a genuinely-missing store reads as empty; a corrupt or
    // unreadable store must FAIL the batch (silently treating it as
    // empty would permanently drop every cross-batch pair of this batch)
    val storePath = new org.apache.hadoop.fs.Path(sigStoreDir)
    val storeExists = storePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(storePath)
    val corpusSigs =
      if (storeExists)
        spark.read.parquet(sigStoreDir)
          // this batch's own partition may exist from a failed prior
          // attempt — it must not count as corpus
          .where(col("batch_id") =!= batchId)
          .drop("batch_id")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], newSigs.schema)
    Dedup.minhashLshIncrementalFromSigs(newSigs, corpusSigs, numHashes, bands)
      .write.mode(SaveMode.Overwrite).parquet(s"$pairLogDir/batch_id=$batchId")
    newSigs.write.mode(SaveMode.Overwrite).parquet(s"$sigStoreDir/batch_id=$batchId")
  }

  /** Batch-mode drive of the same pipeline: each parquet file under
    * `batchesDir` (sorted by name — the arrival order of a file-drop
    * ingest) is processed as one batch. Produces the identical signature
    * store and pair log the streaming path would, so a backfill over
    * historical drops and the live stream share one store. */
  def runBatchDir(
      spark: SparkSession,
      batchesDir: String,
      idCol: String,
      textCol: String,
      sigStoreDir: String,
      pairLogDir: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): Long = {
    val p = new org.apache.hadoop.fs.Path(batchesDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
    files.zipWithIndex.foreach { case (f, i) =>
      processBatch(spark, spark.read.parquet(f), i.toLong, idCol, textCol,
        sigStoreDir, pairLogDir, shingleN, numHashes, bands)
    }
    files.length.toLong
  }

  /** Start the continuous pipeline over a streaming document frame. */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sigStoreDir: String,
      pairLogDir: String,
      checkpointDir: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, idCol, textCol,
          sigStoreDir, pairLogDir, shingleN, numHashes, bands)
      }
      .start()
}
