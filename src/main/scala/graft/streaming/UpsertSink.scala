package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD1 upsert: maintain "latest row per key" state in plain
  * parquet from a stream of change rows — the foreachBatch MERGE pattern
  * every table format documents, without requiring one. State is
  * versioned by micro-batch (`v=<batchId>` subdirs, overwrite
  * semantics), so an at-least-once redelivery replaces its own output
  * instead of double-applying, and readers always see a complete,
  * atomic version. "Latest" is the max of the (orderCol, tieCol) pair,
  * which makes the merge ORDER-INDEPENDENT: any batch split of the same
  * input converges to the same state (asserted by the multi-batch spec).
  *
  * Scale shape per batch: one per-key aggregate of the batch, one keyed
  * merge against state — state-sized, not history-sized; the 100 TB
  * event log is never rescanned.
  */
object UpsertSink {

  /** Version dirs REQUIRE a `_SUCCESS` marker (the default Hadoop
    * committer writes one; a state dir produced with
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` is not a
    * valid input to this sink). A marker-less dir is either a crashed
    * partial write (only ever the newest id — benign, superseded by the
    * retry) or missing-marker corruption of real prior state; the
    * latter must be surfaced, not silently treated as "no state". */
  private def versions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val vDirs = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => s.getPath.getName.stripPrefix("v=").toLong -> s.getPath)
    val (ok, partial) = vDirs.partition { case (_, path) =>
      // a version is readable only once its _SUCCESS marker landed —
      // a crash mid-write leaves a partial v=N dir that must be
      // invisible to both readers and the writer's prior-state lookup
      fs.exists(new Path(path, "_SUCCESS"))
    }
    // MULTIPLE version dirs with no marker anywhere is not a crash
    // signature — it's a whole state dir written without success
    // markers (or with a committer configured
    // marksuccessfuljobs=false). Treating it as "no state" would
    // silently restart state from empty and the next batch would bury
    // the evidence under a fresh marked v=N — fail loudly instead.
    // A SINGLE marker-less dir with no good versions is different: a
    // crash mid-FIRST-write leaves exactly that (v=0, no predecessor),
    // and the replayed batch's Overwrite recovers it — throwing there
    // would brick recovery on every restart. Only one torn dir can
    // exist per crash (retries overwrite the same v=N; later ids only
    // appear after a marker lands), so partial.size > 1 with ok.isEmpty
    // cannot be a torn write. (Torn dirs ALONGSIDE good versions are
    // the normal crash leftover: superseded by the retry, warn only.)
    if (ok.isEmpty && partial.size > 1) throw new IllegalStateException(
      s"state dir $stateDir has version dirs " +
        s"(${partial.map("v=" + _._1).sorted.mkString(", ")}) but none " +
        s"has a _SUCCESS marker — pre-existing state written without " +
        s"success markers is not readable by this sink; refusing to " +
        s"silently discard it")
    if (partial.nonEmpty) System.err.println(
      s"[UpsertSink] WARN: ignoring partial (no _SUCCESS) state " +
        s"versions ${partial.map("v=" + _._1).sorted.mkString(", ")} " +
        s"under $stateDir")
    ok.map(_._1)
  }

  /** Latest row per key within `df` (max (orderCol, tieCol), payload
    * rides along in the struct — one codegen'd max-aggregate). */
  private def latestPerKey(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val pick = max(struct((Seq(orderCol, tieCol) ++ payloadCols).map(col): _*)).as("p")
    df.groupBy(col(keyCol)).agg(pick)
      .select(Seq(col(keyCol)) ++
        (Seq(orderCol, tieCol) ++ payloadCols).map(c => col(s"p.$c").as(c)): _*)
  }

  /** Apply one micro-batch: merge its per-key latest rows into the
    * newest state version BELOW this batch id (a same-id version is a
    * failed prior attempt of THIS batch and must not count), write the
    * merged state as `v=<batchId>`. */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      stateDir: String,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      payloadCols: Seq[String]): Unit = {
    if (batch.isEmpty) return
    val delta = latestPerKey(batch, keyCol, orderCol, tieCol, payloadCols)
    val prior = versions(spark, stateDir).filter(_ < batchId)
    val merged =
      if (prior.isEmpty) delta
      else latestPerKey(
        spark.read.parquet(s"$stateDir/v=${prior.max}").unionByName(delta),
        keyCol, orderCol, tieCol, payloadCols)
    merged.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v=$batchId")
  }

  /** Read the current state (newest version), empty-safe only when at
    * least one batch was applied. */
  def currentState(spark: SparkSession, stateDir: String): DataFrame = {
    val vs = versions(spark, stateDir)
    require(vs.nonEmpty, s"no state versions under $stateDir")
    spark.read.parquet(s"$stateDir/v=${vs.max}")
  }

  def start(
      rows: DataFrame,
      stateDir: String,
      checkpointDir: String,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      payloadCols: Seq[String]): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, stateDir,
          keyCol, orderCol, tieCol, payloadCols)
      }
      .start()
}
