package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: an explicit per-file min/max index over a
  * clustering column, and a reader that opens only the files whose range
  * can contain the predicate — the external-index form of the pruning
  * parquet row-group stats give WITHIN a file (and what table formats
  * persist in their manifests). At 100 TB the scan cost of a selective
  * range query is dominated by how many of the tens of thousands of
  * files must be opened at all; with data clustered on the column (range
  * write, z-order [[Layout]], or any group-per-file layout), the index
  * prunes the file list driver-side before a single task launches.
  */
object ZoneMap {

  /** One scan building the index: (file, min_v, max_v, n_rows) per
    * parquet file under `dir`. Column-pruned to `statCol` — building the
    * index reads one column, not the table. */
  def buildStats(spark: SparkSession, dir: String, statCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(statCol)).as("min_v"),
        max(col(statCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  final case class PrunedScan(df: DataFrame, filesTotal: Long, filesScanned: Long)

  /** Range read through the index: keep only files with
    * `[min_v, max_v] ∩ [lo, hi] ≠ ∅`, then apply the exact filter to the
    * surviving rows (the index prunes files; the residual predicate
    * guarantees exactness regardless of clustering quality). The index
    * itself is file-count-sized — driver-side by construction. */
  /** Driver-memory guard for the stats collect: ~200 bytes/row means
    * the 1M-file cap bounds the index at ~200 MB of driver heap. A
    * table laid out past that isn't a driver-side zone-map candidate
    * (keep the index distributed and semi-join on file instead); the
    * failure mode must be this message, not an OOM. Enforced by
    * collecting through a LIMIT cap+1 probe — one extra row proves the
    * overflow without a second full evaluation of the stats aggregate. */
  private[graft] val MaxIndexFiles = 1000000

  def prunedRead(
      spark: SparkSession,
      dir: String,
      statCol: String,
      stats: DataFrame,
      lo: Long,
      hi: Long): PrunedScan = {
    val all = stats.select(col("file"), col("min_v").cast("long"), col("max_v").cast("long"))
      .limit(MaxIndexFiles + 1)
      .collect()
    require(all.length <= MaxIndexFiles,
      s"zone-map index over $dir exceeds the $MaxIndexFiles-file " +
        s"driver-side collect bound; compact the layout or use " +
        s"prunedReadJoin (keeps the index distributed, no collect)")
    val keep = all.filter(r => r.getLong(1) <= hi && r.getLong(2) >= lo).map(_.getString(0))
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
        .filter(col(statCol).cast("long").between(lo, hi))
    PrunedScan(df, all.length.toLong, keep.length.toLong)
  }

  /** The range-overlap keep-set as a DataFrame: files with
    * `[min_v, max_v] ∩ [lo, hi] ≠ ∅`. The collect path states the same
    * overlap test driver-side on its collected rows (it already holds
    * them for the cap check, and a DataFrame predicate can't run on
    * driver rows) — OperatorsSpec pins the two keep sets equal so an
    * edit to either statement of the predicate fails the build instead
    * of drifting silently. */
  private def overlaps(lo: Long, hi: Long): org.apache.spark.sql.Column =
    col("min_v").cast("long") <= hi && col("max_v").cast("long") >= lo

  private[graft] def keepFiles(stats: DataFrame, lo: Long, hi: Long): DataFrame =
    stats.filter(overlaps(lo, hi)).select(col("file"))

  /** Distributed fallback for indexes past [[MaxIndexFiles]]: the same
    * exact semantics as [[prunedRead]] with the index never leaving the
    * executors — scan rows are semi-joined against the overlap-filtered
    * stats on `input_file_name()`, then the residual predicate applies.
    * The trade: every file is still *opened* — each file's rows are
    * discarded at the first operator after the scan when its file
    * misses the keep set. For a selective range the semi-join build
    * side is survivor-sized and AQE broadcasts it, so the
    * per-excluded-file cost is its footer + one hash probe per row
    * batch, with zero driver memory proportional to ANYTHING (neither
    * total files nor keep set). Use [[prunedRead]] below the cap
    * (skips the open entirely), [[prunedReadIndexed]] above it when
    * the KEEP SET is driver-listable (skips the open too), and this
    * when even the keep set is too big to plan driver-side. */
  def prunedReadJoin(
      spark: SparkSession,
      dir: String,
      statCol: String,
      stats: DataFrame,
      lo: Long,
      hi: Long): PrunedScan = {
    // the keep-set column gets a reserved name before the join: the
    // scanned table may legally have its own `file` column, which the
    // collect path tolerates and this path must too
    val keep = keepFiles(stats, lo, hi)
      .withColumnRenamed("file", "__zm_keep_file")
    val df = spark.read.parquet(dir)
      .withColumn("__zm_file", input_file_name())
      .join(keep, col("__zm_file") === col("__zm_keep_file"), "left_semi")
      .drop("__zm_file")
      .filter(col(statCol).cast("long").between(lo, hi))
    // both counts in ONE distributed job (never a row collect): this
    // path exists precisely because stats is too big to collect, and
    // its lineage may be a full buildStats scan — stats.count() +
    // keep.count() would evaluate that lineage twice before the caller
    // even runs df. (The semi-join build side re-evaluates keep when
    // df executes — inherent to keeping the index distributed; callers
    // with an expensive stats lineage should persist it.)
    val counts = stats.agg(
      count(lit(1)).as("total"),
      count(when(overlaps(lo, hi), 1)).as("kept")).head()
    PrunedScan(df, counts.getLong(0), counts.getLong(1))
  }

  /** Open-time pruning for indexes past [[MaxIndexFiles]]: the overlap
    * filter runs DISTRIBUTED (like [[prunedReadJoin]]) and only the
    * surviving file names come back to the driver — streamed through
    * `toLocalIterator`, never the full index — to seed the scan's file
    * index with exactly the keep set. Excluded files are never listed,
    * never footer-read, never opened: `df.inputFiles` is the keep set,
    * which is what the join path cannot do (its scan still opens every
    * file and discards rows post-scan).
    *
    * The driver bound moves from TOTAL file count ([[prunedRead]]'s
    * cap) to KEEP-SET size (`maxKeepFiles`) — inherent, since Spark
    * plans file splits driver-side; a range query whose survivor list
    * exceeds driver memory is a full-scan-shaped query, and
    * [[prunedReadJoin]] is the right tool. File statuses (sizes for
    * split planning) are not in the stats index, so the reader fetches
    * them for kept paths only; past
    * `spark.sql.sources.parallelPartitionDiscovery.threshold` (default
    * 32) that listing itself runs as a distributed job, so a 100k-file
    * keep set costs a job over 100k paths, not 100k driver RPCs.
    *
    * `stats` lineage is evaluated twice (count + iterate) — same
    * caveat as [[prunedReadJoin]]: persist an expensive index.
    * Exactness contract is identical to both siblings: keep-set
    * overlap test via [[keepFiles]], residual predicate on survivors. */
  def prunedReadIndexed(
      spark: SparkSession,
      dir: String,
      statCol: String,
      stats: DataFrame,
      lo: Long,
      hi: Long,
      maxKeepFiles: Int = MaxIndexFiles): PrunedScan = {
    val counts = stats.agg(
      count(lit(1)).as("total"),
      count(when(overlaps(lo, hi), 1)).as("kept")).head()
    val (total, kept) = (counts.getLong(0), counts.getLong(1))
    require(kept <= maxKeepFiles,
      s"zone-map keep set over $dir ($kept files) exceeds the " +
        s"$maxKeepFiles-file driver-side split-planning bound; a range " +
        s"this unselective should use prunedReadJoin (fully distributed)")
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = keepFiles(stats, lo, hi).toLocalIterator()
    while (it.hasNext) paths += it.next().getString(0)
    val df =
      if (paths.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(paths.toIndexedSeq: _*)
        .filter(col(statCol).cast("long").between(lo, hi))
    PrunedScan(df, total, kept)
  }
}
