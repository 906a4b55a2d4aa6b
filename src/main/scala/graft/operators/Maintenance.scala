package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operators. At 100 TB the dominant one is small-file
  * compaction: streaming sinks and fine-grained partition writes leave
  * thousands of KB-scale files per partition, and scan cost becomes
  * file-open bound (driver listing, footer reads, task scheduling)
  * instead of byte bound. Compaction rewrites a directory into
  * size-targeted files — the same maintenance action table formats call
  * `rewrite_data_files` / `OPTIMIZE`.
  */
object Maintenance {

  final case class CompactionStats(
      inputFiles: Long, inputBytes: Long, outputFiles: Long)

  /** Rewrite the parquet files under `inDir` into `outDir` as
    * ~`targetBytes`-sized files. Sizing uses the real input byte count
    * from the file listing (not a row estimate), so output file count
    * tracks data volume; the rewrite itself is one round-robin shuffle —
    * no driver-side data movement. */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long): CompactionStats = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    def parquetFiles(dir: String) = {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        // Recursive: hive-partitioned layouts nest data files under
        // key=value subdirectories; a top-level-only listing would see
        // zero files for a directory spark.read.parquet reads fine.
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.LocatedFileStatus]
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile && s.getPath.getName.endsWith(".parquet")) buf += s
        }
        buf.toSeq
      }
    }
    val inputs = parquetFiles(inDir)
    require(inputs.nonEmpty, s"no parquet files under $inDir")
    val inputBytes = inputs.map(_.getLen).sum
    val nOut = math.max(1L, (inputBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    CompactionStats(inputs.size.toLong, inputBytes, parquetFiles(outDir).size.toLong)
  }
}
