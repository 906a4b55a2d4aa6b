package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.NewHadoopRDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partitioned text scan with per-file header skip — SURVEY §2.A S2.
  *
  * Reference semantics: Hive external TEXTFILE table with
  * `TBLPROPERTIES ("skip.header.line.count"="3")` over partition dirs
  * (reference: examples/src/hive/create_m33_raw_ext_tbl.hql:1-14). The
  * skip is positional per file — it must not rely on header rows failing
  * a parse, and must not drop data rows.
  *
  * Scale design (100 TB): Spark's text source exposes no per-file line
  * index, and a window over (file, offset) would shuffle the whole scan
  * just to drop 3 rows per file. Instead:
  *   1. a tiny distributed pre-pass reads only the first `skipLines`
  *      lines of each file to learn its header byte length;
  *   2. the main scan uses Hadoop TextInputFormat, whose record key is
  *      the line's byte offset in the file, and filters
  *      `offset >= headerBytes(file)` — embarrassingly parallel, zero
  *      shuffle, splittable files stay splittable.
  */
object HeaderSkipText {

  /** Byte length of the first `n` lines of `path` ('\n' terminated). */
  private def headerByteLen(fs: FileSystem, path: Path, n: Int): Long = {
    val in = fs.open(path)
    try {
      var bytes = 0L
      var lines = 0
      var b = in.read()
      while (b >= 0 && lines < n) {
        bytes += 1
        if (b == '\n') lines += 1
        b = if (lines < n) in.read() else -1
      }
      bytes
    } finally in.close()
  }

  /** Read all text files under `dir` (recursively), skipping `skipLines`
    * header lines per file. Output columns: `row_str`, `input_file`. */
  def read(spark: SparkSession, dir: String, skipLines: Int): DataFrame = {
    val sc = spark.sparkContext
    val conf = sc.hadoopConfiguration
    val rootPath = new Path(dir)
    val fs = rootPath.getFileSystem(conf)

    // pre-pass: per-file header byte lengths (distributed, header-only reads)
    val files: Seq[String] = {
      val it = fs.listFiles(rootPath, true)
      val buf = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getLen > 0) buf += st.getPath.toString
      }
      buf.toSeq
    }
    val confSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val headerLens: Map[String, Long] =
      sc.parallelize(files, math.max(1, math.min(files.size, 64)))
        .map { f =>
          val p = new Path(f)
          val pfs = p.getFileSystem(confSer.value)
          f -> headerByteLen(pfs, p, skipLines)
        }
        .collect()
        .toMap
    val bHeaderLens = sc.broadcast(headerLens)

    // Job + setInputPaths escapes special characters (a comma-joined
    // string path list would break on paths containing commas)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(conf)
    org.apache.hadoop.mapreduce.lib.input.FileInputFormat
      .setInputPaths(job, files.map(new Path(_)): _*)
    val rdd = sc
      .newAPIHadoopRDD(
        job.getConfiguration,
        classOf[TextInputFormat],
        classOf[LongWritable],
        classOf[Text])
      .asInstanceOf[NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, iter) =>
        val path = split.asInstanceOf[FileSplit].getPath.toString
        // a lookup miss means the pre-pass and the scan disagree about
        // path rendering — fail loudly rather than silently ingesting
        // header lines as data
        val skip = bHeaderLens.value.getOrElse(
          path,
          throw new IllegalStateException(
            s"no header length recorded for split path $path " +
              s"(known: ${bHeaderLens.value.keys.take(3).mkString(", ")} ...)"))
        iter.collect {
          case (off, line) if off.get() >= skip => Row(line.toString, path)
        }
      }

    val schema = StructType(Seq(
      StructField("row_str", StringType, nullable = false),
      StructField("input_file", StringType, nullable = false)))
    spark.createDataFrame(rdd, schema)
  }

  /** [[read]] plus a partition column derived from the parent directory
    * name, mirroring `ALTER TABLE ... ADD PARTITION (col='v') LOCATION dir`
    * (reference: examples/src/hive/create_m33_raw_ext_tbl.hql:8-14). */
  def readPartitioned(
      spark: SparkSession,
      partitionCol: String,
      partitionDirs: Map[String, String],
      skipLines: Int): DataFrame = {
    partitionDirs
      .map { case (value, dir) =>
        read(spark, dir, skipLines).withColumn(partitionCol, lit(value))
      }
      .reduce(_.unionByName(_))
  }
}
