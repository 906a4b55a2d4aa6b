package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.text.TextFileFormat
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType

/** Text file source with per-file header skipping — the semantics of
  * Hive's `skip.header.line.count` table property, which Spark's own
  * Hive text scan ignores (SURVEY §7 hard part #1).
  *
  * Extends the built-in text format; the only change is in the reader:
  * the task whose split starts at byte 0 of a file drops the first
  * `skipLines` records. Splits that start mid-file can't contain the
  * header (headers are a few lines, splits are >= MBs), so files remain
  * fully splittable and the skip costs nothing at scale. Unlike an
  * RDD-level rewrite, `input_file_name()` keeps working, which the m33
  * view depends on.
  *
  * Usage: `spark.read.format("graft_text_skip").option("skipLines", "3")`.
  */
class HeaderSkipTextFileFormat extends TextFileFormat with DataSourceRegister {

  override def shortName(): String = "graft_text_skip"
  override def toString: String = "GraftTextSkip"

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val skipLines = options.getOrElse("skipLines", "0").toInt
    val base = super.buildReader(
      sparkSession, dataSchema, partitionSchema, requiredSchema, filters,
      options, hadoopConf)
    file => {
      val it = base(file)
      if (skipLines > 0 && file.start == 0) it.drop(skipLines) else it
    }
  }
}
