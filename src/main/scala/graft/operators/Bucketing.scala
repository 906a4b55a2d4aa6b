package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for shuffle-free fact-fact joins.
  *
  * At 100 TB the expensive part of a recurring fact-fact join is the
  * exchange of both sides on every run. Writing both tables bucketed
  * (and sorted) on the join key pays that shuffle ONCE at write time:
  * Spark records the bucket spec in the catalog, the scan reports
  * `HashPartitioning(key, n)`, and a sort-merge join over two tables
  * with the same bucket count plans with no Exchange on either side
  * (locked by PlanSpec). This is the standard warehouse layout for
  * repeatedly-joined tables — the write-side twin of the read-side
  * broadcast/salting strategies elsewhere in this package.
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted managed table.
    * Idempotent across JVMs: an in-memory catalog forgets managed tables
    * at shutdown but their warehouse directories persist, and a stale
    * location fails CREATE with LOCATION_ALREADY_EXISTS — so both the
    * table and any orphaned location are removed first. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      if (wh.getScheme == null) new java.io.File(wh.toString)
      else new java.io.File(wh), table.toLowerCase)
    if (loc.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc.toPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts this plans exchange-free; Spark's bucketing is honored
    * automatically (spark.sql.sources.bucketing.enabled, default on). */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
