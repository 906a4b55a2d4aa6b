package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC export path — SURVEY §2.A S18-S20.
  *
  * The reference exports the warehouse CSV to an RDBMS with Sqoop: 4
  * parallel mappers doing batched INSERTs (playground.py:710-719; vendored
  * sqoop/mapreduce/ExportJobBase.java:335, DEFAULT_NUM_MAPPERS=4 in
  * sqoop/SqoopOptions.java:258). Spark's JDBC writer is the same pattern —
  * one batched-INSERT connection per partition — so parity is
  * `repartition(numMappers).write.format("jdbc")`.
  */
object JdbcSink {

  /** S19: DDL/statement passthrough to the sink database (the analog of
    * `sqlcmd -i file.sql`; playground.py:703-708). */
  def execStatements(url: String, statements: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      statements.foreach(st.execute)
      st.close()
    } finally conn.close()
  }

  /** S18: parallel batched-INSERT export (Sqoop-export analog). */
  def export(
      df: DataFrame,
      url: String,
      table: String,
      numMappers: Int = 4,
      batchSize: Int = 1000): Unit =
    df.repartition(numMappers)
      .write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode("append")
      .save()

  /** S20: verification read-back (`SELECT TOP 100 *` analog — unordered
    * first-n, same as the reference's check; runall.py:73). */
  def readBack(spark: SparkSession, url: String, table: String, n: Int = 100): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load().limit(n)
}
