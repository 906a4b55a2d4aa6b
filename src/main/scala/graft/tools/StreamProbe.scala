package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dump streaming session-window and interval-join results at
  * a given SF so the append-mode emission rule can be compared against
  * batch twins (used to derive the q63/q64 oracles). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/stream_probe")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Engine.attach(spark)
    val es = graft.streaming.EventStreams
    spark.catalog.dropTempView("probe_sessions")
    es.runToMemory(spark, s"$sfDir/events.parquet",
        df => es.sessionWindows(df), "probe_sessions")
      .select(
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("user_id"), col("n_events"), col("total_value_micros"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/sessions")
    spark.catalog.dropTempView("probe_ssjoin")
    val clicks = es.readStream(spark, s"$sfDir/events.parquet")
      .filter(col("event_type") === "click")
    val errors = es.readStream(spark, s"$sfDir/events.parquet")
      .filter(col("event_type") === "error")
    val q = es.clickErrorJoin(clicks, errors)
      .writeStream.outputMode("append").format("memory")
      .queryName("probe_ssjoin").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table("probe_ssjoin")
      .select(
        col("click_id"), col("user_id"),
        unix_millis(col("click_ts")).as("click_ms"),
        unix_millis(col("err_ts")).as("err_ms"), col("err_value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/ssjoin")
    println("PROBE_DONE")
    spark.stop()
  }
}
