package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * A short untimed warmup (parquet scan + shuffle + codegen) runs first
  * so the first timed query doesn't absorb JVM/session initialization —
  * per-query numbers are otherwise incomparable across runs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Engine.attach(spark)

    // untimed warmup: session, parquet reader, shuffle machinery, codegen
    for (name <- Seq("q01_pricing_summary", "q15_doc_parse", "q27_ann_brute_topk")) {
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => }
    }

    val results = Queries.all.map { case (name, q) =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
