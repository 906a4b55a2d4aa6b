package graft

import org.apache.spark.sql.SparkSession

/** One-off q67 cost attribution (VERDICT r06 #6). Run:
  *   sbt "Test/runMain graft.ProfileQ67"
  * Times, at sf0.1: (a) the prefix-table build (everything up to and
  * including the localCheckpoint), (b) candidate generation on top of a
  * pre-built prefix table (self-join + positional filter), (c) the full
  * ppjoinJaccard including gram-array verification. Deleted after the
  * attribution comment lands in Dedup.scala.
  */
object ProfileQ67 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Engine.attach(spark)
    val d = "/root/testdata/sf0.1"
    val docs = graft.core.Engine.table(spark, d, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q67] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    def teardown(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // warmup
    docs.count(); graft.operators.Dedup
      .ppjoinJaccard(docs, "doc_id", "text", 3, 0.5).count()
    teardown()

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      time("full ppjoinJaccard") {
        graft.operators.Dedup.ppjoinJaccard(docs, "doc_id", "text", 3, 0.5).count()
      }
      teardown()
      time("candidates only (prefix+posfilter)") {
        graft.operators.Dedup.prefixFilterCandidates(docs, "doc_id", "text", 3, 0.5).count()
      }
      teardown()
      time("prefix table build only") {
        graft.operators.Dedup.prefixTable(docs, "doc_id", "text", 3, 0.5).count()
      }
      teardown()
    }
    spark.stop()
  }
}
