package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ThetaSketch

/** Round-12 locks: Theta family completion (grouped + streaming),
  * persisted graph-ANN index, 4:2:0 JPEG, soft-EM unigram. */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------
  // Theta: grouped + streaming forms
  // ------------------------------------------------------------------

  test("sketchBy: each group's sample equals its own global sketch") {
    val df = Seq.tabulate(300)(i => (s"s${i % 3}", s"v${i % 97}"))
      .toDF("src", "v")
    val grouped = ThetaSketch.sketchBy(df, col("src"), col("v"), 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).sorted.toSeq }
    for (g <- Seq("s0", "s1", "s2")) {
      val solo = ThetaSketch.sketch(
          df.filter(col("src") === g), col("v"), 16)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(grouped(g) == solo, s"group $g sample diverged from its own sketch")
    }
  }

  test("streaming theta store equals the batch sketch; replay is idempotent") {
    val docs = Seq.tabulate(90)(i =>
        (i.toLong, s"w${i % 40} w${(i * 7) % 40} w${(i * 11) % 40} w${(i * 13) % 40}"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_r12_theta").toString
    val store = s"$base/store"
    val parts = Seq(
      docs.filter(col("doc_id") < 30),
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 60),
      docs.filter(col("doc_id") >= 60))
    parts.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.DocStreams.mergeThetaBatch(b, i.toLong, store, k = 16)
    }
    def stored(): Seq[Long] =
      spark.read.parquet(s"$store/current").collect().map(_.getLong(0)).sorted.toSeq
    val batch = ThetaSketch.sketch(
        docs.select(explode(
          graft.functions.Functions.wordShingles(col("text"), 3)).as("g")),
        col("g"), 16)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(stored() == batch,
      "drained store != batch sketch of everything seen")
    // at-least-once delivery: replaying a batch must not change the store
    graft.streaming.DocStreams.mergeThetaBatch(parts(1), 99L, store, k = 16)
    assert(stored() == batch, "replayed batch changed the KMV sample")
  }
}
