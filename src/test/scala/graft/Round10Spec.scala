package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Round-10 hardening: reliable-checkpoint file lifecycle, wide-span
  * z-order normalize, and the new operators' locks. */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def testEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L),
    (3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L))
    .toDF("src", "dst")

  test("reliable checkpointEvery: superseded checkpoint FILES are deleted in-loop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_files").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val labels = Graph.labelPropagation(testEdges, rounds = 5, checkpointEvery = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.nonEmpty)
      // rounds 1..4 checkpointed (r < rounds guard); each drop deletes the
      // superseded round's rdd-* dir, so at most the LAST checkpoint's
      // files survive the run — not O(rounds) generations
      val rddDirs = {
        val root = new java.io.File(dir)
        Option(root.listFiles()).getOrElse(Array.empty)
          .flatMap(u => Option(u.listFiles()).getOrElse(Array.empty))
          .filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
      }
      assert(rddDirs.length <= 1,
        s"superseded reliable checkpoint dirs not cleaned: ${rddDirs.mkString(", ")}")
    } finally hadCkpt match {
      case Some(d) => spark.sparkContext.setCheckpointDir(d)
      case None =>
        org.apache.spark.sql.graftbridge.Bridge.clearCheckpointDir(spark)
    }
  }

  test("randomWalks reliable flavor: derived frontier keeps walks bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rw_ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val seeds = Seq(1L, 2L, 5L).toDF("node")
      def walks(ck: Int) =
        Graph.randomWalks(testEdges, seeds, walkLength = 6, checkpointEvery = ck)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(walks(2) == walks(0))
    } finally hadCkpt match {
      case Some(d) => spark.sparkContext.setCheckpointDir(d)
      case None =>
        org.apache.spark.sql.graftbridge.Bridge.clearCheckpointDir(spark)
    }
  }

  test("Layout.normalize: span past 2^63 neither wraps nor collapses") {
    // bounds near both Long extremes: span = hi - lo ≈ 1.8e19 > 2^63,
    // which wrapped BOTH the per-row Long subtraction and the driver-side
    // span before the decimal/BigInt staging
    val lo = Long.MinValue + 10L
    val hi = Long.MaxValue - 10L
    val vals = Seq(lo, -1000000L, 0L, 1000000L, hi)
    val out = vals.toDF("v")
      .select(graft.operators.Layout.normalize(col("v"), lo, hi, bits = 16).as("z"))
      .collect().map(_.getLong(0))
    assert(out.forall(z => z >= 0L && z < 65536L), out.mkString(","))
    // monotone in the input, endpoints exact
    assert(out.toSeq == out.toSeq.sorted)
    assert(out.head == 0L && out.last == 65535L)
  }
}
