package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph
import graft.streaming.DocStreams

/** Round-9 hardening: iterative-operator lineage knobs, the crash-safe
  * sketch-store swap, and the new d-dimensional operators' locks. */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a triangle + pendant: communities and degrees are asymmetric enough
  // that a wrong round boundary or lost lineage changes the answer
  private def testEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L),
    (3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L))
    .toDF("src", "dst")

  test("labelPropagation: checkpointEvery knob yields bit-identical labels") {
    val off = Graph.labelPropagation(testEdges, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = Graph.labelPropagation(testEdges, rounds = 5, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(on == off)
  }

  test("labelPropagation: reliable flavor (checkpoint dir set) bit-identical too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lp_ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val off = Graph.labelPropagation(testEdges, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val on = Graph.labelPropagation(testEdges, rounds = 4, checkpointEvery = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(on == off)
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, s"no reliable checkpoint under $dir")
    } finally hadCkpt.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("randomWalks: checkpointEvery knob yields bit-identical walks") {
    val seeds = Seq(1L, 2L, 5L).toDF("node")
    def walks(ck: Int) =
      Graph.randomWalks(testEdges, seeds, walkLength = 6, checkpointEvery = ck)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(walks(2) == walks(0))
    assert(walks(3) == walks(0))
  }

  // ----- crash-safe sketch-store swap -----------------------------------

  test("mergeHllBatch: crash between the swap renames loses no registers") {
    val store = java.nio.file.Files.createTempDirectory("graft_hll_crash").toString
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val b2 = Seq((2L, "eta theta iota kappa lambda mu")).toDF("doc_id", "text")
    DocStreams.mergeHllBatch(b1, 0L, store, p = 6)
    val healthy = spark.read.parquet(s"$store/current")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // simulate the mid-swap crash: current was renamed aside to prev_1
    // and the process died before next_1 moved into place
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$store/current"),
      new org.apache.hadoop.fs.Path(s"$store/prev_1")))

    // the replayed batch must merge against the RECOVERED registers —
    // under the old delete-then-rename swap it saw an empty store and
    // rebuilt from b2's delta alone
    DocStreams.mergeHllBatch(b2, 1L, store, p = 6)
    val merged = spark.read.parquet(s"$store/current")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    healthy.foreach { case (bucket, rho) =>
      assert(merged.getOrElse(bucket, -1L) >= rho,
        s"bucket $bucket lost its pre-crash register ($rho) after recovery")
    }
    // the swap cleaned up: exactly one complete store, no prev_ leftovers
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).toSet
    assert(names.contains("current") && !names.exists(_.startsWith("prev_")),
      s"unexpected store contents: $names")
  }

  // ----- batched k-center / MMR ------------------------------------------

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def vecFrame(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val vs = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextInt(255) - 127).toDouble.toFloat)))
    (vs, vs.toDF("vec_id", "embedding"))
  }

  test("kCenterGreedy batch mode: exact recorded distances, bounded radius") {
    val (_, df) = vecFrame(60, 6, seed = 21)
    def radius(sel: Seq[(Long, Seq[Long])]): Long = {
      val qz = operators.Similarity.quantizeInt8(df, "vec_id", "embedding")
        .select(col("vec_id"), col("qvec"))
        .as[(Long, Seq[Long])].collect()
      qz.map { case (_, v) => sel.map(s => d2(v, s._2)).min }.max
    }
    def run(b: Int) = {
      val out = operators.Similarity
        .kCenterGreedy(df, "vec_id", "embedding", k = 8, batch = b)
        .orderBy(col("rank"))
        .as[(Long, Long, Long)].collect().toSeq // (rank, vec_id, min_d2)
      val qz = operators.Similarity.quantizeInt8(df, "vec_id", "embedding")
        .select(col("vec_id"), col("qvec"))
        .as[(Long, Seq[Long])].collect().toMap
      (out, out.map { case (_, id, _) => (id, qz(id)) })
    }
    val (exact, exactSel) = run(1)
    val (batched, batchedSel) = run(3)
    assert(batched.size == 8 && batched.map(_._2).distinct.size == 8)
    // seed + the first pick of round 1 are the true greedy picks at any b
    assert(batched.take(2) == exact.take(2))
    // every recorded min_d2 is exact w.r.t. the EARLIER batched centers
    // (no stale pool score leaks into the output)
    batched.zipWithIndex.drop(1).foreach { case ((_, id, d), i) =>
      val earlier = batchedSel.take(i)
      val v = batchedSel(i)._2
      assert(d == earlier.map(s => d2(v, s._2)).min,
        s"pick $id recorded stale min_d2")
    }
    // the documented trade: 2·OPT(#rounds) vs 2·OPT(k) — on this frame
    // the batched radius stays within 2x of exact greedy's
    assert(radius(batchedSel) <= 2 * radius(exactSel),
      s"batched radius ${radius(batchedSel)} vs exact ${radius(exactSel)}")
  }

  test("mmrSelect batch mode: exact recorded scores, same first pick") {
    val (_, df) = vecFrame(40, 6, seed = 33)
    val qv = operators.Similarity
      .quantizeInt8(df.filter(col("vec_id") === 0), "vec_id", "embedding")
      .select(col("qvec")).head().getSeq[Long](0)
    def run(b: Int) = operators.Similarity
      .mmrSelect(df.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        qv, k = 6, batch = b)
      .orderBy(col("rank"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exact = run(1)
    val batched = run(4)
    assert(batched.size == 6 && batched.map(_._2).distinct.size == 6)
    assert(batched.head == exact.head) // round-1 first pick is the true argmax
    // recorded scores are exact for their pick time: recompute the
    // penalty against the earlier batched picks with driver dot products
    val qz = operators.Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("vec_id"), col("qvec"))
      .as[(Long, Seq[Long])].collect().toMap
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    batched.zipWithIndex.foreach { case ((_, id, rel, score), i) =>
      assert(rel == dot(qz(id), qv), s"pick $id relevance mismatch")
      val red = if (i == 0) 0L
        else batched.take(i).map { case (_, pid, _, _) => dot(qz(id), qz(pid)) }.max
      assert(score == 7L * rel - 3L * red, s"pick $id recorded stale score")
    }
  }

  // ----- d-dimensional skyline -------------------------------------------

  private def bruteSkyline(rows: Seq[(Long, Seq[Long])]): Set[Long] = {
    def dom(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).forall { case (x, y) => x >= y } && a != b
    rows.collect {
      case (id, p) if !rows.exists { case (_, q) => dom(q, p) } => id
    }.toSet
  }

  test("skylineN == brute-force dominance filter (d=3, d=4, duplicates, ties)") {
    val rnd = new scala.util.Random(9)
    for (d <- Seq(3, 4); trial <- 1 to 3) {
      // small value range on purpose: dense ties and exact coordinate
      // duplicates, the strictness edge cases
      val pts = Seq.tabulate(250)(i =>
        (i.toLong, Seq.fill(d)((rnd.nextInt(14) - 3).toLong)))
      val names = (0 until d).map(i => s"c$i")
      val df = pts.map { case (id, cs) => (id, cs) }
        .toDF("id", "cs")
        .select(col("id") +: names.zipWithIndex.map { case (n, i) =>
          col("cs").getItem(i).as(n) }: _*)
      val got = operators.Skyline.skylineN(df, names)
        .select("id").as[Long].collect().toSet
      val want = bruteSkyline(pts)
      assert(got == want,
        s"d=$d trial=$trial missing=${want -- got} extra=${got -- want}")
    }
  }

  test("skylineN(2) agrees with skyline2 on integer criteria") {
    val rnd = new scala.util.Random(17)
    val pts = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = pts.toDF("id", "x", "y")
    val a = operators.Skyline.skyline2(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val b = operators.Skyline.skylineN(df, Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("mergeCountMinBatch: healthy swap leaves one store and re-adds exactly") {
    val store = java.nio.file.Files.createTempDirectory("graft_cms_crash").toString
    val b1 = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    DocStreams.mergeCountMinBatch(b1, 0L, store, depth = 2, width = 16)
    val total1 = spark.read.parquet(s"$store/current")
      .agg(sum("cnt")).head().getLong(0)
    DocStreams.mergeCountMinBatch(b1, 1L, store, depth = 2, width = 16)
    val total2 = spark.read.parquet(s"$store/current")
      .agg(sum("cnt")).head().getLong(0)
    assert(total2 == 2 * total1, "second batch must add exactly one delta")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).toSet
    assert(names == Set("current"), s"unexpected store contents: $names")
  }
}
