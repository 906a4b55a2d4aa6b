package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.scalacheck.Gen

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
    } finally hadCkpt match {
      // restore EXACTLY: a leaked dir would flip every later
      // checkpointEvery>0 test in this shared JVM to the reliable flavor
      case Some(d) => spark.sparkContext.setCheckpointDir(d)
      case None =>
        org.apache.spark.sql.graftbridge.Bridge.clearCheckpointDir(spark)
    }
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

  // ----- containment scoring ---------------------------------------------

  test("containmentOnCandidates: doc-in-doc asymmetry, exact ppm, empty guard") {
    val docs = Seq(
      (1L, "alpha beta gamma"),                          // 2 bigrams
      (2L, "alpha beta gamma delta epsilon zeta eta"),   // 6 bigrams, contains doc 1
      (3L, "solo"),                                      // 0 bigrams
      (4L, "unrelated words entirely different text"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = operators.Dedup
      .containmentOnCandidates(docs, "doc_id", "text", cands, shingleN = 2)
      .orderBy(col("doc_b"))
      .as[(Long, Long, Long, Long)].collect()
    // doc 1 ⊂ doc 2: containment a→b = 2/2 = 1e6; b→a = 2/6
    assert(got(0) == ((1L, 2L, 1000000L, 2L * 1000000L / 6L)))
    // doc 3 has no bigrams: its side scores 0, not a division error
    assert(got(1) == ((1L, 3L, 0L, 0L)))
    // disjoint grams: 0 both ways
    assert(got(2) == ((1L, 4L, 0L, 0L)))
  }

  // ----- n-column z-order ------------------------------------------------

  test("zorderKeyN: n=2 is zorderKey2 bit-for-bit; n=3 interleaves at stride 3") {
    val df2 = Seq((5L, 3L)).toDF("a", "b")
    val z2 = df2.select(operators.Layout.zorderKey2(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    val zn = df2.select(operators.Layout.zorderKeyN(Seq(col("a"), col("b")), 3).as("z"))
      .head().getLong(0)
    assert(z2 == zn && zn == 27L)
    // a=1 -> bit at position 0; b=1 -> position 1; c=1 -> position 2
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(operators.Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .head().getLong(0)
    assert(z3 == 7L)
    // a=2 (bit 1) lands at position 1*3+0 = 3 for n=3
    val z4 = Seq((2L, 0L, 0L)).toDF("a", "b", "c")
      .select(operators.Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .head().getLong(0)
    assert(z4 == 8L)
  }

  test("normalize is exact past 2^53 AND past the 2^63 product overflow") {
    // two regimes, both from real column magnitudes:
    //  - span 1e13: (v-lo)*(2^16-1) ~ 6.5e17 > 2^53 — double division
    //    rounds here, decimal must not;
    //  - span 2.1e14 (the actual o_orderdate epoch-micros span): the
    //    product passes 2^63 ≈ 9.2e18 — LONG staging wraps negative
    //    here (the round-9 review finding), decimal must not, and the
    //    result must stay inside [0, 2^bits)
    for ((hi, v) <- Seq(
        (10000000000000L, 9999999999999L),
        (210000000000000L, 209999999999999L),
        (210000000000000L, 150000000000000L))) {
      val got = Seq(Tuple1(v)).toDF("v")
        .select(operators.Layout.normalize(col("v"), 0L, hi, 16).as("n"))
        .head().getLong(0)
      val exact = (BigInt(v) * BigInt((1L << 16) - 1) / BigInt(hi)).toLong
      assert(got == exact, s"normalize drifted at span $hi: $got vs $exact")
      assert(got >= 0L && got < (1L << 16), s"normalize out of range: $got")
    }
  }

  test("zorderWriteN(3) bounds per-file spans on ALL THREE dimensions") {
    // 32 files over 3 dims ≈ 1.7 bits of interleave resolution per dim
    // ((1/32)^(1/3) ≈ 0.32 ideal span); real-data skew (totalprice is
    // right-skewed, so its top z-bit splits unevenly) degrades that —
    // the assertion is vs the single-sort baseline, where the sorted
    // dim is razor-sharp and the others stay ~full-span
    val sf = "/root/testdata/sf0.001"
    val orders = core.Engine.table(spark, sf, "orders")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder3_spec").toString
    operators.Layout.zorderWriteN(
      orders, Seq("o_custkey", "o_orderdate", "o_totalprice"), s"$base/z",
      numFiles = 32)
    orders.repartitionByRange(32, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(s"$base/lin")
    def ratios(dir: String): Seq[Double] = {
      val df = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("d"),
          col("o_totalprice").cast("long").as("p"))
      val g = df.agg(
        (max(col("o_custkey")) - min(col("o_custkey"))).cast("double"),
        (max(col("d")) - min(col("d"))).cast("double"),
        (max(col("p")) - min(col("p"))).cast("double")).head()
      val per = df.groupBy(col("f")).agg(
        (max(col("o_custkey")) - min(col("o_custkey"))).cast("double").as("ck"),
        (max(col("d")) - min(col("d"))).cast("double").as("dd"),
        (max(col("p")) - min(col("p"))).cast("double").as("pp"))
        .agg(avg(col("ck")), avg(col("dd")), avg(col("pp"))).head()
      (0 until 3).map(i => per.getDouble(i) / g.getDouble(i))
    }
    val z = ratios(s"$base/z")
    val lin = ratios(s"$base/lin")
    // single-sort: sharp on custkey, near-full on the others
    assert(lin(0) < 0.2 && lin(1) > 0.8 && lin(2) > 0.8,
      s"baseline unexpected: $lin")
    // z-order: ALL dims bounded well below full span
    z.zipWithIndex.foreach { case (r, i) =>
      assert(r < 0.7, s"dim $i span ratio too wide: $z")
    }
  }

  // ----- Lloyd's k-means -------------------------------------------------

  /** Sequential Lloyd's reference over already-quantized ints: argmin by
    * (d2, cid), integer mean via the same +127-shift truncating
    * division, empty clusters keep their centroid. */
  private def refKmeans(
      vecs: Seq[(Long, Seq[Long])], k: Int, rounds: Int): (Seq[Seq[Long]], Map[Long, Long]) = {
    var cents = vecs.sortBy(_._1).take(k).map(_._2)
    var counts = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      val assign = vecs.map { case (_, v) =>
        val cid = cents.zipWithIndex
          .map { case (c, i) => (d2(v, c), i) }.min._2
        (cid, v)
      }
      counts = (0 until k).map(c =>
        c.toLong -> assign.count(_._1 == c).toLong).toMap
      cents = cents.zipWithIndex.map { case (prev, c) =>
        val members = assign.filter(_._1 == c).map(_._2)
        if (members.isEmpty) prev
        else prev.indices.map(j =>
          members.map(_(j) + 127L).sum / members.size - 127L)
      }
    }
    (cents, counts)
  }

  test("kmeansLloyd == sequential Lloyd's reference (incl. empty cluster)") {
    // vec 0 and vec 1 identical: initial centroids 0 and 1 coincide, so
    // in ROUND 1 every tie resolves to cid 0 and cluster 1 is empty —
    // its centroid must hold at the initial value (later rounds may
    // re-attract members once centroid 0 moves off the shared point)
    val rnd = new scala.util.Random(41)
    val base = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(4)((rnd.nextInt(255) - 127).toDouble.toFloat)))
    val dup = base.updated(1, (1L, base.head._2))
    val df = dup.toDF("vec_id", "embedding")
    val qvecs = operators.Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("vec_id"), col("qvec"))
      .as[(Long, Seq[Long])].collect().toSeq
    val (refCents, refCounts) = refKmeans(qvecs, k = 3, rounds = 3)
    val got = operators.Similarity
      .kmeansLloyd(df, "vec_id", "embedding", k = 3, rounds = 3)
      .orderBy(col("cid"), col("dim_idx"))
      .as[(Long, Long, Long, Long)].collect()
    val gotCents = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val gotCounts = got.map(r => r._1 -> r._4).toMap
    refCents.zipWithIndex.foreach { case (c, i) =>
      assert(gotCents(i.toLong) == c, s"centroid $i diverged")
    }
    assert(gotCounts == refCounts)
    // the empty-cluster hold, observed at rounds = 1: cluster 1 gets no
    // members (all ties go to the identical centroid 0) and must keep
    // its initial centroid
    val (r1Cents, r1Counts) = refKmeans(qvecs, k = 3, rounds = 1)
    assert(r1Counts(1L) == 0L, "test setup: cluster 1 should be empty in round 1")
    val got1 = operators.Similarity
      .kmeansLloyd(df, "vec_id", "embedding", k = 3, rounds = 1)
      .orderBy(col("cid"), col("dim_idx"))
      .as[(Long, Long, Long, Long)].collect()
    val got1Cents = got1.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got1Cents(1L) == qvecs.sortBy(_._1).apply(1)._2)
    assert(got1.filter(_._1 == 1L).forall(_._4 == 0L))
    r1Cents.zipWithIndex.foreach { case (c, i) =>
      assert(got1Cents(i.toLong) == c, s"round-1 centroid $i diverged")
    }
  }

  // ----- Hive multi-insert --------------------------------------------------

  test("multi-insert: one FROM fans out to disjoint, complete tables") {
    Seq((1L, 10.0), (2L, 200.0), (3L, 5.0), (4L, 300.0))
      .toDF("id", "v").createOrReplaceTempView("r9_mi_src")
    for (t <- Seq("r9_mi_a", "r9_mi_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (id BIGINT, v DOUBLE) USING parquet")
    }
    spark.sql("""FROM r9_mi_src
                |INSERT OVERWRITE TABLE r9_mi_a SELECT id, v WHERE v >= 100
                |INSERT OVERWRITE TABLE r9_mi_b SELECT id, v WHERE v < 100""".stripMargin)
    val a = spark.table("r9_mi_a").select("id").as[Long].collect().toSet
    val b = spark.table("r9_mi_b").select("id").as[Long].collect().toSet
    assert(a == Set(2L, 4L) && b == Set(1L, 3L))
    assert((a & b).isEmpty && (a | b).size == 4)
    // OVERWRITE semantics: re-running replaces, never appends
    spark.sql("""FROM r9_mi_src
                |INSERT OVERWRITE TABLE r9_mi_a SELECT id, v WHERE v >= 100
                |INSERT OVERWRITE TABLE r9_mi_b SELECT id, v WHERE v < 100""".stripMargin)
    assert(spark.table("r9_mi_a").count() == 2 && spark.table("r9_mi_b").count() == 2)
  }

  // ----- grouped Misra-Gries ----------------------------------------------

  test("misraGries under groupBy: per-group sketches exact when distinct <= k") {
    // the grouped hash-aggregate path (per-group partial buffers +
    // merges) must behave like the global form does per slice: with
    // distinct items <= k the sketch IS the exact per-group counts
    val rows =
      Seq.fill(30)(("a", "x")) ++ Seq.fill(7)(("a", "y")) ++
      Seq.fill(12)(("b", "y")) ++ Seq.fill(3)(("b", "z")) ++ Seq.fill(1)(("b", "w"))
    val df = rows.toDF("g", "tok")
      .repartition(4) // force multi-partition partials per group
    val sk = df.groupBy(col("g"))
      .agg(graft.functions.Functions.misraGries(col("tok"), 8).as("sk"))
      .as[(String, Seq[(String, Long)])].collect().toMap
      .view.mapValues(_.toMap).toMap
    assert(sk("a") == Map("x" -> 30L, "y" -> 7L))
    assert(sk("b") == Map("y" -> 12L, "z" -> 3L, "w" -> 1L))
  }

  // ----- streaming k-means routing ----------------------------------------

  test("q271 streaming routing == batch assignment against the same centroids") {
    // the streaming path (file-stream source + stateless argmin
    // projection + drain) must agree with the plain batch statement of
    // the same routing — catches stream-schema drift and any
    // quantize/argmin behavior specific to the streaming plan
    val sf = "/root/testdata/sf0.001"
    val got = Queries.all.toMap.apply("q271_streaming_kmeans_route")
      .fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq // (cid, n_assigned, inertia)
    val emb = core.Engine.table(spark, sf, "embeddings")
    val (cm, _) = operators.Similarity.kmeansLloydRun(
      emb, "vec_id", "embedding", k = 4, rounds = 3)
    val best = operators.Similarity.nearestCentroid(cm, col("qvec"))
    val want = operators.Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(best.getField("c").as("cid"), best.getField("d").as("d2"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("d2")).as("inertia"))
      .orderBy(col("cid"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._2).sum == emb.count(), "every vector routed exactly once")
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

  test("property: skylineN == brute force over random d / gridBits / distributions") {
    def cases[A](g: Gen[A], n: Int): Seq[A] = GenCases(g, n, 909)
    val frameGen = for {
      d <- Gen.choose(2, 5)
      gridBits <- Gen.choose(1, 3)
      n <- Gen.choose(1, 120)
      // mixed ranges: tight (dense duplicate/tie space), wide, and
      // negative-offset — exercises bucket-width and bounds math
      span <- Gen.oneOf(3, 40, 100000)
      off <- Gen.oneOf(-50000, 0, 7)
      pts <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(0, span).map(x => (x + off).toLong)))
    } yield (d, gridBits, pts)
    cases(frameGen, 8).foreach { case (d, gridBits, pts) =>
      val rows = pts.zipWithIndex.map { case (cs, i) => (i.toLong, cs) }
      val names = (0 until d).map(i => s"c$i")
      val df = rows.toDF("id", "cs")
        .select(col("id") +: names.zipWithIndex.map { case (nm, i) =>
          col("cs").getItem(i).as(nm) }: _*)
      val got = operators.Skyline.skylineN(df, names, gridBits = gridBits)
        .select("id").as[Long].collect().toSet
      val want = bruteSkyline(rows.map { case (id, cs) => (id, cs) })
      assert(got == want,
        s"d=$d gridBits=$gridBits n=${pts.size} missing=${want -- got} extra=${got -- want}")
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

  test("mergeCountMinBatch: crash between the swap renames loses no counts") {
    // the CMS twin of the HLL crash case: the pre-batch store must be
    // recovered and the uncommitted batch's delta re-added ONCE — under
    // the old delete-then-rename swap the totals restarted from the
    // replayed batch alone
    val store = java.nio.file.Files.createTempDirectory("graft_cms_crash2").toString
    val b1 = Seq((1L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    val b2 = Seq((2L, "delta epsilon")).toDF("doc_id", "text")
    DocStreams.mergeCountMinBatch(b1, 0L, store, depth = 2, width = 16)
    val total1 = spark.read.parquet(s"$store/current")
      .agg(sum("cnt")).head().getLong(0)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$store/current"),
      new org.apache.hadoop.fs.Path(s"$store/prev_1")))
    DocStreams.mergeCountMinBatch(b2, 1L, store, depth = 2, width = 16)
    val total2 = spark.read.parquet(s"$store/current")
      .agg(sum("cnt")).head().getLong(0)
    val b2Only = {
      val d2 = java.nio.file.Files.createTempDirectory("graft_cms_b2").toString
      DocStreams.mergeCountMinBatch(b2, 0L, d2, depth = 2, width = 16)
      spark.read.parquet(s"$d2/current").agg(sum("cnt")).head().getLong(0)
    }
    assert(total2 == total1 + b2Only,
      s"recovered store must hold batch1 + batch2 ($total1 + $b2Only), got $total2")
  }

  test("skylineN/zorderKeyN/kmeans reject out-of-contract arguments") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    intercept[IllegalArgumentException] {
      operators.Skyline.skylineN(df, Seq("a")) // d < 2
    }
    intercept[IllegalArgumentException] {
      operators.Skyline.skylineN(df, Seq("a", "b", "c"), gridBits = 7) // 21 > 18
    }
    intercept[IllegalArgumentException] {
      operators.Layout.zorderKeyN(Seq(col("a")), 8) // n < 2
    }
    intercept[IllegalArgumentException] {
      operators.Layout.zorderKeyN(Seq(col("a"), col("b"), col("c")), 21) // 63 > 62
    }
    intercept[IllegalArgumentException] {
      operators.Similarity.kmeansLloyd(
        Seq((1L, Seq(1f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 0, rounds = 1)
    }
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
