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

  // ------------------------------------------------------------------
  // Persisted graph-ANN index
  // ------------------------------------------------------------------

  import graft.operators.{AnnIndex, Similarity}

  private def randomVecs(n: Int, dims: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
        (i.toLong, Seq.fill(dims)((rnd.nextInt(255) - 127).toDouble.toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("buildOrLoad: stored graph == rebuild; second call reads, not rebuilds") {
    val df = randomVecs(70, 8, seed = 13)
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_idx").toString + "/g"
    def rows(g: org.apache.spark.sql.DataFrame) =
      g.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val stored = AnnIndex.buildOrLoad(df, "vec_id", "embedding", 4, 2, 8, dir)
    val rebuilt = Similarity.nnDescent(df, "vec_id", "embedding", 4, 2, 8)
    assert(rows(stored) == rows(rebuilt), "persistence changed the graph")
    // reuse: poison one parquet cell? cheaper — the second load's plan
    // must be a bare parquet scan with no NN-Descent lineage
    val again = AnnIndex.buildOrLoad(df, "vec_id", "embedding", 4, 2, 8, dir)
    val plan = again.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"second buildOrLoad is not a plain store read:\n$plan")
    assert(rows(again) == rows(rebuilt))
  }

  test("insertBatch: base lists never worsen; new nodes get k-deep lists") {
    val all = randomVecs(90, 8, seed = 17)
    val base = all.filter(col("vec_id") % 9 =!= 0)
    val batch = all.filter(col("vec_id") % 9 === 0)
    val g = Similarity.nnDescent(base, "vec_id", "embedding", 5, 2, 8)
      .localCheckpoint()
    val patched = AnnIndex.insertBatch(g, base, batch, "vec_id", "embedding",
      k = 5, entryIds = Seq(1L, 2L), beam = 10, searchRounds = 3)
      .localCheckpoint()
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("q_id")).agg(sum(col("d2")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (before, after) = (sums(g), sums(patched))
    for ((id, s) <- before)
      assert(after(id) <= s, s"insert worsened base node $id: $s -> ${after(id)}")
    val newDeg = patched.filter(col("q_id") % 9 === 0)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(newDeg.nonEmpty && newDeg.forall(_ == 5L),
      "new nodes must carry full k-deep adjacency")
    // scale shape: the insert path is keyed joins only
    val plan = AnnIndex.insertBatch(g, base, batch, "vec_id", "embedding",
      k = 5, entryIds = Seq(1L, 2L), beam = 10, searchRounds = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in insert:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNL in insert:\n$plan")
  }

  test("tombstoneDelete: edges dropped both ways; orphans and repair queue surface") {
    import graft.operators.AnnIndex
    // hand-built graph so the orphan case is certain: node 5's entire
    // list is tombstoned, node 1's list survives intact
    val graph = Seq(
        (1L, 2L, 10L, 1), (1L, 3L, 20L, 2),
        (2L, 1L, 10L, 1), (2L, 9L, 30L, 2),
        (3L, 9L, 5L, 1), (3L, 8L, 6L, 2),
        (5L, 8L, 7L, 1), (5L, 9L, 9L, 2),
        (9L, 5L, 9L, 1), (9L, 8L, 11L, 2))
      .toDF("q_id", "n_id", "d2", "rank")
    // corpus ids 1,2,3,5,9 survive; 8 and 9 tombstoned? keep 8 out, 9 out
    val remaining = Seq(1L, 2L, 3L, 5L).toDF("vec_id")
    val out = AnnIndex.tombstoneDelete(graph, remaining, "vec_id", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L), "survivor rows must be exactly the remaining ids")
    assert(out(1L) == ((2L, false)), "untouched full list must not queue for repair")
    assert(out(2L) == ((1L, true)), "half-degraded list must queue")
    assert(out(3L) == ((0L, true)), "list of only tombstones must orphan to 0")
    assert(out(5L) == ((0L, true)), "fully-orphaned node must surface, not vanish")
  }

  test("repairLists: the delete queue refills to k on a connected graph") {
    import graft.operators.AnnIndex
    val all = randomVecs(80, 8, seed = 43)
    val remaining = all.filter(col("vec_id") % 8 =!= 5)
    val g = Similarity.nnDescent(all, "vec_id", "embedding", 6, 3, 8)
      .localCheckpoint()
    val kept = AnnIndex.survivingEdges(g, remaining, "vec_id").localCheckpoint()
    val queueBefore = AnnIndex.tombstoneDelete(g, remaining, "vec_id", k = 6)
      .filter(col("needs_repair")).count()
    assert(queueBefore > 0, "fixture must actually degrade some lists")
    val rep = AnnIndex.repairLists(kept, remaining, "vec_id", "embedding",
        k = 6, entryIds = Seq(0L, 1L), beam = 12, searchRounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.length == queueBefore, "repair must process exactly the queue")
    assert(rep.forall(_._2 < 6), "queue rows must all have been degraded")
    assert(rep.forall(_._3 == 6L),
      s"connected-graph repair must refill to k: ${rep.filter(_._3 != 6L).mkString(", ")}")
    // repaired nodes' neighbors are all survivors by construction: the
    // search runs on the kept closure and the merge unions kept edges
    val tomb = (0L until 80L).filter(_ % 8 == 5).toSet
    assert(!rep.exists(r => tomb(r._1)), "a tombstoned node entered the queue")
  }

  test("index serving/repair/filter plans stay on keyed joins — no cartesian, no BNL") {
    import graft.operators.AnnIndex
    val emb = randomVecs(60, 8, seed = 47).withColumn("label", col("vec_id") % 5)
    val g = Similarity.nnDescent(emb, "vec_id", "embedding", 5, 1, 8)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 5)
    def assertKeyed(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a BNL:\n$p")
    }
    assertKeyed("filteredSearchTopK", AnnIndex.filteredSearchTopK(
      g, emb, queries, "vec_id", "embedding", pred = col("label") < 2,
      entryIds = Seq(0L, 1L), beam = 10, rounds = 1, k = 3))
    val remaining = emb.filter(col("vec_id") % 9 =!= 0)
    assertKeyed("tombstoneDelete",
      AnnIndex.tombstoneDelete(g, remaining, "vec_id", k = 5))
    assertKeyed("repairLists", AnnIndex.repairLists(
      AnnIndex.survivingEdges(g, remaining, "vec_id"), remaining,
      "vec_id", "embedding", k = 5, entryIds = Seq(1L, 2L),
      beam = 10, searchRounds = 1))
    // the serve path too: stored-graph search is the q288 shape
    assertKeyed("graphSearchTopK", Similarity.graphSearchTopK(
      g, emb, queries, "vec_id", "embedding", Seq(0L, 1L), 10, 1, 3))
  }

  test("healthAudit: cumulative, and total on a connected graph") {
    val df = randomVecs(60, 4, seed = 23)
    val g = Similarity.nnDescent(df, "vec_id", "embedding", 4, 3, 6)
      .localCheckpoint()
    val audit = AnnIndex.healthAudit(g, entryIds = Seq(0L), hops = 6)
      .orderBy(col("hop")).collect()
    val reached = audit.map(_.getLong(1))
    assert(reached.zip(reached.tail).forall { case (a, b) => a <= b },
      "reach must be cumulative")
    assert(audit.head.getLong(1) == 1L) // hop 0 = the entry itself
    assert(audit.last.getLong(1) == audit.last.getLong(2),
      s"expected full reach on a 2-hash-init graph: ${audit.mkString(", ")}")
    assert(audit.last.getLong(3) == 1000000L)
  }

  test("overlapMatrix: exhaustive-mode pairs estimate exactly; cut math holds") {
    // three sources with engineered overlap, all below k ⇒ θ = 2^60 and
    // every pair's estimate must equal the EXACT distinct-intersection
    val rows =
      (0 until 30).map(i => ("s0", s"v$i")) ++
      (10 until 40).map(i => ("s1", s"v$i")) ++          // |s0 ∩ s1| = 20
      (0 until 5).map(i => ("s2", s"v$i"))               // |s0 ∩ s2| = 5, |s1 ∩ s2| = 0
    val sk = ThetaSketch.sketchBy(rows.toDF("src", "v"), col("src"), col("v"), 64)
    val m = ThetaSketch.overlapMatrix(sk, 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))
      .toMap
    assert(m(("s0", "s1")) == ((30L, 30L, 20L, 20L)))
    assert(m(("s0", "s2")) == ((30L, 5L, 5L, 5L)))
    assert(m(("s1", "s2")) == ((30L, 5L, 0L, 0L)))
    // full sketches: n_common counts only hashes below the shared cut
    // and est scales by 2^60/θ — spot-check the formula on a big pair
    val big = (0 until 500).map(i => ("a", s"x$i")) ++
      (0 until 500).map(i => ("b", s"x$i"))
    val bm = ThetaSketch.overlapMatrix(
        ThetaSketch.sketchBy(big.toDF("src", "v"), col("src"), col("v"), 64), 64)
      .collect().head
    val (nc, theta, est) = (bm.getLong(4), bm.getLong(5), bm.getLong(6))
    // identical sets share the whole sample, but the θ-cut is STRICT
    // (h < θ with θ = h_k), so exactly k-1 entries sit below it — the
    // standard theta-sketch convention the estimator's k-1 numerator
    // mirrors
    assert(nc == 63L, "identical full sketches must share k-1 entries below the cut")
    assert(est == math.floor(
      nc.toDouble * ThetaSketch.HashSpace.toDouble / theta.toDouble).toLong)
  }

  test("serveGraphTopK: streamed serving equals the batch beam search") {
    val emb = randomVecs(50, 8, seed = 31)
    val g = Similarity.nnDescent(emb, "vec_id", "embedding", 5, 2, 8)
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_serve").toString
    emb.filter(col("vec_id") < 6).repartition(2).write.parquet(s"$dir/q")
    val served = graft.streaming.AnnServing.serveGraphTopK(
        spark, g, emb, s"$dir/q", "vec_id BIGINT, embedding ARRAY<FLOAT>",
        queryFilter = col("vec_id") >= 0, idCol = "vec_id",
        vecCol = "embedding", entryIds = Seq(0L, 1L), beam = 8, rounds = 2, k = 3)
      .select(col("q_id"), col("n_id"), col("d2"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sorted.toSeq
    val batch = Similarity.graphSearchTopK(
        g, emb, emb.filter(col("vec_id") < 6), "vec_id", "embedding",
        Seq(0L, 1L), beam = 8, rounds = 2, k = 3)
      .select(col("q_id"), col("n_id"), col("d2"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sorted.toSeq
    assert(served == batch, "streamed serving diverged from the batch search")
  }

  test("round-12 operators are partition-invariant (the engine's determinism discipline)") {
    // every result must be a pure function of the DATA — never of how
    // Spark happened to partition it (that is what makes the DuckDB
    // oracle a fair judge, and what keeps 1000-executor runs
    // reproducible). Re-run each new operator on a deliberately
    // re-partitioned input and require bit-identical rows.
    import graft.operators.{AnnIndex, ThetaSketch}
    val docs = Seq.tabulate(120)(i =>
        (i.toLong, s"s${i % 4}", s"w${i % 23} w${(i * 7) % 23} w${(i * 11) % 23}"))
      .toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    def sk(d: org.apache.spark.sql.DataFrame) = ThetaSketch.sketchBy(
      d.select(col("source"),
        explode(graft.functions.Functions.wordShingles(col("text"), 2)).as("g")),
      col("source"), col("g"), 8)
    assert(rows(ThetaSketch.overlapMatrix(sk(docs), 8)) ==
      rows(ThetaSketch.overlapMatrix(sk(docs.repartition(13)), 8)),
      "overlapMatrix depends on partitioning")
    val emb = randomVecs(50, 8, seed = 53)
    val g = Similarity.nnDescent(emb, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val gb = Similarity.nnDescent(base, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    assert(
      rows(AnnIndex.insertBatch(gb, base, batch, "vec_id", "embedding",
        k = 4, entryIds = Seq(1L, 2L), beam = 8, searchRounds = 2)) ==
      rows(AnnIndex.insertBatch(gb, base.repartition(7),
        batch.repartition(3), "vec_id", "embedding",
        k = 4, entryIds = Seq(1L, 2L), beam = 8, searchRounds = 2)),
      "insertBatch depends on partitioning")
    assert(
      rows(AnnIndex.healthAudit(g, Seq(0L), hops = 3)) ==
      rows(AnnIndex.healthAudit(g.repartition(5), Seq(0L), hops = 3)),
      "healthAudit depends on partitioning")
    val softA = graft.operators.TextAnalysis.unigramTrainSoft(
      docs, "text", maxGram = 2, seedTopK = 8, vocabTarget = 6,
      emRounds = 1, squarings = 2)
    val softB = graft.operators.TextAnalysis.unigramTrainSoft(
      docs.repartition(11), "text", maxGram = 2, seedTopK = 8, vocabTarget = 6,
      emRounds = 1, squarings = 2)
    assert(rows(softA) == rows(softB), "unigramTrainSoft depends on partitioning")
  }

  // ------------------------------------------------------------------
  // Unigram soft E-step: zero-temperature forward-backward posterior
  // ------------------------------------------------------------------

  test("unigram soft posterior matches brute-force enumeration; flow conserves") {
    // tie-rich fixture: in "abab" every 1/2-gram segmentation costs 400
    // (5 optimal paths); "aab" has exactly 2 (aa is overpriced); "bb" 1
    val words = Seq(("abab", 5L), ("aab", 3L), ("bb", 2L)).toDF("w", "f")
    val priced = Seq(
        ("a", 100L), ("b", 100L), ("ab", 200L), ("ba", 200L), ("aa", 250L))
      .toDF("piece", "cost")
    val cost = priced.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute force: enumerate every segmentation, keep the min-cost set,
    // count per-edge usage across it
    def segs(w: String): Seq[Seq[(Int, Int, String)]] = {
      def go(i: Int): Seq[Seq[(Int, Int, String)]] =
        if (i > w.length) Seq(Seq.empty)
        else (1 to 2).filter(n => i + n - 1 <= w.length)
          .map(n => (i, i + n, w.substring(i - 1, i + n - 1)))
          .filter(e => cost.contains(e._3))
          .flatMap(e => go(e._2).map(e +: _))
      go(1)
    }
    val post = graft.operators.TextAnalysis
      .unigramPosterior(words, priced, maxGram = 2, squarings = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)) ->
        (r.getLong(4), r.getLong(5)))
      .toMap
    for (w <- Seq("abab", "aab", "bb")) {
      val all = segs(w)
      val best = all.map(s => s.map(e => cost(e._3)).sum).min
      val opt = all.filter(s => s.map(e => cost(e._3)).sum == best)
      val expectThrough = opt.flatten.groupBy(identity).map {
        case (e, uses) => e -> uses.size.toLong
      }
      val mine = post.filter(_._1._1 == w)
      assert(mine.values.map(_._2).toSet == Set(opt.size.toLong),
        s"$w: npaths ${mine.values.map(_._2).toSet} != ${opt.size}")
      assert(
        mine.map { case ((_, i, j, p), (thr, _)) => ((i, j, p), thr) } ==
          expectThrough.map { case ((i, j, p), t) => ((i, j, p), t) },
        s"$w: per-edge through diverged from brute force")
      // posterior flow conservation: edges leaving position 1 carry all
      // N(w) optimal segmentations exactly once
      val outflow = mine.collect { case ((_, 1, _, _), (thr, _)) => thr }.sum
      assert(outflow == opt.size.toLong, s"$w: outflow $outflow != ${opt.size}")
    }
    // "abab" is genuinely tie-rich — the zero-temperature posterior must
    // spread mass across MORE than one segmentation (else this is hard EM)
    assert(post(("abab", 1, 3, "ab"))._2 == 5L)
    assert(post.filter(_._1._1 == "abab").values.exists(_._1 > 1L))
  }

  test("unigramTrainSoft: soft counts equal 1e6x hard counts when paths are unique") {
    // asymmetric frequencies so every word's optimal segmentation is
    // unique — and SELF-CHECKED below via npaths == 1, so a fixture that
    // ever grows a tie fails loudly rather than comparing garbage. (A
    // symmetric corpus ties maximally: cost(w2)+cost(x) == cost(w)+
    // cost(2x) whenever the gram counts mirror — the first version of
    // this test proved that the hard way.)
    import graft.operators.TextAnalysis
    val docs = (Seq.fill(7)("ab") ++ Seq.fill(3)("cd") ++ Seq.fill(5)("ad") ++
        Seq.fill(2)("b"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (words, _, vocab0) = TextAnalysis.unigramSeedTables(
      docs, "text", maxGram = 2, seedTopK = 10, squarings = 1)
    val np = TextAnalysis.unigramPosterior(
        words, TextAnalysis.unigramPrice(vocab0), maxGram = 2, squarings = 1)
      .select(col("w"), col("npaths")).distinct().collect()
    assert(np.forall(_.getLong(1) == 1L),
      s"fixture is not single-path: ${np.mkString(", ")}")
    val soft = TextAnalysis.unigramTrainSoft(docs, "text", maxGram = 2,
        seedTopK = 10, vocabTarget = 8, emRounds = 1, squarings = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val hard = TextAnalysis.unigramTrain(docs, "text", maxGram = 2,
        seedTopK = 10, vocabTarget = 8, emRounds = 1, squarings = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(soft.keySet == hard.keySet,
      s"vocabs diverged: ${soft.keySet} vs ${hard.keySet}")
    val diverged = soft.filter { case (p, c) => hard(p) * 1000000L != c }
    assert(diverged.isEmpty,
      s"soft != 1e6*hard on a single-path corpus: $diverged")
  }

  // ------------------------------------------------------------------
  // JPEG: 4:2:0 / 4:2:2 / restart intervals / marker hardening
  // ------------------------------------------------------------------

  import graft.multimodal.Jpeg

  /** The decoder's own YCbCr->RGB arithmetic, restated independently:
    * Math.round == floor(x + 0.5), clamp after round. */
  private def rgb(y: Int, cb0: Int, cr0: Int): Int = {
    val (cb, cr) = (cb0 - 128.0, cr0 - 128.0)
    def c8(v: Double) = math.max(0, math.min(255, math.round(v).toInt))
    (c8(y + 1.402 * cr) << 16) | (c8(y - 0.344136 * cb - 0.714136 * cr) << 8) |
      c8(y + 1.772 * cb)
  }

  test("JPEG 4:2:0: full color round-trip is pixel-exact incl. clipped MCUs") {
    // 21x13: 2x1 MCU grid of 16x16, both right and bottom edges clipped
    for (id <- Seq(0L, 5L, 17L)) {
      val (w, h) = (21, 13)
      val bytes = Jpeg.encodeJpeg420(w, h,
        (bx, by) => Jpeg.blockValue(id, bx, by),
        (mx, my) => Jpeg.chromaCb(id, mx, my),
        (mx, my) => Jpeg.chromaCr(id, mx, my))
      val img = Jpeg.decodeJpeg(bytes).getOrElse(fail(s"id=$id: decode None"))
      assert((img.width, img.height, img.nComponents) == (w, h, 3))
      for (y <- 0 until h; x <- 0 until w) {
        val expect = rgb(
          Jpeg.blockValue(id, x / 8, y / 8),
          Jpeg.chromaCb(id, x / 16, y / 16),
          Jpeg.chromaCr(id, x / 16, y / 16))
        assert(img.pixels(y * w + x) == expect,
          s"id=$id pixel ($x,$y): got ${img.pixels(y * w + x)}%06x want $expect%06x")
      }
    }
  }

  test("JPEG restart intervals: DRI/RSTn stream decodes to the identical image") {
    val (w, h) = (33, 17) // 3x2 MCUs: interval 2 puts RSTs mid-row and mid-frame
    def enc(ri: Int) = Jpeg.encodeJpeg420(w, h,
      (bx, by) => Jpeg.blockValue(9L, bx, by),
      (mx, my) => Jpeg.chromaCb(9L, mx, my),
      (mx, my) => Jpeg.chromaCr(9L, mx, my), restartInterval = ri)
    val plain = Jpeg.decodeJpeg(enc(0)).getOrElse(fail("plain decode None"))
    for (ri <- Seq(1, 2, 5)) {
      val withRst = Jpeg.decodeJpeg(enc(ri))
        .getOrElse(fail(s"ri=$ri decode None"))
      assert(withRst.pixels.toSeq == plain.pixels.toSeq,
        s"restart interval $ri changed the decoded image")
    }
    // the DRI/RST stream must actually contain restart markers
    val b = enc(1)
    assert(b.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7))
  }

  test("JPEG 4:2:2 decodes via the generic replication upsample") {
    val (w, h) = (20, 10)
    val bytes = Jpeg.encodeJpeg422(w, h,
      (bx, by) => Jpeg.blockValue(3L, bx, by),
      (mx, my) => Jpeg.chromaCb(3L, mx, my),
      (mx, my) => Jpeg.chromaCr(3L, mx, my))
    val img = Jpeg.decodeJpeg(bytes).getOrElse(fail("4:2:2 decode None"))
    for (y <- 0 until h; x <- 0 until w) {
      val expect = rgb(
        Jpeg.blockValue(3L, x / 8, y / 8),
        Jpeg.chromaCb(3L, x / 16, y / 8), // 2x1: chroma block = MCU = 16x8
        Jpeg.chromaCr(3L, x / 16, y / 8))
      assert(img.pixels(y * w + x) == expect, s"4:2:2 pixel ($x,$y)")
    }
  }

  test("JPEG AC coefficients decode through run-length + extend + IDCT") {
    // the fixtures are DC-only by design (pixel-exact round trips), so
    // the AC branch needs its own positive lock: craft a stream whose
    // single block carries DC diff 0 and ONE AC coefficient — value 1
    // at scan position 1 (natural u=1, v=0) — and check every decoded
    // pixel against the IDCT formula computed independently here.
    val base = Jpeg.encodeJpegGray(8, 8, seed = 0L)
    def u16(b: Array[Byte], o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    var pos = 2
    var sosEnd = -1
    while (sosEnd < 0) {
      assert((base(pos) & 0xff) == 0xff, "fixture marker walk broke")
      val len = u16(base, pos + 2)
      if ((base(pos + 1) & 0xff) == 0xda) sosEnd = pos + 4 + len - 2
      pos = pos + 4 + len - 2
    }
    // Annex K canonical codes: DC size-0 = 00; AC (0,1) = 00 + 1 value
    // bit; EOB (0x00, 4th AC val) = 1010; pad the last byte with 1s
    val bits = "00" + "00" + "1" + "1010"
    val padded = bits + "1" * ((8 - bits.length % 8) % 8)
    val entropy = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val stream = base.take(sosEnd) ++ entropy ++ Array(0xff.toByte, 0xd9.toByte)
    val img = Jpeg.decodeJpeg(stream).getOrElse(fail("AC stream decoded to None"))
    assert((img.width, img.height, img.nComponents) == (8, 8, 1))
    val c0 = 1.0 / math.sqrt(2.0)
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = math.round(c0 * math.cos((2 * x + 1) * math.Pi / 16) / 4.0).toInt + 128
      val expect = math.max(0, math.min(255, p))
      assert(img.pixels(y * 8 + x) == expect,
        s"AC pixel ($x,$y): got ${img.pixels(y * 8 + x)} want $expect")
    }
  }

  test("filteredSearchTopK: predicate honored; recall holds at ~2/5 selectivity") {
    val emb = randomVecs(60, 8, seed = 41)
      .withColumn("label", col("vec_id") % 5)
    val g = Similarity.nnDescent(emb, "vec_id", "embedding", 6, 3, 6)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 8)
    val got = graft.operators.AnnIndex.filteredSearchTopK(
        g, emb, queries, "vec_id", "embedding",
        pred = col("label") < 2, entryIds = Seq(0L, 1L),
        beam = 20, rounds = 3, k = 3)
      .localCheckpoint()
    // every result satisfies the predicate, ranks are 1..<=k per query
    val allowed = emb.filter(col("label") < 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(rows.forall { case (_, n, _) => allowed(n) },
      "filtered search returned a non-matching vector")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"ranks broken for $q")
    }
    // oversample-then-filter recall vs exact FILTERED L2
    val recall = Similarity.recallAtK(got,
        Similarity.l2TopK(emb.filter(col("label") < 2), queries,
          "vec_id", "embedding", k = 3), k = 3)
      .agg(avg(col("recall_ppm"))).head().getDouble(0)
    assert(recall >= 500000.0, s"filtered recall collapsed: $recall ppm")
  }

  test("PNG full decode: all five filters reconstruct the exact ramp; junk is None") {
    import graft.multimodal.Codecs
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((9, 7), (1, 6), (5, 1))) {
      // h >= 5 cases cycle through every filter type; w = 1 exercises
      // the no-left-neighbor branches of Sub/Average/Paeth
      val bytes = Codecs.encodePng(w, h, seed, varyFilters = true)
      val img = Codecs.decodePng(bytes)
        .getOrElse(fail(s"seed=$seed ${w}x$h: decode None"))
      assert((img.width, img.height) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val v = seed + y.toLong * w + x
        val expect = (((v & 255) << 16) | (((v >> 8) & 255) << 8) |
          ((v >> 16) & 255)).toInt
        assert(img.pixels(y * w + x) == expect, s"seed=$seed pixel ($x,$y)")
      }
      // filters are content-invariant: the plain filter-0 stream decodes
      // to the identical image
      val plain = Codecs.decodePng(Codecs.encodePng(w, h, seed)).get
      assert(plain.pixels.toSeq == img.pixels.toSeq)
    }
    // skip-not-fail: truncation, 16-bit, interlaced, corrupt IDAT
    val ok = Codecs.encodePng(6, 5, 3L, varyFilters = true)
    assert(Codecs.decodePng(ok.take(ok.length / 2)).isEmpty)
    val deep = ok.clone(); deep(24) = 16.toByte
    assert(Codecs.decodePng(deep).isEmpty, "16-bit must be None")
    val il = ok.clone(); il(28) = 1.toByte
    assert(Codecs.decodePng(il).isEmpty, "interlaced must be None")
    // a flipped IDAT byte may break the inflate, the length check, or
    // decode to garbage — the contract is only that it NEVER throws
    val corrupt = ok.clone(); corrupt(45) = (corrupt(45) ^ 0x5a).toByte
    Codecs.decodePng(corrupt)
  }

  test("WAV PCM decode: signed LE samples match the sawtooth; truncation is None") {
    import graft.multimodal.Codecs
    // seed near the int16 wrap so sign reinterpretation is exercised
    val bytes = Codecs.encodeWav(sampleRate = 9000, channels = 2,
      nSamples = 40, seed = 32760L)
    val (info, samples) = Codecs.decodeWavSamples(bytes)
      .getOrElse(fail("decode None"))
    assert((info.sampleRate, info.channels, info.nSamples) == ((9000, 2, 40L)))
    assert(samples.length == 80)
    for (i <- samples.indices) {
      val u = (32760L + i) % 65536
      val expect = (if (u < 32768) u else u - 65536).toInt
      assert(samples(i) == expect, s"sample $i: ${samples(i)} != $expect")
    }
    // zero-length payload decodes to an empty sample array, not None
    val empty = Codecs.encodeWav(8000, 1, 0, seed = 1L)
    assert(Codecs.decodeWavSamples(empty).exists(_._2.isEmpty))
    // truncation: the data chunk promises more bytes than the file has
    assert(Codecs.decodeWavSamples(bytes.take(bytes.length - 10)).isEmpty)
    // non-16-bit PCM skips
    val odd = bytes.clone(); odd(34) = 8.toByte
    assert(Codecs.decodeWavSamples(odd).isEmpty, "8-bit must be None")
  }

  test("BMP pixel decode: offset/padding/bottom-up/BGR all reconstruct the ramp") {
    import graft.multimodal.Codecs
    for ((w, h) <- Seq((5, 4), (1, 3), (4, 1))) { // w=5,1: padded rows
      val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, seed = 11L))
        .getOrElse(fail(s"${w}x$h decode None"))
      for (y <- 0 until h; x <- 0 until w) {
        // encodeBmp writes storage row y bottom-up: image row h-1-y
        val v = 11L + (h - 1 - y).toLong * w + x
        val expect = ((((v >> 16) & 255) << 16) | (((v >> 8) & 255) << 8) |
          (v & 255)).toInt
        assert(img.pixels(y * w + x) == expect, s"pixel ($x,$y)")
      }
    }
    val ok = Codecs.encodeBmp(5, 4, 11L)
    assert(Codecs.decodeBmp(ok.take(ok.length - 4)).isEmpty, "truncation must skip")
  }

  test("AVI frame decode: per-frame sums match the ramp; malformed movi skips") {
    import graft.multimodal.Codecs
    val (w, h, nf) = (6, 3, 4)
    val bytes = Codecs.encodeAviFrames(w, h, nf, seed = 9L)
    val (info, sums) = Codecs.decodeAviFrames(bytes)
      .getOrElse(fail("frame decode None"))
    assert((info.width, info.height, info.nFrames) == ((w, h, nf.toLong)))
    assert(sums.length == nf)
    for (f <- 0 until nf) {
      val expect = (0 until w * h).map { p =>
        val v = 9L + f.toLong * w * h + p
        (((v >> 16) & 255) << 16) | (((v >> 8) & 255) << 8) | (v & 255)
      }.sum
      assert(sums(f) == expect, s"frame $f: ${sums(f)} != $expect")
    }
    // the header-only encoder's EMPTY movi decodes to zero frames, not None
    val empty = Codecs.decodeAviFrames(Codecs.encodeAvi(6, 3, nFrames = 4))
    assert(empty.exists(_._2.isEmpty))
    // a frame chunk whose length isn't w*h*3 is not raw BGR24: skip
    val bad = bytes.clone()
    // first frame chunk length field sits at movi data start + 4
    bad(104) = (bad(104) ^ 0x01).toByte
    assert(Codecs.decodeAviFrames(bad).isEmpty)
    assert(Codecs.decodeAviFrames(bytes.take(bytes.length / 2)).isEmpty)
  }

  test("resampleWav: decimation keeps exactly every den-th frame, all channels") {
    import graft.multimodal.Codecs
    val src = Codecs.encodeWav(sampleRate = 16000, channels = 2,
      nSamples = 11, seed = 100L)
    val out = Codecs.resampleWav(src, den = 3).getOrElse(fail("resample None"))
    val (info, samples) = Codecs.decodeWavSamples(out).get
    assert(info.sampleRate == 5333 && info.channels == 2)
    assert(info.nSamples == 4L) // frames 0, 3, 6, 9
    val expect = Seq(0, 3, 6, 9).flatMap(f => Seq(0, 1).map { c =>
      val u = (100L + f * 2 + c) % 65536
      (if (u < 32768) u else u - 65536).toInt
    })
    assert(samples.toSeq == expect, "decimation picked the wrong frames")
    // den = 1 is the identity on samples
    val id1 = Codecs.resampleWav(src, den = 1).get
    assert(Codecs.decodeWavSamples(id1).get._2.toSeq ==
      Codecs.decodeWavSamples(src).get._2.toSeq)
    assert(Codecs.resampleWav(src.take(20), den = 2).isEmpty)
  }

  test("JPEG marker hardening: fill bytes + standalone TEM parse; junk is None") {
    val base = Jpeg.encodeJpegGray(12, 9, seed = 4L)
    val want = Jpeg.decodeJpeg(base).get.pixels.toSeq
    // inject a standalone TEM marker and an extra 0xFF fill byte after SOI
    val padded = (base.take(2) :+ 0xff.toByte :+ 0x01.toByte :+ 0xff.toByte) ++
      base.drop(2)
    val dec = Jpeg.decodeJpeg(padded)
    assert(dec.isDefined && dec.get.pixels.toSeq == want,
      "fill bytes / standalone markers broke the scan loop")
    // still skip-not-fail on garbage: truncation, progressive, bad sampling
    assert(Jpeg.decodeJpeg(base.take(base.length / 2)).isEmpty)
    val prog = base.clone()
    // SOI(2) + DQT(2+2+65=69) puts SOF0 marker at offset 71: flip to SOF2
    assert((prog(72) & 0xff) == 0xc0, "fixture layout changed")
    prog(72) = 0xc2.toByte
    assert(Jpeg.decodeJpeg(prog).isEmpty, "progressive must decode to None")
  }
}
