package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-11 locks: NN-Descent k-NN-graph construction. */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomVecs(n: Int, dims: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
        (i.toLong, Seq.fill(dims)((rnd.nextInt(255) - 127).toDouble.toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("nnDescent: per-node Σd2 is monotonically non-increasing in rounds") {
    val df = randomVecs(80, 16, seed = 7)
    def sums(rounds: Int): Map[Long, Long] =
      Similarity.nnDescent(df, "vec_id", "embedding",
          k = 4, rounds = rounds, initBuckets = 8, checkpointEvery = 1)
        .groupBy(col("q_id")).agg(sum(col("d2")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byRound = (0 to 3).map(sums)
    for (r <- 1 to 3; (id, s) <- byRound(r)) {
      // a node may be missing from an earlier round only if its init
      // bucket was a singleton — every id here has bucket-mates
      assert(s <= byRound(r - 1)(id),
        s"round $r worsened node $id: ${byRound(r - 1)(id)} -> $s")
    }
  }

  test("nnDescent climbs to near-exact recall on a low-dim instance") {
    // NN-Descent is a local search, not an exact algorithm — the lock is
    // the recall CURVE: strictly better than init, near-exact after the
    // rounds a 4-dim instance needs (the fixed seed pins determinism)
    val df = randomVecs(60, 4, seed = 11)
    val exact = Similarity.l2TopK(df, df, "vec_id", "embedding", k = 8)
    def recall(rounds: Int): Double = {
      val approx = Similarity.nnDescent(df, "vec_id", "embedding",
        k = 8, rounds = rounds, initBuckets = 6, checkpointEvery = 1)
      val r = Similarity.recallAtK(approx, exact, k = 8)
        .agg(avg(col("recall_ppm"))).head().getDouble(0)
      r / 1e6
    }
    val (r0, r5) = (recall(0), recall(5))
    assert(r5 > r0, s"rounds did not improve recall: $r0 -> $r5")
    assert(r5 >= 0.95, s"expected near-exact recall after 5 rounds, got $r5")
  }

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("leidenRefine splits a bridge-connected community Louvain froze") {
    // two 5-cliques joined by ONE bridge edge, all forced into a single
    // community — the published badly-connected shape. Refinement from
    // singletons rebuilds each clique but the bridge alone can't merge
    // them: the refined partition is exactly the two cliques, and its
    // exact integer modularity beats the frozen single community.
    val edges = sym(clique(0L to 4L) ++ clique(5L to 9L) :+ (0L, 5L))
    val one = edges.select(col("src").as("node")).distinct()
      .select(col("node"), lit(0L).as("community"))
    val refined = graft.operators.Graph.leidenRefine(edges, one, rounds = 3)
    val groups = refined.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(groups == Set((0L to 4L).toSet, (5L to 9L).toSet), groups.toString)
    def q(labels: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Graph.modularityByCommunity(edges, labels)
        .agg(sum(col("contrib"))).head().getLong(0)
    assert(q(refined) > q(one),
      s"refinement did not improve modularity: ${q(refined)} <= ${q(one)}")
  }

  test("leidenRefine never crosses a phase-1 community boundary") {
    // a fully-connected 6-clique artificially split 3/3: refinement must
    // keep the cut — moves are proposed only across intra-community
    // edges, so no refined community may span both sides (a singleton
    // restart WITHOUT the restriction would re-merge the clique)
    val edges = sym(clique(0L to 5L))
    val split = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("node", "community")
    val refined = graft.operators.Graph.leidenRefine(edges, split, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sides = refined.groupBy(_._2).values.map(_.keys.map(_ / 3).toSet)
    assert(sides.forall(_.size == 1),
      s"a refined community crossed the phase-1 cut: $refined")
  }

  test("multi-level Leiden separates what coarse-contraction Louvain froze") {
    import graft.operators.Graph
    // bridge graph with a frozen phase-1 (everything one community).
    // Louvain's pipeline contracts on the COARSE partition: one
    // super-node, nothing can ever split again. Leiden's contracts on
    // the REFINED partition: two super-nodes joined by the 1-weight
    // bridge, and the weighted rounds KEEP them apart (joining loses
    // modularity: 2m·w_AB − deg_A·Σtot(B) = 42 − 441 < 0).
    val edges = sym(clique(0L to 4L) ++ clique(5L to 9L) :+ (0L, 5L))
    val one = edges.select(col("src").as("node")).distinct()
      .select(col("node"), lit(0L).as("community"))
    def finalCommunities(partitionIn: org.apache.spark.sql.DataFrame): Set[Set[Long]] = {
      // truncate the composed lineage: refine -> contract -> rounds
      // multiplies plan references across stages (the q282/q284 lesson)
      val partition = partitionIn.localCheckpoint()
      val lv2 = Graph.louvainRoundsWeighted(
        Graph.contractCommunities(edges, partition).localCheckpoint(), rounds = 2)
      partition.select(col("node"), col("community").as("c1"))
        .join(lv2.select(col("node").as("c1"), col("community")), "c1")
        .select(col("node"), col("community"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    }
    val louvainStyle = finalCommunities(one)
    val leidenStyle = finalCommunities(Graph.leidenRefine(edges, one, rounds = 3))
    assert(louvainStyle == Set((0L to 9L).toSet), louvainStyle.toString)
    assert(leidenStyle == Set((0L to 4L).toSet, (5L to 9L).toSet),
      leidenStyle.toString)
  }

  test("leidenRefine re-merges a well-connected community") {
    val edges = sym(clique(0L to 5L))
    val one = (0L to 5L).map(i => (i, 0L)).toDF("node", "community")
    val refined = graft.operators.Graph.leidenRefine(edges, one, rounds = 3)
      .collect().map(_.getLong(1)).toSet
    assert(refined.size == 1, s"well-connected clique split: $refined")
  }

  test("unigram-LM: min-plus DP matches brute-force Viterbi segmentation") {
    val docs = Seq(
      (1L, "abab abab cdcd abcd aa bb"),
      (2L, "abab cdcd cdcd abc ab cd"),
      (3L, "aabb ccdd abab cdab baba bcd")).toDF("doc_id", "text")
    val vocab = graft.operators.TextAnalysis.unigramTrain(docs, "text",
        maxGram = 3, seedTopK = 20, vocabTarget = 10, emRounds = 2,
        squarings = 3)
      .collect()
    // chars are never pruned (the segmentability fallback) and the
    // non-char vocab respects the prune budget
    assert(vocab.filter(_.getBoolean(1)).map(_.getString(0)).toSet ==
      Set("a", "b", "c", "d"), vocab.mkString(", "))
    assert(vocab.count(!_.getBoolean(1)) <= 10)
    val cost = vocab.map(r => r.getString(0) -> r.getLong(3)).toMap
    def minCost(w: String): Long =
      if (w.isEmpty) 0L
      else (1 to math.min(3, w.length)).flatMap(n =>
        cost.get(w.take(n)).map(_ + minCost(w.drop(n)))).min
    val expected = Seq(
      "abab abab cdcd abcd aa bb",
      "abab cdcd cdcd abc ab cd",
      "aabb ccdd abab cdab baba bcd")
      .map(_.split(" ").map(minCost).sum)
    val got = graft.operators.TextAnalysis.unigramEncodeStats(docs,
        "doc_id", "text", maxGram = 3, seedTopK = 20, vocabTarget = 10,
        emRounds = 2, squarings = 3)
      .orderBy(col("doc_id")).collect()
    for ((row, exp) <- got.zip(expected))
      assert(row.getLong(3) == exp,
        s"doc ${row.getLong(0)}: DP cost ${row.getLong(3)} != brute $exp")
    // token counts bounded by chars (all-singles) and chars/maxGram
    for (row <- got) {
      val chars = row.getLong(1) // n_words lower bound proxy
      assert(row.getLong(2) >= chars, row.toString) // >= one token per word
    }
  }

  test("theta sketch: union is exact KMV composition — associative, bit-identical") {
    import graft.operators.ThetaSketch
    val k = 16
    val chunks = Seq(0, 1, 2).map(c =>
      Seq.tabulate(200)(i => s"item_${c * 137 + i * 3}").toDF("v"))
    val whole = ThetaSketch.sketch(chunks.reduce(_ unionByName _), col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    val sks = chunks.map(c => ThetaSketch.sketch(c, col("v"), k))
    def hs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq
    val leftAssoc = hs(ThetaSketch.union(
      ThetaSketch.union(sks(0), sks(1), k), sks(2), k))
    val rightAssoc = hs(ThetaSketch.union(
      sks(0), ThetaSketch.union(sks(1), sks(2), k), k))
    assert(leftAssoc == whole && rightAssoc == whole,
      s"KMV union not exact: whole=$whole left=$leftAssoc right=$rightAssoc")
  }

  test("theta sketch: exhaustive mode is exact; set-op estimates are sane") {
    import graft.operators.ThetaSketch
    val k = 64
    // |A| = 40 < k, |B| = 30 < k, overlap 20: everything exhaustive, so
    // est == exact for a, b, union; intersect/diff at theta = 2^60 are
    // exact sample counts scaled by 1 — also exact
    val a = (0 until 40).map(i => s"x$i").toDF("v")
    val b = (20 until 50).map(i => s"x$i").toDF("v")
    val ska = ThetaSketch.sketch(a, col("v"), k)
    val skb = ThetaSketch.sketch(b, col("v"), k)
    val rows = ThetaSketch.estimateRow(ska, k, "a")
      .unionByName(ThetaSketch.estimateRow(skb, k, "b"))
      .unionByName(ThetaSketch.estimateRow(ThetaSketch.union(ska, skb, k), k, "union"))
      .unionByName(ThetaSketch.setOpRows(ska, skb, k))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows == Map("a" -> 40L, "b" -> 30L, "union" -> 50L,
      "intersect" -> 20L, "diff_a_b" -> 20L), rows.toString)
  }

  test("JPEG: DC-only blocks round-trip pixel-exactly, including clipped edges") {
    import graft.multimodal.Jpeg
    for ((w, h, seed) <- Seq((13, 9, 42L), (8, 8, 7L), (1, 1, 3L), (31, 17, 499L))) {
      val img = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(w, h, seed))
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h && img.nComponents == 1)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = Jpeg.blockValue(seed, x / 8, y / 8)
        assert(img.pixels(y * w + x) == expect,
          s"(${w}x$h seed=$seed) pixel ($x,$y): ${img.pixels(y * w + x)} != $expect")
      }
    }
  }

  test("JPEG: 3-component 4:4:4 decode applies the JFIF YCbCr->RGB conversion") {
    import graft.multimodal.Jpeg
    // neutral chroma (128) must decode to pure gray = Y in all channels
    val gray = Jpeg.decodeJpeg(Jpeg.encodeJpegColor(10, 6,
      (bx, by) => 40 + 16 * bx + 8 * by, (_, _) => 128, (_, _) => 128)).get
    assert(gray.nComponents == 3)
    for (y <- 0 until 6; x <- 0 until 10) {
      val v = 40 + 16 * (x / 8) + 8 * (y / 8)
      assert(gray.pixels(y * 10 + x) == ((v << 16) | (v << 8) | v),
        s"($x,$y): ${gray.pixels(y * 10 + x).toHexString}")
    }
    // a non-neutral chroma block: verify against the reference formula
    val c = Jpeg.decodeJpeg(Jpeg.encodeJpegColor(4, 4,
      (_, _) => 100, (_, _) => 90, (_, _) => 170)).get
    def clamp(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
    val expect = (clamp(100 + 1.402 * 42) << 16) |
      (clamp(100 - 0.344136 * -38 - 0.714136 * 42) << 8) | clamp(100 + 1.772 * -38)
    assert(c.pixels.forall(_ == expect),
      s"${c.pixels(0).toHexString} != ${expect.toHexString}")
  }

  test("JPEG: corrupt and unsupported payloads decode to None, never throw") {
    import graft.multimodal.Jpeg
    val good = Jpeg.encodeJpegGray(16, 16, 5L)
    assert(Jpeg.decodeJpeg(good.take(good.length / 2)).isEmpty) // truncated
    assert(Jpeg.decodeJpeg(Array[Byte](1, 2, 3)).isEmpty)       // not a JPEG
    val progressive = good.clone() // flip SOF0 -> SOF2 marker
    val sofAt = (0 until progressive.length - 1).find(i =>
      (progressive(i) & 0xff) == 0xff && (progressive(i + 1) & 0xff) == 0xc0).get
    progressive(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeJpeg(progressive).isEmpty)
    assert(graft.multimodal.Codecs.sniff(good).contains("jpeg"))
  }

  test("hilbertKey2 matches the reference xy2d algorithm and is adjacent-stepped") {
    import graft.operators.Layout
    // reference implementation (classic xy2d with rotation)
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      val n = 1L << bits
      var s = n >> 1
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val rng = new scala.util.Random(29) // seeded: failures must reproduce
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)) ++
      Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val exhaustive = pts.take(1024).toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.Functions.hilbertKey2(col("x"), col("y"), 5).as("h"))
      .collect()
    exhaustive.foreach(r => assert(r.getLong(2) == xy2d(5, r.getLong(0), r.getLong(1)),
      s"(${r.getLong(0)},${r.getLong(1)}): ${r.getLong(2)} != ${xy2d(5, r.getLong(0), r.getLong(1))}"))
    val rnd = pts.drop(1024).toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.Functions.hilbertKey2(col("x"), col("y"), 16).as("h"))
      .collect()
    rnd.foreach(r => assert(r.getLong(2) == xy2d(16, r.getLong(0), r.getLong(1))))
    // the defining locality property Morton lacks: consecutive curve
    // positions are ALWAYS grid neighbors (|dx| + |dy| = 1)
    val byD = exhaustive.map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    for (Array((d1, (x1, y1)), (d2, (x2, y2))) <- byD.sliding(2).map(_.toArray)) {
      assert(d2 == d1 + 1 && math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"curve step $d1->$d2 not adjacent: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbert layout: per-file spans beat z-order on the same harness") {
    import graft.operators.Layout
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Engine.table(spark, sf, "orders")
    val base = java.nio.file.Files.createTempDirectory("graft_hilbert_spec").toString
    Layout.hilbertWrite(orders, "o_custkey", "o_orderdate", s"$base/h", numFiles = 8)
    Layout.zorderWrite(orders, "o_custkey", "o_orderdate", s"$base/z", numFiles = 8)
    def spans(dir: String): (Double, Double) = {
      val df = spark.read.parquet(dir)
        .select(input_file_name().as("f"), $"o_custkey",
          unix_micros($"o_orderdate".cast("timestamp")).as("d"))
      val g = df.agg(
        (max($"o_custkey") - min($"o_custkey")).cast("double").as("ck"),
        (max($"d") - min($"d")).cast("double").as("dd")).head()
      val per = df.groupBy($"f").agg(
        (max($"o_custkey") - min($"o_custkey")).cast("double").as("ck"),
        (max($"d") - min($"d")).cast("double").as("dd"))
        .agg(avg($"ck"), avg($"dd")).head()
      (per.getDouble(0) / g.getDouble(0), per.getDouble(1) / g.getDouble(1))
    }
    val (hck, hdd) = spans(s"$base/h")
    val (zck, zdd) = spans(s"$base/z")
    // both bounded on both dimensions; Hilbert's SUM of normalized spans
    // must not exceed z-order's (the locality win; per-dimension splits
    // can trade off, the total must not)
    assert(hck < 0.7 && hdd < 0.7, s"hilbert spans too wide: $hck / $hdd")
    assert(hck + hdd <= zck + zdd + 1e-9,
      s"hilbert ($hck + $hdd) did not beat z-order ($zck + $zdd)")
  }

  test("graphSearchTopK: beam Σd2 monotone per round; wide beam on a good graph is exact") {
    val df = randomVecs(60, 4, seed = 23)
    val queries = df.filter(col("vec_id") < 6)
    val g = Similarity.nnDescent(df, "vec_id", "embedding",
      k = 8, rounds = 5, initBuckets = 6, checkpointEvery = 1)
    // per-RANK monotonicity (the beam FILLS UP in early rounds — a
    // larger beam's d2 SUM can grow while every rank strictly improves)
    def beamRanks(rounds: Int, beam: Int): Map[(Long, Int), Long] =
      Similarity.graphSearchTopK(g, df, queries, "vec_id", "embedding",
          entryIds = Seq(0L, 1L), beam = beam, rounds = rounds, k = beam)
        .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(2)).toMap
    val byRound = (0 to 3).map(beamRanks(_, 6))
    for (r <- 1 to 3; (key, d2prev) <- byRound(r - 1)) {
      val d2now = byRound(r).getOrElse(key,
        fail(s"round $r lost rank $key"))
      assert(d2now <= d2prev,
        s"round $r worsened $key: $d2prev -> $d2now")
    }
    // a wide beam over a near-exact graph converges to the exact top-k
    val got = Similarity.graphSearchTopK(g, df, queries, "vec_id", "embedding",
        entryIds = Seq(0L, 1L), beam = 20, rounds = 6, k = 5)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.l2TopK(df, queries, "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
  }

  test("nnDescent plan: keyed joins only — no cartesian, no nested loops") {
    val emb = graft.core.Engine.table(spark, "/root/testdata/sf0.001", "embeddings")
    // checkpointEvery = 0 keeps init + the round in ONE inspectable plan
    // (the default truncates per round, hiding earlier stages)
    val p = Similarity.nnDescent(emb, "vec_id", "embedding",
        k = 5, rounds = 1, initBuckets = 16, checkpointEvery = 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in nnDescent:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in nnDescent:\n$p")
  }
}
