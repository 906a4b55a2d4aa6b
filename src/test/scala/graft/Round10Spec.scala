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

  // ----- KLL quantile sketch ---------------------------------------------

  private def sketchOf(vals: Seq[Long], k: Int): graft.functions.KllState = {
    val s = new graft.functions.KllState(k)
    vals.foreach(v => s.insert(v, 1L))
    s
  }

  private def sketchRank(s: graft.functions.KllState, x: Long): Long =
    s.items.iterator.filter(_._1 <= x).map(_._2).sum

  test("kll sketch: rank-error guarantee holds under every split/merge order") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(5000)(rnd.nextLong() % 100000L)
    def trueRank(x: Long): Long = data.count(_ <= x).toLong
    val probes = data.sorted.grouped(250).map(_.head).toSeq :+ data.max
    val parts = data.grouped(613).map(_.toSeq).toSeq
    for (order <- Seq(parts, parts.reverse, rnd.shuffle(parts))) {
      val whole = new graft.functions.KllState(64)
      order.foreach(chunk => whole.mergeIn(sketchOf(chunk, 64)))
      assert(whole.n == data.length.toLong) // compaction preserves weight exactly
      probes.foreach { x =>
        val d = math.abs(sketchRank(whole, x) - trueRank(x))
        assert(d <= whole.err, s"rank error $d at $x exceeds bound ${whole.err}")
      }
      // the bound is useful, not vacuous: well under N (levels·N/k shape)
      assert(whole.err < data.length / 8,
        s"err_bound ${whole.err} too loose for n=${data.length}")
    }
  }

  test("kll sketch: merge is associative in its guarantees") {
    val rnd = new scala.util.Random(13)
    val chunks = Seq.fill(3)(Seq.fill(2000)(rnd.nextLong() % 50000L))
    val all = chunks.flatten
    def trueRank(x: Long): Long = all.count(_ <= x).toLong
    val Seq(a1, b1, c1) = chunks.map(sketchOf(_, 32))
    val Seq(a2, b2, c2) = chunks.map(sketchOf(_, 32))
    val left = { a1.mergeIn(b1); a1.mergeIn(c1); a1 }    // (a ⊔ b) ⊔ c
    val right = { b2.mergeIn(c2); a2.mergeIn(b2); a2 }   // a ⊔ (b ⊔ c)
    for (s <- Seq(left, right)) {
      assert(s.n == all.length.toLong)
      all.sorted.grouped(500).map(_.head).foreach { x =>
        assert(math.abs(sketchRank(s, x) - trueRank(x)) <= s.err)
      }
    }
  }

  test("kll sketch: weighted re-ingest of a sketch's items IS merge") {
    val rnd = new scala.util.Random(29)
    val chunk1 = Seq.fill(3000)(rnd.nextLong() % 20000L)
    val chunk2 = Seq.fill(3000)(rnd.nextLong() % 20000L)
    val all = chunk1 ++ chunk2
    val s1 = sketchOf(chunk1, 64)
    // the streaming-store path: re-insert s1's (v, w) items as weighted
    // values next to chunk2's raw stream, carrying s1's err separately
    val s2 = new graft.functions.KllState(64)
    s1.items.foreach { case (v, w) => s2.insert(v, w) }
    chunk2.foreach(v => s2.insert(v, 1L))
    val errTotal = s1.err + s2.err
    assert(s2.n == all.length.toLong)
    all.sorted.grouped(500).map(_.head).foreach { x =>
      val d = math.abs(sketchRank(s2, x) - all.count(_ <= x))
      assert(d <= errTotal, s"re-ingest rank error $d exceeds $errTotal")
    }
  }

  test("kll sketch: serde round-trip preserves state exactly mid-stream") {
    // the serialize/deserialize pair carries partial buffers across the
    // shuffle; a lossy round-trip would corrupt silently (the grouped
    // test exercises it only implicitly). Serialize mid-stream, resume
    // inserting into the deserialized copy, and require bit-identical
    // state versus the uninterrupted sketch.
    val rnd = new scala.util.Random(97)
    val first = Seq.fill(2500)(rnd.nextLong() % 7777L)
    val second = Seq.fill(2500)(rnd.nextLong() % 7777L)
    val agg = graft.functions.KllSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 32)
    val direct = sketchOf(first ++ second, 32)
    val resumed = agg.deserialize(agg.serialize(sketchOf(first, 32)))
    second.foreach(v => resumed.insert(v, 1L))
    assert(resumed.n == direct.n && resumed.err == direct.err)
    assert(resumed.items.toSeq == direct.items.toSeq)
    assert(resumed.toggles.toSeq == direct.toggles.toSeq)
  }

  test("kll sketch: identical input order reproduces the identical sketch") {
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(4000)(rnd.nextLong() % 9999L)
    val a = sketchOf(data, 64)
    val b = sketchOf(data, 64)
    assert(a.items.toSeq == b.items.toSeq && a.err == b.err && a.n == b.n)
  }

  test("kll_sketch is SQL-callable and rejects non-BIGINT input at analysis") {
    val df = spark.range(0, 1000).selectExpr("id AS v")
    df.createOrReplaceTempView("kll_sql_probe")
    val r = spark.sql(
      "SELECT kll_sketch(v, 1L, 64).n AS n FROM kll_sql_probe").head()
    assert(r.getLong(0) == 1000L)
    val err = intercept[Exception] {
      spark.sql("SELECT kll_sketch(CAST(v AS STRING), 1L, 64) FROM kll_sql_probe")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"))
  }

  // ----- Louvain ---------------------------------------------------------

  /** Driver-side reference of the synchronous integer Louvain round —
    * the weight-1 view of [[louvainRefW]], mirroring the production
    * delegation (louvainRounds → the shared weighted core). */
  private def louvainRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    louvainRefW(edges.map { case (a, b) => (a, b, 1L) }, rounds)

  test("louvainRounds == driver reference on random graphs") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      // random symmetric graph, no self-loops, no isolated nodes
      val n = 20 + trial * 7
      val undirected = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (a, b)) ++ (0L until n.toLong - 1).map(i => (i, i + 1))
      val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val expected = louvainRef(sym, rounds = 3)
      val got = Graph.louvainRounds(sym.toDF("src", "dst"), rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("louvainRounds: degree penalty keeps communities inside their triangle") {
    // two triangles joined by one bridge edge: no node may ever adopt a
    // label from the far triangle — the flood LPA's plain majority vote
    // is prone to is exactly what the Σtot penalty blocks
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    for (r <- 1 to 4) {
      val labels = Graph.louvainRounds(tri.toDF("src", "dst"), rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L).forall(n => labels(n) <= 3L), s"r=$r: $labels")
      assert(Seq(4L, 5L, 6L).forall(n => labels(n) >= 4L), s"r=$r: $labels")
    }
  }

  /** Weighted driver reference with Louvain self-loop semantics:
    * strength/Σtot include self-loop weight; move scores never do. */
  private def louvainRefW(
      edges: Seq[(Long, Long, Long)], rounds: Int): Map[Long, Long] = {
    val bySrc = edges.groupBy(_._1)
    val deg = bySrc.map { case (n, es) => n -> es.map(_._3).sum }
    val w2m = deg.values.sum
    var labels = deg.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val stot = labels.toSeq.groupBy(_._2)
        .map { case (l, ns) => l -> ns.map(n => deg(n._1)).sum }
      labels = labels.map { case (i, cur) =>
        val wic = bySrc(i).filter(e => e._2 != i)
          .groupBy(e => labels(e._2)).map { case (l, es) => l -> es.map(_._3).sum }
        val cands = wic.keySet + cur
        val best = cands.minBy { c =>
          val st = stot(c) - (if (c == cur) deg(i) else 0L)
          (-(w2m * wic.getOrElse(c, 0L) - deg(i) * st), c)
        }
        i -> best
      }
    }
    labels
  }

  test("louvainRoundsWeighted == weighted driver reference (incl. self-loops)") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 2) {
      val n = 15 + trial * 5
      val und = ((for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.2
      } yield (a, b, 1L + rnd.nextInt(5).toLong)) ++
        (0L until n.toLong - 1).map(i => (i, i + 1, 1L + rnd.nextInt(5).toLong)))
      val sym = und.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) } ++
        // self-loops on a few nodes — the contracted-graph shape
        (0L until n.toLong by 4).map(i => (i, i, 2L + 2L * rnd.nextInt(3)))
      val dedup = sym.groupBy(e => (e._1, e._2))
        .map { case ((a, b), es) => (a, b, es.map(_._3).max) }.toSeq
      val expected = louvainRefW(dedup, rounds = 3)
      val got = Graph.louvainRoundsWeighted(
          dedup.toDF("src", "dst", "w"), rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("contractCommunities preserves 2m and aggregates member strengths") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
      .toDF("node", "community")
    val sup = Graph.contractCommunities(tri, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // intra mass as self-loops (6 directed each), one symmetric bridge pair
    assert(sup == Map((1L, 1L) -> 6L, (4L, 4L) -> 6L,
      (1L, 4L) -> 1L, (4L, 1L) -> 1L), sup.toString)
    assert(sup.values.sum == 14L) // total weight == original 2m
    // strength(super-node) == Σ member strengths: 6+1 = 7 = 2+2+3
    assert(sup.collect { case ((s, _), w) if s == 1L => w }.sum == 7L)
  }

  test("louvainRounds: checkpointEvery knob yields bit-identical communities") {
    val off = Graph.louvainRounds(testEdges, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = Graph.louvainRounds(testEdges, rounds = 5, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(on == off)
  }

  test("grouped kll_sketch: per-group guarantees over forced multi-partition partials") {
    // the q272 discipline for the grouped ObjectHashAggregate path:
    // partial buffers and merges happen PER GROUP — force many input
    // partitions so each group's sketch really is merged from pieces,
    // then check the order-independent guarantees per group
    val rnd = new scala.util.Random(61)
    val rows = for (g <- 0 until 4; _ <- 0 until 1500)
      yield (s"g$g", rnd.nextInt(100000).toLong)
    val df = rows.toDF("grp", "v").repartition(13)
    val sks = df.groupBy(col("grp"))
      .agg(graft.functions.Functions.kllSketch(col("v"), lit(1L), 32).as("sk"))
      .collect().map(r => r.getString(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1),
          r.getStruct(1).getSeq[org.apache.spark.sql.Row](2)
            .map(it => (it.getLong(0), it.getLong(1))))).toMap
    val byGroup = rows.groupBy(_._1)
    assert(sks.keySet == byGroup.keySet)
    byGroup.foreach { case (g, rs) =>
      val vals = rs.map(_._2)
      val (n, eb, items) = sks(g)
      assert(n == vals.size.toLong, s"$g: n=$n")
      vals.sorted.grouped(300).map(_.head).foreach { x =>
        val skRank = items.filter(_._1 <= x).map(_._2).sum
        val trueRank = vals.count(_ <= x).toLong
        assert(math.abs(skRank - trueRank) <= eb,
          s"$g: rank error at $x: |$skRank - $trueRank| > $eb")
      }
    }
  }

  test("modularityByCommunity: exact contributions discriminate partitions") {
    // two triangles + bridge, 2m = 14. Ideal partition: per community
    // w_in_dir = 6, Σtot = 7 → contrib = 14·6 − 49 = 35 (Q = 70/196).
    // The trivial partitions must score strictly worse: all-in-one
    // contrib = 14·14 − 14² = 0; singletons Σ −deg² = −34.
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    def total(labels: Seq[(Long, Long)]): Long =
      Graph.modularityByCommunity(tri, labels.toDF("node", "community"))
        .agg(sum(col("contrib"))).head().getLong(0)
    val ideal = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val idealRows = Graph.modularityByCommunity(tri, ideal.toDF("node", "community"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(idealRows(1L) == ((3L, 6L, 7L, 35L)), idealRows.toString)
    assert(idealRows(4L) == ((3L, 6L, 7L, 35L)), idealRows.toString)
    val allOne = (1L to 6L).map(_ -> 1L)
    val singletons = (1L to 6L).map(n => n -> n)
    assert(total(ideal) == 70L)
    assert(total(allOne) == 0L)
    assert(total(singletons) == -34L)
  }

  test("property: kll guarantee over random k / weights / merge shapes") {
    // scalacheck-generator-driven (the PropertySpec discipline, fixed
    // seeds): random capacity, weighted inserts, random split points and
    // merge arity — the theorem |sketchRank - trueRank| <= err and exact
    // n must survive every shape
    import org.scalacheck.Gen
    val seed = org.scalacheck.rng.Seed(20260815L)
    val gen = for {
      k <- Gen.oneOf(8, 16, 32, 64)
      n <- Gen.chooseNum(50, 3000)
      vals <- Gen.listOfN(n, Gen.chooseNum(-50000L, 50000L))
      ws <- Gen.listOfN(n, Gen.chooseNum(1L, 9L))
      parts <- Gen.chooseNum(1, 7)
    } yield (k, vals.zip(ws), parts)
    var s = seed
    for (_ <- 1 to 12) {
      val (k, weighted, parts) = gen.pureApply(Gen.Parameters.default, s)
      s = s.next
      val chunks = weighted.grouped(math.max(1, weighted.size / parts)).toSeq
      val whole = new graft.functions.KllState(k)
      chunks.foreach { ch =>
        val piece = new graft.functions.KllState(k)
        ch.foreach { case (v, w) => piece.insert(v, w) }
        whole.mergeIn(piece)
      }
      val totalW = weighted.map(_._2).sum
      assert(whole.n == totalW, s"k=$k: n=${whole.n} != $totalW")
      val items = whole.items
      weighted.map(_._1).distinct.sorted.grouped(
          math.max(1, weighted.size / 10)).map(_.head).foreach { x =>
        val skRank = items.iterator.filter(_._1 <= x).map(_._2).sum
        val trueRank = weighted.iterator.filter(_._1 <= x).map(_._2).sum
        assert(math.abs(skRank - trueRank) <= whole.err,
          s"k=$k parts=$parts: |$skRank - $trueRank| > ${whole.err} at $x")
      }
    }
  }

  test("modularity is contraction-invariant (P on G == singletons on G/P)") {
    // the exact theorem multi-level Louvain rests on: contraction
    // preserves strengths and 2m, so a partition's modularity on the
    // original graph equals the singleton partition's on the contracted
    // graph — weighted modularityByCommunity must reproduce it exactly
    val rnd = new scala.util.Random(83)
    val n = 14L
    val und = (for {
      a <- 0L until n; b <- (a + 1) until n
      if rnd.nextDouble() < 0.3
    } yield (a, b)) ++ (0L until n - 1).map(i => (i, i + 1))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .distinct.toDF("src", "dst")
    val labels = (0L until n).map(i => i -> (i % 4L)).toDF("node", "community")
    val onG = Graph.modularityByCommunity(edges, labels)
      .agg(sum(col("contrib"))).head().getLong(0)
    val contracted = Graph.contractCommunities(edges, labels)
    val singletons = contracted.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("community"))
    val onGP = Graph.modularityByCommunity(contracted, singletons)
      .agg(sum(col("contrib"))).head().getLong(0)
    assert(onG == onGP, s"modularity not contraction-invariant: $onG vs $onGP")
  }

  test("mergeKllBatch: crash between the swap renames loses no sketch state") {
    val store = java.nio.file.Files.createTempDirectory("graft_kll_crash").toString
    def docs(ids: Range) = ids.map(i =>
        (i.toLong, s"doc $i", "en", "s", 40L + i)).toDF(
        "doc_id", "text", "lang", "source", "n_chars")
    val b1 = docs(0 until 300)
    val b2 = docs(300 until 500)
    graft.streaming.DocStreams.mergeKllBatch(b1, 0L, store, k = 16)
    // simulate the mid-swap crash: current renamed aside, process died
    // before next_1 moved into place
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$store/current"),
      new org.apache.hadoop.fs.Path(s"$store/prev_1")))
    graft.streaming.DocStreams.mergeKllBatch(b2, 1L, store, k = 16)
    val st = spark.read.parquet(s"$store/current")
    val n = st.agg(sum(when(col("w") > 0, col("w")).otherwise(0L))).head().getLong(0)
    val eb = st.agg(sum(col("err"))).head().getLong(0)
    // recovery merged b2 against the RECOVERED b1 sketch: exact count,
    // and the accumulated bound still covers every rank query over the
    // full 500-value stream
    assert(n == 500L, s"n=$n")
    val items = st.filter(col("w") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val all = (0 until 500).map(i => 40L + i)
    Seq(89L, 289L, 439L, 539L).foreach { x =>
      val skRank = items.filter(_._1 <= x).map(_._2).sum
      val trueRank = all.count(_ <= x).toLong
      assert(math.abs(skRank - trueRank) <= eb,
        s"rank error at $x: |$skRank - $trueRank| > $eb")
    }
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).toSet
    assert(names.contains("current") && !names.exists(_.startsWith("prev_")),
      s"unexpected store contents: $names")
  }

  // ----- IVF-PQ ----------------------------------------------------------

  test("ivfPqTopK degenerates to exact L2 with all cells probed + full codebook") {
    // nprobe = #cells makes coverage total; a codebook containing every
    // corpus residual makes each vector its own code, so ADC equals the
    // exact residual L2 — which equals the exact vector L2 within a
    // shared cell. The composed index must then reproduce l2TopK
    // exactly (recall@5 = 1.0 for every query).
    val rnd = new scala.util.Random(17)
    val df = Seq.tabulate(60)(i =>
        (i.toLong, Seq.fill(64)((rnd.nextInt(255) - 127).toDouble.toFloat)))
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 6)
    val approx = graft.operators.Similarity.ivfPqTopK(
      df, queries, "vec_id", "embedding",
      centroidIds = 0L until 4L, trainIds = 0L until 60L,
      m = 8, k = 5, nprobe = 4)
    val exact = graft.operators.Similarity.l2TopK(df, queries, "vec_id", "embedding", k = 5)
    val recall = graft.operators.Similarity.recallAtK(approx, exact, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(recall.size == 6 && recall.values.forall(_ == 1000000L), recall.toString)
  }

  test("ivfPqTopK plan: keyed scoring join, nested loops only at the centroid fans") {
    val emb = graft.core.Engine.table(spark, "/root/testdata/sf0.001", "embeddings")
    val p = graft.operators.Similarity.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        centroidIds = 0L until 4L, trainIds = 0L until 16L,
        m = 8, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"ivfpq fell back to cartesian:\n$p")
    // the only nested loops are the deliberate 4-row centroid broadcast
    // fans — the assignment subtree appears in 4 plan branches (corpus
    // codes, codebook, query probe, distance table; AQE stage reuse
    // dedupes the shared ones at runtime), so the static count is ≤ 4.
    // Codebook joins and the (cell, s, code) scoring join must all be
    // hash joins.
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 4, s"unexpected nested-loop joins ($bnl):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"scoring join not keyed:\n$p")
  }

  test("dynamic partition overwrite replaces ONLY the produced partitions") {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "static")
    spark.sql("DROP TABLE IF EXISTS r10_dynpart")
    spark.sql("""CREATE TABLE r10_dynpart (v BIGINT)
                |USING parquet PARTITIONED BY (p STRING)""".stripMargin)
    try {
      spark.conf.set(key, "dynamic")
      spark.sql("""INSERT OVERWRITE TABLE r10_dynpart PARTITION (p)
                  |SELECT id AS v, CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS p
                  |FROM range(10)""".stripMargin)
      // dynamic: rewriting only 'a' must leave 'b' untouched
      spark.sql("""INSERT OVERWRITE TABLE r10_dynpart PARTITION (p)
                  |SELECT 100L AS v, 'a' AS p""".stripMargin)
      val afterDynamic = spark.table("r10_dynpart")
        .groupBy("p").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(afterDynamic == Map("a" -> 1L, "b" -> 5L), afterDynamic.toString)
      // static (the default): the same statement drops EVERY partition —
      // the contrast that makes the q275 entry's claim meaningful
      spark.conf.set(key, "static")
      spark.sql("""INSERT OVERWRITE TABLE r10_dynpart PARTITION (p)
                  |SELECT 200L AS v, 'a' AS p""".stripMargin)
      val afterStatic = spark.table("r10_dynpart")
        .groupBy("p").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(afterStatic == Map("a" -> 1L), afterStatic.toString)
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS r10_dynpart")
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
