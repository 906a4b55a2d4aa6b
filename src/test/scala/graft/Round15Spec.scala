package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Round-15 locks: footprint manifests + the cell-keyed sharded CDC
  * merge, the seed-store determinism the bench clone discipline rests
  * on, the hardened sniff/ZIP/WARC contracts, and drained-cell growth
  * reporting. */
class Round15Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------------
  // Sniff hardening: tar is claimed LAST and only checksum-valid
  // ------------------------------------------------------------------

  test("sniff: 'ustar' at 257 without a valid header checksum is not tar; " +
      "offset-0 magics take precedence over a payload that spells it") {
    import graft.multimodal.Codecs
    // a real archive still sniffs as tar (checksum validates)
    val tar = graft.sources.Tar.encodeTar(Seq(("a.txt", "hi".getBytes)))
    assert(Codecs.sniff(tar).contains("tar"))
    // payload-region 'ustar' with a garbage header: NOT tar
    val fake = new Array[Byte](600)
    "ustar".getBytes("US-ASCII").copyToArray(fake, 257)
    assert(Codecs.sniff(fake).isEmpty)
    // a PNG whose byte-257 region coincidentally spells 'ustar' keeps
    // its offset-0 identity
    val png = Codecs.encodePng(20, 20, seed = 7L)
    val poisoned = png.clone()
    if (poisoned.length >= 263)
      "ustar".getBytes("US-ASCII").copyToArray(poisoned, 257)
    assert(Codecs.sniff(poisoned).contains("png"))
    // and a tar whose first header is corrupted (checksum broken) no
    // longer claims tar — parseTar would reject it anyway
    val broken = tar.clone()
    broken(148) = '9'
    assert(Codecs.sniff(broken).isEmpty)
  }

  // ------------------------------------------------------------------
  // warcHtmlDocs: rec_idx is the member ordinal (stable under corruption)
  // ------------------------------------------------------------------

  test("warcHtmlDocs: rec_idx is the gzip-member ordinal even when an " +
      "earlier member is not a parseable WARC record") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sources.Warc
    val junk = Warc.gzipMember("this is not a WARC record".getBytes("US-ASCII"))
    val rec = Warc.gzipMember(Warc.formatRecord(
      "response", "http://t.example/x", "<html><body>ok</body></html>".getBytes("US-ASCII")))
    val bytes = junk ++ rec
    val assets = Seq((5L, bytes)).toDF("asset_id", "bytes")
    val rows = graft.multimodal.Multimodal.warcHtmlDocs(assets)
      .select("rec_idx", "target_uri").collect()
    assert(rows.length == 1)
    // member 0 is the junk; the response is member 1 and must say so
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getString(1) == "http://t.example/x")
  }

  // ------------------------------------------------------------------
  // shardGrowthReport: a fully drained cell still surfaces
  // ------------------------------------------------------------------

  test("shardGrowthReport with cents: a zero-member cell surfaces as " +
      "n_members = 0 / merge instead of vanishing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val assigned = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("vec_id", "cell")
    val index = Seq((1L, 2L, 4L, 0L), (2L, 1L, 4L, 0L))
      .toDF("q_id", "n_id", "d2", "cell")
    val cents = Seq((0L, Seq(1.0f)), (1L, Seq(0.0f)), (2L, Seq(0.5f)))
      .toDF("cent_id", "cent_vec")
    val rep = graft.operators.AnnIndex.shardGrowthReport(index, assigned,
      "vec_id", k = 2, splitPpm = 600000L, mergePpm = 100000L,
      cents = Some(cents))
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
    assert(rep.length == 3)
    assert(rep(2) == ((2L, 0L, "merge")), s"drained cell row was ${rep(2)}")
    // and without cents the report still covers exactly assigned's cells
    val noCents = graft.operators.AnnIndex.shardGrowthReport(index, assigned,
      "vec_id", k = 2, splitPpm = 600000L, mergePpm = 100000L)
      .select("cell").collect().map(_.getLong(0)).sorted
    assert(noCents.toSeq == Seq(0L, 1L))
  }

  // ------------------------------------------------------------------
  // Footprint manifests + seed determinism (the bench clone discipline)
  // ------------------------------------------------------------------

  private def seedStore(tag: String): (String,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).localCheckpoint()
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_r15_$tag").toString
    graft.streaming.IndexCdc.initShardedStore(spark, store, assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8)
    (store, assigned, cents)
  }

  test("footprint manifest: written at seed and swap time, equal to the " +
      "cell's member count") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = seedStore("manifest")
    def manifest(c: Long): Long = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(s"$store/cell_$c/current/n_vecs")),
      "UTF-8").trim.toLong
    for (c <- 0L until 4L) {
      val want = spark.read.parquet(s"$store/cell_$c/current/vecs").count()
      assert(manifest(c) == want, s"seed manifest for cell $c")
    }
    // one CDC batch: delete two members of one cell — the swapped
    // store's manifest must track the post-batch count
    val victims = assigned.filter(col("cell") === 0)
      .select(col("vec_id")).orderBy(col("vec_id")).limit(2)
      .collect().map(_.getLong(0))
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val batch = victims.toSeq.toDF("vec_id")
      .join(emb, "vec_id").select(lit("delete").as("op"),
        col("vec_id"), col("embedding"))
    val before = manifest(0L)
    graft.streaming.IndexCdc.mergeShardedCdcBatch(batch, 0L, store, cents,
      "vec_id", "embedding", k = 5, entriesPerCell = 2, beam = 10,
      searchRounds = 2, repairThreshold = 1L)
    assert(manifest(0L) == before - 2)
    assert(manifest(0L) ==
      spark.read.parquet(s"$store/cell_0/current/vecs").count())
  }

  test("seed determinism: two initShardedStore builds over the same " +
      "assignment hold identical per-cell graphs and vecs (what makes a " +
      "file-copy clone equivalent to a fresh build)") {
    val spark = TestSpark.spark
    val (a, _, _) = seedStore("det_a")
    val (b, _, _) = seedStore("det_b")
    for (c <- 0L until 4L) {
      def rows(s: String, part: String) =
        spark.read.parquet(s"$s/cell_$c/current/$part")
          .collect().map(_.toString).sorted.toSeq
      assert(rows(a, "graph") == rows(b, "graph"), s"cell $c graph differs")
      assert(rows(a, "vecs") == rows(b, "vecs"), s"cell $c vecs differs")
    }
  }

  // ------------------------------------------------------------------
  // Layered × sharded serving (q345)
  // ------------------------------------------------------------------

  test("keyedGraphSearchTopKSeeded: the fixed-entry form is its " +
      "degenerate case (q314/q316 hash preservation)") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r15_keyed").toString + "/idx"
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8, indexDir = dir)
    val queries = emb.filter(col("vec_id") >= 40 && col("vec_id") < 46)
    val routed = graft.operators.Similarity.ivfProbeCells(
      queries, "vec_id", "embedding", cents, nprobe = 2)
    val entries = graft.operators.AnnIndex
      .cellEntryPoints(assigned, "vec_id", entriesPerCell = 2)
    val viaEntries = graft.operators.Similarity.keyedGraphSearchTopK(
      index, assigned.select("vec_id", "embedding"), routed, entries,
      "vec_id", "embedding", beam = 8, rounds = 2, k = 3)
      .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    val seeds = routed.select(col("vec_id").as("q_id"),
        col("cell").cast("long").as("cell"))
      .join(entries, Seq("cell"))
      .select(col("q_id"), col("cell"), col("n_id"))
    val viaSeeds = graft.operators.Similarity.keyedGraphSearchTopKSeeded(
      index, assigned.select("vec_id", "embedding"), routed, seeds,
      "vec_id", "embedding", beam = 8, rounds = 2, k = 3)
      .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    assert(viaEntries.nonEmpty && viaEntries == viaSeeds)
  }

  test("cellDescentSeeds: a cell whose stack is shorter than the layer " +
      "passes its seeds through unchanged; taller cells descend") {
    val spark = TestSpark.spark
    import spark.implicits._
    // synthetic assignment engineered per cell: cell 0's members all
    // have level 0 except its entry (level >= 1 unknown — so instead
    // pick REAL ids by their hash level)
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 300)
    val lv = emb.select(col("vec_id"),
      graft.operators.LayeredAnn.levelColumn(col("vec_id"), 3).as("level"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // cell 0: only level-0 ids (+ one level-1 id as its top) → ml = 1;
    // cell 1: includes a level-3 id → ml = 3
    val l0 = lv.filter(_._2 == 0).keys.toSeq.sorted.take(20)
    val l1top = lv.filter(_._2 == 1).keys.toSeq.sorted.head
    val l3top = lv.filter(_._2 == 3).keys.toSeq.sorted.head
    val cell0 = (l0.take(10) :+ l1top).map((_, 0L))
    val cell1 = (l0.drop(10) :+ l3top).map((_, 1L))
    val assigned = (cell0 ++ cell1).toDF("vec_id", "cell")
      .join(emb, "vec_id").select("vec_id", "embedding", "cell")
      .localCheckpoint()
    val layersDir = java.nio.file.Files
      .createTempDirectory("graft_r15_slay").toString + "/layers"
    graft.operators.AnnIndex.buildOrLoadShardedLayers(assigned,
      "vec_id", "embedding", nCells = 2, cap = 3, layerK = 3,
      layerRounds = 2, initBuckets = 8, layersDir = layersDir)
    // route one query to each cell
    val q0 = l0.head
    val routed = Seq((q0, 0L), (q0, 1L)).toDF("vec_id", "cell")
      .join(emb, "vec_id").select("vec_id", "embedding", "cell")
    val seeds = graft.operators.AnnIndex.cellDescentSeeds(spark, layersDir,
      assigned, routed, Seq(0L, 1L), "vec_id", "embedding",
      cap = 3, m = 2, descBeam = 4, descRounds = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // cell 0's stack stops at layer 1 (its only upper node is l1top):
    // layers 3 and 2 pass through, layer 1's graph is a single node →
    // the seed stays the entry itself
    assert(seeds.contains((0L, l1top)),
      s"cell 0 should keep its entry seed $l1top, got $seeds")
    // cell 1 descended from its level-3 top entry
    assert(seeds.exists(_._1 == 1L), s"cell 1 produced no seeds: $seeds")
  }

  test("sharded LAYER reads are partition-pruned to the probed cells") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val layersDir = java.nio.file.Files
      .createTempDirectory("graft_r15_prune").toString + "/layers"
    graft.operators.AnnIndex.buildOrLoadShardedLayers(assigned,
      "vec_id", "embedding", nCells = 4, cap = 3, layerK = 3,
      layerRounds = 2, initBuckets = 8, layersDir = layersDir)
    val probed = col("cell").isin(
      java.lang.Long.valueOf(1L), java.lang.Long.valueOf(3L))
    val p = spark.read.parquet(s"$layersDir/layer_1").filter(probed)
      .queryExecution.executedPlan.toString
    val pf = p.split("\n").find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no PartitionFilters in the layer read:\n$p"))
    assert(pf.contains("cell") && (pf.contains("IN") || pf.contains("in(")),
      s"probed-cell IN-set did not prune layer partitions:\n$pf")
  }

  // ------------------------------------------------------------------
  // Layered-store CDC (q344)
  // ------------------------------------------------------------------

  private def layeredFixture(tag: String): (String, org.apache.spark.sql.DataFrame) = {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_r15_lay_$tag").toString
    graft.streaming.LayeredCdc.initLayeredStore(spark, store, emb,
      "vec_id", "embedding", cap = 3, k = 8, rounds = 3,
      layerK = 4, layerRounds = 2, initBuckets = 8)
    (store, emb)
  }

  private def copyDir(from: String, to: String): Unit = {
    import scala.jdk.CollectionConverters._
    val src = java.nio.file.Paths.get(from)
    java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
      val dst = java.nio.file.Paths.get(to).resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    }
  }

  private def storeRows(store: String, part: String): Seq[String] = {
    val spark = TestSpark.spark
    spark.read.parquet(s"$store/current/$part")
      .collect().map(_.toString).sorted.toSeq
  }

  test("layered CDC: replaying a batch against the recovered pre-batch " +
      "store reproduces the identical post-batch stack") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, emb) = layeredFixture("replay")
    val vecOf = (id: Long) => emb.filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    val batch = Seq(
      ("delete", 3L, vecOf(3L)), ("delete", 17L, vecOf(17L)),
      ("upsert", 500001L, vecOf(5L)))
      .toDF("op", "vec_id", "embedding")
    val pre = java.nio.file.Files
      .createTempDirectory("graft_r15_lay_pre").toString + "/s"
    copyDir(store, pre)
    def merge(dir: String): Unit =
      graft.streaming.LayeredCdc.mergeLayeredCdcBatch(batch, 0L, dir,
        "vec_id", "embedding", cap = 3, k = 8, layerK = 4, m = 2,
        descBeam = 6, descRounds = 2, beam = 12, searchRounds = 2,
        repairThreshold = 1L)
    merge(store)
    merge(pre) // the checkpointed replay against the recovered store
    for (part <- Seq("graph", "vecs", "levels", "layer_1", "layer_2", "layer_3"))
      assert(storeRows(store, part) == storeRows(pre, part),
        s"replay diverged on $part")
    // deleted ids are gone from EVERY level; the upsert joined its layers
    val lvlOf = (id: Long) => spark.range(1).select(
      graft.operators.LayeredAnn.levelColumn(lit(id), 3)).head().getInt(0)
    for (l <- 1 to 3; id <- Seq(3L, 17L))
      if (lvlOf(id) >= l)
        assert(!spark.read.parquet(s"$store/current/layer_$l")
          .filter(col("q_id") === id || col("n_id") === id).head(1).nonEmpty,
          s"deleted id $id still in layer $l")
    val upLvl = lvlOf(500001L)
    for (l <- 1 to math.min(upLvl, 3))
      assert(spark.read.parquet(s"$store/current/layer_$l")
        .filter(col("q_id") === 500001L).head(1).nonEmpty,
        s"upsert (level $upLvl) missing from layer $l")
  }

  test("layered CDC: the stack-wide rebuild guard equals fresh builds " +
      "of level-0 and every layer over survivors ∪ batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, emb) = layeredFixture("rebuild")
    val av = emb.filter(col("vec_id") === 7L).select("embedding").head()
      .getSeq[Float](0)
    val n = spark.read.parquet(s"$store/current/vecs").count()
    val ups = (0 until (n / 2 + 2).toInt).map(i => ("upsert", 600000L + i, av))
    val batch = ups.toDF("op", "vec_id", "embedding")
    graft.streaming.LayeredCdc.mergeLayeredCdcBatch(batch, 0L, store,
      "vec_id", "embedding", cap = 3, k = 8, layerK = 4, m = 2,
      descBeam = 6, descRounds = 2, beam = 12, searchRounds = 2,
      repairThreshold = 1L, rebuildFraction = 0.25,
      rebuildRounds = 2, rebuildBuckets = 8)
    val all = emb.select(col("vec_id"), col("embedding"))
      .unionByName(batch.select(col("vec_id"), col("embedding")))
      .withColumn("level",
        graft.operators.LayeredAnn.levelColumn(col("vec_id"), 3))
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id"), col("n_id"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(spark.read.parquet(s"$store/current/graph")) ==
      rows(graft.operators.Similarity.nnDescent(
        all.select("vec_id", "embedding"), "vec_id", "embedding", 8, 2, 8)),
      "level-0 did not rebuild to the fresh-build graph")
    for (l <- 1 to 3) {
      val mem = all.filter(col("level") >= l).select("vec_id", "embedding")
      val want =
        if (mem.limit(2).count() < 2) Set.empty[(Long, Long, Long)]
        else rows(graft.operators.Similarity.nnDescent(
          mem, "vec_id", "embedding", 4, 2, 8))
      assert(rows(spark.read.parquet(s"$store/current/layer_$l")) == want,
        s"layer $l did not rebuild to the fresh-build subgraph")
    }
  }

  test("layered CDC: post-CDC descent recall is gated against a FRESH " +
      "layered build over the same membership (the staleness test)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, emb) = layeredFixture("stale")
    // churn: delete every vec_id % 5 == 2, upsert 30 new ids carrying
    // existing vectors (shifted ids → fresh levels)
    val dels = emb.filter(col("vec_id") % 5 === 2)
      .select(lit("delete").as("op"), col("vec_id"), col("embedding"))
    val ups = emb.filter(col("vec_id") % 5 === 4)
      .select(lit("upsert").as("op"), (col("vec_id") + 700000L).as("vec_id"),
        col("embedding"))
    graft.streaming.LayeredCdc.mergeLayeredCdcBatch(
      dels.unionByName(ups), 0L, store, "vec_id", "embedding",
      cap = 3, k = 8, layerK = 4, m = 2, descBeam = 6, descRounds = 2,
      beam = 12, searchRounds = 2, repairThreshold = 1L)
    val members = spark.read.parquet(s"$store/current/vecs").localCheckpoint()
    // a fresh layered store over the SAME post-CDC membership
    val freshDir = java.nio.file.Files
      .createTempDirectory("graft_r15_lay_fresh").toString
    graft.streaming.LayeredCdc.initLayeredStore(spark, freshDir, members,
      "vec_id", "embedding", cap = 3, k = 8, rounds = 3,
      layerK = 4, layerRounds = 2, initBuckets = 8)
    val queries = members.filter(col("vec_id") % 7 === 1).limit(10)
      .localCheckpoint()
    def recallOf(dir: String): Double = {
      val served = graft.streaming.LayeredCdc.searchTopK(spark, dir,
        queries, "vec_id", "embedding", cap = 3, m = 2, descBeam = 6,
        descRounds = 2, beam = 12, rounds = 3, k = 5)
      val r = graft.operators.Similarity.recallAtK(served,
        graft.operators.Similarity.l2TopK(members, queries,
          "vec_id", "embedding", k = 5), k = 5)
      r.agg(avg(col("recall_ppm"))).head().getDouble(0)
    }
    val maintained = recallOf(store)
    val fresh = recallOf(freshDir)
    // the maintained stack must not degrade materially below what a
    // from-scratch rebuild of the same membership achieves
    assert(maintained >= fresh - 100000.0,
      s"stale descent: maintained recall $maintained vs fresh $fresh")
    assert(maintained > 500000.0, s"maintained recall collapsed: $maintained")
  }

  test("keyed sharded CDC: a multi-cell batch equals applying the " +
      "single-store lifecycle per cell") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = seedStore("keyed_eq")
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
    // batch: one delete in each of two cells, one upsert into a third
    val ids = assigned.select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cA = 0L
    val cB = 1L
    val delA = ids.filter(_._2 == cA).map(_._1).sorted.head
    val delB = ids.filter(_._2 == cB).map(_._1).sorted.head
    val anchorC = ids.filter(_._2 == 2L).map(_._1).sorted.head
    val vecOf = (id: Long) => emb.filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    val batch = Seq(
      ("delete", delA, vecOf(delA)), ("delete", delB, vecOf(delB)),
      ("upsert", 300001L, vecOf(anchorC)))
      .toDF("op", "vec_id", "embedding")
    // expected: the SINGLE-store merge applied to each touched cell's
    // store in isolation (same knobs, entry ids = two lowest survivors)
    val expect = Seq(cA, cB, 2L).map { c =>
      val vecs = spark.read.parquet(s"$store/cell_$c/current/vecs")
      val graph = spark.read.parquet(s"$store/cell_$c/current/graph")
      val bC = batch.withColumn("cell",
          graft.operators.Similarity.ivfCellColumn(col("embedding"), cents)
            .cast("long"))
        .filter(col("cell") === c).drop("cell")
      val removed = bC.select(col("vec_id")).distinct()
      val remaining = vecs.join(removed, Seq("vec_id"), "left_anti")
        .localCheckpoint()
      var g = graft.operators.AnnIndex.survivingEdges(graph, remaining, "vec_id")
      val entryIds = remaining.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(2).collect().map(_.getLong(0)).toSeq
      val ups = bC.filter(col("op") === "upsert")
        .select(col("vec_id"), col("embedding"))
      if (bC.filter(col("op") === "delete").count() > 0)
        g = graft.operators.AnnIndex.repairGraph(g, remaining,
          "vec_id", "embedding", 5, entryIds, 10, 2)
      if (ups.count() > 0)
        g = graft.operators.AnnIndex.insertBatch(g, remaining, ups,
          "vec_id", "embedding", 5, entryIds, 10, 2)
      c -> g.select(col("q_id"), col("n_id"), col("d2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }.toMap
    graft.streaming.IndexCdc.mergeShardedCdcBatch(batch, 0L, store, cents,
      "vec_id", "embedding", k = 5, entriesPerCell = 2, beam = 10,
      searchRounds = 2, repairThreshold = 1L)
    for (c <- Seq(cA, cB, 2L)) {
      val got = spark.read.parquet(s"$store/cell_$c/current/graph")
        .select(col("q_id"), col("n_id"), col("d2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect(c), s"cell $c diverged from the per-cell merge")
    }
  }
}
