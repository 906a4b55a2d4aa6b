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

  /** (relative path → (length, mtime)) for every file under dir. */
  private def fileState(dir: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => root.relativize(p).toString ->
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toMap
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

  // ------------------------------------------------------------------
  // Sharded-and-layered CDC (q349)
  // ------------------------------------------------------------------

  private def shardedLayeredFixture(tag: String): (String,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).localCheckpoint()
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_r15_slay_$tag").toString
    graft.streaming.ShardedLayeredCdc.initShardedLayeredStore(spark, store,
      assigned, "vec_id", "embedding", nCells = 4, cap = 2, graphK = 5,
      graphRounds = 2, layerK = 3, layerRounds = 2, initBuckets = 8)
    (store, assigned, cents)
  }

  private val slayParts = Seq("graph", "vecs", "levels", "layer_1", "layer_2")

  test("sharded-layered CDC: the keyed multi-cell merge equals applying " +
      "the single-store layered merge per cell in isolation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = shardedLayeredFixture("eq")
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
    val ids = assigned.select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecOf = (id: Long) => emb.filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    // one delete in each of cells 0 and 1, one upsert into cell 2
    val delA = ids.filter(_._2 == 0L).map(_._1).sorted.head
    val delB = ids.filter(_._2 == 1L).map(_._1).sorted.head
    val anchorC = ids.filter(_._2 == 2L).map(_._1).sorted.head
    val batch = Seq(
      ("delete", delA, vecOf(delA)), ("delete", delB, vecOf(delB)),
      ("upsert", 400001L, vecOf(anchorC)))
      .toDF("op", "vec_id", "embedding")
    // expected: copy each touched cell's store into an ISOLATED layered
    // store dir and run the q344 single-store merge on it
    val expect = Seq(0L, 1L, 2L).map { c =>
      val iso = java.nio.file.Files
        .createTempDirectory(s"graft_r15_slay_iso$c").toString
      copyDir(s"$store/cell_$c", iso)
      val bC = batch.withColumn("cell",
          graft.operators.Similarity.ivfCellColumn(col("embedding"), cents)
            .cast("long"))
        .filter(col("cell") === c).drop("cell")
      graft.streaming.LayeredCdc.mergeLayeredCdcBatch(bC, 0L, iso,
        "vec_id", "embedding", cap = 2, k = 5, layerK = 3, m = 2,
        descBeam = 6, descRounds = 2, beam = 10, searchRounds = 2,
        repairThreshold = 1L)
      def rows(part: String) = spark.read.parquet(s"$iso/current/$part")
        .collect().map(_.toString).sorted.toSeq
      c -> slayParts.map(p => p -> rows(p)).toMap
    }.toMap
    graft.streaming.ShardedLayeredCdc.mergeShardedLayeredCdcBatch(batch, 0L,
      store, cents, "vec_id", "embedding", cap = 2, k = 5, layerK = 3,
      m = 2, descBeam = 6, descRounds = 2, beam = 10, searchRounds = 2,
      repairThreshold = 1L)
    for (c <- Seq(0L, 1L, 2L); p <- slayParts) {
      val got = spark.read.parquet(s"$store/cell_$c/current/$p")
        .collect().map(_.toString).sorted.toSeq
      assert(got == expect(c)(p),
        s"cell $c part $p diverged from the per-cell layered merge")
    }
  }

  test("sharded-layered CDC: untouched cells are never opened, and a " +
      "replay after a partial commit reproduces the post-batch store") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = shardedLayeredFixture("replay")
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
    val ids = assigned.select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecOf = (id: Long) => emb.filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    val delA = ids.filter(_._2 == 0L).map(_._1).sorted.head
    val delB = ids.filter(_._2 == 1L).map(_._1).sorted.head
    val batch = Seq(
      ("delete", delA, vecOf(delA)), ("delete", delB, vecOf(delB)))
      .toDF("op", "vec_id", "embedding")
    // vandalize an untouched cell's level-0 graph: opening it crashes
    import scala.jdk.CollectionConverters._
    val gdir = java.nio.file.Paths.get(s"$store/cell_3/current/graph")
    java.nio.file.Files.walk(gdir).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    java.nio.file.Files.write(gdir, "not parquet".getBytes)
    val before3 = fileState(s"$store/cell_3")
    def merge(): Unit = graft.streaming.ShardedLayeredCdc
      .mergeShardedLayeredCdcBatch(batch, 0L, store, cents,
        "vec_id", "embedding", cap = 2, k = 5, layerK = 3, m = 2,
        descBeam = 6, descRounds = 2, beam = 10, searchRounds = 2,
        repairThreshold = 1L)
    val pre1 = java.nio.file.Files
      .createTempDirectory("graft_r15_slay_pre1").toString + "/c"
    copyDir(s"$store/cell_1", pre1)
    merge()
    assert(fileState(s"$store/cell_3") == before3,
      "an untouched cell was opened or rewritten")
    def rows(c: Long, p: String) = spark.read
      .parquet(s"$store/cell_$c/current/$p")
      .collect().map(_.toString).sorted.toSeq
    val want0 = slayParts.map(p => p -> rows(0L, p)).toMap
    val want1 = slayParts.map(p => p -> rows(1L, p)).toMap
    // crash simulation: cell 0 committed, cell 1 rolled back pre-batch
    val c1 = java.nio.file.Paths.get(s"$store/cell_1")
    java.nio.file.Files.walk(c1).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    copyDir(pre1, s"$store/cell_1")
    val state0 = fileState(s"$store/cell_0")
    merge() // the checkpointed replay
    assert(fileState(s"$store/cell_0") == state0,
      "replay re-applied the batch to an already-committed cell")
    for (p <- slayParts) {
      assert(rows(0L, p) == want0(p))
      assert(rows(1L, p) == want1(p),
        s"replay did not reproduce cell 1's post-batch $p")
    }
  }

  test("round-15 index paths stay on keyed joins (no cartesian/BNL)") {
    // the layered descent + seeded serve and the sharded-layered keyed
    // merge's building blocks must never degenerate to CartesianProduct
    // or BroadcastNestedLoopJoin — the 100 TB contract of every index
    // path (the PlanSpec round-13 lock, extended to the round-15 ops)
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).localCheckpoint()
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_r15_plan").toString
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8, indexDir = s"$idxDir/idx")
    graft.operators.AnnIndex.buildOrLoadShardedLayers(assigned,
      "vec_id", "embedding", nCells = 4, cap = 2, layerK = 3,
      layerRounds = 2, initBuckets = 8, layersDir = s"$idxDir/layers")
    val queries = emb.filter(col("vec_id") >= 20 && col("vec_id") < 24)
    val routed = graft.operators.Similarity.ivfProbeCells(
      queries, "vec_id", "embedding", cents, nprobe = 2)
    val served = graft.operators.AnnIndex.shardedLayeredSearchTopK(index,
      assigned, routed, s"$idxDir/layers", "vec_id", "embedding",
      cap = 2, m = 2, descBeam = 4, descRounds = 1, beam = 8,
      rounds = 2, k = 3)
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"sharded-layered serve degenerated to a nested loop:\n$p")
  }

  // ------------------------------------------------------------------
  // FLAC stereo + LPC (q346)
  // ------------------------------------------------------------------

  test("FLAC stereo: all four channel assignments round-trip exactly, " +
      "the side channel carries 17 bits, and LPC inverts the published " +
      "prediction") {
    import graft.multimodal.Flac
    // signals chosen so side = L - R exceeds 16-bit-signed/2 territory
    // in spirit (large relative swings) and LPC residuals are nonzero
    val n = 24
    val L = Array.tabulate(n)(k => 90 * k % 301 - 150)
    val R = Array.tabulate(n)(k => -(70 * k % 257) + 128)
    for (mode <- 0 to 3; cls <- Seq(1, 2, 3, 4)) {
      val bytes = Flac.encodeFlacStereo(Seq((mode, (cls, L), (cls, R))))
      val got = Flac.decodeFlac(bytes)
        .getOrElse(fail(s"mode $mode cls $cls did not decode"))
      assert(got.channels == 2)
      val gl = got.samples.indices.filter(_ % 2 == 0).map(got.samples)
      val gr = got.samples.indices.filter(_ % 2 == 1).map(got.samples)
      assert(gl == L.toSeq, s"left diverged at mode $mode cls $cls")
      assert(gr == R.toSeq, s"right diverged at mode $mode cls $cls")
      val wantMode = Seq("independent", "left_side", "right_side",
        "mid_side")(mode)
      assert(got.channelModes == Seq(wantMode))
      if (cls == 4) assert(got.subframeTypes.forall(_ == "lpc2"))
    }
    // mid/side parity: an odd L + R must reconstruct exactly
    val lOdd = Array(3, 4, 5)
    val rOdd = Array(0, 1, 2) // L + R odd everywhere
    val ms = Flac.decodeFlac(Flac.encodeFlacStereo(
      Seq((3, (1, lOdd), (1, rOdd))))).get
    assert(ms.samples.toSeq == Seq(3, 0, 4, 1, 5, 2))
    // a flipped byte in the frame body must fail the CRC-16, dropping
    // the stream
    val ok = Flac.encodeFlacStereo(Seq((1, (4, L), (4, R))))
    val bad = ok.clone()
    bad(ok.length - 10) = (bad(ok.length - 10) ^ 0x40).toByte
    assert(Flac.decodeFlac(bad).isEmpty)
  }

  test("FLAC mono LPC subframes round-trip through the q336 decoder " +
      "path unchanged") {
    import graft.multimodal.Flac
    val xs = Array.tabulate(30)(k => 40 * k % 211 - 100)
    val bytes = Flac.encodeFlac(Seq((4, xs), (2, xs)))
    val got = Flac.decodeFlac(bytes).getOrElse(fail("mono LPC did not decode"))
    assert(got.channels == 1)
    assert(got.samples.toSeq == xs.toSeq ++ xs.toSeq)
    assert(got.subframeTypes == Seq("lpc2", "fixed1"))
  }

  // ------------------------------------------------------------------
  // VP8L color cache (q347)
  // ------------------------------------------------------------------

  test("VP8L color cache: cached streams round-trip pixel-exactly, " +
      "evictions included; malformed cache shapes are rejected") {
    import graft.multimodal.Vp8l
    for (id <- Seq(0L, 7L, 123L, 4999L); k <- Seq(2, 5, 7)) {
      val w = (id % 21 + 1).toInt; val h = (id % 13 + 3).toInt
      val bytes = Vp8l.encodeCachedAsset(id, w, h, k)
      val (gw, gh, pix, tags) = Vp8l.decode(bytes)
        .getOrElse(fail(s"cached asset $id/$k did not decode"))
      assert((gw, gh) == (w, h) && tags == Seq("none"))
      for (i <- 0 until w * h)
        assert(pix(i) == Vp8l.rampPixel(id, (i % k).toLong),
          s"pixel $i diverged for id $id k $k")
    }
    // many colors force multiplicative-hash slot collisions (32 slots,
    // 300 colors): eviction + reinsert must stay exact
    val big = Vp8l.encodeCachedAsset(11L, 20, 15, 300)
    val (_, _, pix2, _) = Vp8l.decode(big).get
    for (i <- 0 until 300) assert(pix2(i) == Vp8l.rampPixel(11L, (i % 300).toLong))
    // cache_bits = 0 under a set cache flag is malformed (spec: 1..11)
    val bw = new Vp8l.BitWriter
    bw.writeBits(0x2f, 8); bw.writeBits(3, 14); bw.writeBits(3, 14)
    bw.writeBits(0, 1); bw.writeBits(0, 3)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(1, 1) // cache present...
    bw.writeBits(0, 4) // ...but zero bits
    assert(Vp8l.decode(Vp8l.riffWebp(bw.result())).isEmpty)
  }

  // ------------------------------------------------------------------
  // MP4 sample-table census (q348)
  // ------------------------------------------------------------------

  test("MP4 deep walk: stts durations and stco chunk sums round-trip; " +
      "truncated tables drop the asset") {
    import graft.multimodal.Codecs
    val tracks = Seq(
      ("vide", Seq((5L, 2L), (3L, 4L)), Seq(48L, 96L, 1000L)),
      ("soun", Seq((7L, 1L)), Seq.empty[Long]))
    val bytes = Codecs.encodeMp4Deep("mp42", tracks)
    val info = Codecs.walkMp4(bytes).getOrElse(fail("deep mp4 did not walk"))
    assert(info.brand == "mp42")
    assert(info.tracks.map(t => (t.handler, t.nSamples, t.duration,
      t.nChunks, t.sumChunkOff)) == Vector(
      ("vide", 8L, 22L, 3L, 1144L), ("soun", 7L, 7L, 0L, 0L)))
    // corrupt the stts entry count to claim more runs than the box
    // holds: the walk must drop the asset, not read past the table
    val pat = "stts".getBytes("US-ASCII")
    val at = bytes.indexOfSlice(pat)
    val bad = bytes.clone()
    bad(at + 4 + 4 + 3) = 100.toByte // entry_count low byte
    assert(Codecs.walkMp4(bad).isEmpty)
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
