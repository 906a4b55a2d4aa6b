package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Round-16 locks: the sharded-layered lifecycle's ops column
  * (rebalance / maintenance window / growth report), streaming serve
  * over the sharded-layered index, the layered-CDC replay-skip marker
  * and above-stack upsert linking, and the hardened MP4 (co64, stts
  * overflow) and ZIP (EOCD shadowing) walks. */
class Round16Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

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

  /** (relative path → (length, sha-ish content hash)) for every file
    * under dir — byte-identity, not just size/mtime. */
  private def fileBytes(dir: String): Map[String, Seq[Byte]] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => root.relativize(p).toString ->
        java.nio.file.Files.readAllBytes(p).toSeq)
      .toMap
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ------------------------------------------------------------------
  // MP4 walk hardening: co64, stts overflow
  // ------------------------------------------------------------------

  test("walkMp4: co64 chunk offsets walk like stco (same census fields), " +
      "including offsets past 2^32") {
    import graft.multimodal.Codecs
    val runs = Seq((3L, 100L), (2L, 50L))
    val offs = Seq(16L, 5000000000L) // second offset needs 64 bits
    val b = Codecs.encodeMp4Deep("mp42", Seq(("vide", runs, offs)), co64 = true)
    val info = Codecs.walkMp4(b).getOrElse(fail("co64 file did not walk"))
    assert(info.tracks.length == 1)
    val t = info.tracks.head
    assert(t.nSamples == 5L && t.duration == 400L)
    assert(t.nChunks == 2L && t.sumChunkOff == 5000000016L)
    // and the stco form of the same track still reads identically when
    // its offsets fit u32
    val small = Codecs.encodeMp4Deep("mp42", Seq(("vide", runs, Seq(16L, 32L))))
    val s = Codecs.walkMp4(small).get.tracks.head
    val c = Codecs.walkMp4(Codecs.encodeMp4Deep("mp42",
      Seq(("vide", runs, Seq(16L, 32L))), co64 = true)).get.tracks.head
    assert(s == c, "stco and co64 must yield the same census row")
  }

  test("walkMp4: an stts whose count*delta sum overflows Long is " +
      "malformed (None), not a wrapped positive duration") {
    import graft.multimodal.Codecs
    val big = 0xffffffffL // u32 max; (2^32-1)^2 > Long.MaxValue
    val b = Codecs.encodeMp4Deep("mp42",
      Seq(("vide", Seq((big, big)), Seq(16L))))
    assert(Codecs.walkMp4(b).isEmpty,
      "overflowing stts must reject the file, not wrap")
    // a large-but-safe product still walks
    val ok = Codecs.encodeMp4Deep("mp42",
      Seq(("vide", Seq((1000000L, 1000000L)), Seq(16L))))
    assert(Codecs.walkMp4(ok).get.tracks.head.duration == 1000000000000L)
  }

  test("walkMp4: version-1 ctts (signed offsets) and version-1 elst " +
      "(64-bit entries) walk to the same census fields as version 0") {
    import graft.multimodal.Codecs
    val runs = Seq((4L, 10L))
    val ctts = Seq((2L, 30L), (2L, -10L)) // negative shift: the v1 point
    val edits = Seq((500L, -20L), (300L, 7L))
    val v1 = Codecs.encodeMp4Deep("mp42", Seq(("vide", runs, Seq(16L))),
      cttsOf = _ => ctts, editsOf = _ => edits, v1Timing = true)
    val t = Codecs.walkMp4(v1).getOrElse(fail("v1 timing did not walk"))
      .tracks.head
    assert(t.cttsShift == 2 * 30 - 2 * 10)
    assert(t.nEdits == 2 && t.editDuration == 800L && t.firstMediaTime == -20L)
    // the v0 form of NON-negative fields reads identically
    val pos = Seq((2L, 30L), (2L, 10L))
    val ed0 = Seq((500L, 20L), (300L, 7L))
    val a = Codecs.walkMp4(Codecs.encodeMp4Deep("mp42",
      Seq(("vide", runs, Seq(16L))), cttsOf = _ => pos,
      editsOf = _ => ed0)).get.tracks.head
    val b = Codecs.walkMp4(Codecs.encodeMp4Deep("mp42",
      Seq(("vide", runs, Seq(16L))), cttsOf = _ => pos,
      editsOf = _ => ed0, v1Timing = true)).get.tracks.head
    assert(a == b, "v0 and v1 must yield the same census row")
  }

  // ------------------------------------------------------------------
  // ZIP EOCD hardening: a comment containing an EOCD-like pattern must
  // not shadow the true record
  // ------------------------------------------------------------------

  test("parseZip: an EOCD-like byte pattern inside trailing bytes does " +
      "not shadow the true EOCD") {
    import graft.sources.Zip
    val zip = Zip.encodeZip(Seq(
      ("a.txt", "hello".getBytes("US-ASCII"), false),
      ("b/c.bin", Array[Byte](1, 2, 3, 4), true)))
    // craft a fake EOCD whose record is internally plausible (comment
    // fits the tail) but whose central-directory offset points at
    // garbage — the validated scan must fall through to the real one
    val fake = new Array[Byte](22)
    fake(0) = 0x50; fake(1) = 0x4b; fake(2) = 0x05; fake(3) = 0x06
    fake(10) = 1 // 1 entry
    fake(11) = 0
    // cd size 4, cd offset 0 (points at the first LOCAL header's
    // signature 0x04034b50, NOT a CD header) — plausible but wrong
    fake(12) = 4
    fake(16) = 0
    val poisoned = zip ++ fake
    val members = Zip.parseZip(poisoned)
      .getOrElse(fail("true EOCD was shadowed by a fake in trailing bytes"))
    assert(members.map(_.name) == Seq("a.txt", "b/c.bin"))
    // sanity: the clean archive parses the same
    assert(Zip.parseZip(zip).get.map(_.name) == Seq("a.txt", "b/c.bin"))
  }

  // ------------------------------------------------------------------
  // Layered CDC: replay-skip marker (crash AFTER swap, BEFORE the
  // streaming checkpoint commit)
  // ------------------------------------------------------------------

  test("layered CDC: a batch id at or below the store's applied_batch " +
      "marker is skipped — post-swap replay cannot double-apply") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 150).localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory("graft_r16_replay").toString
    graft.streaming.LayeredCdc.initLayeredStore(spark, store, emb,
      "vec_id", "embedding", cap = 3, k = 8, rounds = 3,
      layerK = 4, layerRounds = 2, initBuckets = 8)
    val vecOf = (id: Long) => emb.filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    val batch = Seq(("delete", 3L, vecOf(3L)), ("upsert", 900001L, vecOf(5L)))
      .toDF("op", "vec_id", "embedding")
    def merge(id: Long): Unit =
      graft.streaming.LayeredCdc.mergeLayeredCdcBatch(batch, id, store,
        "vec_id", "embedding", cap = 3, k = 8, layerK = 4, m = 2,
        descBeam = 6, descRounds = 2, beam = 12, searchRounds = 2,
        repairThreshold = 1L)
    merge(0L)
    val post = fileBytes(s"$store/current")
    // the crash-replay of the SAME batch id against the POST-batch
    // store: must be a no-op (the reverse-patch re-cut is not
    // idempotent, so without the marker this would corrupt the stack)
    merge(0L)
    assert(fileBytes(s"$store/current") == post,
      "replaying a committed batch id mutated the store")
    // a NEWER batch id still applies (the marker advances)
    merge(1L)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.streaming.IndexCdc.appliedBatch(fs,
      new org.apache.hadoop.fs.Path(s"$store/current")) == 1L,
      "batch 1 did not apply")
  }

  // ------------------------------------------------------------------
  // Layered CDC: an upsert whose hash level exceeds the surviving
  // stack's max level LINKS into the layers above it (to the entry),
  // exactly as the oracle's unconditional per-layer link CTEs replay
  // ------------------------------------------------------------------

  test("layered CDC: an upsert with level above the surviving stack's " +
      "max links to the entry in those layers instead of entering " +
      "isolated") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).localCheckpoint()
    val cap = 3
    val lvlOf = (id: Long) => spark.range(1).select(
      graft.operators.LayeredAnn.levelColumn(lit(id), cap)).head().getInt(0)
    // members: 12 level-0 ids (the seeded stack has maxL = 0, all
    // layers empty); upsert: a fresh id whose hash level is >= 1
    val level0 = (0L until 200L).filter(lvlOf(_) == 0).take(12)
    val upId = (1000L until 5000L).find(lvlOf(_) >= 1)
      .getOrElse(fail("no high-level id found"))
    val upLvl = lvlOf(upId)
    val members = emb.filter(col("vec_id")
      .isInCollection(level0.map(java.lang.Long.valueOf)))
      .localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory("graft_r16_hilink").toString
    graft.streaming.LayeredCdc.initLayeredStore(spark, store, members,
      "vec_id", "embedding", cap = cap, k = 4, rounds = 2,
      layerK = 3, layerRounds = 2, initBuckets = 8)
    for (l <- 1 to cap)
      assert(spark.read.parquet(s"$store/current/layer_$l").isEmpty,
        s"seed layer $l should be empty (members are all level 0)")
    val vec = emb.filter(col("vec_id") === level0.head)
      .select("embedding").head().getSeq[Float](0)
    val batch = Seq(("upsert", upId, vec)).toDF("op", "vec_id", "embedding")
    graft.streaming.LayeredCdc.mergeLayeredCdcBatch(batch, 0L, store,
      "vec_id", "embedding", cap = cap, k = 4, layerK = 3, m = 2,
      descBeam = 6, descRounds = 2, beam = 8, searchRounds = 2,
      repairThreshold = 1L)
    val entry = level0.min // maxL = 0: the entry is the lowest member id
    for (l <- 1 to math.min(upLvl, cap)) {
      val g = spark.read.parquet(s"$store/current/layer_$l")
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(g.contains((upId, entry)) && g.contains((entry, upId)),
        s"upsert (level $upLvl) not linked to entry $entry at layer $l: " +
          g.mkString(", "))
    }
    for (l <- upLvl + 1 to cap)
      assert(spark.read.parquet(s"$store/current/layer_$l").isEmpty,
        s"layer $l above the upsert's level must stay empty")
  }

  // ------------------------------------------------------------------
  // Sharded-layered lifecycle ops (q350/q351/q352)
  // ------------------------------------------------------------------

  private def shardedLayeredFixture(tag: String)
      : (String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .localCheckpoint()
    val cents = graft.operators.Similarity.ivfCentroids(
      emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity.ivfAssign(
      emb.filter(col("vec_id") % 10 =!= 9), "vec_id", "embedding", cents)
      .localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_r16_slay_$tag").toString
    graft.streaming.ShardedLayeredCdc.initShardedLayeredStore(spark, store,
      assigned, "vec_id", "embedding", nCells = 4, cap = 2, graphK = 10,
      graphRounds = 3, layerK = 5, layerRounds = 2, initBuckets = 16)
    (store, cents.localCheckpoint(), assigned)
  }

  test("sharded-layered rebalance: affected cells' stacks are fresh " +
      "NN-Descent builds over the committed membership, untouched " +
      "cells byte-identical, markers/footprints inherited") {
    val spark = TestSpark.spark
    val (store, cents, _) = shardedLayeredFixture("reb")
    val keptBefore = (0L until 4L).map(c =>
      c -> fileBytes(s"$store/cell_$c/current")).toMap
    val (report, newCents) = graft.streaming.ShardedLayeredCdc
      .rebalanceShardedLayeredStore(spark, store, cents, "vec_id",
        "embedding", cap = 2, k = 10, graphRounds = 3, layerK = 5,
        layerRounds = 2, initBuckets = 16, splitPpm = 280000L,
        mergePpm = 220000L, rebalanceId = 7L)
    val acts = report.collect().map(r =>
      r.getLong(0) -> r.getString(2)).toMap
    // base shares [222k, 271k, 291k, 216k]: cell 2 splits, 3 merges away
    assert(acts(2L) == "split_lo" && acts(4L) == "split_hi" &&
      acts(3L) == "merged_away",
      s"unexpected actions: $acts")
    assert(acts.values.count(_ == "merge_target") == 1)
    val kept = acts.filter(_._2 == "kept").keys
    for (c <- kept)
      assert(fileBytes(s"$store/cell_$c/current") == keptBefore(c),
        s"kept cell $c was rewritten")
    // every affected cell: levels = membership under the hash level,
    // each layer's node set = members at that level, and the level-0
    // graph equals a fresh NN-Descent over the committed vecs
    val affected = acts.filter(a => a._2 != "kept").keys.filter(c =>
      acts(c) != "merged_away")
    for (c <- affected) {
      val cur = s"$store/cell_$c/current"
      val vecs = spark.read.parquet(s"$cur/vecs").localCheckpoint()
      val lv = spark.read.parquet(s"$cur/levels")
      val expLv = vecs.select(col("vec_id"),
        graft.operators.LayeredAnn.levelColumn(col("vec_id"), 2).as("level"))
      assert(rows(lv) == rows(expLv), s"cell $c levels drifted")
      val fresh = graft.operators.Similarity.nnDescent(
        vecs.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        10, 3, 16)
      assert(rows(spark.read.parquet(s"$cur/graph")
          .select("q_id", "n_id", "d2")) ==
        rows(fresh.select("q_id", "n_id", "d2")),
        s"cell $c level-0 graph is not a fresh build")
      for (l <- 1 to 2) {
        val mem = vecs.select(col("vec_id"), col("embedding"))
          .where(graft.operators.LayeredAnn
            .levelColumn(col("vec_id"), 2) >= l)
        val expected =
          if (mem.limit(2).count() < 2)
            Seq.empty[String]
          else rows(graft.operators.Similarity.nnDescent(mem,
            "vec_id", "embedding", 5, 2, 16).select("q_id", "n_id", "d2"))
        assert(rows(spark.read.parquet(s"$cur/layer_$l")
            .select("q_id", "n_id", "d2")) == expected,
          s"cell $c layer $l is not a fresh build over its members")
      }
    }
    // a merged-away cell is emptied at every level
    for (part <- Seq("graph", "vecs", "levels", "layer_1", "layer_2"))
      assert(spark.read.parquet(s"$store/cell_3/current/$part").isEmpty,
        s"merged-away cell 3 still holds $part rows")
    // the dropped centroid left the quantizer
    assert(!newCents.collect().map(_.getLong(0)).contains(3L))
  }

  test("sharded-layered rebalance: an untouched cell's DATA is never " +
      "opened — decisions come from the swap-time manifests alone") {
    val spark = TestSpark.spark
    val (store, cents, _) = shardedLayeredFixture("blind")
    // learn the action set on a pristine copy
    val probe = java.nio.file.Files
      .createTempDirectory("graft_r16_blind_probe").toString + "/s"
    copyDir(store, probe)
    val acts = graft.streaming.ShardedLayeredCdc
      .rebalanceShardedLayeredStore(spark, probe, cents, "vec_id",
        "embedding", cap = 2, k = 10, graphRounds = 3, layerK = 5,
        layerRounds = 2, initBuckets = 16, splitPpm = 280000L,
        mergePpm = 220000L, rebalanceId = 3L)
      ._1.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val kept = acts.collect { case (c, "kept") => c }
    assert(kept.nonEmpty, s"fixture must leave a kept cell: $acts")
    // poison every kept cell's parquet DATA (manifests stay): if the
    // rebalance opened any of it, the re-run would throw
    import scala.jdk.CollectionConverters._
    for (c <- kept) {
      val cur = java.nio.file.Paths.get(s"$store/cell_$c/current")
      java.nio.file.Files.walk(cur).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !Set("applied_batch", "n_vecs").contains(p.getFileName.toString))
        .foreach(p => java.nio.file.Files.write(p,
          "poisoned".getBytes("US-ASCII")))
    }
    val acts2 = graft.streaming.ShardedLayeredCdc
      .rebalanceShardedLayeredStore(spark, store, cents, "vec_id",
        "embedding", cap = 2, k = 10, graphRounds = 3, layerK = 5,
        layerRounds = 2, initBuckets = 16, splitPpm = 280000L,
        mergePpm = 220000L, rebalanceId = 3L)
      ._1.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(acts2 == acts,
      "poisoning kept cells' data changed the report — they were read")
    // and the poison is still in place: neither read NOR rewritten
    for (c <- kept) {
      val g = java.nio.file.Paths.get(s"$store/cell_$c/current/graph")
      val one = java.nio.file.Files.walk(g).iterator().asScala
        .find(java.nio.file.Files.isRegularFile(_)).get
      assert(new String(java.nio.file.Files.readAllBytes(one),
        "US-ASCII") == "poisoned", s"kept cell $c was rewritten")
    }
  }

  test("sharded-layered maintenance window: in-band counts fire nothing " +
      "and every store stays byte-identical") {
    val spark = TestSpark.spark
    val (store, cents, _) = shardedLayeredFixture("noop")
    val before = (0L until 4L).map(c =>
      c -> fileBytes(s"$store/cell_$c/current")).toMap
    val (report, _) = graft.streaming.ShardedLayeredCdc
      .maintenanceWindowLayered(spark, store, cents, "vec_id", "embedding",
        cap = 2, k = 10, graphRounds = 3, layerK = 5, layerRounds = 2,
        initBuckets = 16, splitPpm = 900000L, mergePpm = 10000L,
        rebalanceId = 8L)
    assert(report.collect().forall(_.getString(2) == "kept"))
    for (c <- 0L until 4L)
      assert(fileBytes(s"$store/cell_$c/current") == before(c),
        s"no-op window rewrote cell $c")
  }

  test("sharded-layered growth report: manifest counts, level-0 and " +
      "layer stats, stack height, and the share-band verdicts") {
    val spark = TestSpark.spark
    val (store, cents, assigned) = shardedLayeredFixture("grow")
    val rep = graft.streaming.ShardedLayeredCdc.growthReport(spark, store,
        cents, k = 10, cap = 2, splitPpm = 280000L, mergePpm = 220000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val memCounts = assigned.groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = memCounts.values.sum
    for (c <- 0L until 4L) {
      val r = rep(c)
      assert(r.getLong(1) == memCounts(c), s"cell $c n_members")
      assert(r.getLong(2) == memCounts(c) * 1000000L / total, s"cell $c share")
      val g = spark.read.parquet(s"$store/cell_$c/current/graph")
      assert(r.getLong(3) == g.count(), s"cell $c n_edges")
      val layerRows = (1 to 2).map(l =>
        spark.read.parquet(s"$store/cell_$c/current/layer_$l").count()).sum
      assert(r.getLong(6) == layerRows, s"cell $c n_layer_edges")
      val expMax = spark.read.parquet(s"$store/cell_$c/current/levels")
        .agg(max(col("level"))).head().getInt(0)
      assert(r.getLong(5) == expMax.toLong, s"cell $c max_level")
    }
    assert(rep(2L).getString(7) == "split" && rep(3L).getString(7) == "merge")
  }

  // ------------------------------------------------------------------
  // Streaming serve over the sharded-layered index (q353)
  // ------------------------------------------------------------------

  test("serveShardedLayeredTopK: the drained table equals the batch " +
      "shardedLayeredSearchTopK statement") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .localCheckpoint()
    val cents = graft.operators.Similarity.ivfCentroids(
      emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity.ivfAssign(
      emb, "vec_id", "embedding", cents).localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r16_serve").toString
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 10, graphRounds = 3,
      initBuckets = 16, indexDir = s"$dir/idx")
    graft.operators.AnnIndex.buildOrLoadShardedLayers(assigned,
      "vec_id", "embedding", nCells = 4, cap = 3, layerK = 5,
      layerRounds = 2, initBuckets = 16, layersDir = s"$dir/layers")
    val served = graft.streaming.AnnServing.serveShardedLayeredTopK(spark,
      index, assigned, cents, s"$dir/layers",
      queriesPath = s"$sf/embeddings.parquet",
      querySchemaDDL = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
      queryFilter = col("vec_id") >= 70 && col("vec_id") < 80,
      idCol = "vec_id", vecCol = "embedding", cap = 3, nprobe = 2,
      m = 2, descBeam = 6, descRounds = 2, beam = 12, rounds = 3, k = 5)
    val routed = graft.operators.Similarity.ivfProbeCells(
      emb.filter(col("vec_id") >= 70 && col("vec_id") < 80),
      "vec_id", "embedding", cents, 2)
    val batch = graft.operators.AnnIndex.shardedLayeredSearchTopK(index,
      assigned, routed, s"$dir/layers", "vec_id", "embedding",
      cap = 3, m = 2, descBeam = 6, descRounds = 2, beam = 12,
      rounds = 3, k = 5)
    assert(rows(served.select("q_id", "n_id", "d2")) ==
      rows(batch.select("q_id", "n_id", "d2")))
  }

  // ------------------------------------------------------------------
  // VP8L 2D short-distance codes
  // ------------------------------------------------------------------

  test("VP8L plane codes: the 120-entry table is exactly the spec's " +
      "neighbor set, the inverse maps back, distances resolve against " +
      "the width with the >= 1 clamp, and the direct form keeps +120") {
    import graft.multimodal.Vp8l
    val pairs = Vp8l.kCodeToPlane.map(p => (8 - (p & 0xf), p >> 4)).toSeq
    assert(pairs.length == 120 && pairs.distinct.length == 120)
    val expected = ((1 to 8).map(x => (x, 0)) ++
      (for (y <- 1 to 7; x <- -7 to 8) yield (x, y))).toSet
    assert(pairs.toSet == expected,
      "the table must be a permutation of the spec's neighbor set")
    // the published closest-first head
    assert(pairs.take(8) ==
      Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)))
    for (((x, y), i) <- pairs.zipWithIndex) {
      assert(Vp8l.planeCodeOf(x, y).contains(i + 1), s"inverse of ($x, $y)")
      assert(Vp8l.planeCodeToDistance(20, i + 1) == math.max(1, y * 20 + x),
        s"distance of code ${i + 1} at width 20")
    }
    // (-7, 0)-style pairs are NOT plane codes
    assert(Vp8l.planeCodeOf(-1, 0).isEmpty && Vp8l.planeCodeOf(0, 0).isEmpty)
    // direct distances keep the +120 bias
    assert(Vp8l.planeCodeToDistance(20, 121) == 1)
    assert(Vp8l.planeCodeToDistance(20, 300) == 180)
    // the clamp: (-7, 0) cannot occur, but (x<0, y=1) at tiny widths can
    // drive y*w+x to 0 — e.g. code for (-1, 1) at width 1
    val cNeg = Vp8l.planeCodeOf(-1, 1).get
    assert(Vp8l.planeCodeToDistance(1, cNeg) == 1)
  }

  test("VP8L 2D streams round-trip pixel-exactly in both classes " +
      "(negative-x diagonal copies and (0,1) row copies)") {
    import graft.multimodal.Vp8l
    for (id <- Seq(4L, 7L, 16L, 33L); (w, h) <- Seq((6, 5), (1, 4), (9, 1))) {
      val bytes = Vp8l.encode2dAsset(id, w, h)
      val (dw, dh, pix, transforms) = Vp8l.decode(bytes)
        .getOrElse(fail(s"2D stream (id=$id, $w x $h) did not decode"))
      assert(dw == w && dh == h && !transforms.exists(_ != "none"))
      for (y <- 0 until h; x <- 0 until w) {
        val q = if (id % 2 == 0) (x + y).toLong else x.toLong
        assert(pix(y * w + x) == Vp8l.rampPixel(id, q),
          s"pixel ($x, $y) of id=$id $w x $h")
      }
    }
  }
}
