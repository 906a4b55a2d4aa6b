package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Round-17 locks: streaming serve over the LIVE CDC-maintained
  * sharded stores — per-batch swap-pointer pinning, the per-cell
  * descent-entry manifests refreshed at every swap, the
  * half-committed-stack invisibility contract, path-scoped reads of
  * probed cells only, and the pre-manifest/pre-entries fallbacks. */
class Round17Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r17_$tag").toString

  // --- shared small fixture -------------------------------------------

  private def emb = {
    val spark = TestSpark.spark
    graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 120).localCheckpoint()
  }

  private def centsOf(e: org.apache.spark.sql.DataFrame) =
    graft.operators.Similarity
      .ivfCentroids(e, "vec_id", "embedding", 0L until 2L).localCheckpoint()

  private def writeQueries(e: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column, tag: String): String = {
    val dir = tmp(s"q_$tag")
    e.filter(pred).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private val qDDL = "vec_id BIGINT, embedding ARRAY<FLOAT>"

  private def vecOf(e: org.apache.spark.sql.DataFrame, id: Long): Seq[Float] =
    e.filter(col("vec_id") === id).select("embedding").head().getSeq[Float](0)

  // ------------------------------------------------------------------
  // LIVE flat-sharded serve (q358's scaffold)
  // ------------------------------------------------------------------

  test("live sharded serve: drained results equal the batch statement " +
      "over the current store, a staged-but-unswapped next_ dir is " +
      "invisible, and after a CDC swap the serve follows the pointer") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = emb
    val cents = centsOf(e)
    val assigned = graft.operators.Similarity
      .ivfAssign(e, "vec_id", "embedding", cents).localCheckpoint()
    val store = tmp("flat")
    graft.streaming.IndexCdc.initShardedStore(spark, store, assigned,
      "vec_id", "embedding", nCells = 2, graphK = 6, graphRounds = 2,
      initBuckets = 8)
    val qdir = writeQueries(e, col("vec_id") >= 20 && col("vec_id") < 25, "flat")
    def live() = graft.streaming.AnnServing.serveLiveShardedTopK(spark,
      store, cents, qdir, qDDL, lit(true), "vec_id", "embedding",
      nprobe = 2, entriesPerCell = 2, beam = 8, rounds = 2, k = 3)
      .select(col("q_id"), col("n_id"), col("d2"), col("rank"))
    def batchStatement() = {
      val routed = graft.operators.Similarity.ivfProbeCells(
        e.filter(col("vec_id") >= 20 && col("vec_id") < 25),
        "vec_id", "embedding", cents, 2)
      val vecs = graft.streaming.IndexCdc
        .shardedStoreVecs(spark, store, 0L until 2L)
      graft.operators.AnnIndex.shardedSearchWithEntries(
        graft.streaming.IndexCdc.shardedStoreGraph(spark, store, 0L until 2L),
        vecs.select(col("vec_id"), col("embedding")), routed,
        graft.operators.AnnIndex.cellEntryPoints(vecs, "vec_id", 2),
        "vec_id", "embedding", beam = 8, rounds = 2, k = 3)
        .select(col("q_id"), col("n_id"), col("d2"), col("rank"))
    }
    val pre = rows(batchStatement())
    assert(rows(live()) == pre,
      "live serve must equal the batch statement over the seeded store")
    // a HALF-COMMITTED stack — a staged next_ dir that never swapped
    // (the crash-in-phase-1 state) — must be invisible to serving
    val staged = java.nio.file.Paths.get(store, "cell_0", "next_99", "graph")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.write(staged.resolve("part-junk.parquet"),
      Array.fill[Byte](64)(0x5a))
    assert(rows(live()) == pre,
      "a staged-but-unswapped next_ dir leaked into serving")
    // CDC swap: delete two ids the pre-swap serve actually returned,
    // so the post-swap result set must move
    val delIds = live().select("n_id").distinct()
      .orderBy(col("n_id")).limit(2).collect().map(_.getLong(0))
    assert(delIds.nonEmpty)
    val batch = delIds.toSeq.map(id => ("delete", id, vecOf(e, id)))
      .toDF("op", "vec_id", "embedding")
    graft.streaming.IndexCdc.mergeShardedCdcBatch(batch, 0L, store, cents,
      "vec_id", "embedding", k = 6, entriesPerCell = 2, beam = 8,
      searchRounds = 2, repairThreshold = 1L)
    val post = rows(batchStatement())
    assert(post != pre, "the CDC batch should have moved the result set")
    assert(rows(live()) == post,
      "live serve did not follow the swap pointer to the post-CDC store")
    assert(!live().select("n_id").collect().map(_.getLong(0))
        .exists(delIds.contains),
      "live serve returned a tombstoned id after the swap")
  }

  test("live sharded serve: unprobed cells' files are never opened " +
      "(a corrupted unprobed cell cannot fail the batch)") {
    val spark = TestSpark.spark
    val e = emb
    val cents = centsOf(e)
    val assigned = graft.operators.Similarity
      .ivfAssign(e, "vec_id", "embedding", cents).localCheckpoint()
    val store = tmp("probe")
    graft.streaming.IndexCdc.initShardedStore(spark, store, assigned,
      "vec_id", "embedding", nCells = 2, graphK = 6, graphRounds = 2,
      initBuckets = 8)
    // one query = centroid 0's own vector at nprobe 1: routes to cell 0
    val qdir = writeQueries(e, col("vec_id") === 0, "probe")
    def live() = graft.streaming.AnnServing.serveLiveShardedTopK(spark,
      store, cents, qdir, qDDL, lit(true), "vec_id", "embedding",
      nprobe = 1, entriesPerCell = 2, beam = 8, rounds = 2, k = 3)
      .select(col("q_id"), col("n_id"), col("d2"), col("rank"))
    val pre = rows(live())
    assert(pre.nonEmpty)
    // trash cell 1's entire current store: data unreadable, files gone
    val c1 = java.nio.file.Paths.get(store, "cell_1", "current")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(c1).iterator().asScala.toSeq.reverse
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach(p => java.nio.file.Files.write(p, Array.fill[Byte](8)(0x00)))
    assert(rows(live()) == pre,
      "serving a cell-0-only batch opened cell 1's files")
  }

  // ------------------------------------------------------------------
  // LIVE sharded-layered serve (q359's scaffold) + entry manifests
  // ------------------------------------------------------------------

  private def layeredFixture(tag: String) = {
    val spark = TestSpark.spark
    val e = emb
    val cents = centsOf(e)
    val assigned = graft.operators.Similarity
      .ivfAssign(e, "vec_id", "embedding", cents).localCheckpoint()
    val store = tmp(s"slay_$tag")
    graft.streaming.ShardedLayeredCdc.initShardedLayeredStore(spark, store,
      assigned, "vec_id", "embedding", nCells = 2, cap = 2, graphK = 6,
      graphRounds = 2, layerK = 4, layerRounds = 2, initBuckets = 8)
    (e, cents, store)
  }

  /** The manifest a cell SHOULD carry: (max populated level, lowest id
    * there), derived from the committed levels part. */
  private def expectedEntry(store: String, c: Long): Option[(Int, Long)] = {
    val spark = TestSpark.spark
    val lv = spark.read.parquet(s"$store/cell_$c/current/levels")
    lv.orderBy(col("level").desc, col("vec_id").asc).limit(1)
      .collect().headOption.map(r => (r.getInt(1), r.getLong(0)))
  }

  private def manifestEntry(store: String, c: Long): Option[Option[(Int, Long)]] = {
    val spark = TestSpark.spark
    val cur = new org.apache.hadoop.fs.Path(s"$store/cell_$c/current")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.streaming.IndexCdc.readEntryMeta(fs, cur)
  }

  private def liveLayered(store: String,
      cents: org.apache.spark.sql.DataFrame, qdir: String) =
    graft.streaming.AnnServing.serveLiveShardedLayeredTopK(TestSpark.spark,
      store, cents, qdir, qDDL, lit(true), "vec_id", "embedding",
      cap = 2, nprobe = 2, m = 2, descBeam = 4, descRounds = 2,
      beam = 8, rounds = 2, k = 3)
      .select(col("q_id"), col("n_id"), col("d2"), col("rank"))

  /** The batch statement the live layered serve must equal: the same
    * descent + seeded keyed search primitives over the cells' current
    * parts, with the entry table derived from the committed levels. */
  private def layeredBatchStatement(e: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame, store: String,
      qPred: org.apache.spark.sql.Column) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val routed = graft.operators.Similarity.ivfProbeCells(
      e.filter(qPred), "vec_id", "embedding", cents, 2)
    def part(name: String) = graft.streaming.ShardedLayeredCdc
      .shardedLayeredStorePart(spark, store, 0L until 2L, name)
    val entry = (0L until 2L).flatMap(c =>
        expectedEntry(store, c).map { case (ml, id) => (c, ml, id) })
      .toDF("cell", "ml", "n_id")
    val corpus = part("vecs").select(col("vec_id"), col("embedding"))
    val seeds = graft.operators.AnnIndex.descentSeedsWith(entry, corpus,
      routed, "vec_id", "embedding", cap = 2, m = 2, descBeam = 4,
      descRounds = 2)(l => part(s"layer_$l")
        .select(col("q_id"), col("n_id"), col("d2"), col("cell")))
    graft.operators.Similarity.keyedGraphSearchTopKSeeded(
      part("graph").select(col("cell"), col("q_id"), col("n_id"), col("d2")),
      corpus, routed, seeds, "vec_id", "embedding", 8, 2, 3)
      .select(col("q_id"), col("n_id"), col("d2"), col("rank"))
  }

  test("live sharded-layered serve: seed manifests are written and " +
      "correct, the drain equals the batch statement, a CDC batch that " +
      "deletes a cell's top entry refreshes the manifest, and the " +
      "post-swap serve descends from the NEW entry") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (e, cents, store) = layeredFixture("serve")
    // seed manifests present and correct for every cell
    for (c <- 0L until 2L)
      assert(manifestEntry(store, c) == Some(expectedEntry(store, c)),
        s"cell $c seed entry manifest wrong")
    val qPred = col("vec_id") >= 30 && col("vec_id") < 35
    val qdir = writeQueries(e, qPred, "slay")
    val pre = rows(layeredBatchStatement(e, cents, store, qPred))
    assert(rows(liveLayered(store, cents, qdir)) == pre,
      "live layered serve must equal the batch statement over the seed")
    // delete cell 0's TOP ENTRY (the exact staleness the manifests
    // exist to prevent: a build-time table would still point at it)
    val top0 = manifestEntry(store, 0L).flatten.get._2
    val batch = Seq(("delete", top0, vecOf(e, top0)))
      .toDF("op", "vec_id", "embedding")
    graft.streaming.ShardedLayeredCdc.mergeShardedLayeredCdcBatch(batch, 0L,
      store, cents, "vec_id", "embedding", cap = 2, k = 6, layerK = 4,
      m = 2, descBeam = 4, descRounds = 2, beam = 8, searchRounds = 2,
      repairThreshold = 1L)
    val newMeta = manifestEntry(store, 0L)
    assert(newMeta == Some(expectedEntry(store, 0L)),
      "cell 0's manifest was not refreshed at the swap")
    assert(newMeta.flatten.map(_._2) != Some(top0),
      "the refreshed manifest still names the deleted entry")
    val post = rows(layeredBatchStatement(e, cents, store, qPred))
    assert(rows(liveLayered(store, cents, qdir)) == post,
      "post-swap live serve must equal the batch statement over the " +
        "post-CDC store")
    assert(!liveLayered(store, cents, qdir).select("n_id").collect()
        .map(_.getLong(0)).contains(top0),
      "post-swap serve still returned the tombstoned top entry")
  }

  test("live sharded-layered serve: a legacy cell store without an " +
      "entry manifest derives its descent metadata from the levels " +
      "part and serves identically") {
    val (e, cents, store) = layeredFixture("legacy")
    val qPred = col("vec_id") >= 40 && col("vec_id") < 44
    val qdir = writeQueries(e, qPred, "legacy")
    val withManifests = rows(liveLayered(store, cents, qdir))
    for (c <- 0L until 2L)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(store, s"cell_$c", "current", "entry"))
    assert(rows(liveLayered(store, cents, qdir)) == withManifests,
      "the levels-part fallback served different results")
  }

  test("sharded-layered rebalance refreshes the entry manifests of " +
      "every affected cell (and writes `none` for a merged-away one)") {
    val spark = TestSpark.spark
    val e = graft.core.Engine.table(spark, sf, "embeddings").localCheckpoint()
    val cents = graft.operators.Similarity
      .ivfCentroids(e, "vec_id", "embedding", 0L until 4L).localCheckpoint()
    val assigned = graft.operators.Similarity.ivfAssign(
      e.filter(col("vec_id") % 10 =!= 9), "vec_id", "embedding", cents)
      .localCheckpoint()
    val store = tmp("reb")
    graft.streaming.ShardedLayeredCdc.initShardedLayeredStore(spark, store,
      assigned, "vec_id", "embedding", nCells = 4, cap = 2, graphK = 10,
      graphRounds = 3, layerK = 5, layerRounds = 2, initBuckets = 16)
    val (report, _) = graft.streaming.ShardedLayeredCdc
      .rebalanceShardedLayeredStore(spark, store, cents, "vec_id",
        "embedding", cap = 2, k = 10, graphRounds = 3, layerK = 5,
        layerRounds = 2, initBuckets = 16, splitPpm = 280000L,
        mergePpm = 220000L, rebalanceId = 7L)
    val acts = report.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    for ((c, a) <- acts) {
      if (a == "merged_away")
        assert(manifestEntry(store, c) == Some(None),
          s"merged-away cell $c should carry the empty manifest")
      else
        assert(manifestEntry(store, c) == Some(expectedEntry(store, c)),
          s"cell $c ($a) manifest does not match its committed levels")
    }
  }

  // ------------------------------------------------------------------
  // buildOrLoadShardedLayers: pre-entries artifact migration (ADVICE)
  // ------------------------------------------------------------------

  test("a layers artifact without the /entries table still serves " +
      "(assignment fallback) and is backfilled by the next " +
      "buildOrLoadShardedLayers call") {
    val spark = TestSpark.spark
    val e = emb
    val cents = centsOf(e)
    val assigned = graft.operators.Similarity
      .ivfAssign(e, "vec_id", "embedding", cents).localCheckpoint()
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 2, graphK = 6, graphRounds = 2,
      initBuckets = 8, indexDir = tmp("mig_idx"))
    val layersDir = tmp("mig_layers")
    graft.operators.AnnIndex.buildOrLoadShardedLayers(assigned, "vec_id",
      "embedding", nCells = 2, cap = 2, layerK = 4, layerRounds = 2,
      initBuckets = 8, layersDir = layersDir)
    def search() = {
      val routed = graft.operators.Similarity.ivfProbeCells(
        e.filter(col("vec_id") >= 10 && col("vec_id") < 14),
        "vec_id", "embedding", cents, 2)
      graft.operators.AnnIndex.shardedLayeredSearchTopK(index, assigned,
        routed, layersDir, "vec_id", "embedding", cap = 2, m = 2,
        descBeam = 4, descRounds = 2, beam = 8, rounds = 2, k = 3)
    }
    val withTable = rows(search())
    // simulate a pre-round-16 artifact: entries table absent
    import scala.jdk.CollectionConverters._
    val entriesPath = java.nio.file.Paths.get(layersDir, "entries")
    java.nio.file.Files.walk(entriesPath).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
    assert(rows(search()) == withTable,
      "the assignment fallback must serve the pre-entries artifact " +
        "identically")
    // a build-or-load against the existing artifact backfills the table
    graft.operators.AnnIndex.buildOrLoadShardedLayers(assigned, "vec_id",
      "embedding", nCells = 2, cap = 2, layerK = 4, layerRounds = 2,
      initBuckets = 8, layersDir = layersDir)
    assert(java.nio.file.Files.exists(entriesPath.resolve("_SUCCESS")),
      "buildOrLoadShardedLayers did not backfill the entries table")
    assert(rows(search()) == withTable)
  }

  // ------------------------------------------------------------------
  // Bench hardening: artifact-path resolver, env-ceiling floor (ADVICE)
  // ------------------------------------------------------------------

  test("Bench.repoRoot: env override wins; else the nearest build.sbt " +
      "ancestor of the working dir; else the literal fallback") {
    assert(Bench.repoRoot(Map("SPARK_GRAFT_REPO_ROOT" -> "/x/y"),
      "/anywhere") == "/x/y")
    val nested = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/root/repo/target/r17_nested_probe"))
    assert(Bench.repoRoot(Map.empty, nested.toString) == "/root/repo",
      "a dir nested under the repo must resolve to the repo root")
    assert(Bench.repoRoot(Map.empty, "/dev") == "/root/repo",
      "no build.sbt up the tree must fall back to the literal")
  }

  test("Bench.bandCeiling: the env ceiling is a hard floor — a ceiling " +
      "raised above 240 s is never clamped back for committed entries") {
    assert(Bench.bandCeiling("x", Map("x" -> 2.0), 300.0, Set()) == 300.0)
    assert(Bench.bandCeiling("x", Map("x" -> 2.0), 60.0, Set()) == 75.0)
    assert(Bench.bandCeiling("x", Map("x" -> 100.0), 60.0, Set()) == 240.0)
    assert(Bench.bandCeiling("x", Map.empty, 60.0, Set()) == 60.0)
    assert(Bench.bandCeiling("m", Map("m" -> 1.0), 60.0, Set("m")) == 160.0)
  }

  // ------------------------------------------------------------------
  // ZIP: ZIP64 EOCD + rebased (prepended) archives (ADVICE)
  // ------------------------------------------------------------------

  private def w32le(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def w64le(v: Long): Array[Byte] = w32le(v) ++ w32le(v >> 32)
  private def w16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  test("parseZip: a ZIP64 EOCD (sentinel offset, locator + 64-bit " +
      "record) walks to the same members as the classic form") {
    import graft.sources.Zip
    val members = Seq(
      ("a.txt", "hello zip64".getBytes("US-ASCII"), false),
      ("b/c.bin", Array.tabulate[Byte](300)(_.toByte), true))
    val classic = Zip.encodeZip(members)
    val expect = Zip.parseZip(classic).get.map(m => (m.name, m.payload.toSeq))
    // rewrite the tail: [.. cd][zip64 EOCD record][locator][EOCD with
    // the 0xFFFFFFFF offset sentinel]
    val eocdAt = classic.length - 22
    val cdSize = (classic(eocdAt + 12) & 0xffL) |
      ((classic(eocdAt + 13) & 0xffL) << 8) |
      ((classic(eocdAt + 14) & 0xffL) << 16) |
      ((classic(eocdAt + 15) & 0xffL) << 24)
    val cdOff = (classic(eocdAt + 16) & 0xffL) |
      ((classic(eocdAt + 17) & 0xffL) << 8) |
      ((classic(eocdAt + 18) & 0xffL) << 16) |
      ((classic(eocdAt + 19) & 0xffL) << 24)
    val body = classic.take((cdOff + cdSize).toInt)
    val z64 = w32le(0x06064b50L) ++ w64le(44L) ++ w16le(45) ++ w16le(45) ++
      w32le(0L) ++ w32le(0L) ++ w64le(2L) ++ w64le(2L) ++
      w64le(cdSize) ++ w64le(cdOff)
    val locator = w32le(0x07064b50L) ++ w32le(0L) ++
      w64le((cdOff + cdSize)) ++ w32le(1L)
    val eocd = w32le(0x06054b50L) ++ w16le(0) ++ w16le(0) ++
      w16le(0xffff) ++ w16le(0xffff) ++ w32le(0xffffffffL) ++
      w32le(0xffffffffL) ++ w16le(0)
    val zip64 = body ++ z64 ++ locator ++ eocd
    val got = Zip.parseZip(zip64)
    assert(got.isDefined, "ZIP64 EOCD did not walk")
    assert(got.get.map(m => (m.name, m.payload.toSeq)) == expect)
  }

  test("parseZip: a rebased archive (self-extractor-style prepended " +
      "bytes shift every stored offset) recovers the shift and walks " +
      "to the same members") {
    import graft.sources.Zip
    val members = Seq(
      ("x.txt", "rebased".getBytes("US-ASCII"), false),
      ("y.bin", Array.tabulate[Byte](200)(i => (i * 7).toByte), true))
    val clean = Zip.encodeZip(members)
    val expect = Zip.parseZip(clean).get.map(m => (m.name, m.payload.toSeq))
    val stub = Array.tabulate[Byte](64)(i => (0x40 + i % 26).toByte)
    val rebased = stub ++ clean
    val got = Zip.parseZip(rebased)
    assert(got.isDefined, "rebased archive did not walk")
    assert(got.get.map(m => (m.name, m.payload.toSeq)) == expect)
  }

  // ------------------------------------------------------------------
  // Ogg identification headers, HTTP chunked bodies, MPEG-audio layers,
  // JPEG drop reasons
  // ------------------------------------------------------------------

  test("walkOggIds: Vorbis and Opus id headers parse field-exactly; " +
      "an unidentifiable first packet reports unknown without " +
      "dropping the page accounting") {
    import graft.multimodal.Mpeg
    val vorbisPage = Mpeg.encodeOggPage(7, 0, 0L, 2,
      Seq(Mpeg.vorbisIdHeader(channels = 5, rate = 32000L)))
    val opusPage = Mpeg.encodeOggPage(8, 0, 0L, 2,
      Seq(Mpeg.opusHead(channels = 2, preSkip = 356, rate = 48000L)))
    val junkPage = Mpeg.encodeOggPage(9, 0, 42L, 2,
      Seq(Array[Byte](1, 2, 3)))
    val ids = Mpeg.walkOggIds(vorbisPage ++ opusPage ++ junkPage).get
      .map(s => s.serial -> s).toMap
    assert(ids(7L).codec == "vorbis" && ids(7L).version == 0L &&
      ids(7L).channels == 5L && ids(7L).sampleRate == 32000L &&
      ids(7L).preSkip == 0L)
    assert(ids(8L).codec == "opus" && ids(8L).version == 1L &&
      ids(8L).channels == 2L && ids(8L).sampleRate == 48000L &&
      ids(8L).preSkip == 356L)
    assert(ids(9L).codec == "unknown" && ids(9L).channels == -1L &&
      ids(9L).nPages == 1L && ids(9L).lastGranule == 42L)
  }

  test("dechunk: exact reassembly, and every malformation rejects — " +
      "bad size, missing data CRLF, trailing garbage, truncation") {
    import graft.sources.Warc
    def asc(s: String) = s.getBytes("US-ASCII")
    assert(Warc.dechunk(asc("5\r\nhello\r\n3;ext=1\r\n!!!\r\n0\r\n\r\n"))
      .map(new String(_, "US-ASCII")) == Some("hello!!!"))
    // trailer fields after the 0-chunk are consumed
    assert(Warc.dechunk(asc("2\r\nok\r\n0\r\nX-T: 1\r\n\r\n"))
      .map(new String(_, "US-ASCII")) == Some("ok"))
    assert(Warc.dechunk(asc("zz\r\nhello\r\n0\r\n\r\n")).isEmpty)
    assert(Warc.dechunk(asc("5\r\nhelloXX3\r\n!!!\r\n0\r\n\r\n")).isEmpty)
    assert(Warc.dechunk(asc("5\r\nhello\r\n0\r\n\r\ngarbage")).isEmpty)
    assert(Warc.dechunk(asc("5\r\nhel")).isEmpty)
  }

  test("httpResponseBody: chunked wins, Content-Length is verified " +
      "exactly (a short body is a truncated capture and drops)") {
    import graft.sources.Warc
    def asc(s: String) = s.getBytes("US-ASCII")
    val ok = Warc.httpResponseBody(asc(
      "HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbody"))
    assert(ok.map { case (s, b) => (s, new String(b, "US-ASCII")) } ==
      Some((200, "body")))
    assert(Warc.httpResponseBody(asc(
      "HTTP/1.1 200 OK\r\nContent-Length: 9\r\n\r\nbody")).isEmpty,
      "short body must drop as truncated")
    val ch = Warc.httpResponseBody(asc(
      "HTTP/1.1 404 NF\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "3\r\nabc\r\n0\r\n\r\n"))
    assert(ch.map { case (s, b) => (s, new String(b, "US-ASCII")) } ==
      Some((404, "abc")))
  }

  test("walkMp3Layers: per-layer strides and tables walk all three " +
      "layers; a mid-stream layer change rejects") {
    import graft.multimodal.Mpeg
    for (layer <- 1 to 3) {
      val b = Mpeg.encodeMp3Layered(layer, nFrames = 4, bitrateIdx = 10,
        rateIdx = 1, padBit = _ % 2)
      val info = Mpeg.walkMp3Layers(b).get
      assert(info.layer == layer && info.nFrames == 4L &&
        info.sampleRate == 48000)
      assert(info.bitrateKbps == (layer match {
        case 1 => 320; case 2 => 192; case _ => 160
      }), s"layer $layer bitrate table row")
      assert(info.durationMs ==
        4L * (if (layer == 1) 384 else 1152) * 1000 / 48000)
    }
    val mixed = Mpeg.encodeMp3Layered(1, 2, 10, 1, _ => 0) ++
      Mpeg.encodeMp3Layered(2, 2, 10, 1, _ => 0)
    assert(Mpeg.walkMp3Layers(mixed).isEmpty,
      "a layer change mid-stream must reject, not mis-stride")
  }

  test("Jpeg.dropReason: the four planted classes classify exactly") {
    import graft.multimodal.Jpeg
    val base = Jpeg.encodeJpegGray(9, 7, seed = 3L)
    assert(Jpeg.decodeJpeg(base).isDefined)
    def patched(f: Array[Byte] => Array[Byte]): Array[Byte] = f(base.clone())
    def findMarker(b: Array[Byte], want: Int): Int = {
      var at = 2
      while (at + 4 <= b.length) {
        if ((b(at + 1) & 0xff) == want) return at
        at += 2 + (((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff))
      }
      -1
    }
    val arith = patched { b => b(findMarker(b, 0xc0) + 1) = 0xc9.toByte; b }
    assert(Jpeg.decodeJpeg(arith).isEmpty &&
      Jpeg.dropReason(arith) == "jpeg_arithmetic")
    val deep = patched { b => b(findMarker(b, 0xc0) + 4) = 12.toByte; b }
    assert(Jpeg.decodeJpeg(deep).isEmpty && Jpeg.dropReason(deep) == "jpeg_12bit")
    val trunc = base.take(10)
    assert(Jpeg.decodeJpeg(trunc).isEmpty && Jpeg.dropReason(trunc) == "corrupt")
  }
}
