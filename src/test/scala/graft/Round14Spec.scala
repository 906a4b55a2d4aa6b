package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Round-14 locks: keyed (loop-free) sharded ANN serving, sharded-store
  * CDC, rational polyphase resampling, MP4 container walk, VP8L. */
class Round14Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------------
  // Keyed sharded serving (the loop-free q314/q316 restatement)
  // ------------------------------------------------------------------

  test("cellEntryPoints: each cell's lowest ids, as one table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val assigned = Seq(
      (10L, 0L), (3L, 0L), (7L, 0L), (20L, 1L), (15L, 1L), (99L, 2L))
      .toDF("vec_id", "cell")
      .withColumn("embedding", array(lit(1.0f)))
    val e = graft.operators.AnnIndex
      .cellEntryPoints(assigned, "vec_id", entriesPerCell = 2)
      .orderBy("cell", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq == Seq((0L, 3L), (0L, 7L), (1L, 15L), (1L, 20L), (2L, 99L)))
  }

  test("sharded serving survives routing to an absent/empty cell " +
      "(trained quantizers can leave cells empty)") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_shard").toString + "/idx"
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8, indexDir = dir)
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 14)
    val routedReal = graft.operators.Similarity.ivfProbeCells(
      queries, "vec_id", "embedding", cents, nprobe = 1)
    // the empty-cell scenario: the same queries ALSO routed to cell 9,
    // which has no shard, no members, no entry points
    val routedPlus = routedReal.unionByName(
      routedReal.withColumn("cell", lit(9L)))
    val base = graft.operators.AnnIndex.shardedSearchTopK(index, assigned,
      routedReal, "vec_id", "embedding", entriesPerCell = 2,
      beam = 8, rounds = 2, k = 3).orderBy("q_id", "rank").collect()
    val plus = graft.operators.AnnIndex.shardedSearchTopK(index, assigned,
      routedPlus, "vec_id", "embedding", entriesPerCell = 2,
      beam = 8, rounds = 2, k = 3).orderBy("q_id", "rank").collect()
    assert(base.nonEmpty)
    // the phantom cell contributes no candidates and crashes nothing
    assert(plus.toSeq == base.toSeq)
  }

  // ------------------------------------------------------------------
  // Sharded-store CDC (q322): per-cell commit, replay, rebuild guard
  // ------------------------------------------------------------------

  private def cdcFixture(tag: String): (String,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).localCheckpoint()
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_r14_cdc_$tag").toString
    graft.streaming.IndexCdc.initShardedStore(spark, store, assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8)
    (store, assigned, cents)
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

  private def cellOf(assigned: org.apache.spark.sql.DataFrame, id: Long): Long =
    assigned.filter(col("vec_id") === id).select(col("cell").cast("long"))
      .head().getLong(0)

  private def graphRows(spark: org.apache.spark.sql.SparkSession,
      store: String, c: Long): Set[(Long, Long, Long)] =
    spark.read.parquet(s"$store/cell_$c/current/graph")
      .select(col("q_id"), col("n_id"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("sharded CDC: untouched cells are never opened, read, or rewritten") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = cdcFixture("untouched")
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
    // a batch confined to ONE cell: delete a member, upsert a new id
    // carrying a member's embedding (routes to the same cell)
    val anchor = 7L
    val cA = cellOf(assigned, anchor)
    val av = emb.filter(col("vec_id") === anchor).select("embedding").head()
      .getSeq[Float](0)
    val victim = assigned.filter(col("cell") === cA && col("vec_id") =!= anchor)
      .select(col("vec_id")).orderBy(col("vec_id")).head().getLong(0)
    val vv = emb.filter(col("vec_id") === victim).select("embedding").head()
      .getSeq[Float](0)
    val batch = Seq(("delete", victim, vv), ("upsert", 100001L, av))
      .toDF("op", "vec_id", "embedding")
    val untouched = (0L until 4L).filter(_ != cA)
    // vandalize one untouched cell's graph: replace the parquet dir with
    // a garbage FILE — if maintenance so much as opens it, it crashes
    val sacrificial = untouched.head
    val gdir = java.nio.file.Paths.get(s"$store/cell_$sacrificial/current/graph")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(gdir).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    java.nio.file.Files.write(gdir, "not parquet".getBytes)
    val before = untouched.map(c => c -> fileState(s"$store/cell_$c")).toMap
    graft.streaming.IndexCdc.mergeShardedCdcBatch(batch, 0L, store, cents,
      "vec_id", "embedding", k = 5, entriesPerCell = 2, beam = 10,
      searchRounds = 2, repairThreshold = 1L)
    for (c <- untouched)
      assert(fileState(s"$store/cell_$c") == before(c),
        s"untouched cell $c was rewritten")
    // the touched cell committed the batch; the others still carry the seed
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.streaming.IndexCdc.appliedBatch(fs,
      new org.apache.hadoop.fs.Path(s"$store/cell_$cA/current")) == 0L)
    assert(graft.streaming.IndexCdc.appliedBatch(fs,
      new org.apache.hadoop.fs.Path(s"$store/cell_${untouched.last}/current")) == -1L)
    // and the touched cell's store reflects the batch: victim gone, new id in
    val g = graphRows(spark, store, cA)
    assert(!g.exists(e => e._1 == victim || e._2 == victim))
    assert(g.exists(e => e._1 == 100001L || e._2 == 100001L))
  }

  test("sharded CDC: replay after a partial (crashed) commit reproduces " +
      "the exact post-batch store") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = cdcFixture("replay")
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
    // a batch touching TWO cells: one delete in each of the first two
    // distinct cells
    val ids = assigned.select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cA = ids.head._2
    val cB = ids.find(_._2 != cA).get._2
    val delA = ids.filter(_._2 == cA).map(_._1).sorted.head
    val delB = ids.filter(_._2 == cB).map(_._1).sorted.head
    val vecOf = (id: Long) => emb.filter(col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    val batch = Seq(("delete", delA, vecOf(delA)), ("delete", delB, vecOf(delB)))
      .toDF("op", "vec_id", "embedding")
    def copyDir(from: String, to: String): Unit = {
      import scala.jdk.CollectionConverters._
      val src = java.nio.file.Paths.get(from)
      java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
        val dst = java.nio.file.Paths.get(to).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    }
    val preB = java.nio.file.Files
      .createTempDirectory("graft_r14_preB").toString + "/cell"
    copyDir(s"$store/cell_$cB", preB)
    def merge(): Unit = graft.streaming.IndexCdc.mergeShardedCdcBatch(
      batch, 0L, store, cents, "vec_id", "embedding", k = 5,
      entriesPerCell = 2, beam = 10, searchRounds = 2, repairThreshold = 1L)
    merge()
    val wantA = graphRows(spark, store, cA)
    val wantB = graphRows(spark, store, cB)
    // simulate the crash: cell A committed, cell B rolled back to its
    // pre-batch store (marker -1)
    import scala.jdk.CollectionConverters._
    val bDir = java.nio.file.Paths.get(s"$store/cell_$cB")
    java.nio.file.Files.walk(bDir).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    copyDir(preB, s"$store/cell_$cB")
    val aState = fileState(s"$store/cell_$cA")
    merge() // the checkpointed replay
    // committed cell untouched by the replay; rolled-back cell re-derived
    assert(fileState(s"$store/cell_$cA") == aState,
      "replay re-applied the batch to an already-committed cell")
    assert(graphRows(spark, store, cA) == wantA)
    assert(graphRows(spark, store, cB) == wantB,
      "replay did not reproduce the exact post-batch store")
  }

  test("sharded CDC: the rebuild-fraction guard is CELL-local and equals " +
      "a fresh build over survivors ∪ batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (store, assigned, cents) = cdcFixture("rebuild")
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 200)
    val anchor = 3L
    val cA = cellOf(assigned, anchor)
    val av = emb.filter(col("vec_id") === anchor).select("embedding").head()
      .getSeq[Float](0)
    val members = assigned.filter(col("cell") === cA).count()
    // upserts > 0.25 × remaining for THIS cell (all carry the anchor's
    // embedding, so they all route to cA)
    val nUps = (members / 2 + 2).toInt
    val ups = (0 until nUps).map(i => ("upsert", 200000L + i, av))
    val batch = ups.toDF("op", "vec_id", "embedding")
    graft.streaming.IndexCdc.mergeShardedCdcBatch(batch, 0L, store, cents,
      "vec_id", "embedding", k = 5, entriesPerCell = 2, beam = 10,
      searchRounds = 2, repairThreshold = 1L, rebuildFraction = 0.25,
      rebuildRounds = 2, rebuildBuckets = 8)
    val got = graphRows(spark, store, cA)
    val fresh = graft.operators.Similarity.nnDescent(
      assigned.filter(col("cell") === cA).select("vec_id", "embedding")
        .unionByName(batch.select(col("vec_id"), col("embedding"))),
      "vec_id", "embedding", 5, 2, 8)
      .select(col("q_id"), col("n_id"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == fresh,
      "swamped cell did not rebuild to the fresh-build graph")
  }

  // ------------------------------------------------------------------
  // Rational L/M polyphase resample
  // ------------------------------------------------------------------

  test("rational resample: 44.1k→16k pins rate, frame count, and gcd reduction") {
    import graft.multimodal.Codecs
    for (ns <- Seq(1, 7, 100, 441)) {
      val src = Codecs.encodeWav(44100, 1, ns, seed = 5L)
      val out = Codecs.resampleWavRational(src, 160, 441).get
      val (info, samples) = Codecs.decodeWavSamples(out).get
      assert(info.sampleRate == 16000)
      assert(samples.length == (ns * 160 + 440) / 441,
        s"ns=$ns: got ${samples.length} frames")
      // unreduced L/M is the same resampler (gcd reduction)
      assert(Codecs.resampleWavRational(src, 320, 882).get.toSeq == out.toSeq)
    }
  }

  test("rational resample: per-phase unity DC gain (constant in → constant out)") {
    import graft.multimodal.Codecs
    // a constant signal must survive EVERY phase of the polyphase
    // filter exactly — the per-output tap-sum normalization contract —
    // including at the edges (no fade-in/out) and when upsampling
    val const = Array.fill(200)(1234)
    val src = Codecs.encodeWavSamples(44100, 1, const)
    for ((l, m) <- Seq((160, 441), (441, 160), (3, 2), (2, 3), (7, 5))) {
      val (_, samples) = Codecs.decodeWavSamples(
        Codecs.resampleWavRational(src, l, m).get).get
      assert(samples.forall(_ == 1234),
        s"L/M=$l/$m: constant not preserved: ${samples.distinct.take(5).toSeq}")
    }
  }

  test("rational resample: L == M is the identity on samples") {
    import graft.multimodal.Codecs
    val src = Codecs.encodeWav(22050, 2, 50, seed = 9L)
    val in = Codecs.decodeWavSamples(src).get._2.toSeq
    val out = Codecs.decodeWavSamples(
      Codecs.resampleWavRational(src, 7, 7).get).get._2.toSeq
    assert(out == in)
  }

  test("rational resample: corrupt input skips (None), never throws") {
    import graft.multimodal.Codecs
    assert(Codecs.resampleWavRational("junk".getBytes, 160, 441).isEmpty)
    val truncated = Codecs.encodeWav(44100, 1, 40, seed = 1L).take(30)
    assert(Codecs.resampleWavRational(truncated, 160, 441).isEmpty)
  }

  // ------------------------------------------------------------------
  // ISO-BMFF / MP4 container walk
  // ------------------------------------------------------------------

  test("mp4 walk: brand, track order, handlers, sample counts round-trip") {
    import graft.multimodal.Codecs
    val b = Codecs.encodeMp4("mp42",
      Seq(("vide", 30), ("soun", 44100), ("vide", 0)))
    val info = Codecs.walkMp4(b).getOrElse(fail("walk failed"))
    assert(info.brand == "mp42")
    assert(info.tracks.map(t => (t.handler, t.nSamples)) ==
      Vector(("vide", 30L), ("soun", 44100L), ("vide", 0L)))
  }

  test("mp4 walk: truncated and corrupt boxes return None, never loop") {
    import graft.multimodal.Codecs
    val good = Codecs.encodeMp4("isom", Seq(("vide", 7)))
    for (cut <- Seq(4, 11, 20, good.length / 2, good.length - 1))
      assert(Codecs.walkMp4(good.take(cut)).isEmpty, s"cut=$cut decoded")
    // a box claiming a size past EOF must fail the bounds check
    val oversize = good.clone()
    oversize(24) = 0x7f // moov size high byte → far past EOF
    assert(Codecs.walkMp4(oversize).isEmpty)
    // size < 8 would spin the cursor — must return None instead
    val tiny = good.clone()
    tiny(24) = 0; tiny(25) = 0; tiny(26) = 0; tiny(27) = 3
    assert(Codecs.walkMp4(tiny).isEmpty)
    assert(Codecs.walkMp4("junk".getBytes).isEmpty)
  }

  test("sniff: video MP4 brands are distinct from HEIC's ftyp brands") {
    import graft.multimodal.Codecs
    for (brand <- Seq("isom", "mp42", "avc1"))
      assert(Codecs.sniff(Codecs.encodeMp4(brand, Seq(("vide", 1))))
        .contains("mp4"), brand)
    // the HEIC shell from the census corpus still sniffs as heic
    val heic = new Array[Byte](24)
    heic(3) = 24
    "ftypheic".getBytes("US-ASCII").copyToArray(heic, 4)
    assert(Codecs.sniff(heic).contains("heic"))
  }

  // ------------------------------------------------------------------
  // WebP lossless (VP8L)
  // ------------------------------------------------------------------

  private def vp8lOriginal(id: Long, cls: Int, w: Int, h: Int)(x: Int, y: Int): Int = {
    import graft.multimodal.Vp8l
    val K = (id % 6 + 2).toInt
    cls match {
      case 1 => Vp8l.rampPixel(id, (y - y % 2).toLong * w + x)
      case 2 => Vp8l.rampPixel(id, (y.toLong * w + x) % K)
      case _ => Vp8l.rampPixel(id, y.toLong * w + x)
    }
  }

  test("vp8l: all four transform classes round-trip pixel-exactly") {
    import graft.multimodal.Vp8l
    for {
      (w, h) <- Seq((1, 1), (3, 2), (8, 8), (13, 7), (21, 13), (16, 4), (5, 11))
      cls <- 0 to 3
    } {
      val id = cls.toLong + 4 * (w + h) // id % 4 == cls
      assert(id % 4 == cls)
      val bytes = Vp8l.encodeAsset(id, w, h)
      val (dw, dh, pix, tags) = Vp8l.decode(bytes)
        .getOrElse(fail(s"cls=$cls ${w}x$h id=$id did not decode"))
      assert(dw == w && dh == h)
      val want = Seq("color", "subtract_green", "palette", "predictor")(cls)
      assert(tags == Seq(want), s"cls=$cls tags=$tags")
      for (y <- 0 until h; x <- 0 until w) {
        val exp = vp8lOriginal(id, cls, w, h)(x, y)
        assert(pix(y * w + x) == exp,
          s"cls=$cls ${w}x$h id=$id pixel ($x,$y): " +
            f"got 0x${pix(y * w + x)}%08x want 0x$exp%08x")
      }
    }
  }

  test("vp8l: predictor modes all exercised across the corpus") {
    // the mode grid (id + bx + by) % 14 must hit every mode somewhere
    val modes = (0L until 56L).flatMap { id =>
      val w = 21; val h = 13
      for (bx <- 0 until 6; by <- 0 until 4) yield ((id + bx + by) % 14).toInt
    }.toSet
    assert(modes == (0 until 14).toSet)
  }

  test("vp8l: corrupt, truncated, and out-of-scope streams return None") {
    import graft.multimodal.Vp8l
    val good = Vp8l.encodeAsset(3L, 13, 7)
    for (cut <- Seq(4, 12, 19, 25, good.length / 2, good.length - 2))
      assert(Vp8l.decode(good.take(cut)).isEmpty, s"cut=$cut decoded")
    assert(Vp8l.decode("garbage".getBytes).isEmpty)
    // a non-VP8L webp (the census VP8 shell) must skip, not crash
    val lossyShell = {
      val b = new Array[Byte](28)
      "RIFF".getBytes.copyToArray(b, 0); b(4) = 20
      "WEBPVP8 ".getBytes.copyToArray(b, 8); b(16) = 8
      b
    }
    assert(Vp8l.decode(lossyShell).isEmpty)
  }

  // ------------------------------------------------------------------
  // Layered (HNSW-style) entry points
  // ------------------------------------------------------------------

  test("levelColumn matches the JVM hash's trailing base-4 zeros, capped") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = (0L until 200L).toDF("id")
    val got = ids.select(col("id"),
        graft.operators.LayeredAnn.levelColumn(col("id"), 3).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (id <- 0L until 200L) {
      val h = graft.functions.Functions.md5Hash64Jvm(s"lvl:$id")
      val want =
        if (h % 4 != 0) 0 else if (h % 16 != 0) 1 else if (h % 64 != 0) 2 else 3
      assert(got(id) == want, s"id=$id h=$h")
    }
    // geometric-ish: level 0 dominates, upper layers shrink
    val dist = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(dist(0) > dist.getOrElse(1, 0))
    assert(dist.getOrElse(1, 0) > dist.getOrElse(2, 0))
  }

  test("layered serve: recall gated against the flat-entry form") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings").localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_layered").toString
    val graph = graft.operators.Similarity
      .nnDescent(emb, "vec_id", "embedding", 10, 3, 16).localCheckpoint()
    graft.operators.LayeredAnn.buildOrLoad(emb, "vec_id", "embedding",
      cap = 3, layerK = 5, layerRounds = 2, initBuckets = 16, indexDir = dir)
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
    val layered = graft.operators.LayeredAnn.searchTopK(spark, dir, graph,
      emb, queries, "vec_id", "embedding", cap = 3, m = 2, descBeam = 6,
      descRounds = 2, beam = 10, rounds = 3, k = 5)
    val flat = graft.operators.Similarity.graphSearchTopK(graph, emb,
      queries, "vec_id", "embedding", entryIds = 0L until 4L,
      beam = 10, rounds = 3, k = 5)
    val exact = graft.operators.Similarity
      .l2TopK(emb, queries, "vec_id", "embedding", k = 5)
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Similarity.recallAtK(approx, exact, 5)
        .agg(sum(col("n_hit"))).head().getLong(0)
    val hl = hits(layered)
    val hf = hits(flat)
    // the layered walk must be competitive with the fixed entry list —
    // that is its entire reason to exist
    assert(hl * 10 >= hf * 8, s"layered hits $hl vs flat $hf")
  }

  test("seeded insert/repair equal the fixed-entry forms when seeded " +
      "with the same entries") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 150).localCheckpoint()
    val base = emb.filter(col("vec_id") % 5 =!= 1)
    val batch = emb.filter(col("vec_id") % 5 === 1)
    val g = graft.operators.Similarity
      .nnDescent(base, "vec_id", "embedding", 5, 2, 8).localCheckpoint()
    val entries = Seq(0L, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "d2", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
    val fixedIns = graft.operators.AnnIndex.insertBatch(g, base, batch,
      "vec_id", "embedding", k = 5, entries, beam = 10, searchRounds = 2)
    val seeds = batch.select(col("vec_id").as("q_id"))
      .withColumn("n_id", explode(array(entries.map(lit): _*)))
    val seededIns = graft.operators.AnnIndex.insertBatchSeeded(g, base, batch,
      "vec_id", "embedding", k = 5, seeds, beam = 10, searchRounds = 2)
    assert(rows(seededIns) == rows(fixedIns))
    val remaining = base.filter(col("vec_id") % 7 =!= 3)
    val kept = graft.operators.AnnIndex.survivingEdges(g, remaining, "vec_id")
      .localCheckpoint()
    val fixedRep = graft.operators.AnnIndex.repairGraph(kept, remaining,
      "vec_id", "embedding", k = 5, entries, beam = 10, searchRounds = 2)
    val seededRep = graft.operators.AnnIndex.repairGraphSeeded(kept, remaining,
      "vec_id", "embedding", k = 5,
      qs => qs.select(col("vec_id").as("q_id"))
        .withColumn("n_id", explode(array(entries.map(lit): _*))),
      beam = 10, searchRounds = 2)
    assert(rows(seededRep) == rows(fixedRep))
  }

  test("sharded serving of an empty query batch returns typed-empty") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_shard_empty").toString + "/idx"
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8, indexDir = dir)
    val routed = graft.operators.Similarity.ivfProbeCells(
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", cents, nprobe = 2)
    val out = graft.operators.AnnIndex.shardedSearchTopK(index, assigned,
      routed, "vec_id", "embedding", entriesPerCell = 2,
      beam = 8, rounds = 2, k = 3)
    assert(out.columns.toSeq == Seq("q_id", "n_id", "d2", "rank"))
    assert(out.count() == 0)
  }
}
