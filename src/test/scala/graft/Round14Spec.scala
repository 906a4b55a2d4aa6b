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

  // ------------------------------------------------------------------
  // Shard growth report + rebalance (the q327/q329 lifecycle close)
  // ------------------------------------------------------------------

  test("shardGrowthReport: share boundaries, edge/degraded counts, " +
      "and a drained cell still surfaces") {
    val spark = TestSpark.spark
    import spark.implicits._
    // cells: 0 holds 6/10 (60% -> split), 1 holds 3/10 (30% -> healthy),
    // 2 holds 1/10 (10% -> merge)
    val assigned = ((0L until 6L).map(i => (i, 0L)) ++
      (10L until 13L).map(i => (i, 1L)) ++ Seq((20L, 2L)))
      .toDF("vec_id", "cell")
    // k = 2: node 101's 1-edge list is degraded, 100's 3-edge one is not;
    // cell 2 has NO edges at all (one-member cell) and must still report
    val index = Seq(
      (0L, 100L, 1L, 1L, 1), (0L, 100L, 2L, 2L, 2), (0L, 100L, 3L, 3L, 3),
      (0L, 101L, 1L, 1L, 1),
      (1L, 200L, 5L, 1L, 1), (1L, 200L, 6L, 2L, 2))
      .toDF("cell", "q_id", "n_id", "d2", "rank")
    val rep = graft.operators.AnnIndex.shardGrowthReport(
        index, assigned, "vec_id", k = 2,
        splitPpm = 400000L, mergePpm = 200000L)
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rep.toSeq == Seq(
      (0L, 6L, 600000L, 4L, 1L, "split"),
      (1L, 3L, 300000L, 2L, 0L, "healthy"),
      (2L, 1L, 100000L, 0L, 0L, "merge")))
  }

  test("codecCoverageAudit: decoded/structure/sniffed/unrecognized all " +
      "from genuine decode attempts; corrupt payloads downgrade, never fail") {
    val spark = TestSpark.spark
    import spark.implicits._
    val bmp = graft.multimodal.Codecs.encodeBmp(3, 2, seed = 5L)
    val heicShell = {
      val b = new Array[Byte](24)
      b(3) = 24; "ftypheic".getBytes("US-ASCII").copyToArray(b, 4)
      "    mif1".getBytes("US-ASCII").copyToArray(b, 12)
      b
    }
    val assets = Seq(
      (0L, bmp),                                              // decodes
      (1L, bmp.take(10)),                                     // magic survives, decode fails
      (2L, graft.multimodal.Codecs.encodeMp4("isom", Seq(("vide", 4)))),
      (3L, heicShell),                                        // ftyp, no moov
      (4L, Array[Byte](1, 2, 3, 4, 5)))                       // no magic
      .toDF("asset_id", "bytes")
    val out = graft.multimodal.Multimodal.codecCoverageAudit(assets)
      .orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0L, "bmp", "decoded"),
      (1L, "bmp", "sniffed"),
      (2L, "mp4", "structure"),
      (3L, "heic", "sniffed"),
      (4L, "unknown", "unrecognized")))
  }

  test("rebalanceShardedStore: split + merge verdicts applied, rebuilt " +
      "graphs equal fresh builds, untouched cells never rewritten") {
    val spark = TestSpark.spark
    import spark.implicits._
    def v(x: Double, y: Double): Seq[Float] = Seq(x.toFloat, y.toFloat)
    // cell 0: 8/20 = 40% -> split (A-group near [1,0], B-group near [0,-1]);
    // cell 1: 5/20 = 25% -> kept, then receives cell 2's merge;
    // cell 2: 1/20 = 5%  -> merged away (nearest pool centroid: 1);
    // cell 3: 6/20 = 30% -> kept, UNTOUCHED (its store must not move)
    val members = Seq(
      (0L, v(1.0, 0.0), 0L), (1L, v(0.995, 0.1), 0L), (2L, v(0.99, 0.14), 0L),
      (4L, v(0.98, 0.2), 0L),
      (3L, v(-0.1, -0.995), 0L), (5L, v(0.05, -0.999), 0L),
      (6L, v(0.0, -1.0), 0L), (7L, v(0.1, -0.995), 0L),
      (10L, v(0.0, 1.0), 1L), (11L, v(0.05, 0.999), 1L), (12L, v(-0.05, 0.999), 1L),
      (13L, v(0.1, 0.995), 1L), (14L, v(-0.1, 0.995), 1L),
      (20L, v(0.6, 0.8), 2L),
      (30L, v(-1.0, 0.0), 3L), (31L, v(-0.995, 0.1), 3L), (32L, v(-0.99, -0.14), 3L),
      (33L, v(-0.98, 0.2), 3L), (34L, v(-0.995, -0.1), 3L), (35L, v(-0.98, -0.2), 3L))
      .toDF("vec_id", "embedding", "cell")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("cell"))
      .localCheckpoint()
    val cents = Seq(
      (0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)), (2L, v(0.6, 0.8)), (3L, v(-1.0, 0.0)))
      .toDF("cent_id", "cent_vec")
      .select(col("cent_id"), col("cent_vec").cast("array<float>").as("cent_vec"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_r14_rebal").toString + "/store"
    graft.streaming.IndexCdc.initShardedStore(spark, store, members,
      "vec_id", "embedding", nCells = 4, graphK = 3, graphRounds = 2,
      initBuckets = 4)
    def dirState(c: Long): Seq[(String, Long)] = {
      val d = new java.io.File(s"$store/cell_$c/current")
      d.listFiles().toSeq.map(f => (f.getName, f.lastModified())).sorted
    }
    val untouchedBefore = dirState(3L)
    val (report, newCents) = graft.streaming.IndexCdc.rebalanceShardedStore(
      spark, store, cents, "vec_id", "embedding", k = 3, graphRounds = 2,
      initBuckets = 4, splitPpm = 350000L, mergePpm = 100000L, rebalanceId = 7L)
    val rep = report.orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rep.toSeq == Seq(
      (0L, 4L, "split_lo"), (1L, 6L, "merge_target"), (2L, 0L, "merged_away"),
      (3L, 6L, "kept"), (4L, 4L, "split_hi")))
    // quantizer: merged centroid dropped; split lo = A (id 0's vector),
    // split hi = B (the member least cosine-similar to A: id 3)
    val nc = newCents.orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(nc.map(_._1).toSeq == Seq(0L, 1L, 3L, 4L))
    assert(nc(0)._2 == v(1.0, 0.0) && nc(3)._2 == v(-0.1, -0.995))
    // membership landed where the report says
    val loIds = spark.read.parquet(s"$store/cell_0/current/vecs")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val hiIds = spark.read.parquet(s"$store/cell_4/current/vecs")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val tgtIds = spark.read.parquet(s"$store/cell_1/current/vecs")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(loIds == Seq(0L, 1L, 2L, 4L))
    assert(hiIds == Seq(3L, 5L, 6L, 7L))
    assert(tgtIds == Seq(10L, 11L, 12L, 13L, 14L, 20L))
    assert(spark.read.parquet(s"$store/cell_2/current/vecs").count() == 0)
    // rebuilt graphs equal fresh cell-local builds over the new membership
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "d2", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .sorted.toSeq
    val loFresh = graft.operators.Similarity.nnDescent(
      members.filter(col("vec_id").isin(0L, 1L, 2L, 4L))
        .select("vec_id", "embedding"),
      "vec_id", "embedding", 3, 2, 4)
    assert(rows(spark.read.parquet(s"$store/cell_0/current/graph")) == rows(loFresh))
    val tgtFresh = graft.operators.Similarity.nnDescent(
      members.filter(col("vec_id").isin(10L, 11L, 12L, 13L, 14L, 20L))
        .select("vec_id", "embedding"),
      "vec_id", "embedding", 3, 2, 4)
    assert(rows(spark.read.parquet(s"$store/cell_1/current/graph")) == rows(tgtFresh))
    // the untouched cell's store was neither rewritten nor swapped
    assert(dirState(3L) == untouchedBefore)
    // touched cells committed through the swap protocol: no staged
    // next_ dirs linger, and superseded prevs are pruned post-commit
    for (c <- Seq(0L, 1L, 2L, 4L)) {
      assert(new java.io.File(s"$store/cell_$c/current").exists())
      assert(!new java.io.File(s"$store/cell_$c/next_rebalance_7").exists())
      assert(!new java.io.File(s"$store/cell_$c/prev_7").exists())
    }
  }

  test("rebalance merge works when the target's id is HIGHER than the " +
      "source's (two-phase commit: the union must read pre-swap vecs)") {
    val spark = TestSpark.spark
    import spark.implicits._
    def v(x: Double, y: Double): Seq[Float] = Seq(x.toFloat, y.toFloat)
    // cell 0: 1/20 = 5% -> merges; its nearest sibling is cell 2 — a
    // LATER cell in the sweep, so the target's union is staged after
    // the source's own store would have been emptied under an eager
    // per-cell swap
    val members = (Seq((0L, v(0.6, 0.8), 0L)) ++
      (10L until 20L).map(i => (i, v(1.0, 0.001 * i), 1L)) ++
      (30L until 39L).map(i => (i, v(0.001 * i, 1.0), 2L)))
      .toDF("vec_id", "embedding", "cell")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("cell"))
      .localCheckpoint()
    val cents = Seq((0L, v(0.6, 0.8)), (1L, v(1.0, 0.0)), (2L, v(0.0, 1.0)))
      .toDF("cent_id", "cent_vec")
      .select(col("cent_id"), col("cent_vec").cast("array<float>").as("cent_vec"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_r14_rebal_hi").toString + "/store"
    graft.streaming.IndexCdc.initShardedStore(spark, store, members,
      "vec_id", "embedding", nCells = 3, graphK = 3, graphRounds = 2,
      initBuckets = 4)
    val (report, _) = graft.streaming.IndexCdc.rebalanceShardedStore(
      spark, store, cents, "vec_id", "embedding", k = 3, graphRounds = 2,
      initBuckets = 4, splitPpm = 600000L, mergePpm = 100000L, rebalanceId = 2L)
    val rep = report.orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rep.toSeq == Seq(
      (0L, 0L, "merged_away"), (1L, 10L, "kept"), (2L, 10L, "merge_target")))
    val tgtIds = spark.read.parquet(s"$store/cell_2/current/vecs")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(tgtIds == (0L +: (30L until 39L)).sorted)
  }

  test("maintenanceWindow: a no-op window (every share in band) " +
      "touches no store and reports every cell kept") {
    val spark = TestSpark.spark
    import spark.implicits._
    def v(x: Double, y: Double): Seq[Float] = Seq(x.toFloat, y.toFloat)
    val members = ((0L until 4L).map(i => (i, v(1.0, 0.001 * i), 0L)) ++
      (10L until 13L).map(i => (i, v(0.001 * i, 1.0), 1L)) ++
      (20L until 23L).map(i => (i, v(-1.0, 0.001 * i), 2L)))
      .toDF("vec_id", "embedding", "cell")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("cell"))
      .localCheckpoint()
    val cents = Seq((0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)), (2L, v(-1.0, 0.0)))
      .toDF("cent_id", "cent_vec")
      .select(col("cent_id"), col("cent_vec").cast("array<float>").as("cent_vec"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_r14_window").toString + "/store"
    graft.streaming.IndexCdc.initShardedStore(spark, store, members,
      "vec_id", "embedding", nCells = 3, graphK = 3, graphRounds = 2,
      initBuckets = 4)
    def dirState(c: Long): Seq[(String, Long)] = {
      val d = new java.io.File(s"$store/cell_$c/current")
      d.listFiles().toSeq.map(f => (f.getName, f.lastModified())).sorted
    }
    val before = (0L until 3L).map(dirState)
    // shares are 40/30/30% — inside a [10%, 60%] band, so nothing fires
    val (report, outCents) = graft.streaming.IndexCdc.maintenanceWindow(
      spark, store, cents, "vec_id", "embedding", k = 3, graphRounds = 2,
      initBuckets = 4, splitPpm = 600000L, mergePpm = 100000L,
      rebalanceId = 5L)
    val rep = report.orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rep.toSeq == Seq((0L, 4L, "kept"), (1L, 3L, "kept"), (2L, 3L, "kept")))
    assert(outCents.count() == 3)
    assert((0L until 3L).map(dirState) == before)
    // and a window whose band the big cell leaves DOES fire
    val (report2, _) = graft.streaming.IndexCdc.maintenanceWindow(
      spark, store, cents, "vec_id", "embedding", k = 3, graphRounds = 2,
      initBuckets = 4, splitPpm = 350000L, mergePpm = 100000L,
      rebalanceId = 6L)
    val acts = report2.orderBy("cell").collect().map(_.getString(2)).toSeq
    assert(acts.count(_ == "split_lo") == 1 && acts.count(_ == "split_hi") == 1)
  }

  // ------------------------------------------------------------------
  // WARC-over-gzip ingestion (sources/Warc.scala)
  // ------------------------------------------------------------------

  test("gzip members: multi-member roundtrip, CRC/ISIZE validation, " +
      "optional header fields skipped") {
    import graft.sources.Warc
    val a = "hello corpus".getBytes("US-ASCII")
    val b = (0 until 3000).map(i => ('a' + i % 26).toChar).mkString.getBytes("US-ASCII")
    val stream = Warc.gzipMember(a) ++ Warc.gzipMember(b)
    val got = Warc.gzipMembers(stream).get
    assert(got.length == 2)
    assert(got(0).toSeq == a.toSeq && got(1).toSeq == b.toSeq)
    // a member with FNAME set: header flag + zero-terminated name spliced in
    val m = Warc.gzipMember(a)
    val withName = m.take(3) ++ Array[Byte](0x08) ++ m.slice(4, 10) ++
      "x.txt".getBytes("US-ASCII") ++ Array[Byte](0) ++ m.drop(10)
    assert(Warc.gzipMembers(withName).get.head.toSeq == a.toSeq)
    // corrupt CRC fails the whole object (nothing after it is trusted)
    val bad = stream.clone()
    bad(bad.length - 6) = (bad(bad.length - 6) ^ 0x01).toByte
    assert(Warc.gzipMembers(bad).isEmpty)
    // truncated trailer fails
    assert(Warc.gzipMembers(stream.dropRight(3)).isEmpty)
    assert(Warc.gzipMembers(Array.emptyByteArray).isEmpty)
  }

  test("WARC records: roundtrip, header names case-insensitive, " +
      "length/terminator violations rejected") {
    import graft.sources.Warc
    val payload = "00 17 34".getBytes("US-ASCII")
    val rec = Warc.formatRecord("response", "http://example.com/1/2", payload)
    val parsed = Warc.parseRecord(rec).get
    assert(parsed.recType == "response")
    assert(parsed.targetUri == "http://example.com/1/2")
    assert(parsed.contentLength == payload.length)
    assert(parsed.payload.toSeq == payload.toSeq)
    // case-insensitive header names
    val mixed = new String(rec, "US-ASCII")
      .replace("WARC-Type:", "warc-type:").getBytes("US-ASCII")
    assert(Warc.parseRecord(mixed).get.recType == "response")
    // a record whose Content-Length disagrees with the body is corrupt
    val lied = new String(rec, "US-ASCII")
      .replace(s"Content-Length: ${payload.length}", "Content-Length: 2")
      .getBytes("US-ASCII")
    assert(Warc.parseRecord(lied).isEmpty)
    // missing closing CRLF CRLF
    assert(Warc.parseRecord(rec.dropRight(2)).isEmpty)
    assert(Warc.parseRecord("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")).isEmpty)
  }

  // ------------------------------------------------------------------
  // GIF (multimodal/Gif.scala) and G.711 (Codecs)
  // ------------------------------------------------------------------

  test("GIF: LZW roundtrip across code-width growth, interlace " +
      "reorders storage but never pixels, corrupt streams drop") {
    import graft.multimodal.Gif
    for (id <- 0L until 40L) {
      val w = (id % 19 + 1).toInt
      val h = (id % 11 + 1).toInt
      val bits = (id % 3 + 2).toInt
      val img = Gif.decodeGif(
        Gif.encodeGif(w, h, seed = id, paletteBits = bits,
          interlaced = id % 2 == 1)).get
      assert(img.width == w && img.height == h && img.paletteBits == bits)
      assert(img.interlaced == (id % 2 == 1))
      val k = 1 << bits
      for (q <- 0 until w * h) {
        val ix = Gif.pixelIndex(id, q, k)
        val (r, g, b) = Gif.paletteEntry(ix)
        assert(img.pixels(q) == ((r << 16) | (g << 8) | b),
          s"id=$id q=$q")
      }
      // interlacing must be storage-only: same pixels either way
      val seq = Gif.decodeGif(Gif.encodeGif(w, h, seed = id,
        paletteBits = bits, interlaced = false)).get
      assert(seq.pixels.toSeq == img.pixels.toSeq)
    }
    // a big enough frame to force several code-width growths
    val big = Gif.decodeGif(Gif.encodeGif(60, 40, seed = 9L,
      paletteBits = 4, interlaced = false)).get
    assert(big.pixels.length == 2400)
    // corruption: truncated payload and a clipped sub-block both drop
    val bytes = Gif.encodeGif(10, 8, seed = 3L, paletteBits = 3,
      interlaced = false)
    assert(Gif.decodeGif(bytes.dropRight(6)).isEmpty)
    assert(Gif.decodeGif(bytes.take(20)).isEmpty)
    assert(graft.multimodal.Codecs.sniff(bytes).contains("gif"))
  }

  test("ustar: roundtrip with checksum validation; corrupt headers, " +
      "bogus sizes, and missing terminators all stop the walk") {
    import graft.sources.Tar
    val members = Seq(
      ("docs/a.txt", "00 17 34".getBytes("US-ASCII")),
      ("docs/b.txt", Array.fill[Byte](600)('x')), // spans two data blocks
      ("docs/empty.txt", Array.emptyByteArray))
    val tar = Tar.encodeTar(members)
    assert(tar.length % 512 == 0)
    val got = Tar.parseTar(tar).get
    assert(got.map(_.name) == members.map(_._1))
    assert(got.map(_.size) == members.map(_._2.length.toLong))
    assert(got.forall(_.typeflag == '0'))
    assert(got(1).payload.toSeq == members(1)._2.toSeq)
    // flip one header byte: the checksum must catch it
    val bad = tar.clone()
    bad(1) = (bad(1) ^ 0x01).toByte
    assert(Tar.parseTar(bad).isEmpty)
    // non-octal size field
    val badSize = tar.clone()
    badSize(124) = 'z'
    assert(Tar.parseTar(badSize).isEmpty)
    // truncate before the terminator blocks
    assert(Tar.parseTar(tar.dropRight(1024)).isEmpty)
    assert(Tar.parseTar(tar.dropRight(1)).isEmpty)
  }

  test("IMA ADPCM: state chain matches the reference step rules, " +
      "fact chunk is authoritative, corrupt payloads drop") {
    import graft.multimodal.Codecs
    // single known chain from (pred 0, idx 0): nibble 7 (bits 0-2) ->
    // diff = 7>>3 + 7>>2 + 7>>1 + 7 = 0+1+3+7 = 11, pred 11, idx 0+8=8
    assert(Codecs.imaAdpcmStep(0, 0, 7) == ((11, 8)))
    // nibble 15 from there: step(8)=16, diff = 2+4+8+16 = 30,
    // sign bit -> 11-30 = -19, idx 8+8 = 16
    assert(Codecs.imaAdpcmStep(11, 8, 15) == ((-19, 16)))
    // clamps: predictor at the rails, index at 0 and 88
    assert(Codecs.imaAdpcmStep(32767, 88, 7)._1 == 32767)
    assert(Codecs.imaAdpcmStep(-32768, 88, 15)._1 == -32768)
    assert(Codecs.imaAdpcmStep(0, 0, 0)._2 == 0)   // index floor
    assert(Codecs.imaAdpcmStep(0, 88, 7)._2 == 88) // index ceiling
    val wav = Codecs.encodeWavAdpcm(8000, nNibbles = 9, seed = 3L)
    val (rate, xs) = Codecs.decodeWavAdpcm(wav).get
    assert(rate == 8000 && xs.length == 10 && xs(0) == 0)
    // replay the chain directly
    var pred = 0; var sidx = 0
    for (k <- 0 until 9) {
      val st = Codecs.imaAdpcmStep(pred, sidx, ((3 + k) % 16))
      pred = st._1; sidx = st._2
      assert(xs(k + 1) == pred, s"k=$k")
    }
    // PCM and G.711 payloads are not ADPCM
    assert(Codecs.decodeWavAdpcm(Codecs.encodeWav(8000, 1, 5, 1L)).isEmpty)
    assert(Codecs.decodeWavAdpcm(
      Codecs.encodeWavG711(8000, 1, 5, 1L, format = 7)).isEmpty)
    // truncated data drops
    assert(Codecs.decodeWavAdpcm(wav.dropRight(3)).isEmpty)
  }

  test("ZIP: central-directory walk, stored+DEFLATE members, CRC and " +
      "EOCD discipline; garbage tails tolerated, corrupt data rejected") {
    import graft.sources.Zip
    val members = Seq(
      ("a.txt", "00 17 34".getBytes("US-ASCII"), false),
      ("b.txt", Array.fill[Byte](3000)('y'), true),
      ("c.txt", Array.emptyByteArray, false))
    val zip = Zip.encodeZip(members)
    val got = Zip.parseZip(zip).get
    assert(got.map(_.name) == members.map(_._1))
    assert(got.map(_.method) == Seq(0, 8, 0))
    assert(got(1).payload.toSeq == members(1)._2.toSeq)
    assert(got(1).compressedSize < 3000) // deflate actually compressed
    // an appended garbage tail is IGNORED by the central-directory walk
    // (self-extractor stubs and append-happy writers leave bytes after
    // the EOCD; the backward scan finds the last self-consistent record)
    assert(Zip.parseZip(zip ++ Array[Byte](1, 2, 3)).get
      .map(_.name) == members.map(_._1))
    // flip a payload byte: the member CRC must catch it (a.txt's stored
    // data starts at 30-byte local header + 5-byte name = offset 35)
    val bad = zip.clone()
    bad(36) = (bad(36) ^ 0x01).toByte
    assert(Zip.parseZip(bad).isEmpty)
    assert(Zip.parseZip(zip.dropRight(5)).isEmpty)
    assert(graft.multimodal.Codecs.sniff(zip).contains("zip"))
  }

  test("MP3 walk: ID3v2 skip, per-frame padding stride, CBR gate") {
    import graft.multimodal.Mpeg
    val mp3 = Mpeg.encodeMp3(nFrames = 7, bitrateIdx = 9, rateIdx = 0,
      id3Size = 57, padBit = f => f % 2)
    val info = Mpeg.walkMp3(mp3).get
    assert(info.sampleRate == 44100 && info.bitrateKbps == 128)
    assert(info.nFrames == 7)
    assert(info.durationMs == 7L * 1152 * 1000 / 44100)
    // no tag variant
    val bare = Mpeg.encodeMp3(3, 11, 1, 0, _ => 0)
    val bi = Mpeg.walkMp3(bare).get
    assert(bi.sampleRate == 48000 && bi.bitrateKbps == 192 && bi.nFrames == 3)
    // ignoring the padding bit would desync: flipping one padding bit
    // shifts the next frame boundary and the walk must reject
    val broken = mp3.clone()
    val firstFrame = 67 // 10-byte ID3 header + 57 tag bytes
    broken(firstFrame + 2) = (broken(firstFrame + 2) ^ 0x02).toByte
    assert(Mpeg.walkMp3(broken).isEmpty)
    assert(Mpeg.walkMp3(mp3.dropRight(10)).isEmpty)
    assert(graft.multimodal.Codecs.sniff(mp3).contains("mp3"))
    assert(graft.multimodal.Codecs.sniff(bare).contains("mp3"))
  }

  test("Ogg walk: per-stream page/packet accounting, CRC validation, " +
      "multi-lacing packets") {
    import graft.multimodal.Mpeg
    val big = Array.tabulate(600)(i => (i % 251).toByte) // 3 lacing values
    val p1 = Mpeg.encodeOggPage(7, 0, 100L, 2, Seq(big, "ab".getBytes))
    val p2 = Mpeg.encodeOggPage(9, 0, 50L, 2, Seq("xyz".getBytes))
    val p3 = Mpeg.encodeOggPage(7, 1, 200L, 4, Seq("q".getBytes))
    val stream = p1 ++ p2 ++ p3 // interleaved serials
    val got = Mpeg.walkOgg(stream).get.sortBy(_.serial)
    assert(got.map(s => (s.serial, s.nPages, s.nPackets, s.lastGranule)) ==
      Seq((7L, 2L, 3L, 200L), (9L, 1L, 1L, 50L)))
    // one flipped body byte must fail that page's CRC
    val bad = stream.clone()
    bad(p1.length - 2) = (bad(p1.length - 2) ^ 0x10).toByte
    assert(Mpeg.walkOgg(bad).isEmpty)
    assert(Mpeg.walkOgg(stream.dropRight(1)).isEmpty)
    assert(graft.multimodal.Codecs.sniff(stream).contains("ogg"))
  }

  test("ingest funnel: container dispatch extracts the same documents " +
      "each container carries; corrupt assets drop whole") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = spark.range(0, 30).toDF("doc_id")
    val assets = graft.multimodal.Multimodal.synthesizeMixedCorpusAssets(ids)
    val docs = graft.multimodal.Multimodal.extractCorpusDocs(assets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every asset yields exactly id%3+1 documents through its container
    val byAsset = docs.groupBy(_._1)
    for (i <- 0L until 30L) {
      val expect = (i % 3 + 1).toInt
      assert(byAsset(i).length == expect, s"asset $i")
      val c = Seq("tar", "warc", "zip")((i % 3).toInt)
      assert(byAsset(i).forall(_._2 == c), s"asset $i container")
    }
    // a corrupt asset drops whole, others unaffected
    val weathered = assets.withColumn("bytes",
      when(col("asset_id") === 4L, substring(col("bytes"), 1, 9))
        .otherwise(col("bytes")))
    val docs2 = graft.multimodal.Multimodal.extractCorpusDocs(weathered)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(!docs2.contains(4L) && docs2.contains(5L) && docs2.contains(3L))
  }

  test("extractHtmlText: script/style bodies dropped, tags stripped, " +
      "single-pass entities, whitespace collapsed") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cases = Seq(
      ("<p>a  b</p>", "a b"),
      ("<script>ignore < this</script>keep", "keep"),
      ("<style a=\"b\">x{}</style>text", "text"),
      ("<!-- a <b> c -->after", "after"),
      ("<a href=\"u\">link</a>!", "link !"),
      ("&amp;lt; stays", "&lt; stays"), // single-pass: no double decode
      ("&lt;tag&gt; &quot;q&quot; &apos;a&apos; &amp;", "<tag> \"q\" 'a' &"),
      ("  lots   of\n\nspace  ", "lots of space"))
    val got = cases.map(_._1).toDF("h")
      .select(graft.operators.TextAnalysis.extractHtmlText(col("h")).as("t"))
      .collect().map(_.getString(0))
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"case $i: got '$g' expected '$e'")
    }
  }

  test("canonicalizeUrl: case fold, default ports, fragment cut, " +
      "query sort, bare-authority path") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cases = Seq(
      ("HTTP://Example.COM:80/A?z=1&a=2#f", "http://example.com/A?a=2&z=1"),
      ("https://h.io:443/", "https://h.io/"),
      ("https://h.io:8443/x", "https://h.io:8443/x"), // non-default kept
      ("http://h.io:443/x", "http://h.io:443/x"), // 443 is not http's default
      ("http://h.io", "http://h.io/"),
      ("http://h.io?b=2&a=1", "http://h.io/?a=1&b=2"),
      ("ftp://H.IO/f", "ftp://h.io/f"))
    val got = cases.map(_._1).toDF("u")
      .select(graft.operators.TextAnalysis.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"case $i: got '$g' expected '$e'")
    }
  }

  test("WET pipeline: responses only, corrupt objects drop whole, " +
      "extraction yields the predicted visible text") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = spark.range(0, 20).toDF("doc_id")
    val assets = graft.multimodal.Multimodal.synthesizeWarcHtmlAssets(ids)
    val out = graft.multimodal.Multimodal.warcHtmlDocs(assets)
      .select(col("asset_id"), col("rec_idx"),
        graft.operators.TextAnalysis.extractHtmlText(col("html")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    for (i <- 0L until 20L; rec <- 0 until (i % 2 + 1).toInt) {
      val n = ((i + 3 * rec) % 30 + 1).toInt
      val toks = (0 until n)
        .map(j => f"${(i + 9L * j + 5L * rec) % 100}%02d").mkString(" ")
      val expect = s"$toks tail & <end>"
      val got = out.find(x => x._1 == i && x._2 == rec).map(_._3)
      assert(got.contains(expect), s"asset $i rec $rec")
    }
    // a mixed record set: non-response records are filtered, not errors
    val mixed = graft.sources.Warc.encodeWarcGz(Seq(
      ("warcinfo", "", "meta".getBytes("US-ASCII")),
      ("response", "http://x/1", "<p>hi</p>".getBytes("US-ASCII"))))
    val m = graft.multimodal.Multimodal.warcHtmlDocs(
        Seq((0L, mixed)).toDF("asset_id", "bytes"))
      .collect()
    assert(m.length == 1 && m(0).getLong(1) == 1L) // original record index kept
  }

  test("FLAC: per-class roundtrips, CRC validation, truncation drops") {
    import graft.multimodal.Flac
    def ramp(n: Int, f: Int => Int): Array[Int] = Array.tabulate(n)(f)
    // constant / verbatim / fixed1 / fixed2, multiple frames
    val constant = Seq((0, ramp(5, _ => 42)), (0, ramp(7, _ => -3)))
    val dc = Flac.decodeFlac(Flac.encodeFlac(constant)).get
    assert(dc.samples.toSeq == Seq.fill(5)(42) ++ Seq.fill(7)(-3))
    assert(dc.subframeTypes == Seq("constant", "constant"))
    assert(dc.sampleRate == 8000 && dc.bitsPerSample == 16)
    val verb = Seq((1, ramp(9, k => k * 37 - 111)))
    assert(Flac.decodeFlac(Flac.encodeFlac(verb)).get.samples.toSeq ==
      verb.head._2.toSeq)
    // fixed-1: a drifting ramp with varied residuals
    val f1src = {
      val xs = new Array[Int](20)
      xs(0) = -50
      for (k <- 1 until 20) xs(k) = xs(k - 1) + (k * 7 % 21) - 10
      xs
    }
    val d1 = Flac.decodeFlac(Flac.encodeFlac(Seq((2, f1src)))).get
    assert(d1.samples.toSeq == f1src.toSeq && d1.subframeTypes == Seq("fixed1"))
    // fixed-2: curvature
    val f2src = {
      val xs = new Array[Int](20)
      xs(0) = 10; xs(1) = 14
      for (k <- 2 until 20) xs(k) = 2 * xs(k - 1) - xs(k - 2) + (k * 5 % 21) - 10
      xs
    }
    val d2 = Flac.decodeFlac(Flac.encodeFlac(Seq((3, f2src)))).get
    assert(d2.samples.toSeq == f2src.toSeq && d2.subframeTypes == Seq("fixed2"))
    // corruption: a flipped FRAME bit must fail a CRC, not emit garbage
    // (frames start at byte 42 — marker 4 + block header 4 + STREAMINFO
    // 34; STREAMINFO itself is not CRC-protected)
    val bytes = Flac.encodeFlac(Seq((1, ramp(9, k => k * 37 - 111))))
    for (off <- Seq(bytes.length - 3, (42 + bytes.length) / 2, 43)) {
      val bad = bytes.clone()
      bad(off) = (bad(off) ^ 0x04).toByte
      assert(Flac.decodeFlac(bad).isEmpty, s"flip at $off decoded")
    }
    assert(Flac.decodeFlac(bytes.dropRight(2)).isEmpty)
    assert(graft.multimodal.Codecs.sniff(bytes).contains("flac"))
  }

  test("hardening: deep-table GIF, mixed-class FLAC, flagged gzip " +
      "headers, boundary tar names, empty zip") {
    // GIF with a 256-entry palette and 4000 pixels: the LZW table
    // crosses the 512 and 1024 code-width boundaries at minCode 8
    import graft.multimodal.{Flac, Gif}
    import graft.sources.{Tar, Warc, Zip}
    val deep = Gif.decodeGif(Gif.encodeGif(80, 50, seed = 123L,
      paletteBits = 8, interlaced = true)).get
    assert(deep.pixels.length == 4000)
    for (q <- Seq(0, 1999, 3999)) {
      val (r, g, b) = Gif.paletteEntry(Gif.pixelIndex(123L, q, 256))
      assert(deep.pixels(q) == ((r << 16) | (g << 8) | b), s"q=$q")
    }
    // one FLAC stream mixing all four subframe classes across frames
    val mixed = Flac.encodeFlac(Seq(
      (0, Array.fill(6)(17)),
      (1, Array.tabulate(8)(k => k * 31 - 99)),
      (2, { val xs = new Array[Int](9); xs(0) = 5
        for (k <- 1 until 9) xs(k) = xs(k - 1) + (k % 21) - 10; xs }),
      (3, { val xs = new Array[Int](9); xs(0) = 1; xs(1) = 3
        for (k <- 2 until 9) xs(k) = 2 * xs(k - 1) - xs(k - 2) + (k % 7) - 3
        xs })))
    val md = Flac.decodeFlac(mixed).get
    assert(md.subframeTypes == Seq("constant", "verbatim", "fixed1", "fixed2"))
    assert(md.samples.length == 32)
    // gzip member with FEXTRA + FHCRC flags: both skipped per RFC 1952
    val raw = "flagged member".getBytes("US-ASCII")
    val m = Warc.gzipMember(raw)
    val flagged = m.take(3) ++ Array[Byte](0x06) ++ m.slice(4, 10) ++
      Array[Byte](3, 0, 9, 9, 9) ++ // XLEN=3 LE + 3 extra bytes
      Array[Byte](0, 0) ++ // FHCRC (value unchecked per the RFC's MAY)
      m.drop(10)
    assert(Warc.gzipMembers(flagged).get.head.toSeq == raw.toSeq)
    // ustar name at the exact 100-char field width (no NUL terminator)
    val longName = "d/" + ("x" * 94) + ".txt"
    assert(longName.length == 100)
    val t = Tar.parseTar(Tar.encodeTar(Seq((longName, "7".getBytes)))).get
    assert(t.head.name == longName && t.head.size == 1)
    // an empty zip is a valid archive with zero members
    assert(Zip.parseZip(Zip.encodeZip(Seq.empty)).get.isEmpty)
  }

  test("G.711: expansion matches the ITU-T reference points, " +
      "encode/decode roundtrip, PCM entries untouched") {
    import graft.multimodal.Codecs
    // canonical table anchors: 0xFF/0x7F are +/-zero in mu-law; 0x80 is
    // the positive max 32124; A-law 0x55 = -8, 0xD5 = +8, 0xAA = +/-...
    assert(Codecs.ulawToLinear(0xff) == 0)
    assert(Codecs.ulawToLinear(0x7f) == 0)
    assert(Codecs.ulawToLinear(0x80) == 32124)
    assert(Codecs.ulawToLinear(0x00) == -32124)
    assert(Codecs.alawToLinear(0x55) == -8)
    assert(Codecs.alawToLinear(0xd5) == 8)
    assert(Codecs.alawToLinear(0x2a) == -32256)
    assert(Codecs.alawToLinear(0xaa) == 32256)
    val mu = Codecs.encodeWavG711(8000, 2, 30, seed = 5L, format = 7)
    val (infoMu, fmtMu, xsMu) = Codecs.decodeWavG711(mu).get
    assert(fmtMu == 7 && infoMu.sampleRate == 8000 &&
      infoMu.channels == 2 && infoMu.nSamples == 30)
    assert(xsMu.length == 60)
    assert(xsMu(0) == Codecs.ulawToLinear(5))
    val al = Codecs.encodeWavG711(8000, 1, 10, seed = 200L, format = 6)
    val (_, fmtAl, xsAl) = Codecs.decodeWavG711(al).get
    assert(fmtAl == 6 && xsAl(0) == Codecs.alawToLinear(200))
    // a PCM16 wav is not a G.711 payload, and vice versa
    assert(Codecs.decodeWavG711(Codecs.encodeWav(8000, 1, 5, seed = 1L)).isEmpty)
    assert(Codecs.decodeWavSamples(mu).isEmpty)
    // truncated payload drops
    assert(Codecs.decodeWavG711(mu.dropRight(4)).isEmpty)
  }
}
