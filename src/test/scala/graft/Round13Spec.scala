package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Codecs, Jpeg}

/** Round-13 locks: progressive JPEG, MJPEG-in-AVI, PNG palette/RGBA,
  * FIR audio resampling, sharded ANN serving, streaming index CDC. */
class Round13Spec extends AnyFunSuite {

  // ------------------------------------------------------------------
  // Progressive JPEG (SOF2)
  // ------------------------------------------------------------------

  test("progressive gray round-trips pixel-exactly, incl. odd dims") {
    for ((w, h, seed) <- Seq((8, 8, 0L), (17, 9, 3L), (1, 1, 7L), (31, 17, 123L),
        (24, 16, 55L), (9, 25, 999L))) {
      val bytes = Jpeg.encodeJpegProgressiveGray(w, h, seed)
      val img = Jpeg.decodeJpeg(bytes)
        .getOrElse(fail(s"progressive gray $w x $h seed=$seed did not decode"))
      assert(img.width == w && img.height == h && img.nComponents == 1)
      for (y <- 0 until h; x <- 0 until w) {
        val want = Jpeg.blockValue(seed, x / 8, y / 8)
        assert(img.pixels(y * w + x) == want,
          s"pixel ($x,$y) of $w x $h seed=$seed: got ${img.pixels(y * w + x)}, want $want")
      }
    }
  }

  test("progressive gray equals the baseline decode of the same image") {
    for ((w, h, seed) <- Seq((16, 16, 11L), (19, 7, 42L))) {
      val prog = Jpeg.decodeJpeg(Jpeg.encodeJpegProgressiveGray(w, h, seed)).get
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(w, h, seed)).get
      assert(prog.pixels.toSeq == base.pixels.toSeq)
    }
  }

  test("progressive 4:2:0 color round-trips pixel-exactly (non-interleaved AC dims)") {
    // widths where ceil(w/8) < mcusX*2 force the component-own-dims AC
    // scan geometry (e.g. w=17: luma grid 4 wide, AC scan covers 3)
    for ((w, h, seed) <- Seq((17, 9, 5L), (16, 16, 2L), (31, 17, 77L), (5, 3, 13L))) {
      val bytes = Jpeg.encodeJpegProgressive420(w, h,
        (bx, by) => Jpeg.blockValue(seed, bx, by),
        (mx, my) => Jpeg.chromaCb(seed, mx, my),
        (mx, my) => Jpeg.chromaCr(seed, mx, my))
      val prog = Jpeg.decodeJpeg(bytes)
        .getOrElse(fail(s"progressive 420 $w x $h seed=$seed did not decode"))
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpeg420(w, h,
        (bx, by) => Jpeg.blockValue(seed, bx, by),
        (mx, my) => Jpeg.chromaCb(seed, mx, my),
        (mx, my) => Jpeg.chromaCr(seed, mx, my))).get
      assert(prog.nComponents == 3)
      assert(prog.pixels.toSeq == base.pixels.toSeq,
        s"progressive 420 $w x $h seed=$seed diverged from baseline 420")
    }
  }

  // ------------------------------------------------------------------
  // MJPEG-in-AVI
  // ------------------------------------------------------------------

  test("MJPEG AVI: mixed raw + compressed frames decode to the ramp sums") {
    val (w, h, nf, seed) = (6, 3, 5, 9L)
    val bytes = Codecs.encodeAviMjpegFrames(w, h, nf, seed)
    val (info, sums) = Codecs.decodeAviFrames(bytes)
      .getOrElse(fail("mixed frame decode None"))
    assert((info.width, info.height) == ((w, h)) && sums.length == nf)
    for (f <- 0 until nf) {
      val expect =
        if (f % 2 == 0) (0 until w * h).map { p =>
          val v = seed + f.toLong * w * h + p
          (((v >> 16) & 255) << 16) | (((v >> 8) & 255) << 8) | (v & 255)
        }.sum
        else (0 until w * h).map(p =>
          Jpeg.blockValue(seed + f, (p % w) / 8, (p / w) / 8).toLong).sum
      assert(sums(f) == expect, s"frame $f: ${sums(f)} != $expect")
    }
  }

  test("MJPEG AVI: an undecodable compressed frame skips the frame, not the asset") {
    val bytes = Codecs.encodeAviMjpegFrames(6, 3, 2, seed = 4L)
    // frame 1 is the '00dc' JPEG: corrupt its SOI so the decode fails
    val frame0Len = 6 * 3 * 3
    val dcOff = 100 + 8 + frame0Len + (frame0Len & 1) // second chunk header
    assert(new String(bytes, dcOff, 4, "US-ASCII") == "00dc")
    val bad = bytes.clone()
    bad(dcOff + 8) = 0x00 // SOI 0xFFD8 -> 0x00D8
    val (_, sums) = Codecs.decodeAviFrames(bad).getOrElse(fail("asset dropped"))
    assert(sums.length == 1, "bad compressed frame must skip, not fail the asset")
  }

  // ------------------------------------------------------------------
  // PNG palette / RGBA
  // ------------------------------------------------------------------

  test("PNG palette decode: PLTE lookup + 1-bpp filters reconstruct the ramp") {
    for ((w, h, seed) <- Seq((7, 5, 0L), (29, 13, 41L), (1, 1, 3L), (8, 9, 12L))) {
      val (img, colorType, alphaSum) =
        Codecs.decodePngFull(Codecs.encodePngPalette(w, h, seed))
          .getOrElse(fail(s"palette $w x $h seed=$seed did not decode"))
      assert(colorType == 3 && alphaSum == 0L)
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val j = ((seed + y.toLong * w + x) % 256).toInt
        val (r, g, bl) = Codecs.paletteEntry(j)
        assert(img.pixels(y * w + x) == ((r << 16) | (g << 8) | bl),
          s"pixel ($x,$y) seed=$seed")
      }
    }
  }

  test("PNG RGBA decode: 4-bpp filters + exact alpha sum") {
    for ((w, h, seed) <- Seq((6, 4, 1L), (29, 13, 98L), (2, 11, 17L))) {
      val (img, colorType, alphaSum) =
        Codecs.decodePngFull(Codecs.encodePngRgba(w, h, seed))
          .getOrElse(fail(s"rgba $w x $h seed=$seed did not decode"))
      assert(colorType == 6)
      var wantAlpha = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = seed + y.toLong * w + x
        wantAlpha += (v * 13 + 7) % 256
        val want = (((v & 255) << 16) | (((v >> 8) & 255) << 8) |
          ((v >> 16) & 255)).toInt
        assert(img.pixels(y * w + x) == want, s"pixel ($x,$y) seed=$seed")
      }
      assert(alphaSum == wantAlpha)
    }
  }

  test("Adam7 interlaced PNG decodes to the sequential image, both color types") {
    // dims chosen so several cases have EMPTY late passes (w or h < 8)
    for ((w, h, seed) <- Seq((23, 11, 4L), (8, 8, 9L), (7, 3, 2L), (1, 1, 5L),
        (16, 2, 31L), (2, 16, 8L), (9, 9, 77L))) {
      val seqImg = Codecs.decodePngFull(
        Codecs.encodePng(w, h, seed, varyFilters = true)).get._1
      val (lace, ct, _) = Codecs.decodePngFull(
          Codecs.encodePngInterlaced(w, h, seed))
        .getOrElse(fail(s"interlaced $w x $h seed=$seed did not decode"))
      assert(ct == 2 && lace.pixels.toSeq == seqImg.pixels.toSeq,
        s"interlaced truecolor $w x $h seed=$seed diverged from sequential")
      val (si, _, sa) = Codecs.decodePngFull(Codecs.encodePngRgba(w, h, seed)).get
      val (li, ct6, la) = Codecs.decodePngFull(
        Codecs.encodePngInterlaced(w, h, seed, rgba = true)).get
      assert(ct6 == 6 && li.pixels.toSeq == si.pixels.toSeq && la == sa,
        s"interlaced RGBA $w x $h seed=$seed diverged from sequential")
    }
    val good = Codecs.encodePngInterlaced(23, 11, 3L)
    assert(Codecs.decodePngFull(good.dropRight(20)).isEmpty,
      "truncated interlaced stream must skip")
  }

  test("PNG: palette image without PLTE and truncation are None") {
    val pal = Codecs.encodePngPalette(5, 4, 2L)
    // strip the PLTE chunk (signature 8 + IHDR 25 .. PLTE 12+768)
    val noPlte = pal.take(33) ++ pal.drop(33 + 12 + 768)
    assert(Codecs.decodePngFull(noPlte).isEmpty, "PLTE-less palette must skip")
    // type-2 streams keep decoding through the generalized path
    val rgb = Codecs.encodePng(5, 4, 2L, varyFilters = true)
    assert(Codecs.decodePngFull(rgb).exists(_._2 == 2))
  }

  test("PNG grayscale (types 0 and 4): bpp-1/2 filters + exact alpha sum") {
    for ((w, h, seed) <- Seq((19, 7, 0L), (1, 1, 3L), (9, 6, 44L))) {
      val (g0, ct0, a0) = Codecs.decodePngFull(Codecs.encodePngGray(w, h, seed))
        .getOrElse(fail(s"gray $w x $h seed=$seed did not decode"))
      assert(ct0 == 0 && a0 == 0L)
      var wantAlpha = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = seed + y.toLong * w + x
        wantAlpha += (v * 13 + 7) % 256
        val g = (v % 256).toInt
        assert(g0.pixels(y * w + x) == ((g << 16) | (g << 8) | g),
          s"gray pixel ($x,$y) seed=$seed")
      }
      val (g4, ct4, a4) = Codecs.decodePngFull(
        Codecs.encodePngGray(w, h, seed, alpha = true)).get
      assert(ct4 == 4 && a4 == wantAlpha)
      assert(g4.pixels.toSeq == g0.pixels.toSeq,
        "gray+alpha pixels must equal the alpha-less ramp")
    }
  }

  test("PNG 16-bit grayscale: doubled filter stride + exact high-byte reduction") {
    for ((w, h, seed) <- Seq((13, 5, 0L), (1, 1, 9L), (8, 3, 300L))) {
      val (img, ct, a) = Codecs.decodePngFull(Codecs.encodePngGray16(w, h, seed))
        .getOrElse(fail(s"gray16 $w x $h seed=$seed did not decode"))
      assert(ct == 0 && a == 0L && img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (((seed + y.toLong * w + x) % 65536) >> 8).toInt
        assert(img.pixels(y * w + x) == ((g << 16) | (g << 8) | g),
          s"16-bit pixel ($x,$y) seed=$seed")
      }
    }
    // 16-bit palette is illegal and must skip, not mis-decode
    val pal16 = Codecs.encodePngPalette(4, 3, 1L).clone()
    pal16(24) = 16 // IHDR bit depth
    assert(Codecs.decodePngFull(pal16).isEmpty)
  }

  // ------------------------------------------------------------------
  // FIR resampling
  // ------------------------------------------------------------------

  test("resampleWavFir: exact integer half-band convolution, both channels") {
    val (rate, ch, ns, seed) = (16000, 2, 11, 5L)
    val src = Codecs.encodeWav(rate, ch, ns, seed)
    val out = Codecs.resampleWavFir(src).getOrElse(fail("fir resample None"))
    val (info, samples) = Codecs.decodeWavSamples(out).get
    assert(info.sampleRate == rate / 2 && info.channels == ch)
    assert(info.nSamples == (ns + 1) / 2)
    val in = Codecs.decodeWavSamples(src).get._2
    def x(f: Int, c: Int): Long =
      if (f >= 0 && f < ns) in(f * ch + c).toLong else 0L
    for (j <- 0 until (ns + 1) / 2; c <- 0 until ch) {
      val n = Codecs.firHalfbandTaps.zipWithIndex
        .map { case (t, i) => t * x(2 * j + i - 3, c) }.sum
      val want = math.max(-32768L, math.min(32767L, Math.floorDiv(n, 32L)))
      assert(samples(j * ch + c) == want, s"frame $j ch $c")
    }
    // DC gain is unity: a constant stream stays (near-edge frames aside)
    val const = Codecs.encodeWavSamples(8000, 1, Array.fill(20)(1000))
    val constOut = Codecs.decodeWavSamples(Codecs.resampleWavFir(const).get).get._2
    assert(constOut.slice(2, 8).forall(_ == 1000),
      "unity-gain taps must pass a constant through")
    // den=3 (the 48k->16k pair): exact binomial convolution at stride 3
    val out3 = Codecs.resampleWavFir(src, den = 3).getOrElse(fail("fir3 None"))
    val (i3, s3) = Codecs.decodeWavSamples(out3).get
    assert(i3.sampleRate == rate / 3 && i3.nSamples == (ns + 2) / 3)
    for (j <- 0 until (ns + 2) / 3; c <- 0 until ch) {
      val n = Codecs.firThirdbandTaps.zipWithIndex
        .map { case (t, i) => t * x(3 * j + i - 3, c) }.sum
      val want = math.max(-32768L, math.min(32767L, Math.floorDiv(n, 64L)))
      assert(s3(j * ch + c) == want, s"den3 frame $j ch $c")
    }
    val const3 = Codecs.decodeWavSamples(
      Codecs.resampleWavFir(const, den = 3).get).get._2
    assert(const3.slice(1, 5).forall(_ == 1000),
      "den-3 unity-gain taps must pass a constant through")
    intercept[IllegalArgumentException](Codecs.resampleWavFir(src, den = 5))
  }

  // ------------------------------------------------------------------
  // streaming index CDC (IndexCdc.scala)
  // ------------------------------------------------------------------

  import graft.operators.{AnnIndex, Similarity}
  import graft.streaming.IndexCdc
  import org.apache.spark.sql.functions.{col, count, lit, sum}

  private def randomVecs(n: Int, dims: Int, seed: Int) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
        (i.toLong, Seq.fill(dims)((rnd.nextInt(255) - 127).toDouble.toFloat)))
      .toDF("vec_id", "embedding")
  }

  private def graphRows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "n_id", "d2", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sorted.toSeq

  test("IndexCdc: drained store equals the batch delete+repair+insert composition") {
    val spark = TestSpark.spark
    val all = randomVecs(80, 6, seed = 23).localCheckpoint()
    val base = all.filter(col("vec_id") % 8 =!= 0)
    val g = Similarity.nnDescent(base, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_store").toString
    IndexCdc.initStore(spark, store, g, base.select("vec_id", "embedding"))
    // batch 0: delete vec_id % 5 == 1 survivors; batch 1: insert % 8 == 0
    val dels = base.filter(col("vec_id") % 5 === 1)
      .select(lit("delete").as("op"), col("vec_id"), col("embedding"))
    val ups = all.filter(col("vec_id") % 8 === 0)
      .select(lit("upsert").as("op"), col("vec_id"), col("embedding"))
    IndexCdc.mergeCdcBatch(dels, 0L, store, "vec_id", "embedding",
      k = 4, entryIds = Seq(2L, 3L), beam = 8, searchRounds = 2,
      repairThreshold = 1L)
    IndexCdc.mergeCdcBatch(ups, 1L, store, "vec_id", "embedding",
      k = 4, entryIds = Seq(2L, 3L), beam = 8, searchRounds = 2,
      repairThreshold = 1L)
    val drained = spark.read.parquet(s"$store/current/graph")
    // the batch composition on the same data
    val remaining = base.filter(col("vec_id") % 5 =!= 1)
    val repaired = AnnIndex.repairGraph(
      AnnIndex.survivingEdges(g, remaining, "vec_id"), remaining,
      "vec_id", "embedding", k = 4, entryIds = Seq(2L, 3L),
      beam = 8, searchRounds = 2)
    val composed = AnnIndex.insertBatch(repaired, remaining,
      all.filter(col("vec_id") % 8 === 0).select("vec_id", "embedding"),
      "vec_id", "embedding", k = 4, entryIds = Seq(2L, 3L),
      beam = 8, searchRounds = 2)
    assert(graphRows(drained) == graphRows(composed),
      "drained store diverged from the batch composition")
    // vecs table tracks the surviving id -> vector map
    val vecIds = spark.read.parquet(s"$store/current/vecs")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val wantIds = all.filter(col("vec_id") % 8 === 0 ||
        (col("vec_id") % 8 =!= 0 && col("vec_id") % 5 =!= 1))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(vecIds == wantIds)
  }

  test("IndexCdc: replaying a batch against the recovered pre-batch store is exact") {
    val spark = TestSpark.spark
    val all = randomVecs(60, 6, seed = 31).localCheckpoint()
    val g = Similarity.nnDescent(all, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    val batch = all.filter(col("vec_id") % 6 === 2)
      .select(lit("delete").as("op"), col("vec_id"), col("embedding"))
    def merge(store: String): Seq[(Long, Long, Long, Int)] = {
      IndexCdc.mergeCdcBatch(batch, 0L, store, "vec_id", "embedding",
        k = 4, entryIds = Seq(0L, 1L), beam = 8, searchRounds = 2,
        repairThreshold = 1L)
      graphRows(spark.read.parquet(s"$store/current/graph"))
    }
    // the clean run
    val storeA = java.nio.file.Files.createTempDirectory("graft_cdc_a").toString
    IndexCdc.initStore(spark, storeA, g, all.select("vec_id", "embedding"))
    val first = merge(storeA)
    // the crashed run: swapStore renamed the pre-batch store aside
    // (prev_0) and died before promoting next_0 — on restart the
    // checkpoint replays the batch; recoverStore must promote prev_0
    // back and the replay must land on the IDENTICAL post-batch store
    val storeB = java.nio.file.Files.createTempDirectory("graft_cdc_b").toString
    IndexCdc.initStore(spark, storeB, g, all.select("vec_id", "embedding"))
    val fs = new org.apache.hadoop.fs.Path(storeB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$storeB/current"),
      new org.apache.hadoop.fs.Path(s"$storeB/prev_0")))
    // a half-written next_0 from the crashed attempt must not confuse it
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$storeB/next_0/graph"))
    val replayed = merge(storeB)
    assert(replayed == first,
      "replay against the recovered pre-batch store diverged")
  }

  test("IndexCdc: a batch past the rebuild fraction triggers a FULL rebuild") {
    // insertBatch is deliberately batch-blind (new vectors link only to
    // existing nodes) — fine at ~10% batches, wrong for bulk loads whose
    // vectors are mostly each other's true neighbors. Past the fraction
    // the merge must rebuild over survivors ∪ batch instead.
    val spark = TestSpark.spark
    val all = randomVecs(80, 6, seed = 71).localCheckpoint()
    val base = all.filter(col("vec_id") < 40)
    val big = all.filter(col("vec_id") >= 40) // 100% of the survivors
    val g = Similarity.nnDescent(base, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_rebuild").toString
    IndexCdc.initStore(spark, store, g, base.select("vec_id", "embedding"))
    IndexCdc.mergeCdcBatch(
      big.select(lit("upsert").as("op"), col("vec_id"), col("embedding")),
      0L, store, "vec_id", "embedding", k = 4, entryIds = Seq(0L, 1L),
      beam = 8, searchRounds = 2, repairThreshold = 1L,
      rebuildFraction = 0.25, rebuildRounds = 2, rebuildBuckets = 8)
    val drained = graphRows(spark.read.parquet(s"$store/current/graph"))
    val rebuilt = graphRows(
      Similarity.nnDescent(all, "vec_id", "embedding", 4, 2, 8))
    assert(drained == rebuilt,
      "oversized batch must rebuild, not approximate through insertBatch")
    // and a SMALL batch on the same store still takes the insert path
    // (its new node links only to existing ones — no rebuild signature)
    val small = all.filter(col("vec_id") === 40L)
      .select(lit("upsert").as("op"), col("vec_id"), col("embedding"))
    IndexCdc.mergeCdcBatch(small, 1L, store, "vec_id", "embedding",
      k = 4, entryIds = Seq(0L, 1L), beam = 8, searchRounds = 2,
      repairThreshold = 1L, rebuildFraction = 0.25)
    assert(spark.read.parquet(s"$store/current/graph").count() > 0)
  }

  test("IndexCdc: upsert REPLACES an existing vector (old edges dropped, relinked)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val all = randomVecs(50, 6, seed = 41).localCheckpoint()
    val g = Similarity.nnDescent(all, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    val store = java.nio.file.Files.createTempDirectory("graft_cdc_upsert").toString
    IndexCdc.initStore(spark, store, g, all.select("vec_id", "embedding"))
    // replace vector 5 with vector 7's embedding (an extreme move)
    val newVec = all.filter(col("vec_id") === 7L)
      .select(lit("upsert").as("op"), lit(5L).as("vec_id"), col("embedding"))
    IndexCdc.mergeCdcBatch(newVec, 0L, store, "vec_id", "embedding",
      k = 4, entryIds = Seq(0L, 1L), beam = 16, searchRounds = 5,
      repairThreshold = 1000000L)
    val after = spark.read.parquet(s"$store/current/graph")
    // node 5's new list must be built against the REPLACED vector: its
    // nearest neighbor is now 7 at distance 0
    val top = after.filter(col("q_id") === 5L).orderBy(col("rank"))
      .select("n_id", "d2").collect()
    assert(top.nonEmpty && top.head.getLong(0) == 7L && top.head.getLong(1) == 0L,
      s"replaced vector did not relink: ${top.mkString(",")}")
    // and the vecs table holds exactly one row for id 5, the new vector
    val v5 = spark.read.parquet(s"$store/current/vecs")
      .filter(col("vec_id") === 5L).collect()
    assert(v5.length == 1)
    val v7 = all.filter(col("vec_id") === 7L).select("embedding")
      .as[Seq[Float]].head()
    assert(v5.head.getAs[scala.collection.Seq[Float]]("embedding").toSeq == v7)
  }

  // ------------------------------------------------------------------
  // distributed exact ranks (Ranks.scala)
  // ------------------------------------------------------------------

  test("Ranks: bucketed rank/running-sum/ntile equal the global window exactly") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // keyed values with heavy ties across bucket boundaries
    val df = (0 until 500)
      .map(i => (i.toLong, ((i * 37) % 83).toLong)).toDF("id", "v")
    val want = df
      .withColumn("r", row_number().over(
        Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .withColumn("nt", ntile(7).over(
        Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("v").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "r", "nt", "cum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ranked = graft.operators.Ranks.globalRowNumber(df,
      expr("-(v div 16L)"), Seq(col("v").desc, col("id")), "r")
    val got = graft.operators.Ranks.globalRunningSum(ranked,
        expr("-(v div 16L)"), Seq(col("v").desc, col("id")), col("v"), "cum")
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
      .withColumn("nt",
        graft.operators.Ranks.ntileOfRank(col("r"), col("n"), 7).cast("long"))
      .select("id", "r", "nt", "cum").collect()
    assert(got.length == 500)
    for (r <- got) {
      val (wr, wnt, wcum) = want(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((wr, wnt, wcum)),
        s"id ${r.getLong(0)}")
    }
  }

  test("round-13 operators are partition-invariant (the engine's determinism discipline)") {
    // every result must be a pure function of the DATA — never of how
    // Spark happened to partition it. Re-run each new operator on a
    // deliberately re-partitioned input and require bit-identical rows.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // Ranks: rank / running sum / ntile
    val df = (0 until 300).map(i => (i.toLong, ((i * 31) % 59).toLong)).toDF("id", "v")
    def ranked(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Ranks.globalRunningSum(
        graft.operators.Ranks.globalRowNumber(d,
          expr("v div 8L"), Seq(col("v"), col("id")), "r"),
        expr("v div 8L"), Seq(col("v"), col("id")), col("v"), "cum")
    assert(rows(ranked(df)) == rows(ranked(df.repartition(17))),
      "Ranks depends on partitioning")
    // repairGraph + maintenanceReport
    val emb = randomVecs(60, 6, seed = 61).localCheckpoint()
    val g = Similarity.nnDescent(emb, "vec_id", "embedding", 4, 2, 8)
      .localCheckpoint()
    val remaining = emb.filter(col("vec_id") % 4 =!= 1)
    def repair(r: org.apache.spark.sql.DataFrame) =
      AnnIndex.repairGraph(AnnIndex.survivingEdges(g, r, "vec_id"), r,
        "vec_id", "embedding", k = 4, entryIds = Seq(0L, 2L),
        beam = 8, searchRounds = 2)
    assert(rows(repair(remaining)) == rows(repair(remaining.repartition(9))),
      "repairGraph depends on partitioning")
    assert(
      rows(AnnIndex.maintenanceReport(g, 4, Seq(0L, 2L), hops = 3)) ==
      rows(AnnIndex.maintenanceReport(g.repartition(5), 4, Seq(0L, 2L), hops = 3)),
      "maintenanceReport depends on partitioning")
    // shardedSearchTopK over a hand-sharded index (no store involved)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 0L until 2L)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .localCheckpoint()
    val index = (0 until 2).map(c =>
        Similarity.nnDescent(
            assigned.filter(col("cell") === c).select("vec_id", "embedding"),
            "vec_id", "embedding", 4, 2, 8)
          .withColumn("cell", lit(c.toLong)))
      .reduce(_ unionByName _).localCheckpoint()
    val routed = Similarity.ivfProbeCells(
      emb.filter(col("vec_id") >= 50), "vec_id", "embedding", cents, nprobe = 2)
    def sharded(a: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      AnnIndex.shardedSearchTopK(index, a, r, "vec_id", "embedding",
        entriesPerCell = 2, beam = 8, rounds = 2, k = 3)
    assert(rows(sharded(assigned, routed)) ==
      rows(sharded(assigned.repartition(7), routed.repartition(3))),
      "shardedSearchTopK depends on partitioning")
    // codec stages: stats of repartitioned asset tables are identical
    val ids = (0L until 40L).toDF("doc_id")
    def progStats(d: org.apache.spark.sql.DataFrame) =
      graft.multimodal.Multimodal.decodeJpegStats(
        graft.multimodal.Multimodal.synthesizeJpegProgressiveAssets(d))
    assert(rows(progStats(ids)) == rows(progStats(ids.repartition(11))),
      "progressive JPEG stats depend on partitioning")
  }

  test("shardedSearchTopK: an empty query batch serves an empty result, not a crash") {
    // a streaming micro-batch whose rows all fail the query filter must
    // not kill the serving stream on an empty per-cell reduce
    val emb = randomVecs(30, 6, seed = 83).localCheckpoint()
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 0L until 2L)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .localCheckpoint()
    val index = Similarity.nnDescent(
        assigned.filter(col("cell") === 0).select("vec_id", "embedding"),
        "vec_id", "embedding", 3, 1, 4)
      .withColumn("cell", lit(0L))
    val emptyRouted = Similarity.ivfProbeCells(
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", cents, nprobe = 2)
    val out = AnnIndex.shardedSearchTopK(index, assigned, emptyRouted,
      "vec_id", "embedding", entriesPerCell = 1, beam = 4, rounds = 1, k = 2)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("q_id", "n_id", "d2", "rank"))
  }

  // ------------------------------------------------------------------
  // container sniffing
  // ------------------------------------------------------------------

  test("sniff recognizes WebP and HEIC shells; junk stays None") {
    val webp = "RIFF".getBytes ++ Array[Byte](20, 0, 0, 0) ++
      "WEBPVP8 ".getBytes ++ new Array[Byte](12)
    assert(Codecs.sniff(webp).contains("webp"))
    val heic = Array[Byte](0, 0, 0, 24) ++ "ftypheic".getBytes ++ new Array[Byte](12)
    assert(Codecs.sniff(heic).contains("heic"))
    val mif1 = Array[Byte](0, 0, 0, 24) ++ "ftypmif1".getBytes ++ new Array[Byte](12)
    assert(Codecs.sniff(mif1).contains("heic"))
    assert(Codecs.sniff("ftypnope".getBytes ++ new Array[Byte](8)).isEmpty)
    assert(Codecs.sniff(new Array[Byte](16)).isEmpty)
    // existing containers unaffected
    assert(Codecs.sniff(Codecs.encodeWav(8000, 1, 1, 0L)).contains("wav"))
    assert(Codecs.sniff(Codecs.encodeAvi(2, 2, 1)).contains("avi"))
  }

  test("progressive restart intervals decode to the identical image (every scan kind)") {
    // DRI applies to EVERY scan of a progressive stream: DC-first resets
    // predictors, DC-refine just re-aligns, AC scans reset the EOB run —
    // the decoded image must be bit-identical to the restart-free stream
    for ((w, h, seed, ri) <- Seq((17, 9, 3L, 2), (31, 17, 8L, 1), (24, 16, 5L, 3))) {
      val plain = Jpeg.decodeJpeg(Jpeg.encodeJpegProgressiveGray(w, h, seed)).get
      val rst = Jpeg.decodeJpeg(
          Jpeg.encodeJpegProgressiveGray(w, h, seed, restartInterval = ri))
        .getOrElse(fail(s"progressive+DRI gray $w x $h ri=$ri did not decode"))
      assert(rst.pixels.toSeq == plain.pixels.toSeq, s"gray ri=$ri diverged")
      val plain420 = Jpeg.decodeJpeg(Jpeg.encodeJpegProgressive420(w, h,
        (bx, by) => Jpeg.blockValue(seed, bx, by),
        (mx, my) => Jpeg.chromaCb(seed, mx, my),
        (mx, my) => Jpeg.chromaCr(seed, mx, my))).get
      val rst420 = Jpeg.decodeJpeg(Jpeg.encodeJpegProgressive420(w, h,
          (bx, by) => Jpeg.blockValue(seed, bx, by),
          (mx, my) => Jpeg.chromaCb(seed, mx, my),
          (mx, my) => Jpeg.chromaCr(seed, mx, my), restartInterval = ri))
        .getOrElse(fail(s"progressive+DRI 420 $w x $h ri=$ri did not decode"))
      assert(rst420.pixels.toSeq == plain420.pixels.toSeq, s"420 ri=$ri diverged")
    }
  }

  test("color MJPEG frames decode through the full 4:2:0 path in the movi walk") {
    val (w, h, nf, seed) = (15, 9, 4, 7L)
    val bytes = Codecs.encodeAviMjpegFrames(w, h, nf, seed, color = true)
    val (info, sums) = Codecs.decodeAviFrames(bytes)
      .getOrElse(fail("color mixed frame decode None"))
    assert((info.width, info.height) == ((w, h)) && sums.length == nf)
    for (f <- 1 until nf by 2) {
      val want = Jpeg.decodeJpeg(Jpeg.encodeJpeg420(w, h,
        (bx, by) => Jpeg.blockValue(seed + f, bx, by),
        (mx, my) => Jpeg.chromaCb(seed + f, mx, my),
        (mx, my) => Jpeg.chromaCr(seed + f, mx, my))).get
        .pixels.map(_.toLong).sum
      assert(sums(f) == want, s"color frame $f: ${sums(f)} != $want")
    }
  }

  test("truncated / corrupt progressive streams return None, baseline unaffected") {
    val good = Jpeg.encodeJpegProgressiveGray(17, 9, 3L)
    assert(Jpeg.decodeJpeg(good.take(good.length / 2)).isEmpty)
    assert(Jpeg.decodeJpeg(good.take(4)).isEmpty)
    // EOI stripped: a progressive stream without EOI must not reconstruct
    assert(Jpeg.decodeJpeg(good.dropRight(2)).isEmpty)
    // baseline paths still green after the decoder restructure
    assert(Jpeg.decodeJpeg(Jpeg.encodeJpegGray(12, 12, 9L)).nonEmpty)
    assert(Jpeg.decodeJpeg(Jpeg.encodeJpeg420(17, 9, (_, _) => 100,
      (_, _) => 120, (_, _) => 130, restartInterval = 2)).nonEmpty)
  }
}
