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
