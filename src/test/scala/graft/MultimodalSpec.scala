package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Engine.table(spark, sf, "documents")

  test("asset table: binary payload + typed metadata, all modalities") {
    val assets = Multimodal.assetsFromDocuments(docs)
    assert(assets.schema("bytes").dataType.typeName == "binary")
    val mods = assets.select("modality").distinct().as[String].collect().toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("decodeFeatures: deterministic fixed-width features, no shuffle") {
    val assets = Multimodal.assetsFromDocuments(docs)
    val feats = Multimodal.decodeFeatures(assets)
    assert(feats.count() == docs.count())
    val r = feats.orderBy("asset_id").head()
    assert(r.getAs[scala.collection.Seq[Float]]("feature").length == 8)
    assert(r.getAs[Long]("n_bytes") > 0)
    // no Exchange in the plan: decode is partition-preserving
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("BMP encode/parse round-trip: header fields and exact file size") {
    val b = graft.multimodal.Codecs.encodeBmp(13, 7, seed = 42L)
    assert(b.length == graft.multimodal.Codecs.bmpFileSize(13, 7))
    assert(b.length == 54 + 7 * ((3 * 13 + 3) / 4 * 4))
    val info = graft.multimodal.Codecs.parseBmp(b).get
    assert(info.width == 13 && info.height == 7 && info.bitDepth == 24)
    // top-down BMPs store negative height: magnitude surfaces
    val neg = b.clone()
    val h = -7
    neg(22) = h.toByte; neg(23) = (h >> 8).toByte
    neg(24) = (h >> 16).toByte; neg(25) = (h >> 24).toByte
    assert(graft.multimodal.Codecs.parseBmp(neg).get.height == 7)
  }

  test("PNG encode/parse round-trip: IHDR fields and inflatable IDAT") {
    val C = graft.multimodal.Codecs
    val b = C.encodePng(5, 3, seed = 9L)
    val info = C.parsePng(b).get
    assert(info.width == 5 && info.height == 3 && info.bitDepth == 8)
    // the IDAT really is zlib-compressed scanline data, not filler:
    // inflating yields height * (1 filter byte + 3*width) bytes with the
    // deterministic pixel fill
    val raw = C.inflateIdat(b)
    assert(raw.length == 3 * (1 + 3 * 5))
    assert(raw(0) == 0) // filter type 0 on every scanline
    assert((raw(1) & 0xff) == 9) // pixel (0,0) low byte = seed
  }

  test("WAV encode/parse round-trip incl. chunk walking") {
    val C = graft.multimodal.Codecs
    val b = C.encodeWav(sampleRate = 16000, channels = 2, nSamples = 25, seed = 1L)
    assert(b.length == C.wavFileSize(2, 25))
    val a = C.parseWav(b).get
    assert(a.sampleRate == 16000 && a.channels == 2 &&
      a.bitsPerSample == 16 && a.nSamples == 25L)
  }

  test("parsers reject non-media payloads and truncated headers") {
    val C = graft.multimodal.Codecs
    assert(C.sniff("hello world, definitely not media".getBytes).isEmpty)
    assert(C.parseBmp("BMxx".getBytes).isEmpty) // magic but truncated
    assert(C.parsePng(Array[Byte](0x89.toByte, 'P', 'N', 'G')).isEmpty)
    assert(C.parseWav("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("AVI encode/parse round-trip: MainAVIHeader via hdrl LIST walk") {
    val C = graft.multimodal.Codecs
    val b = C.encodeAvi(width = 320, height = 240, nFrames = 48)
    assert(b.length == C.aviFileSize)
    val v = C.parseAvi(b).get
    assert(v.width == 320 && v.height == 240 && v.nFrames == 48L)
    assert(C.sniff(b).contains("avi"))
    assert(C.parseWav(b).isEmpty) // RIFF but not WAVE
  }

  test("decodeMedia parses synthesized assets distributed-side") {
    val ids = spark.range(0, 40).toDF("doc_id")
    val decoded = Multimodal
      .decodeMedia(Multimodal.synthesizeMediaAssets(ids))
      .orderBy("asset_id").collect()
    assert(decoded.length == 40)
    decoded.foreach { r =>
      val i = r.getLong(0)
      (i % 4) match {
        case 0 =>
          assert(r.getString(1) == "bmp")
          assert(r.getLong(2) == i % 31 + 1 && r.getLong(3) == i % 17 + 1)
          assert(r.getLong(4) == 24)
        case 1 =>
          assert(r.getString(1) == "png")
          assert(r.getLong(2) == i % 31 + 1 && r.getLong(3) == i % 17 + 1)
          assert(r.getLong(4) == 8)
        case 2 =>
          assert(r.getString(1) == "wav")
          assert(r.getLong(5) == 8000 + (i % 8) * 1000)
          assert(r.getLong(6) == i % 2 + 1 && r.getLong(7) == i % 100 + 1)
        case _ =>
          assert(r.getString(1) == "avi")
          assert(r.getLong(2) == i % 31 + 1 && r.getLong(3) == i % 17 + 1)
          assert(r.getLong(8) == i % 50 + 1) // n_frames
      }
    }
  }

  test("decodeFeatures uses real AVI frame counts for video payloads") {
    val C = graft.multimodal.Codecs
    val assets = Seq(
      (1L, "video", C.encodeAvi(64, 48, nFrames = 7), ("s", 0L)))
      .toDF("asset_id", "modality", "bytes", "meta")
    val r = Multimodal.decodeFeatures(assets).head()
    assert(r.getAs[Int]("width") == 64 && r.getAs[Int]("height") == 48)
    assert(r.getAs[Int]("n_frames") == 7)
  }

  test("decodeFeatures uses real parsed dims for real media payloads") {
    val C = graft.multimodal.Codecs
    val assets = Seq(
      (1L, "image", C.encodeBmp(20, 10, 0L), ("s", 0L)),
      (2L, "image", C.encodePng(8, 4, 0L), ("s", 0L)))
      .toDF("asset_id", "modality", "bytes", "meta")
    val got = Multimodal.decodeFeatures(assets)
      .select("asset_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == ((20, 10)))
    assert(got(2L) == ((8, 4)))
  }

  test("frame sampling strides video frame offsets") {
    val feats = Multimodal.decodeFeatures(Multimodal.assetsFromDocuments(docs))
    val sampled = Multimodal.sampleFrames(feats, stride = 2)
    val row = sampled
      .join(feats.select(col("asset_id"), col("frame_offsets")), "asset_id")
      .filter(size(col("frame_offsets")) >= 4)
      .head()
    val all = row.getAs[scala.collection.Seq[Long]]("frame_offsets").toSeq
    val got = row.getAs[scala.collection.Seq[Long]]("sampled_offsets").toSeq
    assert(got == all.zipWithIndex.filter(_._2 % 2 == 0).map(_._1))
  }
}
