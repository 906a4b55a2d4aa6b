package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side mechanics are real — schema, partition-preserving
  * `mapPartitions` over the binary payloads, batch shape, deterministic
  * output — while the codec itself is STUBBED (`FakeCodec`): the image /
  * audio libraries are not available in this environment, so the "decode"
  * derives deterministic pseudo-features from the bytes. Swapping
  * `FakeCodec` for a real JNI/library codec changes no plumbing.
  *
  * Scale notes: decode runs per-partition with no shuffle; payloads never
  * pass through the driver; feature extraction keeps only fixed-width
  * outputs so downstream stages don't carry the raw bytes.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_len", LongType, nullable = true))), nullable = true)))

  /** Decoded fixed-width features per asset. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_offsets", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB codec — deterministic pseudo-decode standing in for a real
    * image/audio library (none available in this container). */
  object FakeCodec {
    def dims(bytes: Array[Byte]): (Int, Int) =
      ((bytes.length % 640) + 1, (bytes.length / 7 % 480) + 1)

    def frameCount(bytes: Array[Byte], modality: String): Int =
      if (modality == "video") bytes.length / 100 + 1 else 1

    /** 8-dim pseudo-embedding: byte histogram moments. */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        f(i % 8) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
  }

  /** Build an asset table from the documents fixture (text bytes standing
    * in for media payloads; modality assigned round-robin). */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("bytes"),
      struct(
        col("source").as("source"),
        col("n_chars").cast("long").as("declared_len")).as("meta"))

  /** Decode + feature-extract: partition-preserving mapPartitions over
    * the payload column (the Scala analog of a `mapInPandas` batch UDF —
    * rows stream through in batches, no driver collection). */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    assets
      .select(col("asset_id"), col("modality"), col("bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val modality = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          // real container headers decode for real; everything else falls
          // back to the deterministic stub (the text stand-ins)
          val sniffed = Codecs.sniff(bytes)
          val avi =
            if (sniffed.contains("avi")) Codecs.parseAvi(bytes) else None
          val (w, h) = sniffed match {
            case Some("bmp") =>
              Codecs.parseBmp(bytes).map(i => (i.width, i.height))
                .getOrElse(FakeCodec.dims(bytes))
            case Some("png") =>
              Codecs.parsePng(bytes).map(i => (i.width, i.height))
                .getOrElse(FakeCodec.dims(bytes))
            case Some("avi") =>
              avi.map(v => (v.width, v.height)).getOrElse(FakeCodec.dims(bytes))
            case _ => FakeCodec.dims(bytes)
          }
          // a corrupt/hostile header's u32 dwTotalFrames must not drive a
          // per-row materialization (frame_offsets below) — clamp it; at
          // 100 TB some assets are always corrupt
          val maxFrames = 1 << 20
          val frames = avi
            .map(v => math.min(math.max(v.nFrames, 0L), maxFrames.toLong).toInt)
            .getOrElse(FakeCodec.frameCount(bytes, modality))
          val offsets = (0 until frames).map(i => i.toLong * 100)
          Row(id, modality, bytes.length.toLong, w, h, frames, offsets,
            FakeCodec.feature(bytes).toSeq)
        }
      }(enc)
  }

  /** Decoded real-media header info per asset (one row per asset;
    * audio-only fields NULL for images and vice versa). */
  val mediaInfoSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("codec", StringType, nullable = true), // bmp|png|wav|avi, NULL if unparseable
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("bit_depth", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("n_channels", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Synthesize a real-media asset table from an id column: each id is
    * encoded as a genuine BMP, PNG or WAV file (id mod 3) with
    * id-derived dimensions, inside `mapPartitions` — payloads are built
    * and stay executor-side, the distributed shape of any fixture or
    * re-encode stage at 100 TB. */
  def synthesizeMediaAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val bytes = (i % 4) match {
          case 0 => Codecs.encodeBmp((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i)
          case 1 => Codecs.encodePng((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i)
          case 2 => Codecs.encodeWav(
            sampleRate = (8000 + (i % 8) * 1000).toInt,
            channels = (i % 2 + 1).toInt,
            nSamples = (i % 100 + 1).toInt, seed = i)
          case _ => Codecs.encodeAvi(
            (i % 31 + 1).toInt, (i % 17 + 1).toInt, nFrames = (i % 50 + 1).toInt)
        }
        Row(i, bytes)
      }
    }(enc)
  }

  /** Real header decode over a binary column: sniff the container by
    * magic bytes and parse the actual BMP/PNG/WAV header (pure-JVM
    * [[Codecs]]). Unparseable payloads surface as codec NULL rather than
    * failing the stage — at 100 TB some assets are always corrupt. */
  def decodeMedia(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaInfoSchema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nb = bytes.length.toLong
        Codecs.sniff(bytes) match {
          case Some("bmp") =>
            Codecs.parseBmp(bytes) match {
              case Some(i) => Row(id, "bmp", i.width.toLong, i.height.toLong,
                i.bitDepth.toLong, null, null, null, null, nb)
              case None => Row(id, null, null, null, null, null, null, null, null, nb)
            }
          case Some("png") =>
            Codecs.parsePng(bytes) match {
              case Some(i) => Row(id, "png", i.width.toLong, i.height.toLong,
                i.bitDepth.toLong, null, null, null, null, nb)
              case None => Row(id, null, null, null, null, null, null, null, null, nb)
            }
          case Some("wav") =>
            Codecs.parseWav(bytes) match {
              case Some(a) => Row(id, "wav", null, null, a.bitsPerSample.toLong,
                a.sampleRate.toLong, a.channels.toLong, a.nSamples, null, nb)
              case None => Row(id, null, null, null, null, null, null, null, null, nb)
            }
          case Some("avi") =>
            Codecs.parseAvi(bytes) match {
              case Some(vi) => Row(id, "avi", vi.width.toLong, vi.height.toLong,
                null, null, null, null, vi.nFrames, nb)
              case None => Row(id, null, null, null, null, null, null, null, null, nb)
            }
          case _ => Row(id, null, null, null, null, null, null, null, null, nb)
        }
      }
    }(enc)
  }

  /** Synthesize a mixed-container corpus for the census entry: id mod 7
    * cycles bmp / png / wav / avi / jpeg / WebP / HEIC. The WebP and
    * HEIC payloads are real container shells (RIFF/WEBP with a VP8
    * chunk header; an ISO-BMFF ftyp box with the heic brand) whose
    * codec payload is junk — exactly what a sniff-and-count pass sees;
    * decode is not claimed for them. */
  def synthesizeCensusAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeCensusAssets needs non-negative ids, got $i")
        val bytes = (i % 8) match {
          case 0 => Codecs.encodeBmp((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i)
          case 1 => Codecs.encodePng((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i)
          case 2 => Codecs.encodeWav(8000, 1, (i % 50 + 1).toInt, seed = i)
          case 3 => Codecs.encodeAvi((i % 31 + 1).toInt, (i % 17 + 1).toInt,
            nFrames = (i % 6 + 1).toInt)
          case 4 => Jpeg.encodeJpegGray((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i)
          case 5 => // RIFF/WEBP shell: 'VP8 ' chunk of opaque payload
            val b = new Array[Byte](28)
            "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
            b(4) = 20; "WEBPVP8 ".getBytes("US-ASCII").copyToArray(b, 8)
            b(16) = 8
            (0 until 8).foreach(j => b(20 + j) = ((i + j) % 256).toByte)
            b
          case 6 => // ISO-BMFF ftyp box, heic major brand + mif1 compat
            val b = new Array[Byte](24)
            b(3) = 24; "ftypheic".getBytes("US-ASCII").copyToArray(b, 4)
            "    mif1".getBytes("US-ASCII").copyToArray(b, 12)
            (20 until 24).foreach(j => b(j) = ((i + j) % 256).toByte)
            b
          case _ => // video MP4: walkable moov/trak/stbl structure
            Codecs.encodeMp4(
              Seq("isom", "mp42", "avc1")((i % 3).toInt),
              (0 until (i % 3 + 1).toInt).map(t =>
                (if (t % 2 == 0) "vide" else "soun",
                  ((i + 7 * t) % 50 + 1).toInt)))
        }
        Row(i, bytes)
      }
    }(enc)
  }

  /** Walkable MP4 corpus — one asset per id with 1–3 tracks
    * (alternating video/audio handlers) and id-predicted per-track
    * sample counts, major brand rotating over the video brand set. */
  def synthesizeMp4Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMp4Assets needs non-negative ids, got $i")
        Row(i, Codecs.encodeMp4(
          Seq("isom", "mp42", "avc1")((i % 3).toInt),
          (0 until (i % 3 + 1).toInt).map(t =>
            (if (t % 2 == 0) "vide" else "soun",
              ((i + 7 * t) % 50 + 1).toInt))))
      }
    }(enc)
  }

  /** WebP-lossless corpus — one VP8L asset per id cycling the four
    * transform classes ([[Vp8l.encodeAsset]]): color, subtract-green
    * (with LZ77 row copies), palette (with pixel bundling), predictor
    * (with meta prefix groups). */
  def synthesizeWebpAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWebpAssets needs non-negative ids, got $i")
        Row(i, Vp8l.encodeAsset(i, (i % 21 + 1).toInt, (i % 13 + 1).toInt))
      }
    }(enc)
  }

  /** Color-CACHE VP8L corpus ([[Vp8l.encodeCachedAsset]]): id-derived
    * dims, pixels cycling over id%6+2 ramp colors so every stream
    * alternates literal inserts and cache references (with slot
    * evictions where two colors collide in the multiplicative hash) —
    * the stream class real cwebp output emits routinely. */
  def synthesizeWebpCachedAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWebpCachedAssets needs non-negative ids, got $i")
        Row(i, Vp8l.encodeCachedAsset(i,
          (i % 21 + 1).toInt, (i % 13 + 1).toInt, (i % 6 + 2).toInt))
      }
    }(enc)
  }

  /** 2D short-distance VP8L corpus ([[Vp8l.encode2dAsset]]): id-derived
    * dims; even ids the diagonal ramp rowed by plane-code (−1, 1)
    * copies, odd ids the vertical ramp rowed by (0, 1) whole-row
    * copies — the backward-reference class real cwebp output emits
    * near-ubiquitously for photographic content. */
  def synthesizeWebp2dAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWebp2dAssets needs non-negative ids, got $i")
        Row(i, Vp8l.encode2dAsset(i, (i % 17 + 1).toInt, (i % 11 + 1).toInt))
      }
    }(enc)
  }

  /** Full VP8L decode over a binary column reduced to the exact pixel
    * stats the image entries pin ([[Vp8l.decode]]): packed-RGB sum,
    * alpha sum, and the transform tag the stream declared — so a wrong
    * transform dispatch fails the hash even when pixels happen to
    * agree. Undecodable payloads drop (skip-not-fail). Partition-
    * preserving, driver-free. */
  def decodeWebpStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("transform", StringType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false),
      StructField("alpha_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Vp8l.decode(r.getAs[Array[Byte]](1)).map { case (w, h, pix, tags) =>
          var ps = 0L
          var as = 0L
          var i = 0
          while (i < pix.length) {
            val p = pix(i)
            ps += ((p >> 16) & 0xff) * 65536L + ((p >> 8) & 0xff) * 256L + (p & 0xff)
            as += (p >>> 24) & 0xff
            i += 1
          }
          Row(id, "vp8l", w.toLong, h.toLong, tags.mkString("+"), ps, as)
        }
      }
    }(enc)
  }

  /** DEEP-sample-table MP4 corpus ([[Codecs.encodeMp4Deep]]): 1-3
    * tracks per asset (alternating vide/soun handlers, brands rotating
    * isom/mp42/avc1), each track carrying an id-derived stts RUN TABLE
    * (1-3 runs of (count, delta)) and an id-derived stco chunk-offset
    * list — the census fields a video-corpus inventory needs beyond
    * q324's counts. */
  def synthesizeMp4DeepAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMp4DeepAssets needs non-negative ids, got $i")
        val brand = Seq("isom", "mp42", "avc1")((i % 3).toInt)
        val tracks = (0 until (i % 3 + 1).toInt).map { t =>
          val handler = if ((i + t) % 2 == 0) "vide" else "soun"
          val runs = (0 until ((i + t) % 3 + 1).toInt).map { j =>
            ((i + 3 * j + t) % 7 + 1, (i + 5 * j) % 9 + 1)
          }
          val offs = (0 until ((i + t) % 4).toInt).map { j =>
            48L + (i * 7 + t * 13 + j * 29) % 1000
          }
          (handler, runs, offs)
        }
        Row(i, Codecs.encodeMp4Deep(brand, tracks))
      }
    }(enc)
  }

  /** Per-track CENSUS over the deep walk ([[Codecs.walkMp4]]): one row
    * per track — (asset_id, brand, track_idx, handler, n_samples,
    * duration, n_chunks, sum_chunk_off) in file order, the stts run
    * table reduced to its duration sum and the stco table to its
    * count/offset sum; no codec payload ever decoded. Corrupt or
    * truncated boxes drop the asset. Partition-preserving,
    * driver-free. */
  def walkMp4Census(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("brand", StringType, nullable = false),
      StructField("track_idx", LongType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false),
      StructField("sum_chunk_off", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.multimodal.Codecs.walkMp4(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          info =>
            info.tracks.zipWithIndex.map { case (t, ix) =>
              Row(id, info.brand, ix.toLong, t.handler, t.nSamples,
                t.duration, t.nChunks, t.sumChunkOff)
            }
        }
      }
    }(enc)
  }

  /** MP4 corpus with COMPOSITION offsets and EDIT lists
    * ([[Codecs.encodeMp4Deep]] with ctts/elst): B-frame-bearing tracks
    * carry ctts runs, trimmed/delayed tracks an elst (incl. negative
    * first media_time — the standard priming-delay form); 64-bit
    * chunk offsets (co64) on every third asset. */
  def synthesizeMp4EditAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMp4EditAssets needs non-negative ids, got $i")
        val tracks = (0 until (i % 3 + 1).toInt).map { t =>
          val handler = if ((i + t) % 2 == 0) "vide" else "soun"
          val runs = Seq(((i + t) % 7 + 1, i % 9 + 1))
          val offs = (0 until ((i + t) % 3).toInt).map { j =>
            48L + (i * 7 + t * 13 + j * 29) % 1000
          }
          (handler, runs, offs)
        }
        def cttsOf(t: Int): Seq[(Long, Long)] =
          if ((i + t) % 2 != 0) Nil
          else (0 until ((i + t) % 4 / 2 + 1).toInt).map { j =>
            ((i + 3 * j + t) % 5 + 1, (i + 7 * j) % 90)
          }
        def editsOf(t: Int): Seq[(Long, Long)] =
          if ((i + t) % 3 != 0) Nil
          else (0 until ((i + t) % 2 + 1).toInt).map { j =>
            (100L + (i + 13 * t + j) % 50, (i + j) % 40 - 10)
          }
        // every fifth asset stores its timing tables in the version-1
        // forms (s32 ctts offsets / 64-bit elst entries) — same census
        // values, so the oracle is encoding-blind by construction
        Row(i, Codecs.encodeMp4Deep("mp42", tracks, co64 = i % 3 == 2,
          cttsOf = cttsOf, editsOf = editsOf, v1Timing = i % 5 == 4))
      }
    }(enc)
  }

  /** Per-track ctts/elst census over the deep walk ([[Codecs.walkMp4]]):
    * one row per track — composition-shift volume (Σ count·offset,
    * −1 without a ctts), edit-list entry count and duration sum (−1
    * without an elst), and the first media_time (the priming delay a
    * player honors; negative values are the standard form). Corrupt
    * boxes drop the asset. Partition-preserving, driver-free. */
  def walkMp4EditCensus(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("track_idx", LongType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false),
      StructField("ctts_shift", LongType, nullable = false),
      StructField("n_edits", LongType, nullable = false),
      StructField("edit_duration", LongType, nullable = false),
      StructField("first_media_time", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.multimodal.Codecs.walkMp4(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          info =>
            info.tracks.zipWithIndex.map { case (t, ix) =>
              Row(id, ix.toLong, t.handler, t.nSamples, t.duration,
                t.nChunks, t.cttsShift, t.nEdits, t.editDuration,
                t.firstMediaTime)
            }
        }
      }
    }(enc)
  }

  /** ISO-BMFF structure walk over a binary column ([[Codecs.walkMp4]]):
    * one row per track — (asset_id, brand, track_idx, handler,
    * n_samples) in file order, no codec payload ever decoded. Corrupt
    * or truncated boxes drop the asset (skip-not-fail). Partition-
    * preserving, driver-free. */
  def walkMp4Tracks(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("brand", StringType, nullable = false),
      StructField("track_idx", LongType, nullable = false),
      StructField("handler", StringType, nullable = false),
      StructField("n_samples", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.walkMp4(r.getAs[Array[Byte]](1)).toSeq.flatMap { info =>
          info.tracks.zipWithIndex.map { case (t, ix) =>
            Row(id, info.brand, ix.toLong, t.handler, t.nSamples)
          }
        }
      }
    }(enc)
  }

  /** Per-asset container identification ([[Codecs.sniff]]): the first
    * pass of any mixed-corpus audit — which formats are even present,
    * and how much of the corpus each covers. NULL container for
    * unrecognized payloads. */
  def sniffContainers(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("container", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), Codecs.sniff(r.getAs[Array[Byte]](1)).orNull)
      }
    }(enc)
  }

  /** Corpus-wide codec COVERAGE audit — the operational "how much of my
    * 100 TB actually decodes" readout: for every asset, sniff the
    * container and then genuinely ATTEMPT the deepest pass this engine
    * has for it — full pixel/sample decode for BMP/PNG/WAV/AVI/JPEG,
    * VP8L decode for WebP, the moov/trak/stbl structure walk for
    * ISO-BMFF — and report what actually happened:
    *
    *  - `decoded`   — the payload decoded end-to-end;
    *  - `structure` — the container structure walked (tracks counted),
    *                  payload deliberately untouched (video MP4);
    *  - `sniffed`   — the container was recognized but its payload did
    *                  not decode (lossy WebP/HEIC out-of-scope codecs,
    *                  or a corrupt/truncated stream);
    *  - `unrecognized` — no magic matched (container "unknown").
    *
    * Every decoder is called through its own skip-not-fail path and
    * additionally fenced (a corrupt payload must downgrade the asset's
    * status, never fail the stage), so this entry doubles as a canary
    * over the whole decode surface: any decoder regression flips rows
    * from `decoded` to `sniffed`. Partition-preserving mapPartitions,
    * bytes never on the driver; the caller aggregates the fixed-width
    * (asset_id, container, status) rows. */
  def codecCoverageAudit(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("status", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        def fenced[A](body: => Option[A]): Boolean =
          scala.util.Try(body).toOption.flatten.isDefined
        val (container, status) = Codecs.sniff(bytes) match {
          case Some(c @ "bmp") =>
            (c, if (fenced(Codecs.decodeBmp(bytes))) "decoded" else "sniffed")
          case Some(c @ "png") =>
            (c, if (fenced(Codecs.decodePngFull(bytes))) "decoded" else "sniffed")
          case Some(c @ "wav") =>
            (c, if (fenced(Codecs.decodeWavSamples(bytes))) "decoded" else "sniffed")
          case Some(c @ "avi") =>
            (c, if (fenced(Codecs.decodeAviFrames(bytes))) "decoded" else "sniffed")
          case Some(c @ "jpeg") =>
            (c, if (fenced(Jpeg.decodeJpeg(bytes))) "decoded" else "sniffed")
          case Some(c @ "gif") =>
            (c, if (fenced(Gif.decodeGif(bytes))) "decoded" else "sniffed")
          case Some(c @ "flac") =>
            (c, if (fenced(Flac.decodeFlac(bytes))) "decoded" else "sniffed")
          case Some(c @ "webp") =>
            (c, if (fenced(Vp8l.decode(bytes))) "decoded" else "sniffed")
          case Some(c @ "zip") =>
            (c, if (fenced(graft.sources.Zip.parseZip(bytes))) "decoded" else "sniffed")
          case Some(c @ "tar") =>
            (c, if (fenced(graft.sources.Tar.parseTar(bytes))) "decoded" else "sniffed")
          case Some(c @ "gzip") =>
            (c, if (fenced(graft.sources.Warc.gzipMembers(bytes))) "decoded"
            else "sniffed")
          case Some(c @ "mp3") => // structural frame walk, no audio decode
            (c, if (fenced(Mpeg.walkMp3(bytes))) "structure" else "sniffed")
          case Some(c @ "ogg") => // page walk, no codec decode
            (c, if (fenced(Mpeg.walkOgg(bytes))) "structure" else "sniffed")
          case Some(c) => // heic | mp4 — ISO-BMFF: structure walk only
            (c, if (fenced(Codecs.walkMp4(bytes))) "structure" else "sniffed")
          case None => ("unknown", "unrecognized")
        }
        Row(id, container, status)
      }
    }(enc)
  }

  /** GIF corpus — one asset per id, id-derived dims, palette width
    * cycling 4/8/16 entries, odd ids INTERLACED (the four-pass row
    * schedule), every asset carrying a Graphic Control Extension so
    * the extension-skip path always runs ([[Gif.encodeGif]]). */
  def synthesizeGifAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeGifAssets needs non-negative ids, got $i")
        Row(i, Gif.encodeGif((i % 19 + 1).toInt, (i % 11 + 1).toInt, seed = i,
          paletteBits = (i % 3 + 2).toInt, interlaced = i % 2 == 1))
      }
    }(enc)
  }

  /** Full GIF decode reduced to the pinned image stats: dims, palette
    * width, interlace flag, and the palette-resolved packed-RGB pixel
    * sum ([[Gif.decodeGif]] — real LZW, sub-block reassembly,
    * deinterlace). Undecodable payloads drop (skip-not-fail).
    * Partition-preserving, driver-free. */
  def decodeGifStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("palette_bits", LongType, nullable = false),
      StructField("interlaced", BooleanType, nullable = false),
      StructField("pixel_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Gif.decodeGif(r.getAs[Array[Byte]](1)).map { img =>
          var s = 0L
          var i = 0
          while (i < img.pixels.length) {
            val p = img.pixels(i)
            s += ((p >> 16) & 0xff) * 65536L + ((p >> 8) & 0xff) * 256L + (p & 0xff)
            i += 1
          }
          Row(id, "gif", img.width.toLong, img.height.toLong,
            img.paletteBits.toLong, img.interlaced, s)
        }
      }
    }(enc)
  }

  /** G.711 telephony corpus — μ-law WAVs on even ids, A-law on odd,
    * 8 kHz, 1–2 channels, id-predicted byte ramps
    * ([[Codecs.encodeWavG711]]). */
  def synthesizeWavG711Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWavG711Assets needs non-negative ids, got $i")
        Row(i, Codecs.encodeWavG711(8000, (i % 2 + 1).toInt, (i % 120 + 1).toInt,
          seed = i, format = if (i % 2 == 0) 7 else 6))
      }
    }(enc)
  }

  /** G.711 decode reduced to the pinned audio stats: law, rate,
    * channels, frames, and the expanded 16-bit linear sum/abs/peak
    * ([[Codecs.decodeWavG711]] — exact ITU-T expansion arithmetic).
    * Undecodable payloads drop. Partition-preserving, driver-free. */
  def decodeWavG711Stats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_channels", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sum_pcm", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false),
      StructField("peak_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.decodeWavG711(r.getAs[Array[Byte]](1)).map { case (info, fmt, xs) =>
          var sum = 0L; var sa = 0L; var pk = 0L
          var i = 0
          while (i < xs.length) {
            sum += xs(i)
            val a = math.abs(xs(i).toLong)
            sa += a
            if (a > pk) pk = a
            i += 1
          }
          Row(id, if (fmt == 7) "ulaw" else "alaw", info.sampleRate.toLong,
            info.channels.toLong, info.nSamples, sum, sa, pk)
        }
      }
    }(enc)
  }

  /** WARC-over-gzip crawl corpus — one *.warc.gz object per id holding
    * 1–3 records (warcinfo/request/response), each record its OWN gzip
    * member ([[graft.sources.Warc.encodeWarcGz]] — the record-splittable
    * crawl layout), payloads as fixed-width token text so every stat is
    * id-predictable. */
  def synthesizeWarcGzAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWarcGzAssets needs non-negative ids, got $i")
        val recs = (0 until (i % 3 + 1).toInt).map { rec =>
          val recType = Seq("warcinfo", "request", "response")(rec % 3)
          val n = ((i + rec) % 40 + 1).toInt
          val payload = (0 until n)
            .map(j => f"${(i + 7L * j + 13L * rec) % 100}%02d")
            .mkString(" ").getBytes("US-ASCII")
          (recType, s"http://example.com/$i/$rec", payload)
        }
        Row(i, graft.sources.Warc.encodeWarcGz(recs))
      }
    }(enc)
  }

  /** WARC ingestion stats — the first real pass of a crawl-scale text
    * pipeline: walk the gzip members ([[graft.sources.Warc.gzipMembers]]
    * — RFC 1952 headers, per-member CRC32/ISIZE validation), parse each
    * WARC record, and reduce its payload to (tokens, token sum). One
    * row per record, in member order; undecodable objects drop
    * (skip-not-fail). Partition-preserving, driver-free. */
  def parseWarcGzStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("rec_idx", LongType, nullable = false),
      StructField("rec_type", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("content_length", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("sum_tokens", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.sources.Warc.gzipMembers(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          members =>
            members.zipWithIndex.flatMap { case (m, ix) =>
              graft.sources.Warc.parseRecord(m).map { rec =>
                val toks = new String(rec.payload, "US-ASCII")
                  .split(" ").filter(_.nonEmpty)
                Row(id, ix.toLong, rec.recType, rec.targetUri,
                  rec.contentLength, toks.length.toLong,
                  toks.map(_.toLong).sum)
              }
            }
        }
      }
    }(enc)
  }

  /** ustar tarball corpus — one archive per id with 1–3 document
    * members (the layout datasets actually ship in), fixed-width token
    * payloads so every stat is id-predictable
    * ([[graft.sources.Tar.encodeTar]]). */
  def synthesizeTarAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeTarAssets needs non-negative ids, got $i")
        val members = (0 until (i % 3 + 1).toInt).map { m =>
          val n = ((i + 2 * m) % 30 + 1).toInt
          val payload = (0 until n)
            .map(j => f"${(i + 5L * j + 11L * m) % 100}%02d")
            .mkString(" ").getBytes("US-ASCII")
          (s"doc_${i}_$m.txt", payload)
        }
        Row(i, graft.sources.Tar.encodeTar(members))
      }
    }(enc)
  }

  /** Tarball ingestion stats — walk the ustar members
    * ([[graft.sources.Tar.parseTar]] — checksum-validated headers,
    * Long-safe octal sizes) and reduce each document payload to token
    * stats. One row per member in archive order; unwalkable archives
    * drop (skip-not-fail). Partition-preserving, driver-free. */
  def parseTarStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("member_idx", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("typeflag", StringType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("sum_tokens", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.sources.Tar.parseTar(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          members =>
            members.zipWithIndex.map { case (m, ix) =>
              val toks = new String(m.payload, "US-ASCII")
                .split(" ").filter(_.nonEmpty)
              Row(id, ix.toLong, m.name, m.size, m.typeflag.toString,
                toks.length.toLong, toks.map(_.toLong).sum)
            }
        }
      }
    }(enc)
  }

  /** IMA-ADPCM telephony corpus — mono 8 kHz single-block format-0x11
    * WAVs, id-derived nibble streams ([[Codecs.encodeWavAdpcm]]). */
  def synthesizeWavAdpcmAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWavAdpcmAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodeWavAdpcm(8000, (i % 100 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** IMA-ADPCM decode reduced to the pinned audio stats — the full
    * predictor/step-index state chain runs per nibble
    * ([[Codecs.decodeWavAdpcm]]). Undecodable payloads drop.
    * Partition-preserving, driver-free. */
  def decodeWavAdpcmStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sum_pcm", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false),
      StructField("peak_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.decodeWavAdpcm(r.getAs[Array[Byte]](1)).map { case (rate, xs) =>
          var sum = 0L; var sa = 0L; var pk = 0L
          var i = 0
          while (i < xs.length) {
            sum += xs(i)
            val a = math.abs(xs(i).toLong)
            sa += a
            if (a > pk) pk = a
            i += 1
          }
          Row(id, "ima_adpcm", rate.toLong, xs.length.toLong, sum, sa, pk)
        }
      }
    }(enc)
  }

  /** FLAC corpus — mono 16-bit 8 kHz subset streams, 1–3 frames per
    * asset, the subframe class cycling by id: CONSTANT, VERBATIM,
    * FIXED order 1, FIXED order 2 (Rice-coded residuals)
    * ([[Flac.encodeFlac]]). Sample streams are closed-form in
    * (id, frame, ordinal) so decoded sums are oracle-predictable. */
  def synthesizeFlacAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeFlacAssets needs non-negative ids, got $i")
        val cls = (i % 4).toInt
        val frames = (0 until (i % 3 + 1).toInt).map { f =>
          val ns = ((i + f) % 40 + 3).toInt
          val xs = new Array[Int](ns)
          cls match {
            case 0 =>
              java.util.Arrays.fill(xs, (((i + 7 * f) % 200) - 100).toInt)
            case 1 =>
              for (k <- 0 until ns) xs(k) = (((i + 3L * k + f) % 200) - 100).toInt
            case 2 =>
              xs(0) = (((i + f) % 200) - 100).toInt
              for (k <- 1 until ns)
                xs(k) = xs(k - 1) + (((i + 5L * k + f) % 21) - 10).toInt
            case _ =>
              xs(0) = (((i + f) % 200) - 100).toInt
              xs(1) = xs(0) + (((i + f) % 11) - 5).toInt
              for (k <- 2 until ns)
                xs(k) = 2 * xs(k - 1) - xs(k - 2) +
                  (((i + 5L * k + f) % 21) - 10).toInt
          }
          (cls, xs)
        }
        Row(i, Flac.encodeFlac(frames))
      }
    }(enc)
  }

  /** FLAC decode reduced to the pinned audio stats — full bitstream
    * parse with CRC-8/CRC-16 validation, Rice residual decode, and the
    * fixed-predictor reconstruction ([[Flac.decodeFlac]]); the
    * subframe type the stream DECLARED is surfaced so a wrong type
    * dispatch fails the hash even when samples agree. Undecodable
    * payloads drop. Partition-preserving, driver-free. */
  def decodeFlacStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("subframe_type", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_pcm", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false),
      StructField("peak_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Flac.decodeFlac(r.getAs[Array[Byte]](1)).map { a =>
          var sum = 0L; var sa = 0L; var pk = 0L
          var i = 0
          while (i < a.samples.length) {
            sum += a.samples(i)
            val x = math.abs(a.samples(i).toLong)
            sa += x
            if (x > pk) pk = x
            i += 1
          }
          Row(id, "flac", a.subframeTypes.distinct.mkString("+"),
            a.sampleRate.toLong, a.subframeTypes.length.toLong,
            a.samples.length.toLong, sum, sa, pk)
        }
      }
    }(enc)
  }

  /** FLAC residual-coding EXTRAS corpus ([[Flac.encodeFlacExtras]]) —
    * the round-16 closure of the remaining scope-outs: per id one of
    * WASTED BITS (samples premultiplied by 2^k), a partition-order-1
    * stream whose second partition is the ESCAPE (unencoded 9-bit
    * residuals), partition order 2 with per-partition Rice parameters,
    * or the 5-bit RICE2 method — the forms real encoder output hits on
    * quiet and loud material respectively. */
  def synthesizeFlacExtraAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeFlacExtraAssets needs non-negative ids, got $i")
        val cls = 5 + (i % 4).toInt
        val k = (i % 3 + 1).toInt
        val frames = (0 until (i % 3 + 1).toInt).map { f =>
          val ns = ((i + f) % 5 * 4 + 16).toInt
          val xs = Array.tabulate(ns) { j =>
            cls match {
              case 5 => ((((i + 3L * j + f) % 200) - 100) << k).toInt
              case 6 => (((i + 5L * j + 2L * f) % 120) - 60).toInt
              case 7 => (((i + 7L * j + f) % 150) - 75).toInt
              case _ => (((i + 11L * j + f) % 180) - 90).toInt
            }
          }
          (cls, k, xs)
        }
        Row(i, Flac.encodeFlacExtras(frames))
      }
    }(enc)
  }

  /** STEREO FLAC corpus with LPC subframes — the round-15 closure of
    * Flac.scala's documented scope-out: 2-channel 16-bit 8 kHz streams,
    * 1-3 frames per asset, the CHANNEL-ASSIGNMENT mode cycling by id
    * (independent, left/side, right/side, mid/side) and each channel's
    * subframe class cycling per frame over VERBATIM, FIXED 1, FIXED 2,
    * and LPC order 2 ([[Flac.encodeFlacStereo]]). Every class encodes
    * any signal losslessly (the residual absorbs the prediction error),
    * so the channel signals are free id-closed-forms and the oracle
    * states the INPUT samples directly. */
  def synthesizeFlacStereoAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeFlacStereoAssets needs non-negative ids, got $i")
        val mode = (i % 4).toInt
        val frames = (0 until (i % 3 + 1).toInt).map { f =>
          val ns = ((i + f) % 40 + 3).toInt
          val ls = Array.tabulate(ns)(k => (((i + 3L * k + f) % 200) - 100).toInt)
          val rs = Array.tabulate(ns)(k => (((2L * i + 5L * k + 7L * f) % 180) - 90).toInt)
          val clsL = ((i + f) % 4 + 1).toInt
          val clsR = ((i + 2 + f) % 4 + 1).toInt
          (mode, (clsL, ls), (clsR, rs))
        }
        Row(i, Flac.encodeFlacStereo(frames))
      }
    }(enc)
  }

  /** Stereo-FLAC decode reduced to pinned stats: full bitstream parse
    * with both CRCs validated, per-channel subframe decode at the
    * side channel's widened bit depth, LPC reconstruction, and the
    * exact integer inter-channel inversion ([[Flac.decodeFlac]]). The
    * DECLARED channel mode and the LPC subframe count are surfaced so
    * a wrong channel-assignment dispatch or a fixed-predictor fallback
    * fails the hash even where samples agree. Undecodable payloads
    * drop. Partition-preserving, driver-free. */
  def decodeFlacStereoStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("channel_mode", StringType, nullable = false),
      StructField("n_channels", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("n_lpc_subframes", LongType, nullable = false),
      StructField("sum_pcm", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false),
      StructField("peak_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Flac.decodeFlac(r.getAs[Array[Byte]](1)).map { a =>
          var sum = 0L; var sa = 0L; var pk = 0L
          var i = 0
          while (i < a.samples.length) {
            sum += a.samples(i)
            val x = math.abs(a.samples(i).toLong)
            sa += x
            if (x > pk) pk = x
            i += 1
          }
          Row(id, "flac", a.channelModes.distinct.mkString("+"),
            a.channels.toLong,
            (a.subframeTypes.length / a.channels).toLong,
            a.samples.length.toLong,
            a.subframeTypes.count(_.startsWith("lpc")).toLong,
            sum, sa, pk)
        }
      }
    }(enc)
  }

  /** ZIP document corpus — one archive per id with 1–3 members, the
    * compression method alternating stored/DEFLATE per member, fixed-
    * width token payloads ([[graft.sources.Zip.encodeZip]]). */
  def synthesizeZipAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeZipAssets needs non-negative ids, got $i")
        val members = (0 until (i % 3 + 1).toInt).map { m =>
          val n = ((i + 2 * m) % 30 + 1).toInt
          val payload = (0 until n)
            .map(j => f"${(i + 5L * j + 11L * m) % 100}%02d")
            .mkString(" ").getBytes("US-ASCII")
          (s"doc_${i}_$m.txt", payload, (i + m) % 2 == 1)
        }
        Row(i, graft.sources.Zip.encodeZip(members))
      }
    }(enc)
  }

  /** ZIP ingestion stats — central-directory walk, stored + DEFLATE
    * members extracted and CRC32-validated
    * ([[graft.sources.Zip.parseZip]]), payloads reduced to token
    * stats. One row per member in directory order; unwalkable archives
    * drop. Partition-preserving, driver-free. */
  def parseZipStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("member_idx", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("method", LongType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("sum_tokens", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.sources.Zip.parseZip(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          members =>
            members.zipWithIndex.map { case (m, ix) =>
              val toks = new String(m.payload, "US-ASCII")
                .split(" ").filter(_.nonEmpty)
              Row(id, ix.toLong, m.name, m.method.toLong, m.size,
                toks.length.toLong, toks.map(_.toLong).sum)
            }
        }
      }
    }(enc)
  }

  /** MP3 corpus — MPEG-1 Layer III streams with id-derived frame
    * counts, bitrate/rate indices, per-frame padding bits, and an
    * ID3v2 tag on every third asset ([[Mpeg.encodeMp3]]). */
  def synthesizeMp3Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMp3Assets needs non-negative ids, got $i")
        Row(i, Mpeg.encodeMp3(
          nFrames = (i % 25 + 1).toInt,
          bitrateIdx = Seq(9, 11, 5)((i % 3).toInt),
          rateIdx = ((i / 3) % 3).toInt,
          id3Size = if (i % 3 == 0) (i % 200 + 10).toInt else 0,
          padBit = f => ((i + f) % 2).toInt))
      }
    }(enc)
  }

  /** MP3 frame census ([[Mpeg.walkMp3]] — ID3v2 skip, per-frame
    * padding honored in the stride): rate, bitrate, frame count,
    * duration. Unwalkable streams drop. Partition-preserving. */
  def walkMp3Stats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("bitrate_kbps", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Mpeg.walkMp3(r.getAs[Array[Byte]](1)).map { info =>
          Row(id, "mp3", info.sampleRate.toLong, info.bitrateKbps.toLong,
            info.nFrames, info.durationMs)
        }
      }
    }(enc)
  }

  /** VBR MP3 corpus ([[Mpeg.encodeMp3Vbr]]): per-frame id-derived
    * bitrate indices over the full MPEG-1 L3 table, every third frame
    * CRC-protected (valid ISO CRC-16 over header + side info), even
    * ids carrying a Xing FRAMES declaration, some with an ID3v2
    * shell — the podcast-era stream class the CBR walk rejects. */
  def synthesizeMp3VbrAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMp3VbrAssets needs non-negative ids, got $i")
        val nf = (i % 5 + 2).toInt
        Row(i, Mpeg.encodeMp3Vbr(
          nFrames = nf,
          rateIdx = (i % 3).toInt,
          bitrateIdxOf = f => ((i + f) % 14 + 1).toInt,
          crcOf = f => (i + f) % 3 == 0,
          xingFrames = if (i % 2 == 0) nf.toLong else -1L,
          id3Size = (i % 4).toInt * 10))
      }
    }(enc)
  }

  /** VBR MP3 census ([[Mpeg.walkMp3Vbr]] — per-frame bitrates, ISO
    * CRC-16 validation on protected frames, frame-0 Xing/Info read):
    * rate, walked + declared frame counts, CRC-frame count, bitrate
    * min/max/sum, duration. Unwalkable streams drop.
    * Partition-preserving. */
  def walkMp3VbrCensus(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_crc_frames", LongType, nullable = false),
      StructField("min_kbps", LongType, nullable = false),
      StructField("max_kbps", LongType, nullable = false),
      StructField("sum_kbps", LongType, nullable = false),
      StructField("declared_frames", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Mpeg.walkMp3Vbr(r.getAs[Array[Byte]](1)).map { info =>
          Row(id, "mp3", info.sampleRate.toLong, info.nFrames,
            info.nCrcFrames, info.minKbps.toLong, info.maxKbps.toLong,
            info.sumKbps, info.declaredFrames, info.durationMs)
        }
      }
    }(enc)
  }

  /** Ogg corpus — 1–2 logical streams per asset, id-derived page and
    * packet counts and granule positions, every page carrying its real
    * CRC ([[Mpeg.encodeOggPage]]). */
  def synthesizeOggAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeOggAssets needs non-negative ids, got $i")
        val out = new java.io.ByteArrayOutputStream()
        for (s <- 0 until (i % 2 + 1).toInt) {
          val nPages = ((i + s) % 3 + 1).toInt
          for (pg <- 0 until nPages) {
            val packets = (0 until ((i + s + pg) % 3 + 1).toInt).map { k =>
              Array.tabulate(((i + 7 * pg + s + k) % 40 + 1).toInt)(
                j => ((i + j + k) % 256).toByte)
            }
            out.write(Mpeg.encodeOggPage(
              serial = (s + 7).toInt, pageSeq = pg,
              granule = i + 100L * s + 10L * pg,
              headerType = if (pg == 0) 2 else if (pg == nPages - 1) 4 else 0,
              packets = packets))
          }
        }
        Row(i, out.toByteArray)
      }
    }(enc)
  }

  /** Ogg page census ([[Mpeg.walkOgg]] — every page CRC-validated):
    * per logical stream (serial), page count, completed-packet count,
    * final granule. Unwalkable streams drop. Partition-preserving. */
  def walkOggStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("serial", LongType, nullable = false),
      StructField("n_pages", LongType, nullable = false),
      StructField("n_packets", LongType, nullable = false),
      StructField("last_granule", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Mpeg.walkOgg(r.getAs[Array[Byte]](1)).toSeq.flatMap { streams =>
          streams.map(s => Row(id, s.serial, s.nPages, s.nPackets, s.lastGranule))
        }
      }
    }(enc)
  }

  /** Ogg corpus whose streams carry REAL identification headers in
    * packet 0 of their BOS pages — (doc_id + s) even streams Vorbis,
    * odd Opus, id-predicted channels / rate / pre-skip; later pages
    * carry the q339-shaped data packets, so the page/packet accounting
    * stays exercised alongside the id parse. */
  def synthesizeOggIdAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeOggIdAssets needs non-negative ids, got $i")
        val out = new java.io.ByteArrayOutputStream()
        for (s <- 0 until (i % 2 + 1).toInt) {
          val nPages = ((i + s) % 3 + 1).toInt
          val idPacket =
            if ((i + s) % 2 == 0)
              Mpeg.vorbisIdHeader(
                channels = ((i + s) % 8 + 1).toInt,
                rate = (i + s) / 2 % 4 match {
                  case 0 => 44100L; case 1 => 48000L
                  case 2 => 32000L; case _ => 16000L
                })
            else
              Mpeg.opusHead(
                channels = ((i + s) / 2 % 2 + 1).toInt,
                preSkip = (312 + (i + s) % 100).toInt,
                rate = 48000L)
          for (pg <- 0 until nPages) {
            val packets =
              if (pg == 0) Seq(idPacket) // the id header alone on BOS
              else (0 until ((i + s + pg) % 3 + 1).toInt).map { k =>
                Array.tabulate(((i + 7 * pg + s + k) % 40 + 1).toInt)(
                  j => ((i + j + k) % 256).toByte)
              }
            out.write(Mpeg.encodeOggPage(
              serial = (s + 7).toInt, pageSeq = pg,
              granule = i + 100L * s + 10L * pg,
              headerType = if (pg == 0) 2 else if (pg == nPages - 1) 4 else 0,
              packets = packets))
          }
        }
        Row(i, out.toByteArray)
      }
    }(enc)
  }

  /** Ogg IDENTIFICATION census ([[Mpeg.walkOggIds]]): per logical
    * stream the codec / version / channels / sample rate / pre-skip
    * read from packet 0, next to the page accounting. Unwalkable
    * assets drop; an unidentifiable first packet reports `unknown`
    * with −1 fields. Partition-preserving. */
  def walkOggIdCensus(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("serial", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("version", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("pre_skip", LongType, nullable = false),
      StructField("n_pages", LongType, nullable = false),
      StructField("n_packets", LongType, nullable = false),
      StructField("last_granule", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Mpeg.walkOggIds(r.getAs[Array[Byte]](1)).toSeq.flatMap { streams =>
          streams.map(s => Row(id, s.serial, s.codec, s.version, s.channels,
            s.sampleRate, s.preSkip, s.nPages, s.nPackets, s.lastGranule))
        }
      }
    }(enc)
  }

  /** Mixed-container document corpus for the ingest FUNNEL: id mod 3
    * cycles ustar / *.warc.gz / ZIP, each holding its id-predicted
    * fixed-width-token documents — the realistic shape of a 100 TB
    * text drop (nobody ships one container format). */
  def synthesizeMixedCorpusAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMixedCorpusAssets needs non-negative ids, got $i")
        def toks(n: Int, f: Int => Long): Array[Byte] =
          (0 until n).map(j => f"${f(j)}%02d").mkString(" ").getBytes("US-ASCII")
        val bytes = (i % 3) match {
          case 0 =>
            graft.sources.Tar.encodeTar((0 until (i % 3 + 1).toInt).map { m =>
              (s"doc_${i}_$m.txt",
                toks(((i + 2 * m) % 30 + 1).toInt, j => (i + 5L * j + 11L * m) % 100))
            })
          case 1 =>
            graft.sources.Warc.encodeWarcGz((0 until (i % 3 + 1).toInt).map { rec =>
              (Seq("warcinfo", "request", "response")(rec % 3),
                s"http://example.com/$i/$rec",
                toks(((i + rec) % 40 + 1).toInt, j => (i + 7L * j + 13L * rec) % 100))
            })
          case _ =>
            graft.sources.Zip.encodeZip((0 until (i % 3 + 1).toInt).map { m =>
              (s"doc_${i}_$m.txt",
                toks(((i + 2 * m) % 30 + 1).toInt, j => (i + 5L * j + 11L * m) % 100),
                (i + m) % 2 == 1)
            })
        }
        Row(i, bytes)
      }
    }(enc)
  }

  /** The ingest FUNNEL: one pass over a mixed-container corpus that
    * sniffs each asset and extracts EVERY document through the right
    * walker — ustar members, WARC records out of per-record gzip
    * members, ZIP members (stored + DEFLATE) — reducing each document
    * to token stats. The one operator a text pipeline actually starts
    * with at 100 TB: containers vary, the downstream contract
    * (documents + stats) does not. Unrecognized or corrupt assets drop
    * whole (skip-not-fail); a corrupt member inside a walkable
    * container drops per the container's own validation rules.
    * Partition-preserving, bytes never on the driver. */
  def extractCorpusDocs(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("member_idx", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("sum_tokens", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        def stats(payloads: Seq[Array[Byte]], container: String): Seq[Row] =
          payloads.zipWithIndex.map { case (p, ix) =>
            val toks = new String(p, "US-ASCII").split(" ").filter(_.nonEmpty)
            Row(id, container, ix.toLong, toks.length.toLong,
              toks.map(_.toLong).sum)
          }
        Codecs.sniff(bytes) match {
          case Some("tar") =>
            graft.sources.Tar.parseTar(bytes).toSeq
              .flatMap(ms => stats(ms.map(_.payload), "tar"))
          case Some("gzip") =>
            graft.sources.Warc.gzipMembers(bytes).toSeq.flatMap { members =>
              val recs = members.flatMap(graft.sources.Warc.parseRecord)
              if (recs.length != members.length) Seq.empty // corrupt record set
              else stats(recs.map(_.payload), "warc")
            }
          case Some("zip") =>
            graft.sources.Zip.parseZip(bytes).toSeq
              .flatMap(ms => stats(ms.map(_.payload), "zip"))
          case _ => Seq.empty
        }
      }
    }(enc)
  }

  /** MPEG-audio corpus across ALL THREE MPEG-1 layers: id mod 3
    * cycles Layer I / II / III, with id-predicted bitrate index, rate
    * index, frame count, and alternating padding — the slot-vs-byte
    * length arithmetic differs per layer, so one wrong stride desyncs
    * that layer's every asset. */
  def synthesizeMp3LayerAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMp3LayerAssets needs non-negative ids, got $i")
        Row(i, Mpeg.encodeMp3Layered(
          layer = (i % 3 + 1).toInt,
          nFrames = (i % 5 + 1).toInt,
          bitrateIdx = (i % 14 + 1).toInt,
          rateIdx = (i / 3 % 3).toInt,
          padBit = f => ((i + f) % 2).toInt))
      }
    }(enc)
  }

  /** All-layer MPEG-audio census ([[Mpeg.walkMp3Layers]]): per asset
    * the layer, rate, bitrate, walked frame count, and duration under
    * the per-layer samples-per-frame constant. Partition-preserving. */
  def walkMp3LayerCensus(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("layer", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("bitrate_kbps", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Mpeg.walkMp3Layers(r.getAs[Array[Byte]](1)).map { info =>
          Row(id, "mpeg_audio", info.layer.toLong, info.sampleRate.toLong,
            info.bitrateKbps.toLong, info.nFrames, info.durationMs)
        }
      }
    }(enc)
  }

  private def findJpegMarker(b: Array[Byte], want: Int): Int = {
    var at = 2
    while (at + 4 <= b.length) {
      if ((b(at + 1) & 0xff) == want) return at
      at += 2 + (((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff))
    }
    -1
  }

  /** JPEG corpus spanning the DROP-REASON classes a real crawl
    * contains: id mod 5 cycles a decodable baseline asset, the same
    * asset declared arithmetic-coded (SOF9), declared 12-bit sample
    * precision, carrying a REAL 16-bit (pq=1) quantization table, and
    * truncated to its first 10 bytes — the planted fixtures the honest
    * audit (q361) classifies. */
  def synthesizeJpegReasonAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeJpegReasonAssets needs non-negative ids, got $i")
        val base = Jpeg.encodeJpegGray((i % 15 + 1).toInt, (i % 9 + 1).toInt,
          seed = i)
        val bytes = (i % 5) match {
          case 0 => base
          case 1 =>
            val b = base.clone()
            b(findJpegMarker(b, 0xc0) + 1) = 0xc9.toByte
            b
          case 2 =>
            val b = base.clone()
            b(findJpegMarker(b, 0xc0) + 4) = 12.toByte
            b
          case 3 =>
            // splice a genuine 16-bit DQT in: pq=1, len 131, every
            // value widened to u16 big-endian
            val at = findJpegMarker(base, 0xdb)
            val len = ((base(at + 2) & 0xff) << 8) | (base(at + 3) & 0xff)
            val out = new java.io.ByteArrayOutputStream()
            out.write(base, 0, at)
            out.write(0xff); out.write(0xdb)
            val nlen = 2 + 1 + 128
            out.write(nlen >> 8); out.write(nlen & 0xff)
            out.write(0x10 | (base(at + 4) & 0x0f))
            for (k <- 0 until 64) {
              out.write(0); out.write(base(at + 5 + k) & 0xff)
            }
            out.write(base, at + 2 + len, base.length - (at + 2 + len))
            out.toByteArray
          case _ => base.take(10)
        }
        Row(i, bytes)
      }
    }(enc)
  }

  /** The coverage audit made HONEST about WHY a JPEG dropped: same
    * decode-or-sniff verdict as [[codecCoverageAudit]], plus the
    * [[Jpeg.dropReason]] tag for every sniffed asset (`ok` for
    * decoded ones) — so a real-corpus audit distinguishes "scoped-out
    * coding form" (arithmetic / 12-bit / 16-bit tables) from "damaged
    * bytes" instead of lumping both into one sniffed bucket.
    * Partition-preserving. */
  def jpegAuditWithReasons(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("reason", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (status, reason) =
          if (Jpeg.decodeJpeg(bytes).isDefined) ("decoded", "ok")
          else ("sniffed", Jpeg.dropReason(bytes))
        Row(id, "jpeg", status, reason)
      }
    }(enc)
  }

  /** WARC-of-HTML crawl corpus — the true Common Crawl shape: each
    * *.warc.gz response record carries an HTML PAGE (script, style,
    * comment, attributes, entities — every extraction hazard) whose
    * visible text is id-predicted fixed-width tokens. */
  def synthesizeWarcHtmlAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWarcHtmlAssets needs non-negative ids, got $i")
        val recs = (0 until (i % 2 + 1).toInt).map { rec =>
          val n = ((i + 3 * rec) % 30 + 1).toInt
          val toks = (0 until n)
            .map(j => f"${(i + 9L * j + 5L * rec) % 100}%02d").mkString(" ")
          val html = "<html><head><script>if (1<2) hidden</script>" +
            "<style>p { }</style></head><body><!-- note -->" +
            "<p class=\"d\">" + toks + "</p>" +
            "<p>tail &amp; &lt;end&gt;</p></body></html>"
          ("response", s"http://example.com/$i/$rec", html.getBytes("US-ASCII"))
        }
        Row(i, graft.sources.Warc.encodeWarcGz(recs))
      }
    }(enc)
  }

  /** WARC corpus in the FULL Common-Crawl response shape: each
    * response record's payload is an HTTP message — status line,
    * headers, and the HTML body framed either by `Content-Length`
    * ((i + rec) even) or by `Transfer-Encoding: chunked` with
    * id-predicted chunk sizes ((i + rec) odd) — and every
    * (i + 5·rec) % 7 == 3 record is a TRUNCATED capture (its payload
    * cut 10 bytes short of the declared Content-Length framing), the
    * damage a real crawl carries. */
  def synthesizeWarcHttpAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWarcHttpAssets needs non-negative ids, got $i")
        val out = new java.io.ByteArrayOutputStream()
        for (rec <- 0 until (i % 2 + 1).toInt) {
          val n = ((i + 3 * rec) % 30 + 1).toInt
          val toks = (0 until n)
            .map(j => f"${(i + 9L * j + 5L * rec) % 100}%02d").mkString(" ")
          val html = "<html><body><p>" + toks + "</p></body></html>"
          val body = html.getBytes("US-ASCII")
          val http =
            if ((i + rec) % 2 == 0) {
              ("HTTP/1.1 200 OK\r\n" +
                "Content-Type: text/html\r\n" +
                s"Content-Length: ${body.length}\r\n" +
                "\r\n").getBytes("US-ASCII") ++ body
            } else {
              val cs = ((i + rec) % 11 + 3).toInt
              val bo = new java.io.ByteArrayOutputStream()
              bo.write(("HTTP/1.1 200 OK\r\n" +
                "Content-Type: text/html\r\n" +
                "Transfer-Encoding: chunked\r\n" +
                "\r\n").getBytes("US-ASCII"))
              var o = 0
              while (o < body.length) {
                val k = math.min(cs, body.length - o)
                bo.write(s"${k.toHexString}\r\n".getBytes("US-ASCII"))
                bo.write(body, o, k)
                bo.write("\r\n".getBytes("US-ASCII"))
                o += k
              }
              bo.write("0\r\n\r\n".getBytes("US-ASCII"))
              bo.toByteArray
            }
          val recBytes = graft.sources.Warc.formatRecord(
            "response", s"http://example.com/$i/$rec", http)
          val emitted =
            if ((i + 5 * rec) % 7 == 3)
              // truncated capture: the WARC record body stops 10 bytes
              // short of its declared Content-Length — parseRecord must
              // drop exactly this record and nothing else
              recBytes.take(recBytes.length - 10)
            else recBytes
          out.write(graft.sources.Warc.gzipMember(emitted))
        }
        Row(i, out.toByteArray)
      }
    }(enc)
  }

  /** The WARC→HTTP→HTML walk for the full-response corpus: gzip
    * members → WARC records (truncated captures drop at the record
    * check) → [[graft.sources.Warc.httpResponseBody]] (chunked bodies
    * re-assembled, Content-Length bodies length-verified) → the HTML
    * string plus the HTTP status. rec_idx is the gzip-member ordinal,
    * so a dropped record never shifts its neighbors. Partition-
    * preserving. */
  def warcHttpDocs(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("rec_idx", LongType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("http_status", LongType, nullable = false),
      StructField("html", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.sources.Warc.gzipMembers(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          members =>
            members.zipWithIndex.flatMap { case (m, ix) =>
              for {
                rec <- graft.sources.Warc.parseRecord(m)
                if rec.recType == "response"
                (status, body) <- graft.sources.Warc.httpResponseBody(rec.payload)
              } yield Row(id, ix.toLong, rec.targetUri, status.toLong,
                new String(body, "US-ASCII"))
            }
        }
      }
    }(enc)
  }

  /** The WARC→HTML half of the WET pipeline: walk the gzip members,
    * parse each WARC record, keep responses, surface the HTML as a
    * STRING column — so the visible-text extraction
    * ([[graft.operators.TextAnalysis.extractHtmlText]]) runs as
    * codegen'd scan-stage expressions on top, exactly how the two
    * stages compose at 100 TB (binary walk in mapPartitions, string
    * surgery in the scan). Corrupt objects drop whole. */
  def warcHtmlDocs(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("rec_idx", LongType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("html", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        graft.sources.Warc.gzipMembers(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          members =>
            // rec_idx is the gzip-MEMBER ordinal (indexed before parsing,
            // as parseWarcGzStats does), so a corrupt earlier record
            // shifts nothing: both surfaces report the same index for
            // the same record
            members.zipWithIndex.flatMap { case (m, ix) =>
              graft.sources.Warc.parseRecord(m).collect {
                case rec if rec.recType == "response" =>
                  Row(id, ix.toLong, rec.targetUri,
                    new String(rec.payload, "US-ASCII"))
              }
            }
        }
      }
    }(enc)
  }

  /** Synthesize grayscale baseline-JPEG assets from an id column
    * (id-derived dims, per-block constant pixels — see
    * [[Jpeg.encodeJpegGray]]): the [[synthesizeMediaAssets]] shape for
    * the one container that set omits. Executor-side mapPartitions,
    * payloads never touch the driver. */
  def synthesizeJpegAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        // sign-preserving % on a negative id would yield nonpositive dims
        // (encode require) or negative pixel values (breaking the exact
        // round-trip + oracle) — fail loudly at the entry point instead
        require(i >= 0, s"synthesizeJpegAssets needs non-negative ids, got $i")
        Row(i, Jpeg.encodeJpegGray((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** Synthesize 4:2:0 color baseline-JPEG assets — the dominant
    * real-world chroma layout ([[Jpeg.encodeJpeg420]]): id-derived dims,
    * per-8×8-luma-block constant Y ([[Jpeg.blockValue]]) and per-MCU
    * constant chroma ([[Jpeg.chromaCb]]/[[Jpeg.chromaCr]]), so the full
    * color round-trip is pixel-exact and the q296 oracle predicts the
    * decoded RGB pixel sum from id arithmetic. Every third asset is
    * encoded with a DRI/RSTn restart interval — the decoded image is
    * identical by spec, so the restart path sits under the same hash
    * gate for free. Executor-side mapPartitions; payloads never touch
    * the driver. */
  def synthesizeJpeg420Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeJpeg420Assets needs non-negative ids, got $i")
        val bytes = Jpeg.encodeJpeg420(
          (i % 31 + 1).toInt, (i % 17 + 1).toInt,
          (bx, by) => Jpeg.blockValue(i, bx, by),
          (mx, my) => Jpeg.chromaCb(i, mx, my),
          (mx, my) => Jpeg.chromaCr(i, mx, my),
          restartInterval = if (i % 3 == 0) 2 else 0)
        Row(i, bytes)
      }
    }(enc)
  }

  /** Synthesize PROGRESSIVE (SOF2) JPEG assets — the dominant
    * real-world JPEG shape ([[Jpeg.encodeJpegProgressive]]: DC-first +
    * DC-refinement + per-component AC scans with EOBn runs and a
    * successive-approximation refinement pass): even ids grayscale
    * 4:4:4, odd ids COLOR 4:2:0 — the subsampled case forces the
    * non-interleaved AC-scan geometry (component-own block dims, not
    * the padded MCU grid). Same id-derived dims and per-block/per-MCU
    * constants as the q286/q296 baseline fixtures, so the decoded
    * pixel sums stay oracle-predictable. Executor-side mapPartitions;
    * payloads never touch the driver. */
  def synthesizeJpegProgressiveAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeJpegProgressiveAssets needs non-negative ids, got $i")
        val (w, h) = ((i % 31 + 1).toInt, (i % 17 + 1).toInt)
        // every third asset carries a DRI/RSTn restart interval — the
        // decoded image is identical by spec (E.2.4), so progressive
        // restart handling (DC predictor AND EOB-run resets in every
        // scan kind) sits under the same hash gate for free
        val ri = if (i % 3 == 0) 2 else 0
        val bytes =
          if (i % 2 == 0) Jpeg.encodeJpegProgressiveGray(w, h, seed = i,
            restartInterval = ri)
          else Jpeg.encodeJpegProgressive420(w, h,
            (bx, by) => Jpeg.blockValue(i, bx, by),
            (mx, my) => Jpeg.chromaCb(i, mx, my),
            (mx, my) => Jpeg.chromaCr(i, mx, my),
            restartInterval = ri)
        Row(i, bytes)
      }
    }(enc)
  }

  /** Synthesize 4:2:2 color baseline-JPEG assets — the other common
    * subsampled layout ([[Jpeg.encodeJpeg422]]: luma 2×1, one chroma
    * block per 16×8 MCU): per-8×8-luma-block constant Y, per-MCU
    * constant chroma at indices (x/16, y/8), so the horizontal-only
    * replication upsample sits under its own oracle (q296 covered
    * 4:2:0's two-axis case). */
  def synthesizeJpeg422Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeJpeg422Assets needs non-negative ids, got $i")
        Row(i, Jpeg.encodeJpeg422(
          (i % 31 + 1).toInt, (i % 17 + 1).toInt,
          (bx, by) => Jpeg.blockValue(i, bx, by),
          (mx, my) => Jpeg.chromaCb(i, mx, my),
          (mx, my) => Jpeg.chromaCr(i, mx, my)))
      }
    }(enc)
  }

  /** Synthesize filter-cycling PNG assets from an id column: id-derived
    * dims, the deterministic v = id + y·w + x RGB ramp, and scanline
    * filter (id + y) mod 5 per row — every one of PNG's five filters
    * under the q302 pixel-sum gate ([[Codecs.encodePng]] with
    * `varyFilters`). Executor-side mapPartitions; payloads never touch
    * the driver. */
  def synthesizePngAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizePngAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodePng(
          (i % 29 + 1).toInt, (i % 13 + 1).toInt, seed = i, varyFilters = true))
      }
    }(enc)
  }

  /** FULL PNG decode over a binary column — inflate + all-five-filters
    * unfiltering ([[Codecs.decodePng]]), reduced immediately to
    * fixed-width stats (dims, component count, exact packed-RGB pixel
    * sum) so downstream stages never carry pixel buffers. Undecodable
    * payloads surface with codec NULL. Partition-preserving,
    * driver-free — the q286/q296 JPEG shape for the PNG container. */
  def decodePngStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_components", LongType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Codecs.decodePng(r.getAs[Array[Byte]](1)) match {
          case Some(img) =>
            var s = 0L
            var i = 0
            while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
            Row(id, "png", img.width.toLong, img.height.toLong, 3L, s)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Synthesize palette + RGBA PNG assets — the two common real-corpus
    * forms (icons/screenshots, transparency) the type-2 fixture set
    * omits: even ids 8-bit PALETTE (color type 3, the deterministic
    * 256-entry PLTE, index = v mod 256), odd ids RGBA (color type 6,
    * alpha (v·13+7) mod 256), both with the five-filter scanline
    * cycling. Executor-side mapPartitions. */
  def synthesizePngExtAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizePngExtAssets needs non-negative ids, got $i")
        val (w, h) = ((i % 29 + 1).toInt, (i % 13 + 1).toInt)
        Row(i,
          if (i % 2 == 0) Codecs.encodePngPalette(w, h, seed = i)
          else Codecs.encodePngRgba(w, h, seed = i))
      }
    }(enc)
  }

  /** Synthesize Adam7-INTERLACED PNG assets — the progressive-rendering
    * form web encoders emit, which the sequential fixtures omit: even
    * ids interlaced truecolor (type 2), odd ids interlaced RGBA
    * (type 6), dims small enough that several assets have EMPTY late
    * passes (the geometry corner every Adam7 decoder must get right).
    * Same v-ramp pixels as the sequential fixtures, so the decoded
    * sums stay id-predictable. */
  def synthesizePngInterlacedAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizePngInterlacedAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodePngInterlaced(
          (i % 23 + 1).toInt, (i % 11 + 1).toInt, seed = i, rgba = i % 2 == 1))
      }
    }(enc)
  }

  /** FULL PNG decode surfacing the color TYPE and the exact alpha sum
    * ([[Codecs.decodePngFull]]) — the [[decodePngStats]] shape extended
    * to palette (PLTE lookup) and RGBA (4-byte filter offsets) forms;
    * alpha_sum is NULL for the alpha-less types. */
  def decodePngFullStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("color_type", LongType, nullable = true),
      StructField("n_components", LongType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true),
      StructField("alpha_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Codecs.decodePngFull(r.getAs[Array[Byte]](1)) match {
          case Some((img, colorType, alphaSum)) =>
            var s = 0L
            var i = 0
            while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
            val nComp = colorType match {
              case 0 => 1L // grayscale
              case 4 => 2L // grayscale + alpha
              case 6 => 4L // RGBA
              case _ => 3L // truecolor / palette (expands to RGB)
            }
            Row(id, "png", img.width.toLong, img.height.toLong,
              colorType.toLong, nComp, s,
              if (colorType == 4 || colorType == 6) alphaSum else null)
          case None => Row(id, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Synthesize GRAYSCALE PNG assets — color types 0 (even ids) and 4
    * (gray+alpha, odd ids): the photographic/scan forms the color
    * fixtures omit. Gray byte v mod 256 from the same v-ramp, alpha
    * (v·13+7) mod 256, five-filter cycling at bpp 1 and 2. */
  def synthesizePngGrayAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizePngGrayAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodePngGray(
          (i % 19 + 1).toInt, (i % 7 + 1).toInt, seed = i, alpha = i % 2 == 1))
      }
    }(enc)
  }

  /** Synthesize 16-BIT grayscale PNG assets ([[Codecs.encodePngGray16]]:
    * big-endian v mod 2^16 samples, filters at the 2-byte stride) — the
    * photographic/scientific depth the 8-bit fixtures omit; the decode
    * reduces by the exact high byte. */
  def synthesizePng16Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizePng16Assets needs non-negative ids, got $i")
        Row(i, Codecs.encodePngGray16((i % 13 + 1).toInt, (i % 5 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** Synthesize 16-bit PCM WAV assets from an id column (id-derived
    * rate/channels/length and the deterministic sawtooth payload —
    * [[Codecs.encodeWav]]), the q302-shape fixture for the audio
    * modality. Executor-side mapPartitions. */
  def synthesizeWavAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWavAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodeWav(
          sampleRate = (8000 + (i % 8) * 1000).toInt,
          channels = (i % 2 + 1).toInt,
          nSamples = (i % 100 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** CD-rate WAV corpus (44 100 Hz) — the input side of the 44.1k→16k
    * rational resample pair ([[resampleAudioRational]] at 160/441).
    * Same deterministic ramp payload as [[synthesizeWavAssets]]. */
  def synthesizeWav441Assets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeWav441Assets needs non-negative ids, got $i")
        Row(i, Codecs.encodeWav(
          sampleRate = 44100,
          channels = (i % 2 + 1).toInt,
          nSamples = (i % 120 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** Rational L/M resample over a binary audio column
    * ([[Codecs.resampleWavRational]]) — partition-preserving, payloads
    * never touch the driver; undecodable inputs drop (skip-not-fail). */
  def resampleAudioRational(assets: DataFrame,
      l: Int,
      m: Int,
      idCol: String = "asset_id",
      bytesCol: String = "bytes"): DataFrame = {
    require(l >= 1 && m >= 1)
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.resampleWavRational(r.getAs[Array[Byte]](1), l, m)
          .map(resampled => Row(id, resampled))
      }
    }(enc)
  }

  /** FULL WAV PCM decode over a binary column
    * ([[Codecs.decodeWavSamples]]) reduced to the amplitude stats an
    * audio-corpus pipeline's first pass computes (loudness/clipping
    * screens before any expensive feature extraction): signed sample
    * sum, absolute sum, and peak — all exact integers. Undecodable or
    * non-16-bit-PCM payloads surface with codec NULL. Partition-
    * preserving, driver-free. */
  def decodeWavStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("sample_rate", LongType, nullable = true),
      StructField("n_channels", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("sum_pcm", LongType, nullable = true),
      StructField("sum_abs", LongType, nullable = true),
      StructField("peak_abs", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Codecs.decodeWavSamples(r.getAs[Array[Byte]](1)) match {
          case Some((info, samples)) =>
            var (s, sa, pk) = (0L, 0L, 0L)
            var i = 0
            while (i < samples.length) {
              val v = samples(i)
              s += v; sa += math.abs(v)
              if (math.abs(v) > pk) pk = math.abs(v)
              i += 1
            }
            Row(id, "wav", info.sampleRate.toLong, info.channels.toLong,
              info.nSamples, s, sa, pk)
          case None => Row(id, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Synthesize 24bpp BMP assets (id-derived dims, the deterministic
    * v-ramp — [[Codecs.encodeBmp]]), the dedicated fixture for the q304
    * pixel gate (the mixed [[synthesizeMediaAssets]] set assigns BMP to
    * only every fourth id). */
  def synthesizeBmpAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeBmpAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodeBmp((i % 31 + 1).toInt, (i % 17 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** FULL BMP pixel decode ([[Codecs.decodeBmp]]: header offset, row
    * padding, bottom-up flip, BGR order) reduced to fixed-width stats —
    * the q302 PNG shape for the BMP container. */
  def decodeBmpStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_components", LongType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Codecs.decodeBmp(r.getAs[Array[Byte]](1)) match {
          case Some(img) =>
            var s = 0L
            var i = 0
            while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
            Row(id, "bmp", img.width.toLong, img.height.toLong, 3L, s)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Synthesize AVI assets with REAL frame payloads
    * ([[Codecs.encodeAviFrames]]: id-derived dims and frame count, raw
    * BGR24 '00db' chunks carrying the deterministic per-frame ramp). */
  def synthesizeAviAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeAviAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodeAviFrames(
          (i % 15 + 1).toInt, (i % 9 + 1).toInt,
          nFrames = (i % 6 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** Synthesize AVI assets with MIXED raw + Motion-JPEG frames
    * ([[Codecs.encodeAviMjpegFrames]]: even frames raw '00db' BGR24
    * ramps, odd frames '00dc' chunks each a complete baseline grayscale
    * JPEG at seed = id + f) — the compressed-video shape a real corpus
    * contains, with every frame's pixel sum still id-predictable. */
  def synthesizeMjpegAviAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMjpegAviAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodeAviMjpegFrames(
          (i % 15 + 1).toInt, (i % 9 + 1).toInt,
          nFrames = (i % 6 + 1).toInt, seed = i))
      }
    }(enc)
  }

  /** [[synthesizeMjpegAviAssets]] with COLOR Motion-JPEG frames: odd
    * frames are '00dc' chunks each a complete 4:2:0 baseline JPEG
    * (per-luma-block constant Y, per-MCU constant chroma at seed
    * id + f) — the actually-dominant compressed-video payload shape,
    * whose decoded RGB frame sums stay id-predictable through the
    * q296 color arithmetic. */
  def synthesizeMjpegColorAviAssets(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        require(i >= 0, s"synthesizeMjpegColorAviAssets needs non-negative ids, got $i")
        Row(i, Codecs.encodeAviMjpegFrames(
          (i % 15 + 1).toInt, (i % 9 + 1).toInt,
          nFrames = (i % 6 + 1).toInt, seed = i, color = true))
      }
    }(enc)
  }

  /** REAL frame sampling over a video column: decode the movi payload
    * ([[Codecs.decodeAviFrames]]) and emit every `stride`-th frame's
    * packed-RGB pixel sum — the frame-extraction stage of a video
    * pipeline, where [[sampleFrames]] demonstrated only the offset
    * plumbing. One row per SAMPLED frame; undecodable assets drop (the
    * [[resizeImages]] skip discipline). Partition-preserving,
    * driver-free, payloads reduced before anything downstream. */
  def sampleFrameStats(assets: DataFrame, stride: Int,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    require(stride >= 1)
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("frame_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.decodeAviFrames(r.getAs[Array[Byte]](1)).toSeq.flatMap {
          case (info, sums) =>
            sums.indices.collect {
              case f if f % stride == 0 =>
                Row(id, f.toLong, info.width.toLong, info.height.toLong, sums(f))
            }
        }
      }
    }(enc)
  }

  /** FULL JPEG decode over a binary column — not just the header parse
    * of [[decodeMedia]]: Huffman entropy decode + dequantize + IDCT +
    * level shift run per asset, and the decoded payload is reduced to
    * fixed-width stats (dims, component count, exact pixel sum) so
    * downstream stages never carry pixel buffers. Undecodable payloads
    * surface with codec NULL (skip, not fail). Partition-preserving,
    * driver-free. */
  def decodeJpegStats(assets: DataFrame,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_components", LongType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Jpeg.decodeJpeg(r.getAs[Array[Byte]](1)) match {
          case Some(img) =>
            var s = 0L
            var i = 0
            while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
            Row(id, "jpeg", img.width.toLong, img.height.toLong,
              img.nComponents.toLong, s)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Image resize stage: every parseable 24bpp BMP payload is
    * nearest-neighbor downscaled by `scaleDen` (min dimension 1) via
    * [[Codecs.resizeBmp]]; everything else is dropped (corrupt or
    * non-image payloads must not fail the stage). Partition-preserving
    * mapPartitions, payloads never touch the driver — the thumbnail /
    * normalize step of an image-corpus pipeline. */
  def resizeImages(assets: DataFrame,
      scaleDen: Int = 2,
      idCol: String = "asset_id",
      bytesCol: String = "bytes"): DataFrame = {
    require(scaleDen >= 1)
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Codecs.resizeBmpScale(bytes, scaleDen).map(resized => Row(id, resized))
      }
    }(enc)
  }

  /** Audio resample stage: every parseable 16-bit PCM payload is
    * decimated by `den` ([[Codecs.resampleWav]] — the 44.1/48 kHz →
    * 16 kHz-class prep step of an ASR corpus); everything else drops
    * (the [[resizeImages]] skip discipline). Partition-preserving
    * mapPartitions, payloads never touch the driver. */
  def resampleAudio(assets: DataFrame,
      den: Int = 2,
      idCol: String = "asset_id",
      bytesCol: String = "bytes"): DataFrame = {
    require(den >= 1)
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.resampleWav(r.getAs[Array[Byte]](1), den)
          .map(resampled => Row(id, resampled))
      }
    }(enc)
  }

  /** Audio resample stage with the production low-pass: decimate-by-2
    * behind the integer half-band FIR ([[Codecs.resampleWavFir]]) —
    * anti-aliased, still bit-deterministic. Unparseable payloads drop
    * (the [[resizeImages]] skip discipline). Partition-preserving
    * mapPartitions, payloads never touch the driver. */
  def resampleAudioFir(assets: DataFrame,
      den: Int = 2,
      idCol: String = "asset_id",
      bytesCol: String = "bytes"): DataFrame = {
    Codecs.firTaps(den) // fail fast on an unsupported factor
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select(col(idCol).cast("long"), col(bytesCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Codecs.resampleWavFir(r.getAs[Array[Byte]](1), den)
          .map(resampled => Row(id, resampled))
      }
    }(enc)
  }

  /** Frame sampling: every `stride`-th frame offset (video only). */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .filter(col("modality") === "video")
      .select(
        col("asset_id"),
        filter(col("frame_offsets"), (_, i) => i % stride === 0).as("sampled_offsets"))
}
