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
          val (w, h) = FakeCodec.dims(bytes)
          val frames = FakeCodec.frameCount(bytes, modality)
          val offsets = (0 until frames).map(i => i.toLong * 100)
          Row(id, modality, bytes.length.toLong, w, h, frames, offsets,
            FakeCodec.feature(bytes).toSeq)
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
