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
