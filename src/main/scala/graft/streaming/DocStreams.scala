package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Streaming document-pipeline stages. The per-document scoring
  * operators (quality classifier, PII redaction, language ID, …) are
  * pure column expressions, so they run UNCHANGED on a stream — same
  * code, same plan fragment, no state store. That is the deployment
  * story for a live ingest feed: the batch-validated gates apply to the
  * stream without a reimplementation, and their verdicts stay
  * bit-identical to the batch oracle because nothing depends on
  * micro-batch boundaries.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Quality gate on a document stream: keep documents whose classifier
    * logit clears 0, carrying the logit for downstream routing. */
  def qualityGate(
      docs: DataFrame,
      weights: Seq[(String, Double)],
      intercept: Double): DataFrame =
    TextAnalysis.qualityClassifier(docs, "doc_id", "text", weights, intercept)
      .filter(col("keep"))

  /** Drain helper mirroring [[EventStreams.runToMemory]] for document
    * directories. */
  def runToMemory(
      spark: SparkSession,
      dir: String,
      transform: DataFrame => DataFrame,
      queryName: String): DataFrame =
    EventStreams.drainToTable(spark, transform(readStream(spark, dir)), queryName)
}
