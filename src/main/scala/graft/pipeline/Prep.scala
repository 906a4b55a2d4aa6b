package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** The end-to-end training-data prep pipeline (q88's composition) as a
  * product surface: read a documents table, quality-filter, exact-dedup
  * (keep the lowest id per content group), cap documents per source,
  * assign deterministic train/val/test splits, and write the result
  * partitioned by split. Every stage is one of the catalog operators, so
  * the whole run is rerun-stable: the same input always produces the
  * same splits, byte for byte.
  *
  * Scale shape: the stages chain scan-side filters and key-partitioned
  * aggregates; nothing collects to the driver except the final report
  * (rows = sources × splits). The split-partitioned write is the layout
  * a training job reads back with zero filtering.
  */
object Prep {

  val defaultWeights: Seq[(String, Double)] = Seq(
    "n_tokens" -> 0.02, "mean_token_len" -> 0.3,
    "punct_ratio" -> -20.0, "stopword_ratio" -> 4.0)

  /** Run the pipeline over a parquet documents table with columns
    * (doc_id, text, source, ...). Writes parquet under
    * `outDir/split=train|val|test/` and returns the per-(source, split)
    * report. */
  def run(
      spark: SparkSession,
      inPath: String,
      outDir: String,
      cap: Int = 100,
      weights: Seq[(String, Double)] = defaultWeights,
      intercept: Double = -2.5,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    val docs = spark.read.parquet(inPath)
    val kept = docs.join(
      TextAnalysis.qualityClassifier(docs, "doc_id", "text", weights, intercept)
        .filter(col("keep")).select(col("doc_id")), "doc_id")
    val deduped = kept.join(
      Dedup.exactGroups(kept, "doc_id", "text")
        .select(col("keep_id").as("doc_id")), "doc_id")
    val capped = Sampling.perSourceCap(deduped, "doc_id", "source", cap)
    val split = Sampling.assignSplits(capped, "doc_id", trainPct, valPct)
    split.write.mode("overwrite").partitionBy("split").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))
  }
}
