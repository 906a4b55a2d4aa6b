package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.operators.{Dedup, Similarity}

/** Scale probe: replicate the sf0.1 corpus Nx (with shifted ids) and
  * time the heavy operators, to observe scaling behavior beyond the
  * bench SF — near-linear growth validates the "no O(n^2) pair space"
  * claims; superlinear growth flags a blowup before it ships. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32)
    val sf = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val docs0 = Engine.table(spark, sf, "documents")
    val n0 = docs0.count()
    // replicate with id offsets AND a copy tag appended to the text, so
    // replicas are near-duplicates (realistic dedup pressure), not exact
    val docs = spark.range(mult).crossJoin(docs0)
      .select(
        (col("doc_id") + col("id") * 1000000L).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("id")).as("text"),
        col("lang"), col("source"))
      .cache()
    val n = time(s"materialize ${mult}x corpus") { docs.count() }
    println(s"docs: $n0 -> $n")
    time(s"minhash signatures ($n docs)") {
      Dedup.minhashSignatures(docs, "doc_id", "text").count()
    }
    time(s"minhash LSH candidates ($n docs)") {
      Dedup.minhashLsh(docs, "doc_id", "text").count()
    }
    time(s"simhash signatures ($n docs)") {
      Dedup.simhashSignatures(docs, "doc_id", "text").count()
    }
    val emb0 = Engine.table(spark, sf, "embeddings")
    val emb = spark.range(mult).crossJoin(emb0)
      .select(
        (col("vec_id") + col("id") * 1000000L).as("vec_id"),
        col("embedding"), col("label"))
      .cache()
    val ne = time("materialize embeddings") { emb.count() }
    time(s"LSH ANN top-5 ($ne vectors)") {
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .count()
    }
    docs.unpersist(); emb.unpersist()
    spark.stop()
  }
}
