package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.functions.{Functions => F}
import graft.operators.Dedup

/** Scratch stage-by-stage timing of the minhash-LSH pipeline. */
object ProfileQ22 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val df = Engine.table(spark, sf, "documents")
    val docs = df.select(
      col("doc_id"),
      F.shingles(F.tokens(col("text")), 3).as("sg"))
    time("shingles") { docs.count() }
    val exploded = docs.select(col("doc_id"), explode(col("sg")).as("s"))
    time("explode") { exploded.count() }
    val hashed = exploded.select(col("doc_id"), (F.hash64(col("s")) % Dedup.MinHash.P).as("x"))
    time("hash") { hashed.agg(sum("x")).collect() }
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 3, 12)
    time("signatures") { sigs.count() }
    time("full q22") {
      Dedup.minhashLsh(df, "doc_id", "text", 3, 12, 4).count()
    }
    time("full q22 again") {
      Dedup.minhashLsh(df, "doc_id", "text", 3, 12, 4).count()
    }
    spark.stop()
  }
}
