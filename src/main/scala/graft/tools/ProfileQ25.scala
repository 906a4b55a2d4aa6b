package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.functions.{Functions => F}

/** Scratch stage-by-stage timing of the ngram-jaccard pipeline. */
object ProfileQ25 {
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
      struct(col("lang"), F.tokens(col("text")).getItem(0).as("tok0")).as("block"),
      transform(F.shingles(F.tokens(col("text")), 2), g => F.hash64(g)).as("grams"))
    time("gram prep (count)") { docs.count() }
    val cached = docs.cache()
    time("gram prep cached") { cached.count() }
    val a = cached.as("a"); val b = cached.as("b")
    val joined = a.join(b, col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
    time("pair join (count)") { joined.count() }
    val withJac = joined.select(
      col("a.doc_id"), col("b.doc_id"),
      round(F.jaccard(col("a.grams"), col("b.grams")), 6).as("jaccard"))
    time("pairs + jaccard") { withJac.count() }
    time("top50") { withJac.orderBy(col("jaccard").desc).limit(50).collect() }
    cached.unpersist()
    spark.stop()
  }
}
