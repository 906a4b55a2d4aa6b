package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.operators.Dedup

/** Scratch: where does minhash-LSH time go on a duplicate-dense corpus? */
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32)
    val sf = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val docs0 = Engine.table(spark, sf, "documents")
    val docs = spark.range(mult).crossJoin(docs0)
      .select(
        (col("doc_id") + col("id") * 1000000L).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("id")).as("text"))
      .cache()
    docs.count()
    import graft.functions.{Functions => F}
    val sh = docs.select(col("doc_id"), F.shingles(F.tokens(col("text")), 3).as("sg"))
    time("shingle arrays (force w/ size)") {
      sh.select(sum(size(col("sg")))).collect()
    }
    val expl = sh.select(col("doc_id"), explode(col("sg")).as("s"))
    time("explode count") { expl.count() }
    time("explode + hash") {
      expl.select(col("doc_id"), (F.hash64(col("s")) % 2147483647L).as("x"))
        .agg(sum("x")).collect()
    }
    val sigs = time("signatures full") {
      val s = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
      s.count(); s
    }
    val rows = 3
    val banded = sigs.select(
      col("doc_id"),
      explode(array((0 until 4).map { bnd =>
        struct(
          lit(bnd).as("band"),
          concat_ws("_", slice(col("sig"), bnd * rows + 1, rows).cast("array<string>"))
            .as("bkey"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bkey")).cache()
    time("banding") { banded.count() }
    val pairs = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
    val np = time("raw pair join count") { pairs.count() }
    println(s"raw candidate rows: $np")
    time("distinct pairs") {
      pairs.select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    spark.stop()
  }
}
