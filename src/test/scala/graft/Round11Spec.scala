package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-11 locks: NN-Descent k-NN-graph construction. */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomVecs(n: Int, dims: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
        (i.toLong, Seq.fill(dims)((rnd.nextInt(255) - 127).toDouble.toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("nnDescent: per-node Σd2 is monotonically non-increasing in rounds") {
    val df = randomVecs(80, 16, seed = 7)
    def sums(rounds: Int): Map[Long, Long] =
      Similarity.nnDescent(df, "vec_id", "embedding",
          k = 4, rounds = rounds, initBuckets = 8, checkpointEvery = 1)
        .groupBy(col("q_id")).agg(sum(col("d2")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byRound = (0 to 3).map(sums)
    for (r <- 1 to 3; (id, s) <- byRound(r)) {
      // a node may be missing from an earlier round only if its init
      // bucket was a singleton — every id here has bucket-mates
      assert(s <= byRound(r - 1)(id),
        s"round $r worsened node $id: ${byRound(r - 1)(id)} -> $s")
    }
  }

  test("nnDescent climbs to near-exact recall on a low-dim instance") {
    // NN-Descent is a local search, not an exact algorithm — the lock is
    // the recall CURVE: strictly better than init, near-exact after the
    // rounds a 4-dim instance needs (the fixed seed pins determinism)
    val df = randomVecs(60, 4, seed = 11)
    val exact = Similarity.l2TopK(df, df, "vec_id", "embedding", k = 8)
    def recall(rounds: Int): Double = {
      val approx = Similarity.nnDescent(df, "vec_id", "embedding",
        k = 8, rounds = rounds, initBuckets = 6, checkpointEvery = 1)
      val r = Similarity.recallAtK(approx, exact, k = 8)
        .agg(avg(col("recall_ppm"))).head().getDouble(0)
      r / 1e6
    }
    val (r0, r5) = (recall(0), recall(5))
    assert(r5 > r0, s"rounds did not improve recall: $r0 -> $r5")
    assert(r5 >= 0.95, s"expected near-exact recall after 5 rounds, got $r5")
  }

  test("nnDescent plan: keyed joins only — no cartesian, no nested loops") {
    val emb = graft.core.Engine.table(spark, "/root/testdata/sf0.001", "embeddings")
    // checkpointEvery = 0 keeps init + the round in ONE inspectable plan
    // (the default truncates per round, hiding earlier stages)
    val p = Similarity.nnDescent(emb, "vec_id", "embedding",
        k = 5, rounds = 1, initBuckets = 16, checkpointEvery = 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in nnDescent:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in nnDescent:\n$p")
  }
}
