package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Round-14 locks: keyed (loop-free) sharded ANN serving, sharded-store
  * CDC, rational polyphase resampling, MP4 container walk, VP8L. */
class Round14Spec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------------
  // Keyed sharded serving (the loop-free q314/q316 restatement)
  // ------------------------------------------------------------------

  test("cellEntryPoints: each cell's lowest ids, as one table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val assigned = Seq(
      (10L, 0L), (3L, 0L), (7L, 0L), (20L, 1L), (15L, 1L), (99L, 2L))
      .toDF("vec_id", "cell")
      .withColumn("embedding", array(lit(1.0f)))
    val e = graft.operators.AnnIndex
      .cellEntryPoints(assigned, "vec_id", entriesPerCell = 2)
      .orderBy("cell", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq == Seq((0L, 3L), (0L, 7L), (1L, 15L), (1L, 20L), (2L, 99L)))
  }

  test("sharded serving survives routing to an absent/empty cell " +
      "(trained quantizers can leave cells empty)") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents).localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_shard").toString + "/idx"
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8, indexDir = dir)
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 14)
    val routedReal = graft.operators.Similarity.ivfProbeCells(
      queries, "vec_id", "embedding", cents, nprobe = 1)
    // the empty-cell scenario: the same queries ALSO routed to cell 9,
    // which has no shard, no members, no entry points
    val routedPlus = routedReal.unionByName(
      routedReal.withColumn("cell", lit(9L)))
    val base = graft.operators.AnnIndex.shardedSearchTopK(index, assigned,
      routedReal, "vec_id", "embedding", entriesPerCell = 2,
      beam = 8, rounds = 2, k = 3).orderBy("q_id", "rank").collect()
    val plus = graft.operators.AnnIndex.shardedSearchTopK(index, assigned,
      routedPlus, "vec_id", "embedding", entriesPerCell = 2,
      beam = 8, rounds = 2, k = 3).orderBy("q_id", "rank").collect()
    assert(base.nonEmpty)
    // the phantom cell contributes no candidates and crashes nothing
    assert(plus.toSeq == base.toSeq)
  }

  test("sharded serving of an empty query batch returns typed-empty") {
    val spark = TestSpark.spark
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    val cents = graft.operators.Similarity
      .ivfCentroids(emb, "vec_id", "embedding", 0L until 4L)
    val assigned = graft.operators.Similarity
      .ivfAssign(emb, "vec_id", "embedding", cents)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_shard_empty").toString + "/idx"
    val index = graft.operators.AnnIndex.buildOrLoadSharded(assigned,
      "vec_id", "embedding", nCells = 4, graphK = 5, graphRounds = 2,
      initBuckets = 8, indexDir = dir)
    val routed = graft.operators.Similarity.ivfProbeCells(
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", cents, nprobe = 2)
    val out = graft.operators.AnnIndex.shardedSearchTopK(index, assigned,
      routed, "vec_id", "embedding", entriesPerCell = 2,
      beam = 8, rounds = 2, k = 3)
    assert(out.columns.toSeq == Seq("q_id", "n_id", "d2", "rank"))
    assert(out.count() == 0)
  }
}
