package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions.hash64

/** LAYERED entry points for the persisted graph-ANN index — the HNSW
  * structure that keeps routing hops logarithmic as the corpus grows:
  * a fixed global entry list ([[AnnIndex]]'s `entryIds`) costs the beam
  * a corpus-diameter walk at 100×, while HNSW descends a stack of
  * geometrically-shrinking layers and hands EACH QUERY its own good
  * level-0 entry point.
  *
  * Level assignment is hash-deterministic (no RNG state): node level =
  * the number of trailing base-4 zeros of the engine's md5-derived
  * [[hash64]] of `"lvl:" || id`, capped — a geometric distribution with
  * p = 1/4 per layer (HNSW's mL dial), so layer l holds ~n/4^l nodes
  * and the whole upper stack costs ~n/3 extra build volume. Per layer,
  * the members' own NN-Descent subgraph persists beside the level-0
  * graph; search descends from the single top entry (lowest id at the
  * max populated level), beam-searching each layer's subgraph seeded by
  * the layer above's result, and the final level-0 search runs
  * [[Similarity.graphSearchTopKSeeded]] from the per-query descent
  * seeds instead of a fixed id list. Serve, insert, and repair all
  * consume the same descent ([[AnnIndex.insertBatchSeeded]] /
  * [[AnnIndex.repairGraphSeeded]]).
  *
  * Persistence follows the [[AnnIndex.buildOrLoad]] artifact
  * discipline: plain parquet per part, committed behind the LAST
  * part's `_SUCCESS` (parts are written in a fixed order, so the final
  * marker gates the set), per-dir build locks for same-JVM racers.
  *
  * Scale shape: every stage is keyed joins + per-query windows over
  * beam-sized tables; layer subgraph builds are the audited
  * [[Similarity.nnDescent]] bucketed shape over geometrically smaller
  * member sets; the descent's driver artifacts are two bounded scalars
  * (max level, top entry id). */
object LayeredAnn {

  /** Deterministic geometric level: trailing base-4 zeros of
    * hash64("lvl:" || id), capped. P(level ≥ l) = 4^-l. */
  def levelColumn(id: Column, cap: Int): Column = {
    require(cap >= 1 && cap <= 8)
    val h = hash64(concat(lit("lvl:"), id.cast("string")))
    (1 to cap - 1).foldLeft(
      when(h % 4 =!= 0, lit(0))) { (acc, l) =>
      acc.when(h % lit(math.pow(4, l + 1).toLong) =!= 0, lit(l))
    }.otherwise(lit(cap))
  }

  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build-or-load the layered artifact: `levels` (id, level) and one
    * `layer_l` NN-Descent subgraph per upper level 1..cap over the
    * members with level ≥ l. The level-0 graph is the caller's
    * existing [[AnnIndex.buildOrLoad]] store — layering ADDS entry
    * structure, it does not replace the base index. */
  def buildOrLoad(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      layerK: Int,
      layerRounds: Int,
      initBuckets: Int,
      indexDir: String): Unit = {
    val spark = emb.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/layer_$cap/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    buildLocks.computeIfAbsent(indexDir, _ => new Object).synchronized {
      if (!fs.exists(marker)) {
        val lv = emb.select(col(idCol), col(vecCol),
          levelColumn(col(idCol), cap).as("level")).localCheckpoint()
        lv.select(col(idCol), col("level"))
          .write.mode("overwrite").parquet(s"$indexDir/levels")
        for (l <- 1 to cap) {
          val members = lv.filter(col("level") >= l).select(col(idCol), col(vecCol))
          val g =
            if (members.count() < 2)
              // a layer can thin out to one node at small corpora: an
              // empty subgraph is valid — descent keeps its seed
              members.limit(0).select(
                col(idCol).as("q_id"), col(idCol).as("n_id"),
                col(idCol).as("d2"), lit(1).as("rank"))
            else Similarity.nnDescent(members, idCol, vecCol,
              layerK, layerRounds, initBuckets)
          g.write.mode("overwrite").parquet(s"$indexDir/layer_$l")
        }
      }
    }
  }

  /** Descend the layer stack: start every query at the single top
    * entry (lowest id on the max populated level), beam-search each
    * layer's stored subgraph seeded by the layer above, carry the best
    * `m` per query down. Returns the (q_id, n_id) level-0 seed
    * table. */
  def descendSeeds(
      spark: SparkSession,
      indexDir: String,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      m: Int,
      beam: Int,
      rounds: Int): DataFrame = {
    val lv = spark.read.parquet(s"$indexDir/levels")
    // two bounded driver scalars: the top layer index and its entry id
    val maxL = lv.agg(max(col("level"))).head().getInt(0)
    val entry = lv.filter(col("level") === maxL)
      .agg(min(col(idCol))).head().getLong(0)
    var seeds = queries.select(col(idCol).as("q_id"))
      .withColumn("n_id", lit(entry))
    for (l <- math.min(maxL, cap) to 1 by -1) {
      val layerGraph = spark.read.parquet(s"$indexDir/layer_$l")
      val members = corpus
        .join(lv.filter(col("level") >= l).select(col(idCol)), idCol)
      val res = Similarity.graphSearchTopKSeeded(layerGraph, members,
        queries, seeds, idCol, vecCol, beam, rounds, m)
      seeds = res.select(col("q_id"), col("n_id")).localCheckpoint()
    }
    seeds
  }

  /** Layered serve: descend, then the level-0 beam search from the
    * per-query seeds. Same output shape as
    * [[Similarity.graphSearchTopK]]. */
  def searchTopK(
      spark: SparkSession,
      indexDir: String,
      graph: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cap: Int,
      m: Int,
      descBeam: Int,
      descRounds: Int,
      beam: Int,
      rounds: Int,
      k: Int): DataFrame = {
    val seeds = descendSeeds(spark, indexDir, corpus, queries,
      idCol, vecCol, cap, m, descBeam, descRounds)
    Similarity.graphSearchTopKSeeded(graph, corpus, queries, seeds,
      idCol, vecCol, beam, rounds, k)
  }
}
