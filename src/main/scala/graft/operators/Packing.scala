package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: documents are laid out in
  * a deterministic global order, concatenated, and cut into fixed-size
  * context windows — each doc gets its global token offset, the chunk it
  * starts in, and its offset within that chunk.
  *
  * The global running sum is computed as a distributed prefix-sum, NOT a
  * single global window (which Spark would execute on one partition —
  * the classic scale trap of `Window.orderBy` with no partitionBy):
  * contiguous id ranges form buckets, each bucket computes its local
  * running sums in parallel, bucket totals (one row per bucket) get a
  * tiny driver-scale cumulative base, and the base is broadcast-joined
  * back. At 100 TB the big table is touched by exactly one
  * hash-partitioned window plus one broadcast join.
  */
object Packing {

  /** Lay out `df` rows in ascending `idCol` order and pack their token
    * counts into chunks of `capacity` tokens. Emits the input columns
    * `idCol`, `nTokensCol` plus `start_offset`, `chunk_id`,
    * `chunk_offset` (all longs).
    *
    * `bucketSpan` is the id-range width per prefix-sum bucket: ids in
    * `[i*span, (i+1)*span)` form bucket i, so buckets partition the
    * global order into contiguous runs. Size it so a bucket's rows fit
    * one task comfortably (span 2^20 at ~1k tokens/doc = ~1 GB of
    * counted tokens per bucket). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      capacity: Long,
      bucketSpan: Long = 1L << 20): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(bucketSpan > 0, s"bucketSpan must be positive, got $bucketSpan")
    val id: Column = col(idCol).cast("long")
    val n: Column = col(nTokensCol).cast("long")
    val inBucket = Window.partitionBy(col("_bucket")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df
      // integral `div` like chunk_id below: floor(double /) would round
      // ids past 2^53 across bucket boundaries
      .withColumn("_bucket", expr(s"CAST(`$idCol` AS BIGINT) div ${bucketSpan}L"))
      .withColumn("_local_off", coalesce(sum(n).over(inBucket), lit(0L)))
    // bucket totals: one row per bucket; the cumulative bases come from
    // [[Ranks.cumulativeBases]]'s broadcast triangular join — bucket
    // totals are ~(max id / span) rows, and with the join there is no
    // single-partition WindowExec anywhere in the plan
    val bases = Ranks.cumulativeBases(
      local.groupBy(col("_bucket")).agg(sum(n).as("_total")),
      "_bucket", "_total", "_base")
    local
      .join(broadcast(bases), "_bucket")
      .withColumn("start_offset", col("_base") + col("_local_off"))
      .select(
        col(idCol), n.as(nTokensCol),
        col("start_offset"),
        // integral `div`, not floor(double /): offsets past 2^53 would
        // lose precision through a double round-trip
        expr(s"start_offset div ${capacity}L").as("chunk_id"),
        expr(s"start_offset % ${capacity}L").as("chunk_offset"))
  }

  /** Curriculum packing: like [[packSequences]], but the global layout
    * order is (level asc, id asc) — documents at lower `levelCol` come
    * first, so a quality- or difficulty-ordered curriculum becomes the
    * physical token order the trainer reads. The distributed prefix-sum
    * generalizes by making the bucket key level-major:
    * `bucket = level * idStride + id div span` enumerates contiguous
    * runs of the (level, id) order, so the same local-window +
    * broadcast-bases plan applies; the bases window still touches one
    * row per non-empty bucket, never the data.
    *
    * `idStride` must exceed `max(id) div span` — it is the number of id
    * ranges reserved per level (an exceeded stride would interleave two
    * levels' buckets and corrupt the global order, hence the runtime
    * guard on the bucket column). */
  def packCurriculum(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      levelCol: String,
      capacity: Long,
      bucketSpan: Long = 1L << 20,
      idStride: Long = 1L << 20): DataFrame = {
    require(capacity > 0 && bucketSpan > 0 && idStride > 0)
    val id: Column = col(idCol).cast("long")
    val n: Column = col(nTokensCol).cast("long")
    val idBucket = expr(s"CAST(`$idCol` AS BIGINT) div ${bucketSpan}L")
    val inBucket = Window.partitionBy(col("_bucket")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df
      .withColumn("_bucket",
        when(idBucket >= idStride,
          raise_error(lit(s"idStride $idStride exceeded — raise it")).cast("long"))
          .otherwise(col(levelCol).cast("long") * lit(idStride) + idBucket))
      .withColumn("_local_off", coalesce(sum(n).over(inBucket), lit(0L)))
    val bases = Ranks.cumulativeBases(
      local.groupBy(col("_bucket")).agg(sum(n).as("_total")),
      "_bucket", "_total", "_base")
    local
      .join(broadcast(bases), "_bucket")
      .withColumn("start_offset", col("_base") + col("_local_off"))
      .select(
        col(idCol), col(levelCol), n.as(nTokensCol),
        col("start_offset"),
        expr(s"start_offset div ${capacity}L").as("chunk_id"),
        expr(s"start_offset % ${capacity}L").as("chunk_offset"))
  }
}
