package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions.hash64

/** KMV/theta-style distinct-value sketches with SET OPERATIONS across
  * datasets — union / intersection / difference distinct-count estimates
  * at sketch cost (the train-vs-eval overlap question the exact q74
  * semi-join and q93 Bloom answer at corpus cost). The missing
  * set-algebra member of the sketch family next to MG (heavy hitters),
  * CMS (point frequency), HLL (distinct count) and KLL (quantiles).
  *
  * The sketch is the k SMALLEST distinct [[graft.functions.Functions.hash64]]
  * values — a deterministic FUNCTION OF THE DISTINCT SET, independent of
  * row order, partitioning, and merge shape (unlike compaction sketches,
  * which are order-dependent and can only pin bounds): the sample sets
  * themselves are bit-identical in every engine under the fixed md5
  * hash, so an oracle can restate them exactly.
  *
  * Estimators (hash64 is uniform on [0, 2^60)): a full sketch estimates
  * its set's distinct count as (k−1)·2^60 / h_k (the classic KMV
  * estimator; an unfull sketch IS the distinct set — exhaustive mode);
  * a θ-cut subset (intersection/difference at θ = min(θ_A, θ_B))
  * estimates |X| as |sample|·2^60 / θ. Estimates are computed with one
  * exact double product and one divide + floor — exactly-rounded IEEE
  * ops that agree bit-for-bit across engines (the dsirWeights
  * discipline); everything else is integer. The standard theta caveat
  * holds: set-op error scales with the UNION size, not the result size
  * (RSE ≈ 1/√(k−2) of |A∪B|).
  *
  * Scale shape: one distinct-aggregate + global top-k per dataset (the
  * top-k is a TakeOrderedAndProject — k rows cross the wire per
  * partition); every set operation then runs on ≤ k-row samples.
  * Union is EXACT KMV composition (any of the k smallest of A∪B is in
  * some side's k smallest) — associative and mergeable across shards,
  * days and tables. */
object ThetaSketch {

  /** hash64 values are uniform on [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** The KMV sample: k smallest distinct hashes of `value` (column `h`). */
  def sketch(df: DataFrame, value: Column, k: Int): DataFrame =
    df.select(hash64(value).as("h")).distinct().orderBy(col("h")).limit(k)

  /** Per-group KMV samples — the family's grouped form (MG q272, HLL
    * q257, KLL q279): the k smallest distinct hashes of `value` WITHIN
    * each group, as (g, h). One distinct-aggregate + one per-group
    * window; k rows per group survive, so downstream set algebra between
    * any two groups runs on ≤ k-row samples exactly like the global
    * sketches. */
  def sketchBy(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    df.select(group.as("g"), hash64(value).as("h")).distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("g"), col("h"))
  }

  /** One row per group (g, n_sample, theta, est) — [[estimateRow]]
    * grouped: θ = h_k when the group's sample is full (estimation cut),
    * else 2^60 (exhaustive — est is the exact distinct count). */
  def estimateRowsBy(sk: DataFrame, k: Int): DataFrame =
    sk.groupBy(col("g"))
      .agg(count(lit(1)).as("n_sample"), max(col("h")).as("hmax"))
      .select(col("g"), col("n_sample"),
        when(col("n_sample") >= k, col("hmax"))
          .otherwise(lit(HashSpace)).as("theta"))
      .select(col("g"), col("n_sample"), col("theta"),
        when(col("n_sample") < k, col("n_sample"))
          .otherwise(floor(
            lit((k - 1).toDouble) * lit(HashSpace.toDouble) /
              col("theta").cast("double")).cast("long"))
          .as("est"))

  /** Exact KMV union: merge the samples, keep the k smallest. */
  def union(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).distinct().orderBy(col("h")).limit(k)

  /** Pairwise source-overlap matrix from [[sketchBy]] samples: for every
    * unordered group pair, the intersection-cardinality estimate at the
    * shared cut θ = min(θ_A, θ_B) — "which sources duplicate each
    * other", the audit a training-mix owner runs before weighting
    * sources, at sketch cost instead of |corpus|² (this is exactly what
    * the per-source samples exist for). Everything is sample-sized: the
    * common-hash join runs on ≤ k rows per group and the pair frame on
    * the |groups|-row theta table (the one crossJoin is group-count ×
    * group-count scalars, the q285 1-row-θ discipline, never data). */
  def overlapMatrix(sk: DataFrame, k: Int): DataFrame = {
    val th = sk.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hmax"))
      .select(col("g"), col("n"),
        when(col("n") >= k, col("hmax")).otherwise(lit(HashSpace)).as("theta"))
    val pairs = th.select(col("g").as("src_a"), col("n").as("na"),
        col("theta").as("ta"))
      .crossJoin(th.select(col("g").as("src_b"), col("n").as("nb"),
        col("theta").as("tb")))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("na"), col("nb"),
        least(col("ta"), col("tb")).as("theta"))
    val common = sk.select(col("g").as("src_a"), col("h"))
      .join(sk.select(col("g").as("src_b"), col("h")), "h")
      .filter(col("src_a") < col("src_b"))
      .join(pairs.select(col("src_a"), col("src_b"), col("theta")),
        Seq("src_a", "src_b"))
      .filter(col("h") < col("theta"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs.join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("na"), col("nb"),
        coalesce(col("n_common"), lit(0L)).as("n_common"), col("theta"),
        floor(coalesce(col("n_common"), lit(0L)).cast("double") *
          lit(HashSpace.toDouble) / col("theta").cast("double"))
          .cast("long").as("est_intersect"))
  }

  /** One-row (op, n_sample, theta, est) for a plain KMV sketch: θ = h_k
    * when full (estimation cut) else 2^60 (exhaustive — est is exact). */
  def estimateRow(sk: DataFrame, k: Int, op: String): DataFrame =
    sk.agg(count(lit(1)).as("n_sample"), max(col("h")).as("hmax"))
      .select(lit(op).as("op"), col("n_sample"),
        when(col("n_sample") >= k, col("hmax"))
          .otherwise(lit(HashSpace)).as("theta"))
      .select(col("op"), col("n_sample"), col("theta"),
        when(col("n_sample") < k, col("n_sample"))
          .otherwise(floor(
            lit((k - 1).toDouble) * lit(HashSpace.toDouble) /
              col("theta").cast("double")).cast("long"))
          .as("est"))

  /** Two rows — ("intersect", …) and ("diff_a_b", …) — at the shared cut
    * θ = min(θ_A, θ_B): only sample entries below BOTH thetas are
    * reliable joint evidence, and |sample|·2^60/θ estimates the true op
    * cardinality. All sample-sized joins. */
  def setOpRows(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    def thetaOf(sk: DataFrame, name: String) =
      sk.agg(count(lit(1)).as("n"), max(col("h")).as("hmax"))
        .select(when(col("n") >= k, col("hmax"))
          .otherwise(lit(HashSpace)).as(name))
    val tmin = thetaOf(a, "ta").crossJoin(thetaOf(b, "tb"))
      .select(least(col("ta"), col("tb")).as("theta"))
    def row(sample: DataFrame, op: String) =
      sample.crossJoin(tmin).filter(col("h") < col("theta"))
        .agg(count(lit(1)).as("n_sample")) // global agg: a row even when empty
        .crossJoin(tmin)
        .select(lit(op).as("op"), col("n_sample"), col("theta"),
          floor(col("n_sample").cast("double") * lit(HashSpace.toDouble) /
            col("theta").cast("double")).cast("long").as("est"))
    row(a.join(b, "h"), "intersect")
      .unionByName(row(a.join(b, Seq("h"), "left_anti"), "diff_a_b"))
  }
}
