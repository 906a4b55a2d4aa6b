package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions.hash64

/** Deterministic sampling and train/val/test splitting for training-data
  * pipelines.
  *
  * All assignment is a pure function of (salt, id) through the engine-
  * portable md5-derived [[graft.functions.Functions.hash64]] — no RNG
  * state, no partition dependence. That is the property a 100 TB corpus
  * pipeline needs: re-runs, retries, cluster resizes, and incremental
  * additions all assign every document to the same sample/split, and the
  * assignment is reproducible in any engine (which also makes it
  * oracle-checkable, unlike `rand()`/`sampleBy`).
  *
  * [[leakageSafeSplits]] is the dedup endgame applied to splitting:
  * hashing the near-duplicate GROUP's canonical id (not the doc id)
  * guarantees no pair of near-duplicates ever straddles train/test — the
  * standard guard against split leakage inflating eval scores.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) for an id column. */
  def bucket(id: Column, salt: String, buckets: Int): Column =
    pmod(hash64(concat(lit(salt + ":"), id.cast("string"))), lit(buckets.toLong))

  /** Keep a deterministic ~`pct`% of rows (exact membership is stable
    * forever; the fraction is approximate like any hash sample). */
  def samplePct(df: DataFrame, idCol: String, pct: Int, salt: String = "sample"): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(bucket(col(idCol), salt, 100) < pct)
  }

  /** Split-label expression: train/val/test by hash bucket. */
  def splitLabel(id: Column, trainPct: Int, valPct: Int, salt: String = "split"): Column = {
    require(trainPct + valPct <= 100)
    val b = bucket(id, salt, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Assign every row a deterministic split label on its own id. */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), trainPct, valPct))

  /** Leakage-safe splits: near-duplicate pairs are resolved to groups
    * (connected components) and the split is hashed from the group's
    * canonical id, so every member of a near-dup group lands in the SAME
    * split. Docs in no group hash on their own id (they are their own
    * canonical). */
  def leakageSafeSplits(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    val canon = Dedup.resolveDuplicateGroups(pairs)
      .withColumnRenamed("doc_id", "_cc_doc")
    df
      .join(canon, df(idCol) === canon("_cc_doc"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col(idCol)))
      .drop("_cc_doc")
      .withColumn("split", splitLabel(col("canonical_id"), trainPct, valPct))
  }

  /** Training-mix construction: deterministically downsample each source
    * so the sampled corpus matches target proportions (the "data mixing"
    * step that turns raw crawls + curated sets into a pretraining mix).
    *
    * `weights` are integer parts per source (e.g. web->70, books->20,
    * code->10). The achievable total is limited by the scarcest source:
    * T = min_s floor(count_s * P / part_s) with P = sum of parts; each
    * source then contributes n_s = floor(T * part_s / P) rows, accepted
    * by the deterministic [[bucket]] hash at parts-per-million
    * resolution. All arithmetic is integer, so the plan — and the
    * oracle — is engine-exact; membership is stable across reruns and
    * cluster sizes like every other sampler here.
    *
    * Scale shape: one count-by-source aggregate (rows = #sources,
    * collected driver-side — a handful of longs), then a pure filter
    * riding the scan. No shuffle of data rows, no RNG. */
  /** Per-source acceptance plan for [[mixSources]]:
    * (source, total rows, accept parts-per-million). */
  def mixPlan(
      df: DataFrame,
      sourceCol: String,
      weights: Map[String, Long]): Seq[(String, Long, Long)] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val p = weights.values.sum
    val counts = df
      .filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(weights.keySet.subsetOf(counts.keySet),
      s"sources missing from data: ${weights.keySet -- counts.keySet}")
    val total = weights.map { case (s, w) => counts(s) * p / w }.min
    weights.toSeq.sortBy(_._1).map { case (s, w) =>
      (s, counts(s), total * w / p * 1000000L / counts(s))
    }
  }

  def mixSources(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Long],
      salt: String = "mix"): DataFrame = {
    val plan = mixPlan(df, sourceCol, weights)
    val ppmCol = plan.foldLeft(lit(-1L)) { case (acc, (s, _, ppm)) =>
      when(col(sourceCol) === s, lit(ppm)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt, 1000000) < ppmCol)
  }

  /** Per-source document cap (the "max N pages per domain" rule every
    * crawl pipeline applies so one mega-site cannot dominate the mix):
    * keep at most `cap` rows per source, chosen by the deterministic
    * hash order on the id — rerun-stable and engine-exact, where a
    * `LIMIT` inside a group would be neither. Emits the kept rows with
    * their within-source `rk`.
    *
    * Scale shape: the naive form is one `row_number` window partitioned
    * by source — a total sort of each source's rows on a single task,
    * which a Zipf-hot domain turns into a straggler. This runs the
    * standard two-level top-k instead: rows first rank within
    * (source, salt-bucket) partitions — bounded at rows/`saltBuckets`
    * per task — and only the per-bucket top `cap` survivors (≤
    * cap × saltBuckets rows per source, independent of domain size)
    * enter the final per-source ranking. Any row outside its bucket's
    * top `cap` cannot be in the source's top `cap` under the same total
    * order, so the two-phase result is exactly the one-phase result. */
  /** Token-budget sampling: keep documents per source, in deterministic
    * hash order, while the running token total stays within `budget` —
    * "take ~1B tokens from each source", the volume-based sibling of the
    * row-count [[perSourceCap]]. Inclusive rule: a document is kept iff
    * the running sum THROUGH it is ≤ budget.
    *
    * Scale shape: the running sum is a distributed prefix-sum, not one
    * window per source. The 60-bit document hash is both the sample
    * order and the bucket key (`bucket = h >> (60 - log2 buckets)`, an
    * order-preserving range split of the hash space — and a bit shift,
    * because 2^60 exceeds double's 2^53 exact-integer range so a
    * float division would mis-bucket), so each (source, bucket) cumsums
    * locally, bucket totals roll up to per-source bases (sources ×
    * buckets rows — broadcast scale), and base + local = the exact
    * global prefix sum. Same pattern as sequence packing (q68), applied
    * to a hash order instead of an id order. */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weightCol: String,
      budget: Long,
      salt: String = "budget",
      buckets: Int = 64): DataFrame = {
    require(budget > 0 && buckets >= 2 && (buckets & (buckets - 1)) == 0,
      "budget must be positive and buckets a power of two")
    import org.apache.spark.sql.expressions.Window
    val shift = 60 - (63 - java.lang.Long.numberOfLeadingZeros(buckets.toLong))
    val h = hash64(concat(lit(salt + ":"), col(idCol).cast("string")))
    val rows = df.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      col(weightCol).cast("long").as("w"),
      h.as("h"), shiftrightunsigned(h, shift).as("b"))
    val wLocal = Window.partitionBy(col("source"), col("b"))
      .orderBy(col("h"), col("doc_id"))
    val local = rows.withColumn("cs", sum(col("w")).over(wLocal))
    // per-(source, bucket) totals -> running base of all EARLIER buckets
    val wBase = Window.partitionBy(col("source")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = rows.groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("bt"))
      .withColumn("base", coalesce(sum(col("bt")).over(wBase), lit(0L)))
      .select(col("source"), col("b"), col("base"))
    local
      .join(broadcast(bases), Seq("source", "b"))
      .filter(col("base") + col("cs") <= budget)
      .select(col("doc_id"), col("source"),
        (col("base") + col("cs")).as("cum_tokens"))
  }

  /** Exact-quota stratified sample: keep exactly `floor(n_g * ppm / 1e6)`
    * rows from each stratum g, chosen by the deterministic hash order on
    * the id — the exact-allocation sibling of [[samplePct]]/[[mixSources]],
    * whose `bucket(id) < ppm` filter hits the target fraction only in
    * expectation. Use this when the quota must be exact (fixed-size eval
    * sets, per-class budgets); use the ppm filter when a ±binomial-noise
    * fraction is fine, because exactness has a real cost at scale: the
    * within-stratum rank is a sort-based window per stratum (Spark
    * range-partitions the sort, but a Zipf-hot stratum still pays its
    * full sort), where the ppm filter rides the scan with zero shuffle.
    * Emits kept rows with their stratum quota. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      ppm: Long,
      salt: String = "strat"): DataFrame = {
    require(ppm >= 0 && ppm <= 1000000, s"ppm in [0, 1e6], got $ppm")
    import org.apache.spark.sql.expressions.Window
    val h = hash64(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol))
    df.withColumn("_rk", row_number().over(w.orderBy(h.asc, col(idCol).asc)))
      .withColumn("_cnt", count(lit(1)).over(w))
      // `div`, not `/`: Column./ on longs is double division in Spark
      .withColumn("quota", expr(s"(_cnt * $ppm) div 1000000"))
      .filter(col("_rk") <= col("quota"))
      .drop("_rk", "_cnt")
  }

  def perSourceCap(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int,
      salt: String = "cap",
      saltBuckets: Int = 16): DataFrame = {
    require(cap >= 1 && saltBuckets >= 1)
    import org.apache.spark.sql.expressions.Window
    val h = hash64(concat(lit(salt + ":"), col(idCol).cast("string")))
    val wLocal = Window
      .partitionBy(col(sourceCol), pmod(h, lit(saltBuckets.toLong)))
      .orderBy(h.asc, col(idCol).asc)
    val wGlobal = Window.partitionBy(col(sourceCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("_lrk", row_number().over(wLocal))
      .filter(col("_lrk") <= cap)
      .drop("_lrk")
      .withColumn("rk", row_number().over(wGlobal).cast("bigint"))
      .filter(col("rk") <= cap)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis, IPL 2006 "exponential race"): each row gets the key
    * `-ln(u)/w` with u uniform in (0,1] derived from hash64(salt:id) —
    * the k smallest keys are a weight-proportional sample, the pipeline
    * step that draws a token-budget subset biased toward high-quality /
    * long documents. Hash-derived u keeps the draw reproducible across
    * re-runs, retries and engines (and oracle-checkable, unlike rand()).
    *
    * The key surfaces as integer nanos (`floor(1e9·key)`) with the id as
    * tie-break, so the selection order is integer-deterministic; u is
    * deterministic across engines not because the long→double conversion
    * is exact (above 2^53 it rounds) but because Spark, DuckDB, and the
    * JVM all apply the identical IEEE round-to-nearest conversion to the
    * identical hash-derived long — and ln/division/multiply are likewise
    * exactly-specified IEEE ops, making a flipped floor a ≲1e-10
    * coincidence per row rather than an engine disagreement.
    *
    * Scale shape: a pure per-row projection followed by sort-limit —
    * Spark plans TakeOrderedAndProject (per-partition top-k, then a
    * k-row merge on the driver), NOT a full sort: one scan, no shuffle
    * of the corpus, k rows of driver memory. */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "es"): DataFrame = {
    val u = (hash64(concat(lit(salt + ":"), col(idCol).cast("string"))) + 1)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    // non-positive weights are excluded up front: they carry zero
    // selection mass (the w→0 limit of the race key is +∞), and left in
    // they would otherwise produce Infinity/NaN keys that engines floor
    // differently (Spark → Long.MaxValue under ansi=false, ANSI engines
    // error) or, for w<0, always-winning negative keys
    df.filter(col(weightCol) > 0)
      .withColumn("es_key_nano",
        floor(-log(u) / col(weightCol).cast("double") * lit(1e9)))
      .orderBy(col("es_key_nano"), col(idCol))
      .limit(k)
  }
}
