package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Deduplication operators for large text corpora.
  *
  * Algorithms follow the published formulations: MinHash resemblance
  * estimation (Broder, "On the resemblance and containment of
  * documents", 1997) with banded LSH candidate generation (Leskovec/
  * Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3), and SimHash
  * (Charikar, "Similarity estimation techniques from rounding
  * algorithms", 2002) as used for near-duplicate web documents
  * (Manku/Jain/Sarma, WWW'07).
  *
  * All signature math is built on the engine-portable [[graft.functions.Functions.hash64]]
  * (md5-derived) so results are bit-reproducible across engines — that is
  * what makes these operators oracle-checkable, and at 100 TB it also makes
  * incremental dedup runs stable across Spark versions (Spark's internal
  * `hash()` is not a cross-version contract).
  *
  * Scale notes: every op here is one shuffle (groupBy doc or join on
  * bucket key); candidate generation never materializes the O(n^2) pair
  * space — pairs only exist within an LSH band bucket / blocking key.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct value of `cols`. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact-duplicate groups by content hash: (fingerprint, n_docs, min id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** MinHash universal-hash family over the prime P = 2^31-1: minhash j
    * of a doc is `min over shingles of (a(j) * (md5hash64(s) % P) + b(j)) % P`.
    * One md5 per shingle (not per shingle x seed); the per-seed work is
    * pure integer arithmetic, safe from 64-bit overflow (a, x < P so
    * a*x + b < 2^62) — which also makes it expressible in any ANSI engine
    * for the oracle. Coefficients derive from md5 of fixed strings, so
    * they are reproducible constants, not RNG state. */
  object MinHash {
    val P: Long = 2147483647L
    val sentinel: Long = Long.MaxValue // empty shingle set
    def a(j: Int): Long = (md5Hash64Jvm(s"minhash_a:$j") % (P - 1)) + 1
    def b(j: Int): Long = md5Hash64Jvm(s"minhash_b:$j") % P
  }

  /** Per-document MinHash signatures: (doc_id, sig array<long>).
    *
    * Shape chosen for scale: explode shingles -> one codegen'd md5 per
    * shingle -> groupBy(doc) with `numHashes` codegen'd min-aggregates.
    * No per-row array lambdas (Spark evaluates higher-order functions
    * interpreted, which was 10x slower here), and partial aggregation
    * does the min map-side so the shuffle carries one row per doc. */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12): DataFrame = {
    // hash-repartition on doc_id BEFORE the CPU-heavy shingle/hash work:
    // a single-file input otherwise runs the whole pipeline in one task,
    // and the groupBy(doc_id) below reuses this partitioning (no second
    // shuffle). On a many-file 100 TB input AQE coalesces this exchange.
    val docs = df
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .repartition(col("doc_id"))
      .select(
        col("doc_id"),
        wordShingles(col("_text"), shingleN).as("sg"))
    val x = hash64(col("s")) % MinHash.P
    val mins = docs
      .select(col("doc_id"), explode(col("sg")).as("s"))
      .select(col("doc_id"), x.as("x"))
      .groupBy(col("doc_id"))
      .agg(
        min((col("x") * MinHash.a(0) + MinHash.b(0)) % MinHash.P).as("m0"),
        (1 until numHashes).map(j =>
          min((col("x") * MinHash.a(j) + MinHash.b(j)) % MinHash.P).as(s"m$j")): _*)
    // docs whose shingle set is empty (fewer than n tokens) keep a
    // sentinel signature
    docs
      .select(col("doc_id"))
      .join(mins, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        array((0 until numHashes).map(j =>
          coalesce(col(s"m$j"), lit(MinHash.sentinel))): _*).as("sig"))
  }

  /** Band a signature frame: (doc_id, sig) -> (doc_id, sig, band, bkey). */
  private def bandSignatures(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(
      col("doc_id"),
      col("sig"),
      explode(
        array((0 until bands).map { b =>
          struct(
            lit(b).as("band"),
            concat_ws("_", slice(col("sig"), b * rows + 1, rows).cast("array<string>")).as("bkey"))
        }: _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bkey").as("bkey"))
  }

  /** Pairwise estimated jaccard (fraction of matching minhash positions)
    * between two banded sides, joined on the band key. Unrolled
    * per-position comparison (codegen'd): the zip_with/aggregate HOF form
    * runs interpreted per pair, which dominates when the corpus genuinely
    * contains many near-duplicates. */
  private def bandPairs(a0: DataFrame, b0: DataFrame, numHashes: Int): DataFrame = {
    val a = a0.as("a")
    val b = b0.as("b")
    val matches = (0 until numHashes)
      .map(i => when(col("a.sig").getItem(i) === col("b.sig").getItem(i), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        round(matches.cast("double") / numHashes, 6).as("est_jaccard"))
      .distinct()
  }

  /** MinHash + LSH near-duplicate candidates.
    *
    * signatures -> `bands` bands of `numHashes/bands` rows -> docs sharing
    * any band bucket are candidates. Output: (doc_a, doc_b, est_jaccard)
    * where est_jaccard is the fraction of matching minhashes. Join is on
    * the band key (shuffle, no cartesian).
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // materialize signatures once (localCheckpoint): the band self-join
    // consumes them on both sides (probe + broadcast build), which would
    // otherwise recompute the whole shingle+hash pipeline twice. One
    // compact row per doc; the checkpoint is scoped to this call's plan
    // (reclaimed with it by the ContextCleaner), so concurrent minhashLsh
    // calls cannot evict each other — unlike a shared cache slot.
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, numHashes).localCheckpoint()
    val banded = bandSignatures(sigs, numHashes, bands)
    bandPairs(banded, banded, numHashes)
  }

  /** Incremental MinHash-LSH: near-dup candidates between a NEW ingest
    * batch and an existing corpus, given the corpus's stored signatures —
    * the daily-ingest shape at 100 TB: signatures are computed once per
    * document ever (write [[minhashSignatures]] output to a table at
    * ingest), and each new batch only hashes itself and band-joins
    * against the stored bands. Emits (new x corpus) and (new x new)
    * pairs; (corpus x corpus) pairs were already known.
    *
    * `corpusSigs` must be (doc_id, sig) with the same shingleN/numHashes
    * family the corpus was built with. */
  def minhashLshIncremental(
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      corpusSigs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val newSigs =
      minhashSignatures(newDf, idCol, textCol, shingleN, numHashes).localCheckpoint()
    minhashLshIncrementalFromSigs(newSigs, corpusSigs, numHashes, bands)
  }

  /** As [[minhashLshIncremental]], but with the new batch's signatures
    * already computed — the shape a continuous-ingest pipeline uses,
    * where each batch's signatures are computed once and both joined
    * against the store and appended to it. */
  def minhashLshIncrementalFromSigs(
      newSigs: DataFrame,
      corpusSigs: DataFrame,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val newBands = bandSignatures(newSigs, numHashes, bands)
    val allBands = bandSignatures(corpusSigs, numHashes, bands)
      .unionByName(newBands)
    bandPairs(allBands, newBands, numHashes)
  }

  /** Per-document SimHash signature (`bits` wide, default 32): bit j is
    * set iff the sum over distinct tokens of (+1/-1 for token-hash bit j)
    * is positive. Same explode -> codegen'd-aggregate shape as
    * [[minhashSignatures]]: one md5 per distinct token, `bits` sum
    * aggregates with map-side partials. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash bits must be in [1, 64], got $bits")
    // hash64 carries 60 bits (its top 4 are always 0 — they would vote
    // every signature bit >= 60 to constant 0); wider signatures use the
    // full-width digest hash
    val tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (bits > 60) hash64Full else hash64
    val h = df
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .repartition(col("doc_id")) // distribute CPU work; reused by groupBy
      .select(col("doc_id"), explode(array_distinct(tokens(col("_text")))).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h"))
    val votes = h
      .groupBy(col("doc_id"))
      .agg(
        sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as("v0"),
        (1 until bits).map(j =>
          sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
            .as(s"v$j")): _*)
    votes.select(
      col("doc_id"),
      (0 until bits)
        .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _)
        .as("simhash"))
  }

  /** Split `bits` signature bits into `numChunks` contiguous chunks,
    * widest first: Seq of (shift, width). */
  private[operators] def chunkBounds(bits: Int, numChunks: Int): Seq[(Int, Int)] = {
    val base = bits / numChunks
    val extra = bits % numChunks
    val widths = Seq.tabulate(numChunks)(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths).map { case (shift, w) => (shift, w) }
  }

  /** The multi-table blocking keys for a hamming-radius-`r` search
    * (Manku/Jain/Sarma, WWW'07): the signature is split into `numChunks`
    * chunks; a pair differing in <= r bits touches <= r chunks, so some
    * (numChunks - r)-subset of chunks is identical on both sides — one
    * blocking table per subset, keyed on that subset's chunk values,
    * guarantees every such pair shares a bucket in at least one table.
    * Returns (tableId, packedKey) structs for exploding. */
  private def simhashTableKeys(
      sig: org.apache.spark.sql.Column,
      bits: Int,
      numChunks: Int,
      maxHamming: Int): Seq[org.apache.spark.sql.Column] = {
    require(numChunks > maxHamming,
      s"numChunks ($numChunks) must exceed maxHamming ($maxHamming)")
    val bounds = chunkBounds(bits, numChunks)
    def chunk(i: Int): org.apache.spark.sql.Column = {
      val (shift, w) = bounds(i)
      shiftright(sig, shift).bitwiseAND((1L << w) - 1)
    }
    val subsets = bounds.indices.combinations(numChunks - maxHamming).toSeq
    subsets.zipWithIndex.map { case (ss, ti) =>
      // pack the subset's chunk values into one long, each shifted by its
      // own width (chunk widths vary when numChunks doesn't divide bits)
      val packed = ss.tail.foldLeft(chunk(ss.head)) { (acc, i) =>
        acc * (1L << bounds(i)._2) + chunk(i)
      }
      struct(lit(ti).as("tbl"), packed.as("tkey"))
    }
  }

  /** SimHash near-duplicate pairs within a hamming radius.
    *
    * Candidate generation is the multi-table permuted-chunk scheme above:
    * C(numChunks, numChunks - maxHamming) blocking tables, each a bucket
    * join on ~(bits * (1 - r/numChunks)) key bits. Unlike a single
    * top-bits block, recall at hamming <= maxHamming is GUARANTEED — the
    * result is exactly the all-pairs hamming ball, computed without the
    * quadratic self-join (the q24 oracle is the brute-force all-pairs
    * query for precisely that reason). The explode factor (20 tables for
    * bits=32, r=3, chunks=6) is the published recall/cost dial; at 100 TB
    * the join stays linear-ish because each table's key space (~16 bits
    * here, more with 64-bit sigs) keeps buckets small. */
  def simhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32,
      numChunks: Int = 6,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol, bits)
    // Collapse identical signatures into classes BEFORE the table join:
    // dedup corpora are dominated by exact-dup clusters, and a g-doc
    // cluster would otherwise contribute g^2 join rows through EVERY
    // blocking table. Classes make the join touch each distinct signature
    // once per table; doc-level pairs are expanded only at the end —
    // output-sized work (any pair-LISTING operator is quadratic in class
    // size by definition; pipelines that only need groups should feed
    // classes straight into resolveDuplicateGroups instead).
    val classes = sigs
      .groupBy(col("simhash"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .localCheckpoint() // consumed by three branches below
    // hamming-0 pairs: all doc pairs within a class
    val within = classes
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0).cast("integer").as("hamming"))
    // cross-class candidates: multi-table bucket join over UNIQUE sigs
    val keyed = classes.select(
      col("simhash"), col("docs"),
      explode(array(simhashTableKeys(col("simhash"), bits, numChunks, maxHamming): _*))
        .as("t"))
      .select(col("simhash"), col("docs"), col("t.tbl").as("tbl"), col("t.tkey").as("tkey"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    val cross = a
      .join(b, col("a.tbl") === col("b.tbl") && col("a.tkey") === col("b.tkey") &&
        col("a.simhash") < col("b.simhash"))
      .select(
        col("a.simhash").as("sa"), col("b.simhash").as("sb"),
        col("a.docs").as("da"), col("b.docs").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("sa", "sb") // a class pair can collide in several tables
      .select(explode(col("da")).as("x"), col("db"), col("hamming"))
      .select(col("x"), explode(col("db")).as("y"), col("hamming"))
      .select(
        least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"),
        col("hamming"))
    within.unionByName(cross)
  }

  /** Resolve near-duplicate pairs into groups: connected components over
    * the pair graph, labeling every member with the smallest doc id in
    * its component (the canonical survivor).
    *
    * Iterative min-label propagation — the standard shuffle-based
    * connected-components pattern: each round joins labels across edges
    * and keeps the minimum, converging in O(diameter) rounds (near-dup
    * components are small, so a handful). Each round is one shuffle;
    * `localCheckpoint` truncates the growing lineage. */
  def resolveDuplicateGroups(
      pairs: DataFrame,
      maxIterations: Int = 15): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .distinct()
      .cache()
    var labels = edges.select(col("u").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val nbrMin = edges
        .join(labels, edges("v") === labels("doc_id"))
        .groupBy(col("u"))
        .agg(min(col("label")).as("nbr_label"))
      // convergence rides the SAME job that materializes the round
      // (localCheckpoint is a Dataset action, so the observed metric is
      // filled in when it runs) — no separate join + isEmpty job per
      // iteration, which doubled the cost of every round
      val obs = new org.apache.spark.sql.Observation(s"cc_round_$iter")
      val next = labels
        .join(nbrMin, labels("doc_id") === nbrMin("u"), "left")
        .select(
          col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("nbr_label") < col("label")).cast("long").as("_changed"))
        .observe(obs, sum(coalesce(col("_changed"), lit(0L))).as("n_changed"))
        .drop("_changed")
        .localCheckpoint()
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      labels = next
      iter += 1
    }
    edges.unpersist(blocking = false)
    labels.select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** Alternating large-star / small-star connected components (Kiveris/
    * Lattanzi/Mirrokni/Rastogi/Vassilvitskii, "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round rewires edges toward
    * per-neighborhood minima, converging in O(log^2 n) rounds regardless
    * of graph DIAMETER — the scale alternative to [[resolveDuplicateGroups]]'s
    * min-label propagation, whose round count is the component diameter
    * (fine for clustered near-dup graphs, pathological for chain-shaped
    * ones: crawl-link graphs, record-linkage chains). Same output
    * contract: every node labeled with its component's minimum id.
    *
    * Each round is two shuffles (neighborhood min + rewire); convergence
    * detection rides the round's own materialization via `Observation`
    * fingerprints (edge count + id sums + an order-independent hash sum),
    * no extra comparison job. */
  def resolveDuplicateGroupsStar(
      pairs: DataFrame,
      maxIterations: Int = 25): DataFrame = {
    val u = col("u"); val v = col("v")
    def bidir(e: DataFrame): DataFrame =
      e.union(e.select(v.as("u"), u.as("v")))
    // large-star: every neighbor larger than u links to the minimum of
    // u's closed neighborhood
    def largeStar(e: DataFrame): DataFrame = {
      val m = bidir(e).groupBy(u).agg(least(min(v), first(u)).as("m"))
      bidir(e).join(m, "u")
        .filter(v > u)
        .select(v.as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // small-star: u and its not-larger neighbors all link to their min
    def smallStar(e: DataFrame): DataFrame = {
      val sm = bidir(e).filter(v <= u)
      val m = sm.groupBy(u).agg(least(min(v), first(u)).as("m"))
      sm.join(m, "u").select(v.as("u"), col("m").as("v"))
        .union(m.select(u, col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    val nodes = bidir(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .select(u.as("doc_id")).distinct().localCheckpoint()
    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var prevFp: (Long, Long, Long, Long) = (-1L, 0L, 0L, 0L)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val obs = new org.apache.spark.sql.Observation(s"ccstar_round_$iter")
      val next = smallStar(largeStar(edges))
        .observe(obs,
          count(lit(1)).as("cnt"),
          coalesce(sum(col("u")), lit(0L)).as("su"),
          coalesce(sum(col("v")), lit(0L)).as("sv"),
          coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)).as("sh"))
        .localCheckpoint()
      val fp = (
        obs.get("cnt").asInstanceOf[Long], obs.get("su").asInstanceOf[Long],
        obs.get("sv").asInstanceOf[Long], obs.get("sh").asInstanceOf[Long])
      converged = fp == prevFp
      prevFp = fp
      // superseded round's edge blocks die with the new checkpoint
      // (same targeted LogicalRDD unpersist as Graph.pagerank — never
      // a context-global sweep)
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(edges)
      edges = next
      iter += 1
    }
    // a non-converged exit would return intermediate (non-star) edges as
    // labels — silently wrong output; fail loudly instead. O(log^2 n)
    // rounds means the default cap covers any physically storable graph.
    require(converged,
      s"large-star/small-star did not converge within $maxIterations rounds")
    // converged state is a star per component, rooted at the min id
    val mapping = edges.select(u.as("doc_id"), v.as("canonical_id"))
    nodes
      .join(mapping, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs inside a blocking
    * key (cheap equality blocking keeps the pair space linear-ish).
    *
    * Shape notes: grams are hashed to a compact long array per doc before
    * the pair join (8-byte comparisons, ~5x smaller shuffle than strings);
    * jaccard uses one intersect per pair with |union| = |a|+|b|-|inter|.
    * A fully-exploded alternative (join on (block, gram) rows, count per
    * pair) was measured SLOWER and skews worse: a hot gram shared by all
    * docs in a block makes that join quadratic per gram, while here the
    * pair space is bounded by the blocking alone. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[org.apache.spark.sql.Column],
      shingleN: Int = 2,
      minJaccard: Double = 0.0): DataFrame = {
    val docs = df
      .repartition(col(idCol)) // distribute gram hashing + pair work
      .select(
        col(idCol).as("doc_id"),
        struct(blockCols: _*).as("block"),
        transform(wordShingles(col(textCol), shingleN), g => hash64(g)).as("grams"))
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.grams"), col("b.grams"))).as("li"),
        (size(col("a.grams")) + size(col("b.grams"))).as("stot"))
      .select(
        col("doc_a"), col("doc_b"),
        round(
          when(col("stot") === col("li"), when(col("li") === 0, 0.0).otherwise(1.0))
            .otherwise(col("li").cast("double") / (col("stot") - col("li"))),
          6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exact n-gram Jaccard on an externally-supplied candidate pair set —
    * the scale-correct shape for corpus-wide near-dup scoring: candidate
    * REDUCTION first (MinHash-LSH band collisions, already sub-quadratic),
    * exact verification second. Unlike equality blocking on a natural key
    * (language, first token, ...), the pair space is bounded by the LSH
    * parameters rather than by the Zipf skew of the blocking key, so no
    * single hot block can go quadratic at 100x the corpus.
    *
    * `candidates` must have (doc_a, doc_b) columns; grams are hashed to
    * longs once per doc and the candidate set hash-joins against that
    * gram table twice. */
  def ngramJaccardOnCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int = 2,
      minJaccard: Double = 0.0): DataFrame = {
    gramPairStats(df, idCol, textCol, candidates, shingleN)
      .select(
        col("doc_a"), col("doc_b"),
        col("li"), (col("na") + col("nb")).as("stot"))
      .select(
        col("doc_a"), col("doc_b"),
        round(
          when(col("stot") === col("li"), when(col("li") === 0, 0.0).otherwise(1.0))
            .otherwise(col("li").cast("double") / (col("stot") - col("li"))),
          6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Shared per-candidate-pair gram statistics for the exact scorers
    * ([[ngramJaccardOnCandidates]], [[containmentOnCandidates]]): grams
    * hashed to longs once per doc, the candidate set hash-joined
    * against that table twice, emitting (doc_a, doc_b,
    * li = |G(a) ∩ G(b)|, na = |G(a)|, nb = |G(b)|). */
  private def gramPairStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int): DataFrame = {
    val docs = df
      .repartition(col(idCol)) // distribute gram hashing
      .select(
        col(idCol).as("doc_id"),
        transform(wordShingles(col(textCol), shingleN), g => hash64(g)).as("grams"))
    candidates
      .select(col("doc_a"), col("doc_b"))
      .join(docs.select(col("doc_id").as("doc_a"), col("grams").as("ga")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("grams").as("gb")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("li"),
        size(col("ga")).cast("long").as("na"),
        size(col("gb")).cast("long").as("nb"))
  }

  /** Exact n-gram CONTAINMENT on an externally-supplied candidate pair
    * set: C(a→b) = |G(a) ∩ G(b)| / |G(a)| — the doc-in-doc / quotation
    * metric resemblance misses (Broder's resemblance-vs-containment
    * split, SEQUENCES'97): a short document embedded whole in a long
    * one scores containment ≈ 1 while its Jaccard stays near
    * |G(a)|/|G(b)| — exactly the pairs a Jaccard-thresholded dedup
    * keeps as "different" although one adds no new content. Both
    * directions surface per pair as integer ppm
    * (`floor(1e6 · |∩| / |G|)`, exact under the hash gate); an empty
    * gram side scores 0 (nothing to contain).
    *
    * Scale shape: identical to [[ngramJaccardOnCandidates]] — grams
    * hashed once per doc, the candidate set hash-joins that table
    * twice, per-pair work bounded by candidate volume (LSH-bounded,
    * not corpus-quadratic). */
  def containmentOnCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int = 2): DataFrame = {
    def ppm(li: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      when(n === 0L, 0L).otherwise(
        org.apache.spark.sql.graftbridge.Bridge.integralDivide(
          li * lit(1000000L), n))
    gramPairStats(df, idCol, textCol, candidates, shingleN)
      .select(
        col("doc_a"), col("doc_b"),
        ppm(col("li"), col("na")).as("cont_a_ppm"),
        ppm(col("li"), col("nb")).as("cont_b_ppm"))
  }

  /** Prefix-filter candidate generation for threshold-Jaccard self-join
    * (the SSJoin/PPJoin family: Chaudhuri/Ganti/Kaushik ICDE'06,
    * Bayardo/Ma/Srikant WWW'07, Xiao/Wang/Lin/Yu WWW'08). Orders every
    * doc's gram set by ascending document frequency (rarest first; gram
    * value tie-break) and keeps only the first `n - ceil(t*n) + 1` grams:
    * two sets with Jaccard >= t MUST share at least one prefix gram under
    * any common global order, so joining on prefix grams (plus the length
    * filter `|y| >= t*|x|`) yields a candidate set with GUARANTEED recall
    * at threshold t — the exact-threshold alternative to MinHash-LSH
    * candidates, whose recall is only probabilistic.
    *
    * Scale shape: df-count is one shuffle; the rarest-first order makes
    * prefix buckets small by construction (a gram appearing in k docs
    * contributes at most C(k,2) candidate pairs and rare grams dominate
    * prefixes), unlike natural-key blocking where one Zipf-hot block goes
    * quadratic. */
  /** The materialized prefix table feeding both sides of the candidate
    * self-join: per doc, its grams rarest-first with rank and set size,
    * truncated to the `n - ceil(t*n) + 1` prefix. Package-visible so
    * the profiling/spec path can time the build separately from the
    * join.
    *
    * Cost attribution (sf0.1 documents, t=0.5, warm, local[32]): the
    * full ppjoinJaccard splits ~45% this build (gram explode + df
    * groupBy + df join + two doc windows + checkpoint), ~25% the
    * candidate self-join with the positional bound (125k candidate
    * pairs out), ~30% the gram-array verification (256 true pairs out)
    * — inherent and output-sensitive, no single hot spot. The one
    * tempting rewrite — computing df as `count(*) OVER (PARTITION BY
    * g)` to fuse the groupBy and the join into one shuffle — is
    * rejected for scale: a window partition is buffered whole, so one
    * Zipf-hot gram (df in the millions at 100 TB) becomes a
    * multi-million-row in-memory partition, whereas the groupBy+join
    * pair is skew-splittable by AQE. */
  private[graft] def prefixTable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double): DataFrame = {
    // the domain check lives with the prefix arithmetic it protects:
    // t=0 would keep EVERY gram (the quadratic candidate space the
    // prefix filter exists to avoid) and t>1 an empty table — callers
    // reaching prefixTable directly get the same fail-fast as the
    // public entry point
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    val docGram = df
      .repartition(col(idCol))
      .select(
        col(idCol).as("doc_id"),
        explode(array_distinct(transform(wordShingles(col(textCol), shingleN), g => hash64(g))))
          .as("g"))
    val dfreq = docGram.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
    val ordered = docGram
      .join(dfreq, "g")
      .select(
        col("doc_id"), col("g"),
        row_number().over(w.orderBy(col("df"), col("g"))).as("rk"),
        count(lit(1)).over(w).as("n"))
    // materialize once: the prefix table feeds BOTH sides of the
    // self-join below, and its lineage (gram explode + df join + two
    // windows) would otherwise execute twice when exchange reuse doesn't
    // line up — same rationale as minhashLsh's signature checkpoint
    ordered
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("g"), col("rk"), col("n"))
      .localCheckpoint()
  }

  def prefixFilterCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double): DataFrame = {
    val prefix = prefixTable(df, idCol, textCol, shingleN, threshold)
    val a = prefix.as("a")
    val b = prefix.as("b")
    // positional filter (the bound that makes this PPJoin, not just
    // prefix filtering): both docs' grams follow the SAME global order,
    // so at the pair's globally-FIRST shared prefix gram — positions
    // (i, j), found as min(struct(rk_a, rk_b)) since the global min is
    // simultaneously rank-minimal on both sides — no shared gram
    // precedes it and every other shared gram follows it on both sides:
    //   overlap <= 1 + min(n_a - i, n_b - j).
    // Jaccard >= t needs overlap >= ceil(t/(1+t) * (n_a + n_b)); pairs
    // whose bound can't reach it are pruned before the (expensive)
    // gram-array verification join.
    a.join(b,
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= ceil(lit(threshold) * col("a.n")) &&
          col("a.n") >= ceil(lit(threshold) * col("b.n")))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(min(struct(
        col("a.rk").as("ia"), col("b.rk").as("jb"),
        col("a.n").as("na"), col("b.n").as("nb"))).as("f"))
      .filter(
        lit(1) + least(col("f.na") - col("f.ia"), col("f.nb") - col("f.jb")) >=
          ceil(lit(threshold) / (lit(1.0) + lit(threshold)) *
            (col("f.na") + col("f.nb"))))
      .select(col("doc_a"), col("doc_b"))
  }

  /** Exact threshold-Jaccard self-join: prefix-filter candidates, then
    * exact verification — every pair with jaccard >= threshold, none
    * missed (unlike the LSH path), no all-pairs join. */
  def ppjoinJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double): DataFrame =
    ngramJaccardOnCandidates(
      df, idCol, textCol,
      prefixFilterCandidates(df, idCol, textCol, shingleN, threshold),
      shingleN, minJaccard = threshold)

  /** Embedding near-duplicate pairs: block on provided columns plus a
    * 4-bit sign-bucket of the leading dimensions, then exact cosine. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val signBucket = (0 until 4)
      .map(j => when(col(vecCol).getItem(j) > 0f, 1 << j).otherwise(0))
      .reduce(_ + _)
    val docs = df.select(
      col(idCol).as("vec_a_id"),
      struct(blockCols :+ signBucket.as("sb"): _*).as("block"),
      col(vecCol).as("v"))
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.vec_a_id") < col("b.vec_a_id"))
      .select(
        col("a.vec_a_id").as("vec_a"),
        col("b.vec_a_id").as("vec_b"),
        round(graft.functions.Functions.cosineSim(col("a.v"), col("b.v")), 6).as("cos"))
  }

  /** Content-defined chunk fingerprinting — the dedup that catches
    * PARTIAL overlap (boilerplate headers, quoted blocks, mirrored
    * passages) which whole-document MinHash/SimHash verdicts miss. The
    * token stream is cut where the token's [[graft.functions.Functions.hash64]]
    * is 0 mod `divisor` (the order-1 analog of Rabin/gear content-defined
    * chunking, Muthitacharoen et al. SOSP'01): boundaries move WITH the
    * content, so an insertion early in a document does not reflow every
    * later chunk the way fixed-width shingling would. Expected chunk
    * length is `divisor` tokens. A chunk is "shared" when its fingerprint
    * appears in at least one OTHER document.
    *
    * Returns one row per document: (doc_id, n_chunks, n_shared_chunks,
    * dup_ratio). Scale shape: explode -> per-doc running boundary count
    * (window over the doc partition) -> chunk aggregation -> one global
    * fingerprint-frequency shuffle. Nothing is quadratic: pair space
    * never materializes at all — sharing is a group-count on the
    * fingerprint key, so Zipf-hot boilerplate chunks cost rows, not
    * rows^2. */
  def chunkDupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      divisor: Int = 8): DataFrame = {
    require(divisor >= 1, s"divisor must be >= 1, got $divisor")
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .repartition(col(idCol))
      .select(
        col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // a boundary token STARTS a new chunk; tokens before the first
    // boundary form chunk 0
    val chunks = toks
      .withColumn("chunk",
        sum(when(pmod(hash64(col("tok")), lit(divisor)) === 0, 1L).otherwise(0L)).over(w))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(hash64(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("fp"))
    val freq = chunks.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    chunks
      .join(freq, "fp")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_chunks"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
        floor(lit(1e6) *
          (col("n_shared_chunks").cast("double") / col("n_chunks")))
          .cast("long").as("dup_ppm"))
  }

  /** Maximal cross-document duplicated spans: for every document, the
    * maximal token ranges whose every `k`-token window also appears in
    * at least `minDocs - 1` OTHER documents — substring-level exact
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL'22, which removes shared >= 50-token spans
    * found via suffix arrays). The suffix-array construction is
    * replaced by the shuffle-native equivalent: hash every k-token
    * window ([[graft.functions.Functions.hash64]] over the
    * space-joined window, positions from `posexplode` of the ordered
    * window list), count distinct documents per window hash, keep
    * positions whose hash is shared, and merge overlapping/adjacent
    * windows (gap <= k) into maximal spans with one gaps-and-islands
    * pass per document. A shared run of m >= k tokens appears as
    * m - k + 1 consecutive shared windows and merges back into the
    * single [start, start + m - 1] span.
    *
    * Returns (doc_id, span_start, span_end, span_tokens, n_windows),
    * positions 1-based token indexes, span_end inclusive.
    *
    * Scale shape: windows table is one row per token (O(corpus
    * tokens), never pairs); the window-hash frequency is one
    * map-side-partial groupBy; membership is a semi-join on the hash
    * (AQE broadcasts it when the duplicated-hash set is small); island
    * numbering is a per-document window over the doc-hashed layout —
    * state bounded by document length, nothing driver-side. Self-
    * repetition inside one document does NOT create a span
    * (countDistinct >= minDocs is across documents); q76 covers
    * within-doc repetition. */
  def duplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"window must be >= 1 token, got $k")
    require(minDocs >= 2, s"a span shared by < 2 docs is not a duplicate (got $minDocs)")
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(
        col(idCol).as("doc_id"),
        posexplode(wordShingleSeq(col(textCol), k)).as(Seq("pos", "gram")))
      // 1-based positions: token index, aligned with SQL subscripting
      .select(
        col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        hash64(col("gram")).as("h"))
    val dup = grams
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    val hits = grams.join(dup, Seq("h"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // windows [pos, pos+k-1] and [prev, prev+k-1] merge when
    // pos - prev <= k (overlap or exact adjacency); first row per doc
    // (lag null) starts an island via otherwise(1)
    hits
      .withColumn("newi",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
      .withColumn("island", sum(col("newi")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(
        col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
  }

  /** Apply substring-level dedup: rewrite the corpus with duplicated
    * spans REMOVED everywhere except one canonical occurrence — the
    * action [[duplicateSpans]] reports. Per shared window hash the
    * owner is the minimum doc_id containing it (deterministic, no
    * RNG); every other document drops the k tokens each non-owned
    * shared window covers (overlapping windows union into exactly the
    * maximal spans). The owner keeps its text for that window intact,
    * so every duplicated passage survives in exactly the lowest-id
    * document that carries it — Lee et al.'s keep-one-occurrence rule
    * at document granularity.
    *
    * Returns one row per input document: (doc_id, n_tokens,
    * n_removed, text_clean) — text_clean is the space-join of the
    * kept tokens in order ('' when everything was removed).
    *
    * Scale shape: windows/tokens are O(corpus tokens) rows; ownership
    * is one more column on the same window-hash aggregate
    * [[duplicateSpans]] already pays; covered positions explode each
    * removable window to k rows (bounded k× blowup on REMOVABLE
    * windows only, not the corpus); the rebuild is a per-doc
    * sort-aggregate whose state is one document's tokens — the same
    * bound every per-doc operator here carries. */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"window must be >= 1 token, got $k")
    require(minDocs >= 2, s"a span shared by < 2 docs is not a duplicate (got $minDocs)")
    val grams = df
      .select(
        col(idCol).as("doc_id"),
        posexplode(wordShingleSeq(col(textCol), k)).as(Seq("pos", "gram")))
      .select(
        col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        hash64(col("gram")).as("h"))
    // one aggregate yields both the dup verdict and the owner
    val owners = grams
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"), min(col("doc_id")).as("owner"))
      .filter(col("nd") >= minDocs)
      .select(col("h"), col("owner"))
    val removable = grams
      .join(owners, "h")
      .filter(col("doc_id") =!= col("owner"))
    // every token position a removable window covers, deduplicated
    val covered = removable
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .distinct()
    val toks = df
      .select(
        col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("tpos"), col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok")), " ").as("text_clean"))
    // fully-removed docs vanish from `kept` — left join restores them
    // with an empty rewrite. n_tokens is the token-STREAM length
    // (split counts an empty text as one empty token, same as
    // string_split) so n_removed = n_tokens - n_kept is exact by
    // construction
    df.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
