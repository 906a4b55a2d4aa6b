package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs): these run
  * inside the parquet scan stage, so a 100 TB corpus pays one pass and no
  * shuffle for per-document scoring.
  */
object TextAnalysis {

  /** Tiny deterministic stopword lists per language for n-gram-overlap
    * language ID. (Real lists would be larger; the operator shape — score
    * per language inside one projection, argmax — is what matters.) */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un"))

  // counts surface as BIGINT to match ANSI engines (DuckDB len/length)
  private def overlapCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t))).cast("bigint")

  /** Language-ID scores + argmax prediction (first language wins ties in
    * declaration order; 'und' when no word matches). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = df.select(
      col(idCol).as("doc_id") +:
        langWords.map { case (lang, ws) => overlapCount(toks, ws).as(s"score_$lang") }: _*)
    val best = langWords.map { case (l, _) => col(s"score_$l") }.reduce(greatest(_, _))
    // earlier languages win ties (fold from the right so the leftmost
    // matching WHEN ends up outermost)
    val pred = langWords.reverse.foldLeft(lit("und")) { case (acc, (l, _)) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Per-document quality metrics: char/token counts, mean token length,
    * punctuation ratio, stopword ratio. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val stop = langWords.toMap.apply("en")
    // ratios surface as integer PPM (floor(1e6 · n/m)), not round(x, 6):
    // round()'s half-boundary ties are engine-dependent (decimal-repr
    // HALF_UP vs binary), while division, the 1e6 multiply, and floor
    // are each exactly rounded — bit-identical everywhere
    df.select(
      col(idCol).as("doc_id"),
      length(t).cast("bigint").as("n_chars"),
      size(toks).cast("bigint").as("n_tokens"),
      floor(lit(1e6) *
        (aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          size(toks))).cast("long").as("mean_token_len_ppm"),
      floor(lit(1e6) *
        ((length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") /
          length(t))).cast("long").as("punct_ratio_ppm"),
      floor(lit(1e6) * (overlapCount(toks, stop).cast("double") / size(toks)))
        .cast("long").as("stopword_ratio_ppm"))
  }

  /** Fixed-weight linear quality classifier — the model-based quality
    * filter of the CCNet/FastText recipe, with offline-trained weights
    * supplied as literals so serving is a pure column expression over
    * the [[qualityScore]] features (zero shuffle, whole-stage codegen).
    * Emits the LOGIT, not the sigmoid: exp() is a libm call whose last
    * ulp differs across engines, while a dot product of 6dp-rounded
    * features with literal weights is exactly evaluated everywhere;
    * thresholding the logit at 0 is the same decision sigmoid >= 0.5
    * makes. `weights` is ordered — the accumulation tree is built in
    * sequence so both engines evaluate the identical expression.
    *
    * The logit surfaces as INTEGER MICRO-UNITS (`floor(logit * 1e6)`),
    * not a 6dp-rounded double: `round()` of a double sitting exactly on
    * a half-boundary is engine-dependent (HALF_UP on decimal repr vs
    * binary rounding — observed flipping a real sf0.1 document), while
    * IEEE multiply + floor is exactly rounded everywhere. `micros >= 0`
    * is the same verdict `logit >= 0` makes. */
  def qualityClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[(String, Double)],
      intercept: Double): DataFrame = {
    // ppm features are rescaled back to ratios by an exact division —
    // weights stay in natural (ratio) units
    def feature(f: String): Column =
      if (f == "n_tokens" || f == "n_chars") col(f).cast("double")
      else col(s"${f}_ppm").cast("double") / lit(1e6)
    val logit = weights.foldLeft(lit(intercept)) { case (acc, (f, w)) =>
      acc + lit(w) * feature(f)
    }
    val micros = floor(logit * lit(1e6)).cast("long")
    qualityScore(df, idCol, textCol)
      .select(col("doc_id"), micros.as("logit_micros"),
        (micros >= 0L).as("keep"))
  }

  /** Token counts: whitespace tokens and a BPE-ish `[a-z0-9]+` word-piece
    * regex count. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("bigint").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z0-9]+"), lit(0))).cast("bigint")
        .as("re_tokens"))

  /** Document fingerprints: raw content hash + order-insensitive
    * bag-of-words hash (sorted distinct tokens). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol).as("doc_id"),
      hash64(col(textCol)).as("content_fp"),
      hash64(concat_ws(" ", array_sort(array_distinct(toks)))).as("bow_fp"))
  }

  /** Per-(doc, term) TF-IDF scores over whitespace tokens.
    *
    * Shape: explode -> (doc, term) counts with map-side partials, document
    * frequencies as a second aggregate over the term table, corpus size
    * broadcast as a one-row frame — two shuffles total, nothing collected.
    *
    * `rationalIdf = true` replaces `ln((N+1)/(df+1)) + 1` with the
    * rational `(N+1)/(df+1)`: IEEE division is exactly rounded and
    * therefore bit-identical across engines, while libm `log` is only
    * ~1-ulp accurate and can differ between runtimes — the rational
    * variant is what the DuckDB oracle checks; the classic log form is
    * the production default. */
  def tfIdf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rationalIdf: Boolean = false): DataFrame = {
    val terms = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms
      .groupBy(col("term"))
      .agg(count(lit(1)).as("dfq")) // terms is unique per (doc, term)
    val total = df.select(count(lit(1)).as("n_docs"))
    val rawIdf =
      (col("n_docs") + lit(1)).cast("double") / (col("dfq") + lit(1))
    val idf = if (rationalIdf) rawIdf else log(rawIdf) + lit(1.0)
    terms
      .join(docFreq, "term")
      .crossJoin(broadcast(total))
      .select(
        col("doc_id"), col("term"), col("tf"),
        round(col("tf") * idf, 6).as("tfidf"))
  }

  /** Per-(doc, term) Okapi BM25 scores (Robertson & Spärck Jones
    * probabilistic relevance framework) — the retrieval-scoring sibling
    * of [[tfIdf]] for search/RAG over a curated corpus. `k1` tunes term-
    * frequency saturation, `b` document-length normalization.
    *
    * Same two-shuffle shape as tfIdf plus a doc-length join; corpus
    * stats (N, total length) broadcast as a one-row frame.
    *
    * `rationalIdf = true` drops the `ln` from
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`: every remaining op
    * (+, -, *, /) is exactly rounded in IEEE so the score is
    * bit-identical across engines when the expression tree matches —
    * that variant is what the DuckDB oracle checks. The classic log
    * form is the production default. */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      rationalIdf: Boolean = false): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
    val docLen = toks.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    val terms = toks
      .select(col("doc_id"), explode(col("ts")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = terms.groupBy(col("term")).agg(count(lit(1)).as("dfq"))
    val stats = docLen.select(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val avgdl = col("tot_dl").cast("double") / col("n_docs")
    val rawIdf = (col("n_docs") - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5))
    val idf = if (rationalIdf) rawIdf else log(lit(1.0) + rawIdf)
    val norm = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)
    terms
      .join(docFreq, "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"), col("term"), col("tf"),
        round(idf * (col("tf") * lit(k1 + 1)) / norm, 6).as("bm25"))
  }

  /** BM25 top-k retrieval: score every document against a free-text
    * query (sum of per-term BM25 over the query's distinct tokens) and
    * return the k best. The query is tokenized driver-side (it is one
    * short string); scoring stays fully distributed — the term filter
    * reaches the (doc, term) aggregate as an `isin` predicate, so only
    * query-term rows survive the scoring joins. Per-doc summation is
    * exact (6dp inputs summed as DECIMAL), so ranking is deterministic
    * and engine-reproducible under `rationalIdf`. */
  def bm25Search(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryText: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      rationalIdf: Boolean = false): DataFrame = {
    val queryTerms = queryText.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(queryTerms.nonEmpty, "bm25Search requires a non-empty query")
    bm25(df, idCol, textCol, k1, b, rationalIdf)
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"))
      .agg(
        round(sum(col("bm25").cast("decimal(18,6)")), 6).cast("double").as("score"),
        count(lit(1)).as("n_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Benchmark-contamination check: for each eval document, how much of
    * it already appears in the training corpus (the standard n-gram-
    * overlap test-set-leakage audit run before every pretraining run).
    *
    * Shape: the train side is reduced to its DISTINCT n-gram hash set
    * (one shuffle, map-side partials collapse the heavy duplication);
    * the eval side explodes to (doc, gram-hash) and LEFT SEMI-joins the
    * train set to count hits. Joining on the 64-bit gram hash instead of
    * the gram string keeps shuffle rows fixed-width — at 100 TB the
    * train gram set is far larger than memory, so this must be a
    * shuffle hash/SMJ join, never a broadcast, and a semi join ships no
    * payload back. Nothing is ever collected.
    */
  def contamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame = {
    import graft.functions.Functions.wordShingles
    val trainGrams = train
      .select(explode(wordShingles(col(textCol), shingleN)).as("g"))
      .select(hash64(col("g")).as("gh"))
      .distinct()
    // wordShingles is distinct per doc already, so (doc_id, gh) needs no
    // extra global distinct (which would cost a shuffle)
    val evalGrams = eval
      .select(col(idCol).as("doc_id"),
        explode(wordShingles(col(textCol), shingleN)).as("g"))
      .select(col("doc_id"), hash64(col("g")).as("gh"))
    val hits = evalGrams
      .join(trainGrams, Seq("gh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
    evalGrams
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        floor(lit(1e6) *
          (coalesce(col("n_overlap"), lit(0L)).cast("double") / col("n_grams")))
          .cast("long").as("contamination_ppm"))
  }

  /** Intra-document repetition metrics — the quality signal that catches
    * boilerplate/spam documents whose *tokens* are ordinary but whose
    * structure is a loop (nav bars, keyword stuffing, generation loops).
    *
    * One codegen'd [[graft.functions.TokenRepetition]] pass per document
    * (zero shuffle — rides the parquet scan like the other quality
    * scores). The composed higher-order-function form was 10+x slower:
    * Spark runs HOF lambdas interpreted, and the per-distinct-token
    * occurrence count is O(distinct x tokens) per doc. */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = graft.functions.Functions.tokenRepetition(col(textCol))
    df.select(col(idCol).as("doc_id"), st.as("_st"))
      .select(
        col("doc_id"),
        col("_st").getItem(0).as("n_tokens"),
        col("_st").getItem(1).as("n_distinct"),
        floor(lit(1e6) *
          (col("_st").getItem(1).cast("double") / col("_st").getItem(0)))
          .cast("long").as("distinct_ratio_ppm"),
        col("_st").getItem(2).as("max_token_freq"),
        when(col("_st").getItem(3) === 0L, lit(0L)).otherwise(
          floor(lit(1e6) * (lit(1.0) -
            col("_st").getItem(4).cast("double") / col("_st").getItem(3)))
            .cast("long"))
          .as("dup_bigram_ppm"))
  }

  /** PII patterns shared by [[redactPii]] and its oracle: RE2-safe (no
    * backreferences/lookaround) so Spark (java.util.regex) and any
    * RE2-family engine (DuckDB, Hyperscan scrubbers) compile the same
    * automaton. Order matters: SSN before phone, or the phone pattern
    * eats `123-45-6789`'s tail. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "\\+?[0-9]{3}[ -][0-9]{3}[ -][0-9]{4}", "<PHONE>"))

  /** PII redaction for training corpora: replace emails / SSNs / phone
    * numbers with typed placeholder tokens and count what was removed
    * (the counts feed the pipeline's compliance report). Pure
    * `regexp_replace`/`regexp_extract_all` column expressions — one
    * codegen'd pass over the scan, zero shuffle, no UDF. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, token)) => regexp_replace(c, pat, token)
    }
    val countCols = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("bigint")
        .as(s"n_$name")
    }
    df.select(
      col(idCol).as("doc_id") +: redacted.as("redacted") +: countCols: _*)
  }

  /** Bigram-LM likelihood scoring (the KenLM-style fluency filter of the
    * CCNet recipe, reduced to its order-2 core): train MLE bigram
    * probabilities P(b|a) = C(a,b)/C(a·) on the corpus itself, then score
    * each document by the sum of its bigrams' probabilities. Repetitive /
    * templated text scores high, rare-garbage text scores low — the
    * complement of [[repetitionScore]] (which only sees within-document
    * structure, while this sees corpus-global frequency).
    *
    * Each per-bigram probability becomes `floor(1e6 * C(a,b) / C(a·))`
    * micro-units: long-long division through double is exactly rounded,
    * floor is exact, and the per-document SUM is then integer — order-
    * free and bit-identical in any engine (a double sum would depend on
    * summation order, which no distributed engine pins).
    *
    * Scale shape: one explode pass emits the bigram stream; C(a,b) is a
    * hash aggregate with map-side partials; C(a·) aggregates the (much
    * smaller) distinct-bigram table, not the stream; the model join
    * attaches scores to distinct bigrams first, so the occurrence stream
    * is joined exactly once, keyed (a,b). Nothing driver-side; model size
    * is vocabulary-bounded, not corpus-bounded. */
  /** Per-source dataset-card statistics: doc count, token volume,
    * char-length min/max and exact lower-median / p90 — the report a
    * training-mix decision is made from. Quantiles are computed from the
    * (source, length) HISTOGRAM, not a per-source row sort: the window
    * walks distinct lengths (cardinality-bounded, thousands), so a
    * Zipf-hot source costs an aggregate, never a single-task sort of
    * its rows. The quantile rule is integer (`k*cum >= q*n` on counts) —
    * no interpolation, engine-exact.
    *
    * Quantile q at denominator k = smallest length whose running count
    * reaches ceil(q/k * n): lower median for (1,2), p90 for (9,10). */
  def corpusStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
      col(sourceCol).as("source"),
      size(tokens(col(textCol))).cast("bigint").as("ntok"),
      length(col(textCol)).cast("bigint").as("nch"))
    val agg = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("ntok")).as("n_tokens"),
      min(col("nch")).as("min_chars"),
      max(col("nch")).as("max_chars"))
    val w = Window.partitionBy(col("source")).orderBy(col("nch"))
    val cum = base.groupBy(col("source"), col("nch"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .join(agg.select(col("source"), col("n_docs")), "source")
    def quantile(num: Int, den: Int, name: String) =
      cum.filter(col("cum") * den >= col("n_docs") * num)
        .groupBy(col("source")).agg(min(col("nch")).as(name))
    agg
      .join(quantile(1, 2, "median_chars"), "source")
      .join(quantile(9, 10, "p90_chars"), "source")
  }

  /** Positional inverted index: one (tok, doc_id, pos) row per token
    * occurrence — the index layout phrase and proximity search run on.
    * Persist it partitioned/bucketed by `tok` and every query below
    * touches only its terms' slices. */
  def positionalIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("tok"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Exact phrase search over a [[positionalIndex]]: documents containing
    * the tokens consecutively, with occurrence counts. Each phrase term
    * selects its index slice (at scale: a partition-pruned read, rows =
    * that term's postings); consecutive terms chain on
    * (doc_id, pos + i) equi-joins, so the work is bounded by the RAREST
    * term's postings flowing through keyed joins — the classic
    * merge-postings plan, no scan of the corpus text. */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val first = index.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(
          index.filter(col("tok") === w)
            .select(col("doc_id"), (col("pos") - lit(i.toLong)).as("p0")),
          Seq("doc_id", "p0"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Cluster labeling via rational c-TF-IDF (the BERTopic labeling step
    * with the log dropped — libm log is not bit-portable, and ranking is
    * invariant to the monotone transform within a cluster for the
    * rare-term regime this surfaces): score(term, cluster) =
    * (tf_c / tokens_c) · (n_clusters / df_c), in integer ppm. Emits the
    * `topK` highest-scoring terms per cluster — the human-readable label
    * of each slice of the corpus.
    *
    * Scale shape: one (cluster, term) hash aggregate over the exploded
    * stream; df and cluster sizes aggregate the (much smaller) distinct
    * table; n_clusters is a broadcast scalar; per-cluster ranking
    * windows over the term table, not the corpus. */
  def clusterTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      clusterCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(clusterCol).as("cluster"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("cluster"), col("tok")).agg(count(lit(1)).as("tf"))
    val ct = tf.groupBy(col("cluster")).agg(sum(col("tf")).as("cluster_tokens"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_c"))
    val nc = tf.select(col("cluster")).distinct().count()
    val score = floor(
      lit(1e6) * (col("tf").cast("double") / col("cluster_tokens").cast("double")) *
        (lit(nc.toDouble) / col("df_c").cast("double"))).cast("long")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score_ppm").desc, col("tok").asc)
    tf.join(broadcast(ct), "cluster")
      .join(dfc, "tok")
      .withColumn("score_ppm", score)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("cluster"), col("rank"), col("tok"), col("tf"), col("score_ppm"))
  }

  /** Proximity (NEAR/w) search over a [[positionalIndex]]: documents
    * where `termA` and `termB` occur within `window` positions of each
    * other, in either order, with the pair count. Same postings-join
    * shape as [[phraseSearch]] — the range predicate rides a doc_id
    * equi-join, so pair work is bounded by the two terms' postings
    * co-located per document, never a corpus scan. */
  def proximitySearch(
      index: DataFrame,
      termA: String,
      termB: String,
      window: Int): DataFrame = {
    require(window >= 1)
    val a = index.filter(col("tok") === termA)
      .select(col("doc_id"), col("pos").as("pa"))
    val b = index.filter(col("tok") === termB)
      .select(col("doc_id"), col("pos").as("pb"))
    a.join(b, Seq("doc_id"))
      .filter(abs(col("pa") - col("pb")) <= window && col("pa") =!= col("pb"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), min(abs(col("pa") - col("pb"))).as("min_dist"))
  }

  /** Blocklist filter: per document, how many tokens hit a blocked-term
    * list and the keep/drop verdict — the safety/compliance gate of a
    * crawl pipeline. Small lists fold into the scan as a literal-array
    * membership test (zero shuffle, codegen); `maxInline` guards the
    * expression size, beyond it the list becomes a broadcast semi-join —
    * same verdicts, still no corpus shuffle. */
  def blocklistFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blocked: Seq[String],
      maxInline: Int = 256): DataFrame = {
    require(blocked.nonEmpty)
    val toks = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
    val hits =
      if (blocked.length <= maxInline)
        toks.select(col("doc_id"),
          when(array_contains(array(blocked.map(lit): _*), col("tok")), 1L)
            .otherwise(0L).as("hit"))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val bl = blocked.toDF("tok").withColumn("blocked", lit(1L))
        toks.join(broadcast(bl), Seq("tok"), "left")
          .select(col("doc_id"), coalesce(col("blocked"), lit(0L)).as("hit"))
      }
    hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("hit")).as("n_blocked"))
      .select(col("doc_id"), col("n_tokens"), col("n_blocked"),
        (col("n_blocked") === 0L).as("keep"))
  }

  /** (word index, 32-bit mask) Bloom probe `k` for a gram column. Words
    * are 32-bit so the mask shift never reaches an engine's sign bit
    * (shifting into bit 63 is an error in some engines, so a 64-bit-word
    * Bloom would not be oracle-portable). */
  private def bloomProbe(g: Column, k: Int, bits: Int): (Column, Column) = {
    val pos = pmod(hash64(concat(lit(s"bloom$k:"), g)), lit(bits.toLong))
    (shiftrightunsigned(pos, 5),
      call_function("shiftleft", lit(1L), pmod(pos, lit(32L)).cast("int")))
  }

  /** Bloom filter of a gram set: `bits` bits as `bits/32` packed words,
    * `hashes` md5-family probes per gram. Deterministic (no seeds), so a
    * filter built anywhere — any engine, any partitioning — is the same
    * words, and membership is oracle-checkable. Returns (word, bits). */
  def bloomFilter(grams: DataFrame, gramCol: String, bits: Int, hashes: Int): DataFrame = {
    require(bits % 32 == 0 && hashes >= 1)
    grams.select(explode(array((0 until hashes).map { k =>
        val (w, m) = bloomProbe(col(gramCol), k, bits)
        struct(w.as("word"), m.as("mask"))
      }: _*)).as("p"))
      .groupBy(col("p.word").as("word"))
      .agg(expr("bit_or(p.mask)").as("bits"))
  }

  /** Bloom-filter decontamination scan: build a [[bloomFilter]] from the
    * EVAL suite's n-grams (KBs, broadcast), then flag every train
    * document whose grams probe into it — per doc (n_grams, n_flagged,
    * flag_ratio). Flags are a superset of [[contamination]]'s exact
    * overlap (false positives possible, false negatives IMPOSSIBLE — a
    * present gram always has all its bits set), which is the right
    * failure mode for a decontamination pre-filter: the flagged slice is
    * re-checked exactly, the unflagged 99% is passed untouched.
    *
    * Scale shape: at 100 TB the exact semi-join ships every train gram
    * hash through a shuffle keyed on gram; this streams the corpus past
    * a constant-size broadcast bitset — zero shuffle on the train side
    * until the tiny flagged remainder. */
  def bloomContamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bits: Int = 4096,
      hashes: Int = 2): DataFrame = {
    import graft.functions.Functions.wordShingles
    val evalGrams = eval
      .select(explode(wordShingles(col(textCol), shingleN)).as("g")).distinct()
    val filter = bloomFilter(evalGrams, "g", bits, hashes)
    val probes = train
      .select(col(idCol).as("doc_id"),
        explode(wordShingles(col(textCol), shingleN)).as("g"))
      .select(col("doc_id"), col("g"),
        explode(array((0 until hashes).map { k =>
          val (w, m) = bloomProbe(col("g"), k, bits)
          struct(w.as("word"), m.as("mask"))
        }: _*)).as("p"))
      .select(col("doc_id"), col("g"), col("p.word").as("word"), col("p.mask").as("mask"))
    val perGram = probes
      .join(broadcast(filter), Seq("word"), "left")
      .groupBy(col("doc_id"), col("g"))
      .agg(min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0L, 1L)
        .otherwise(0L)).as("all_set"))
    perGram.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("all_set")).as("n_flagged"))
      .select(col("doc_id"), col("n_grams"), col("n_flagged"),
        floor(lit(1e6) * (col("n_flagged").cast("double") / col("n_grams")))
          .cast("long").as("flag_ppm"))
  }

  /** Count-Min sketch of the corpus token stream (Cormode & Muthukrishnan
    * '05): `depth` rows of `width` counters; occurrence of token t adds 1
    * to cell `hash64("cms<r>:" + t) mod width` in every row r. The whole
    * sketch is `depth × width` longs — FIXED memory however large the
    * vocabulary, which is the point at 100 TB: exact token counts need a
    * vocabulary-sized shuffle, the sketch needs one map-side-combined
    * aggregate into ~1k cells. Hashes are the engine-portable md5 family,
    * so the sketch itself is deterministic and oracle-checkable (no
    * RNG-seeded hash functions).
    *
    * Returns (r, cell, cnt). */
  def countMinSketch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2)
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"),
          pmod(hash64(concat(lit(s"cms$r:"), col("tok"))), lit(width.toLong))
            .as("cell"))
      }: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[countMinSketch]]: est(t) = min over rows of
    * the token's cell count — an overestimate by at most the collision
    * mass, never an underestimate. `queries` is (tok); the sketch and the
    * query set are both tiny, so the lookup is a broadcast join. */
  def cmsEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val probes = queries.select(col("tok"),
      explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"),
          pmod(hash64(concat(lit(s"cms$r:"), col("tok"))), lit(width.toLong))
            .as("cell"))
      }: _*)).as("rc"))
      .select(col("tok"), col("rc.r").as("r"), col("rc.cell").as("cell"))
    probes.join(broadcast(sketch), Seq("r", "cell"))
      .groupBy(col("tok"))
      .agg(min(col("cnt")).as("est"))
  }

  /** Corpus vocabulary: the `size` most frequent tokens, ties broken by
    * token text so the cut is a total order (a count-only cut would be
    * nondeterministic at the boundary). Plans as hash-aggregate +
    * TakeOrderedAndProject — per-partition top-`size` then a merge of
    * `partitions × size` rows, never a global sort of the vocabulary. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, size: Int): DataFrame = {
    require(size >= 1)
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(size)
  }

  /** Per-document out-of-vocabulary rate against [[vocabulary]] — the
    * gate a tokenizer-training pipeline uses to spot documents the
    * vocabulary doesn't cover (foreign scripts, binary junk, OCR noise).
    * The vocab is `size` rows, so the token-stream join broadcasts it:
    * one scan-side pass, no shuffle of the corpus. */
  def oovRate(df: DataFrame, idCol: String, textCol: String, vocabSize: Int): DataFrame = {
    val vocab = vocabulary(df, idCol, textCol, vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        floor(lit(1e6) * (col("n_oov").cast("double") / col("n_tokens")))
          .cast("long").as("oov_ppm"))
  }

  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1).as("a"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("b"))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val cb = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cb"))
    val ca = cb.groupBy(col("a")).agg(sum(col("cb")).as("ca"))
    val model = cb.join(ca, "a").select(
      col("a"), col("b"),
      floor(lit(1e6) * col("cb").cast("double") / col("ca").cast("double"))
        .cast("long").as("p_micros"))
    val scored = bi.join(model, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micros")).as("score_micros"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_micros"), lit(0L)).as("score_micros"))
  }

  // -------------------------------------------------------------------
  // Byte-pair-encoding tokenizer training
  // -------------------------------------------------------------------

  /** Word-frequency table with each word's symbol sequence encoded as a
    * doubly-space-delimited string: [a,b,c] is " a  b  c " (one space at
    * the ends, two between symbols). Symbols never contain spaces (words
    * come from a space split), so the encoding is unambiguous. */
  private def bpeWordSyms(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(
        col("w"),
        concat(
          lit(" "),
          array_join(filter(split(col("w"), ""), c => length(c) > 0), "  "),
          lit(" ")).as("sym"),
        col("f"))

  /** The merge loop shared by [[bpeTrain]] and [[bpeVocab]]: returns the
    * cached base table (caller unpersists), the symbol table after
    * `merges` rounds, and the merge history (step, lhs, rhs, merged,
    * freq). See [[bpeTrain]] for the algorithm and scale notes. */
  private def bpeLoop(df: DataFrame, textCol: String, merges: Int)
      : (DataFrame, DataFrame, Seq[(Int, String, String, String, Long)]) = {
    val base = bpeWordSyms(df, textCol).cache()
    var cur = base
    val hist = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var exhausted = false
    for (step <- 1 to merges if !exhausted) {
      val toks = cur
        .select(split(trim(col("sym")), "  ").as("t"), col("f"))
        .filter(size(col("t")) >= 2)
      val best = toks
        .select(
          explode(arrays_zip(
            slice(col("t"), lit(1), size(col("t")) - 1).as("a"),
            slice(col("t"), lit(2), size(col("t")) - 1).as("b"))).as("p"),
          col("f"))
        .groupBy(col("p.a").as("lhs"), col("p.b").as("rhs"))
        .agg(sum(col("f")).as("freq"))
        .orderBy(col("freq").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true // every word is one symbol already
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        hist += ((step, l, r, l + r, c))
        // lit() carries the pair verbatim (no SQL-literal escaping issues)
        cur = cur.withColumn("sym",
          call_function("replace", col("sym"), lit(s" $l  $r "), lit(s" ${l + r} ")))
      }
    }
    (base, cur, hist.toSeq)
  }

  /** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
    * tokenizer-building step of an LLM data pipeline. Returns the merge
    * table (step, lhs, rhs, merged, freq), ordered by step.
    *
    * Runs entirely on the WORD-frequency table: the corpus is scanned
    * once (a map-side-combined word count — the only corpus-sized
    * shuffle); every merge round then aggregates the vocab-sized table,
    * so per-round cost is independent of corpus size — the property that
    * makes BPE training feasible at 100 TB (vocab grows roughly
    * logarithmically with corpus, not linearly). Per round: one
    * vocab-sized adjacent-pair aggregate weighted by word frequency,
    * plus a 1-row argmax collect (count desc, then pair lexicographic —
    * ties are deterministic). The driver holds only the merge table.
    *
    * Applying a merge (x,y)->xy on the doubly-delimited encoding (see
    * [[bpeWordSyms]]) is a plain string `replace(" x  y ", " xy ")`:
    * both Spark's and ANSI engines' replace scan left-to-right
    * non-overlapping, which is exactly BPE's greedy merge order
    * ("a a a a" becomes [aa, aa]; "a a a" becomes [aa, a]). The doubled
    * interior delimiter keeps adjacent occurrences of the same pair from
    * sharing a boundary character — with single spaces, " a a a a "
    * contains " a a " at offsets 0 and 4 sharing one space, and the
    * left-to-right scan would miss the second merge. No UDFs anywhere:
    * the whole round is codegen'd split/zip/replace expressions. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    val (base, _, hist) = bpeLoop(df, textCol, merges)
    base.unpersist()
    import spark.implicits._
    hist.toDF("step", "lhs", "rhs", "merged", "freq")
  }

  /** Token distribution after `merges` BPE rounds: top `topK` tokens by
    * total corpus frequency (desc, then token asc — deterministic).
    * The segmentation IS the trained tokenizer applied to the corpus —
    * same replace chain, evaluated lazily over the word table. */
  def bpeVocab(df: DataFrame, textCol: String, merges: Int, topK: Int): DataFrame = {
    val (base, cur, _) = bpeLoop(df, textCol, merges)
    val vocab = cur
      .select(explode(split(trim(col("sym")), "  ")).as("token"), col("f"))
      .groupBy(col("token"))
      .agg(sum(col("f")).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)
    base.unpersist() // evaluation below recomputes once; no leaked cache
    vocab
  }

  /** Per-document encoding stats under the trained tokenizer — the
    * pipeline step BPE training exists for: how many tokens each doc
    * costs. Tokenization is word-local, so the corpus is never
    * re-segmented: the vocab-sized word table (word -> token count after
    * `merges` rounds) joins back to the word stream — at 100 TB that's a
    * broadcast of the vocab against one corpus pass, not a second
    * training run. Docs with no words surface with zero counts. */
  def bpeEncodeStats(df: DataFrame, idCol: String, textCol: String, merges: Int): DataFrame = {
    val (base, cur, _) = bpeLoop(df, textCol, merges)
    val wordTok = cur.select(
      col("w"),
      size(split(trim(col("sym")), "  ")).cast("long").as("w_tokens"))
    val docWords = df
      .select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), " ")).as("w"))
      .filter(col("w") =!= "")
    val agg = docWords.join(wordTok, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("w_tokens")).as("n_bpe_tokens"))
    val out = df.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
    base.unpersist()
    out
  }

  // -------------------------------------------------------------------
  // WordPiece-style greedy tokenizer (the other mainstream subword
  // scheme next to BPE: vocab = frequent substrings, encode = greedy
  // longest-match-first)
  // -------------------------------------------------------------------

  /** The word-frequency table WordPiece shares with BPE: lowercased
    * space-split words, map-side-combined counts — the only corpus-sized
    * shuffle any of the tokenizer operators pay. */
  private def wpWords(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** WordPiece-style vocabulary: every single character seen in the
    * corpus (guarantees total segmentability, as WordPiece's byte
    * fallback does) plus the `topK` most frequent substrings of length
    * 2..`maxGram`, occurrence-weighted by word frequency (overlapping
    * occurrences count, ties freq-desc then gram-asc — deterministic).
    * One column `g`. Vocab-sized output: safe to broadcast. */
  private def wpVocab(words: DataFrame, maxGram: Int, topK: Int): DataFrame = {
    val grams = (2 to maxGram).map { n =>
      words.select(
        explode(
          when(length(col("w")) >= n,
            transform(
              sequence(lit(1), length(col("w")) - (n - 1)),
              i => col("w").substr(i, lit(n))))
            .otherwise(array())).as("g"),
        col("f"))
    }.reduce(_ unionByName _)
      .groupBy(col("g")).agg(sum(col("f")).as("freq"))
      .orderBy(col("freq").desc, col("g"))
      .limit(topK)
      .select(col("g"))
    val chars = words
      .select(explode(filter(split(col("w"), ""), c => length(c) > 0)).as("g"))
      .distinct()
    grams.unionByName(chars).distinct()
  }

  /** Per-word token count under greedy longest-match-first segmentation
    * against a WordPiece-style vocab — computed WITHOUT any per-word
    * sequential loop, via pointer doubling:
    *
    *   1. longest-match table: for every (word, char position) the
    *      longest vocab entry starting there (single chars are always in
    *      vocab, so a match always exists). Built by exploding candidate
    *      substrings of length 1..maxGram and broadcast-joining the
    *      vocab — O(word-table chars × maxGram) rows, all vocab-sized
    *      (words combine across the corpus), never corpus-sized.
    *   2. greedy segmentation is the walk pos -> pos + matchLen(pos)
    *      from 1 to beyond the word end; its step count is the token
    *      count. The walk is a functional graph, so `jump` tables
    *      compose with themselves: after r self-joins each row jumps
    *      min(2^r, remaining) steps — ceil(log2(maxWordLen)) rounds
    *      total, each one vocab-sized shuffle on (w, pos). The same
    *      doubling trick that makes list-ranking distributed; a
    *      sequential scan per word would be a UDF loop instead.
    *
    * Each round is `localCheckpoint`ed to keep the self-joining plan
    * tree linear (the tables are vocab-sized — at 100 TB corpus this is
    * the ~100M-distinct-words table, not the corpus; for multi-hour
    * cluster runs swap in reliable checkpoints as PageRank's
    * `checkpointEvery` knob does).
    *
    * Returns (w, w_tokens). */
  private def wpWordTokens(words: DataFrame, maxGram: Int, topK: Int): DataFrame = {
    val vocab = wpVocab(words, maxGram, topK)
    val pos = words.select(
      col("w"),
      explode(sequence(lit(1), length(col("w")))).as("pos"))
    val cand = pos.select(
      col("w"), col("pos"),
      explode(sequence(lit(1),
        least(lit(maxGram), length(col("w")) - col("pos") + 1))).as("n"))
      .withColumn("sub", col("w").substr(col("pos"), col("n")))
    val step = cand
      .join(broadcast(vocab), col("sub") === col("g"))
      .groupBy(col("w"), col("pos"))
      .agg(max(col("n")).as("mlen"))
    val maxLenRow = words.agg(max(length(col("w"))).cast("long")).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 1L else maxLenRow.getLong(0)
    // 2^rounds >= maxLen so one application of the folded jump walks any
    // word end to end
    val rounds = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, maxLen - 1)))
    var jump = step.select(
      col("w"), col("pos"),
      (col("pos") + col("mlen")).as("next"),
      lit(1L).as("steps")).localCheckpoint()
    for (_ <- 1 until rounds.toInt + 1) {
      val b = jump.select(
        col("w").as("bw"), col("pos").as("bpos"),
        col("next").as("bnext"), col("steps").as("bsteps"))
      val folded = jump
        .join(b, col("w") === col("bw") && col("next") === col("bpos"), "left")
        .select(
          col("w"), col("pos"),
          coalesce(col("bnext"), col("next")).as("next"),
          (col("steps") + coalesce(col("bsteps"), lit(0L))).as("steps"))
        .localCheckpoint()
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(jump)
      jump = folded
    }
    jump.filter(col("pos") === 1)
      .select(col("w"), col("steps").as("w_tokens"))
  }

  /** Per-document token cost under a WordPiece-style greedy
    * longest-match tokenizer with a corpus-derived vocab — the
    * `bpeEncodeStats` twin for the other mainstream subword scheme.
    * Segmentation is word-local, so the corpus-sized work is one word
    * count + one join-back of the vocab-sized (word -> token count)
    * table (broadcast at scale); docs with no words surface with zeros.
    * Returns (doc_id, n_words, n_chars, n_wp_tokens). */
  def wordpieceEncodeStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxGram: Int = 4,
      topK: Int = 200): DataFrame = {
    val words = wpWords(df, textCol).cache()
    val wordTok = wpWordTokens(words, maxGram, topK)
    val docWords = df
      .select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), " ")).as("w"))
      .filter(col("w") =!= "")
    val agg = docWords.join(wordTok, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("w_tokens")).as("n_wp_tokens"))
    val out = df.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_wp_tokens"), lit(0L)).as("n_wp_tokens"))
    words.unpersist()
    out
  }

  // -------------------------------------------------------------------
  // Unigram-LM (SentencePiece-style) tokenizer training: the third
  // production tokenizer family next to BPE (merge-based) and WordPiece
  // (greedy longest-match). Seed a bounded candidate vocab, then run
  // fixed-round hard EM — Viterbi E-step as a min-plus matrix-squaring
  // DP over each word's position lattice, count M-step with per-round
  // pruning — all in integer micro-nats (the q253 DSIR pricing
  // discipline), so both engines replay training bit-identically.
  // -------------------------------------------------------------------

  /** Add-1-smoothed piece costs in integer micro-nats:
    * `cost(x) = floor(1e6 · ln((T + |V|) / (cnt(x) + 1)))` — each operand
    * is an exact small integer, the double casts are exact, and the one
    * divide + ln + floor round identically in every engine (the
    * [[dsirWeights]] discipline). Higher cost = rarer piece. */
  private[graft] def unigramPrice(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(tot)).select(
      col("piece"), col("is_char"), col("cnt"),
      floor(lit(1e6) * log(
        (col("t") + col("v")).cast("double") / (col("cnt") + 1).cast("double")))
        .as("cost"))
  }

  /** Viterbi E-step, fully relational: each word is a position DAG
    * (edge (i → i+|x|) per vocab piece x matching at i, cost = the
    * piece's micro-nats) and the optimal segmentation is its min-cost
    * 1 → len+1 path. The all-pairs min-cost table is built by
    * `squarings` min-plus self-squarings over identity-seeded edges
    * (covers paths of ≤ 2^squarings edges — single chars are always in
    * vocab, so a path always exists for words ≤ 2^squarings chars; the
    * same doubling discipline as [[wpWordTokens]], localCheckpoint'd per
    * squaring). A position is ON the optimal path iff
    * cost(1→i) + cost(i→end) = cost(1→end), and the edge chosen there is
    * the deterministic (longest, then lexicographic) one among edges
    * with cost + cost(j→end) = cost(i→end) — no sequential traceback
    * walk anywhere. On exact integer cost ties every optimal position
    * contributes (union-of-optimal-paths accounting, deterministic in
    * both engines). Returns (w, i, j, piece, cost), one row per chosen
    * edge. */
  /** The shared lattice DP of hard- and soft-EM E-steps: the priced
    * edge table (checkpointed — it feeds the squarings AND the
    * chooser/posterior stages) and the all-pairs min-cost table after
    * `squarings` min-plus self-squarings over identity-seeded edges. */
  private def unigramDpTables(
      words: DataFrame,
      priced: DataFrame,
      maxGram: Int,
      squarings: Int): (DataFrame, DataFrame) = {
    val posLen = words.select(
      col("w"), explode(sequence(lit(1), length(col("w")))).as("i"))
    val cand = (1 to maxGram).map { n =>
      posLen.filter(col("i") + lit(n - 1) <= length(col("w")))
        .select(col("w"), col("i"), (col("i") + lit(n)).as("j"),
          col("w").substr(col("i"), lit(n)).as("piece"))
    }.reduce(_ unionByName _)
    val edges = cand
      .join(broadcast(priced.select(col("piece"), col("cost"))), "piece")
      .select(col("w"), col("i"), col("j"), col("piece"), col("cost"))
      .localCheckpoint()
    var dmat = edges.select(col("w"), col("i"), col("j"), col("cost"))
      .unionByName(words
        .select(col("w"),
          explode(sequence(lit(1), length(col("w")) + 1)).as("i"))
        .select(col("w"), col("i"), col("i").as("j"), lit(0L).as("cost")))
    for (s <- 1 to squarings) {
      val comp = dmat
        .select(col("w"), col("i"), col("j").as("k"), col("cost").as("c1"))
        .join(dmat.select(
          col("w"), col("i").as("k"), col("j"), col("cost").as("c2")),
          Seq("w", "k"))
        .select(col("w"), col("i"), col("j"), (col("c1") + col("c2")).as("cost"))
      dmat = dmat.unionByName(comp)
        .groupBy(col("w"), col("i"), col("j")).agg(min(col("cost")).as("cost"))
      // one truncation AFTER the loop: the un-truncated squaring tree has
      // only 2^squarings refs to the checkpointed edge table (bounded
      // small), while a per-squaring eager checkpoint costs a full Spark
      // job each — measured ~2x end-to-end on the q284 path
      if (s == squarings) dmat = dmat.localCheckpoint()
    }
    (edges, dmat)
  }

  private def unigramChosenEdges(
      words: DataFrame,
      priced: DataFrame,
      maxGram: Int,
      squarings: Int): DataFrame = {
    val (edges, dmat) = unigramDpTables(words, priced, maxGram, squarings)
    val dEnd = dmat.filter(col("j") === length(col("w")) + 1)
      .select(col("w"), col("i").as("pos"), col("cost").as("ce"))
    val dStart = dmat.filter(col("i") === 1)
      .select(col("w"), col("j").as("pos"), col("cost").as("cs"))
    val total = dEnd.filter(col("pos") === 1)
      .select(col("w"), col("ce").as("tc"))
    val onpath = dStart.join(dEnd, Seq("w", "pos")).join(total, "w")
      .filter(col("cs") + col("ce") === col("tc"))
      .select(col("w"), col("pos"))
    val opt = edges
      .join(dEnd.select(col("w"), col("pos").as("j"), col("ce").as("cej")),
        Seq("w", "j"))
      .join(dEnd.select(col("w"), col("pos").as("i"), col("ce").as("cei")),
        Seq("w", "i"))
      .filter(col("cost") + col("cej") === col("cei"))
      .join(onpath.select(col("w"), col("pos").as("i")), Seq("w", "i"))
    // argmax in one keyed aggregate instead of a window sort: per (w, i)
    // the chosen edge is the LONGEST optimal one, and (w, i, j) fully
    // determines piece and cost (piece = substr(w, i, j−i); opt is
    // unique per (w, i, j) — dmat is a groupBy output), so ties on j
    // cannot occur and max_by(·, j) IS the (j DESC, piece) rank-1 row
    opt.groupBy(col("w"), col("i"))
      .agg(max_by(struct(col("j"), col("piece"), col("cost")), col("j"))
        .as("_e"))
      .select(col("w"), col("i"), col("_e.j").as("j"),
        col("_e.piece").as("piece"), col("_e.cost").as("cost"))
  }

  /** Seeding + `emRounds` of hard EM. Seed = every corpus char
    * (occurrence-weighted counts; chars are never pruned — they are the
    * segmentability fallback, as in SentencePiece) plus the `seedTopK`
    * most frequent substrings of length 2..`maxGram`. Each round prices
    * the vocab, Viterbi-segments every distinct word, re-counts pieces
    * from the chosen edges weighted by word frequency, and PRUNES to the
    * `vocabTarget` best non-char pieces by (count desc, piece asc).
    * Returns (words, final priced vocab). */
  /** Shared seeding of hard- and soft-EM training: the distinct-word
    * table (guarded: every word must fit the DP's 2^squarings-edge
    * budget), the never-pruned char base, and the seed vocab
    * (chars + `seedTopK` most frequent 2..maxGram substrings). */
  private[graft] def unigramSeedTables(
      df: DataFrame,
      textCol: String,
      maxGram: Int,
      seedTopK: Int,
      squarings: Int): (DataFrame, DataFrame, DataFrame) = {
    val words = wpWords(df, textCol).localCheckpoint()
    // the DP covers paths of <= 2^squarings edges; a longer word would
    // get NO segmentation row and silently vanish from every downstream
    // inner join (encode stats would undercount) — fail loudly instead.
    // One tiny agg over the already-materialized distinct-word table.
    val maxLen = words.agg(coalesce(max(length(col("w"))), lit(0)))
      .head().getInt(0)
    require(maxLen <= (1 << squarings),
      s"unigram DP covers words <= ${1 << squarings} chars " +
        s"(squarings=$squarings) but the corpus has a $maxLen-char word; " +
        "raise squarings or pre-clip the corpus")
    def gramsOfLen(n: Int) = words.select(
      explode(when(length(col("w")) >= n,
        transform(
          sequence(lit(1), length(col("w")) - (n - 1)),
          i => col("w").substr(i, lit(n))))
        .otherwise(array())).as("piece"),
      col("f"))
    val charCounts = gramsOfLen(1)
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      .withColumn("is_char", lit(true))
      .localCheckpoint() // the never-pruned base, reused every round
    val seedGrams = (2 to maxGram).map(gramsOfLen).reduce(_ unionByName _)
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(seedTopK)
      .withColumn("is_char", lit(false))
    (words, charCounts, charCounts.unionByName(seedGrams).localCheckpoint())
  }

  private def unigramLoop(
      df: DataFrame,
      textCol: String,
      maxGram: Int,
      seedTopK: Int,
      vocabTarget: Int,
      emRounds: Int,
      squarings: Int): (DataFrame, DataFrame) = {
    val (words, charCounts, vocab0) =
      unigramSeedTables(df, textCol, maxGram, seedTopK, squarings)
    var vocab = vocab0
    for (_ <- 1 to emRounds) {
      val chosen = unigramChosenEdges(
        words, unigramPrice(vocab), maxGram, squarings)
      val counts = chosen.join(words, "w")
        .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
      val newChars = charCounts.select(col("piece"))
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"),
          lit(true).as("is_char"))
      val newGrams = counts
        .join(charCounts.select(col("piece")), Seq("piece"), "left_anti")
        .orderBy(col("cnt").desc, col("piece")).limit(vocabTarget)
        .withColumn("is_char", lit(false))
      vocab = newChars.unionByName(newGrams).localCheckpoint()
    }
    (words, unigramPrice(vocab))
  }

  /** The trained unigram-LM vocab: (piece, is_char, cnt, cost_micro)
    * after `emRounds` of hard EM — the SentencePiece-style tokenizer
    * model next to [[bpeTrain]] (q241) and the WordPiece vocab (q244).
    *
    * Scale shape: the corpus is scanned ONCE (the shared word-frequency
    * aggregate); everything after runs on the distinct-word table —
    * candidate tables are words × positions × maxGram and the DP tables
    * words × positions², all vocab-sized, so per-round cost is
    * independent of corpus size exactly like BPE/WordPiece training.
    * `squarings` must satisfy 2^squarings ≥ max word length (chars only
    * path); words longer than that would surface with no segmentation
    * row and must be pre-clipped by the caller. */
  def unigramTrain(
      df: DataFrame,
      textCol: String,
      maxGram: Int = 4,
      seedTopK: Int = 60,
      vocabTarget: Int = 40,
      emRounds: Int = 2,
      squarings: Int = 4): DataFrame =
    unigramLoop(df, textCol, maxGram, seedTopK, vocabTarget, emRounds,
      squarings)._2
      .select(col("piece"), col("is_char"), col("cnt"), col("cost").as("cost_micro"))

  /** Per-document encode stats under the trained unigram-LM tokenizer —
    * the [[bpeEncodeStats]] twin: (doc_id, n_words, n_unigram_tokens,
    * cost_micro), where each word's token count is its Viterbi-chosen
    * edge count and cost its chosen-edge micro-nat sum (equal to the
    * optimal path cost except on exact integer ties, where the
    * deterministic union accounting may add positions). Word-local, so
    * the corpus is never re-segmented: the vocab-sized (word → stats)
    * table joins back to one corpus pass. */
  def unigramEncodeStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxGram: Int = 4,
      seedTopK: Int = 60,
      vocabTarget: Int = 40,
      emRounds: Int = 2,
      squarings: Int = 4): DataFrame = {
    val (words, priced) = unigramLoop(
      df, textCol, maxGram, seedTopK, vocabTarget, emRounds, squarings)
    val wt = unigramChosenEdges(words, priced, maxGram, squarings)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("w_tokens"), sum(col("cost")).as("w_cost"))
    val docWords = df
      .select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), " ")).as("w"))
      .filter(col("w") =!= "")
    val agg = docWords.join(wt, "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("w_tokens")).as("n_unigram_tokens"),
        sum(col("w_cost")).as("cost_micro"))
    df.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_unigram_tokens"), lit(0L)).as("n_unigram_tokens"),
        coalesce(col("cost_micro"), lit(0L)).as("cost_micro"))
  }

  /** Soft-EM posterior over the segmentation lattice, at ZERO
    * TEMPERATURE and engine-exact: the posterior restricted to the set
    * of ALL minimum-cost segmentations (uniform over them), computed by
    * forward/backward PATH COUNTING on the optimal-edge DAG — exact
    * integers, so both engines replay it bit-identically.
    *
    * Kudo 2018's finite-temperature forward-backward needs α/β
    * probability sums, and floating sums are order-dependent — Spark's
    * partial aggregation and any oracle engine would disagree in ulps
    * that no rounding discipline can pin (and fixed-point α underflows:
    * an 8-edge lattice at piece probability ~1e-4 is ~1e-32). The
    * zero-temperature limit keeps the E-step's soul — every optimal
    * segmentation contributes, not just one arbitrary winner — in
    * arithmetic an oracle can restate: an edge is on SOME min-cost path
    * iff cs(i) + cost + ce(j) = total, and with nF/nB = min-cost path
    * counts from/to the word ends, exactly nF(i)·nB(j) of the N(w)
    * optimal segmentations use it.
    *
    * Returns one row per optimal edge:
    * (w, i, j, piece, through = nF(i)·nB(j), npaths = N(w)).
    *
    * Scale shape: everything runs on the distinct-word table — the DP
    * is [[unigramDpTables]]; the count recurrences are 2^squarings
    * sequential position rounds, each one keyed join + one word-keyed
    * aggregate on word-sized tables (checkpointed — the accumulator is
    * referenced twice per round). Corpus-size-independent like the
    * hard E-step. */
  private[graft] def unigramPosterior(
      words: DataFrame,
      priced: DataFrame,
      maxGram: Int,
      squarings: Int): DataFrame = {
    val (edges, dmat) = unigramDpTables(words, priced, maxGram, squarings)
    val dEnd = dmat.filter(col("j") === length(col("w")) + 1)
      .select(col("w"), col("i").as("pos"), col("cost").as("ce"))
    val dStart = dmat.filter(col("i") === 1)
      .select(col("w"), col("j").as("pos"), col("cost").as("cs"))
    val total = dEnd.filter(col("pos") === 1)
      .select(col("w"), col("ce").as("tc"))
    // an edge is on some min-cost path iff cs(i) + cost + ce(j) = total
    // (cs(i)+ce(i) >= tc and cost+ce(j) >= ce(i) always, so equality
    // forces both tight — the same certificate unigramChosenEdges picks
    // its deterministic winner from)
    val opt = edges
      .join(dStart.select(col("w"), col("pos").as("i"), col("cs")), Seq("w", "i"))
      .join(dEnd.select(col("w"), col("pos").as("j"), col("ce")), Seq("w", "j"))
      .join(total, "w")
      .filter(col("cs") + col("cost") + col("ce") === col("tc"))
      .select(col("w"), col("i"), col("j"), col("piece"))
      .localCheckpoint() // feeds both count recurrences + the join below
    val maxLen = 1 << squarings
    // the forward and backward path-count recurrences both read only
    // the checkpointed optimal-edge DAG and are independent of each
    // other — overlap the two sequential-round chains (guide §2.6)
    val Seq(nf, nb) = graft.core.Par.run[DataFrame](Seq(
      () => {
        // forward: nF(1) = 1; nF(p) = Σ_{opt (i,p)} nF(i) — positions
        // are topological (edges only go forward), so ascending-p
        // rounds suffice
        var acc = words.select(col("w"), lit(1).as("pos"), lit(1L).as("n"))
        for (p <- 2 to maxLen + 1) {
          val step = opt.filter(col("j") === p)
            .join(acc.select(col("w"), col("pos").as("i"), col("n")),
              Seq("w", "i"))
            .groupBy(col("w")).agg(sum(col("n")).as("n"))
            .select(col("w"), lit(p).as("pos"), col("n"))
          acc = acc.unionByName(step).localCheckpoint()
        }
        acc
      },
      () => {
        // backward: nB(len+1) = 1; nB(p) = Σ_{opt (p,j)} nB(j),
        // descending p
        var acc = words.select(
          col("w"), (length(col("w")) + 1).as("pos"), lit(1L).as("n"))
        for (p <- maxLen to 1 by -1) {
          val step = opt.filter(col("i") === p)
            .join(acc.select(col("w"), col("pos").as("j"), col("n")),
              Seq("w", "j"))
            .groupBy(col("w")).agg(sum(col("n")).as("n"))
            .select(col("w"), lit(p).as("pos"), col("n"))
          acc = acc.unionByName(step).localCheckpoint()
        }
        acc
      }))
    val npaths = nb.filter(col("pos") === 1)
      .select(col("w"), col("n").as("npaths"))
    opt
      .join(nf.select(col("w"), col("pos").as("i"), col("n").as("nfi")),
        Seq("w", "i"))
      .join(nb.select(col("w"), col("pos").as("j"), col("n").as("nbj")),
        Seq("w", "j"))
      .join(npaths, "w")
      .select(col("w"), col("i"), col("j"), col("piece"),
        (col("nfi") * col("nbj")).as("through"), col("npaths"))
  }

  /** Soft M-step counts in integer micro-units: piece x's expected count
    * is Σ_w f(w) · (paths through x's edges) / N(w), staged per (w, x)
    * as `(f · Σthrough · 1e6) div N` — exact integer products and one
    * floor division, order-independent under any aggregation. (f·thr·1e6
    * needs BIGINT headroom: fine to f ~ 1e7 at any bench SF; a 100 TB
    * corpus moves the product to DECIMAL(38,0), the labelCentroids
    * staging note.) */
  private def unigramSoftCounts(
      words: DataFrame,
      priced: DataFrame,
      maxGram: Int,
      squarings: Int): DataFrame =
    unigramPosterior(words, priced, maxGram, squarings)
      .groupBy(col("w"), col("piece"))
      .agg(sum(col("through")).as("thr"), max(col("npaths")).as("npaths"))
      .join(words, "w")
      .select(col("piece"), expr("(f * thr * 1000000L) div npaths").as("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))

  /** Unigram-LM training with the SOFT E-step ([[unigramPosterior]]):
    * per round, price the vocab, compute expected micro-counts over all
    * minimum-cost segmentations, and prune to the `vocabTarget` best
    * non-char pieces (chars never pruned — the segmentability fallback,
    * as in hard EM). Returns (piece, is_char, cnt_micro, cost_micro) —
    * the [[unigramTrain]] twin with hard Viterbi counts replaced by the
    * posterior's expected counts; hard EM remains the oracle-checked
    * fallback knob (q284). Rounds after the first price micro-counts —
    * the cost ratios are scale-invariant up to the +1 smoothing grain,
    * which is the point of pricing by ratio. */
  def unigramTrainSoft(
      df: DataFrame,
      textCol: String,
      maxGram: Int = 4,
      seedTopK: Int = 60,
      vocabTarget: Int = 40,
      emRounds: Int = 1,
      squarings: Int = 4): DataFrame = {
    val (words, charCounts, vocab0) =
      unigramSeedTables(df, textCol, maxGram, seedTopK, squarings)
    var vocab = vocab0
    for (_ <- 1 to emRounds) {
      val counts = unigramSoftCounts(
        words, unigramPrice(vocab), maxGram, squarings)
      val newChars = charCounts.select(col("piece"))
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"),
          lit(true).as("is_char"))
      val newGrams = counts
        .join(charCounts.select(col("piece")), Seq("piece"), "left_anti")
        .orderBy(col("cnt").desc, col("piece")).limit(vocabTarget)
        .withColumn("is_char", lit(false))
      vocab = newChars.unionByName(newGrams).localCheckpoint()
    }
    unigramPrice(vocab).select(col("piece"), col("is_char"),
      col("cnt").as("cnt_micro"), col("cost").as("cost_micro"))
  }

  // -------------------------------------------------------------------
  // Fixed-stride overlapping chunk windows (RAG prep)
  // -------------------------------------------------------------------

  /** Split each document into fixed-size overlapping token windows —
    * the standard retrieval-corpus chunking step (chunk k starts at
    * token 1 + k·stride; the last window may be short; stride < size
    * gives the overlap that keeps answers from straddling a boundary).
    * Pure per-row expressions (split / sequence / slice / array_join):
    * rides the scan, zero shuffle, output linear at size/stride × corpus.
    * Docs with no tokens emit no chunks. Returns (doc_id, chunk_id,
    * start_tok, n_tokens, chunk_text). */
  def chunkWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      "need 1 <= stride <= size (stride > size would drop tokens)")
    val toks = split(trim(col(textCol)), " ")
    val n = when(trim(col(textCol)) === "", lit(0)).otherwise(org.apache.spark.sql.functions.size(toks))
    df.select(col(idCol).as("doc_id"), toks.as("t"), n.as("n"))
      .filter(col("n") >= 1)
      .select(
        col("doc_id"), col("t"), col("n"),
        posexplode(sequence(lit(1), col("n"), lit(stride))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start_tok"),
        least(lit(size), col("n") - col("col") + 1).cast("long").as("n_tokens"),
        array_join(slice(col("t"), col("col"), lit(size)), " ").as("chunk_text"))
  }

  // -------------------------------------------------------------------
  // Source-distribution drift audit
  // -------------------------------------------------------------------

  /** Per-source unigram distribution drift vs the whole corpus, as total
    * variation distance — the "did this source shift?" audit a training
    * mix needs before weighting sources.
    *
    * TV(p_s, q) = 1/2 Σ_w |p_s(w) − q(w)| is computed ENTIRELY in exact
    * integer arithmetic: with per-source counts f_sw (total t_s) and
    * corpus counts f_w (total T),
    *   Σ_w |f_sw·T − f_w·t_s|  =  Σ_{w∈s} |f_sw·T − f_w·t_s|
    *                              + (T − Σ_{w∈s} f_w)·t_s
    * — the absent-word tail collapses to one closed-form term, so no
    * source×vocab grid is ever materialized; the only shuffles are the
    * word count and one vocab-sized join on `w`. The final division
    * (one exactly-rounded IEEE op) is the only floating-point step, so
    * the result is bit-identical in any engine. At 100 TB move the
    * products to DECIMAL(38,0): f_sw·T can pass 2^63 there (not at any
    * bench SF).
    *
    * Also surfaces each source's most over-represented word (argmax of
    * the same integer score, ties to the lexicographically first word).
    * Returns (source, total_tokens, distinct_words, tv_num, tv,
    * top_word, top_diff). */
  def sourceDrift(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(sourceCol).as("source"),
        explode(split(trim(lower(col(textCol))), " ")).as("w"))
      .filter(col("w") =!= "")
    val sw = tok.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("fsw"))
    val wTot = sw.groupBy(col("w")).agg(sum(col("fsw")).as("fw"))
    val sTot = sw.groupBy(col("source")).agg(sum(col("fsw")).as("ts"))
    val tTot = wTot.agg(sum(col("fw")).as("T"))
    val scored = sw
      .join(wTot, "w")
      .join(broadcast(sTot), "source")
      .crossJoin(broadcast(tTot))
      .withColumn("diff", col("fsw") * col("T") - col("fw") * col("ts"))
    val agg = scored.groupBy(col("source"))
      .agg(
        max(col("ts")).as("total_tokens"),
        max(col("T")).as("T"),
        count(lit(1)).as("distinct_words"),
        sum(abs(col("diff"))).as("present_abs"),
        sum(col("fw")).as("present_fw"),
        // argmax by (diff desc, w asc): min-struct on the negated score
        min(struct((-col("diff")).as("negDiff"), col("w"))).as("top"))
    agg.select(
      col("source"),
      col("total_tokens"),
      col("distinct_words"),
      (col("present_abs") +
        (col("T") - col("present_fw")) * col("total_tokens")).as("tv_num"),
      col("top"), col("T"))
      .select(
        col("source"),
        col("total_tokens"),
        col("distinct_words"),
        col("tv_num"),
        (col("tv_num").cast("double") /
          (lit(2L) * col("total_tokens") * col("T")).cast("double")).as("tv"),
        col("top.w").as("top_word"),
        (-col("top.negDiff")).as("top_diff"))
  }

  /** DSIR-style importance weights: score every document by how much its
    * hashed n-gram distribution resembles a target subset of the corpus
    * versus the raw corpus (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023 — the standard
    * pretraining-mix curation step: fit two bag-of-hashed-ngrams models,
    * weight each doc by its log-likelihood ratio, resample by weight).
    *
    * Features are unigrams + adjacent bigrams hashed into `buckets`
    * buckets; both models are add-1-smoothed multinomials over buckets.
    * The per-bucket log-ratio is computed ONCE on the bucket table as
    * `floor(1e6 · ln((ct+1)(Tr+B) / ((cr+1)(Tt+B))))` — each count is
    * cast to double (exact: < 2^53) and the products/quotient are
    * single IEEE ops that round identically in every engine — floored
    * to integer micro-nats — and a document's score is then an exact
    * integer sum of those micro-nats, immune to summation order. That is what keeps an information-
    * theoretic score hash-oracle-checkable.
    *
    * Scale shape: one pass over the corpus explodes features (map-side,
    * no shuffle), the bucket model is a `buckets`-group aggregate with
    * map-side combine (output B rows — broadcastable by construction),
    * and the per-doc score is a broadcast join + groupBy(doc_id). No
    * corpus-sized shuffle beyond the natural per-doc aggregate; the two
    * passes over the feature explode trade recompute for not
    * materializing a corpus-sized intermediate. */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 1024): DataFrame = {
    val b = buckets.toLong
    val t = tokens(col(textCol))
    // zip_with pads the shorter side with null and concat propagates it,
    // so filtering nulls leaves exactly the len-1 adjacent bigrams
    val bigrams = filter(
      zip_with(t, slice(t, lit(2), size(t)), (x, y) => concat(x, lit(" "), y)),
      x => x.isNotNull)
    val feats = df.select(
        col(idCol).as("doc_id"),
        when(targetPred, 1L).otherwise(0L).as("is_t"),
        explode(concat(t, bigrams)).as("f"))
      .withColumn("b", pmod(hash64(col("f")), lit(b)))
    val counts = feats.groupBy(col("b")).agg(
      sum(col("is_t")).as("ct"),
      count(lit(1)).as("cr"))
    val tot = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    // cast to double BEFORE multiplying: each operand is < 2^53 so the
    // casts are exact, and the two double products round IDENTICALLY in
    // every engine — long multiplication would silently wrap past 2^63
    // (corpora beyond ~3e9 features) under ansi=false
    val ratio = counts.crossJoin(broadcast(tot)).select(
      col("b"),
      floor(lit(1e6) * log(
        ((col("ct") + 1).cast("double") * (col("tr") + b).cast("double")) /
          ((col("cr") + 1).cast("double") * (col("tt") + b).cast("double"))))
        .as("lr_micro"))
    feats.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_feats"),
        sum(col("lr_micro")).as("score_micro"))
  }

  /** Engine-portable HyperLogLog registers (Flajolet et al., AofA 2007):
    * the mergeable distinct-count sketch, built from the md5-derived
    * 60-bit [[graft.functions.Functions.hash64]] so every engine computes
    * bit-identical registers. Bucket = top `p` hash bits; rho = leading-
    * zero count of the remaining `60-p` bits + 1, derived from the BINARY
    * STRING length (`bin()`, identical unpadded semantics in Spark and
    * DuckDB) rather than float log2 — no float anywhere, so the register
    * table itself sits under the hash gate. Buckets no value hashed into
    * are absent (estimators treat them as 0).
    *
    * Scale shape: THE sketch for 100 TB distinct counts — a single scan,
    * map-side max-combine into ≤2^p groups, a 2^p-row result that merges
    * across partitions/days/tables by pairwise register max. Duplicate
    * values hash identically, so the aggregate is insensitive to row
    * count, only to distinct count. */
  def hllRegisters(df: DataFrame, value: Column, p: Int = 6): DataFrame = {
    val (bucket, rho) = hllBucketRho(value, p)
    df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("max_rho"), count(lit(1)).as("n_hashed"))
  }

  /** Per-group [[hllRegisters]]: one register table per `groupCol` value
    * (distinct count per source/partition/day). The register tables
    * merge by per-bucket max — folding this output over all groups is
    * bit-identical to the whole-corpus [[hllRegisters]] (pinned in
    * PipelineOpsSpec), which is the sketch's 100 TB contract: count each
    * shard where it lives, combine 2^p-row summaries anywhere. */
  def hllRegistersBy(
      df: DataFrame,
      groupCol: String,
      value: Column,
      p: Int = 6): DataFrame = {
    val (bucket, rho) = hllBucketRho(value, p)
    df.select(col(groupCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("max_rho"), count(lit(1)).as("n_hashed"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
    * MOSS algorithm): hash every k-token gram, then from each window of
    * w consecutive gram hashes keep the minimum (ties to the leftmost
    * position — the (hash, pos) lexicographic min, identical struct
    * comparison in both engines). Guarantee: any shared token run of at
    * least w + k − 1 tokens between two documents produces at least one
    * shared selected fingerprint, while the fingerprint density stays
    * ~2/(w+1) — the principled sparse alternative to hashing EVERY
    * window (duplicateSpans), with a detection floor instead of
    * exhaustive coverage.
    *
    * Documents with fewer than w grams keep their single minimum (the
    * first truncated window). Output: one row per selected (doc_id,
    * gram_pos, gram_hash), distinct.
    *
    * Scale shape: one explode (positional grams ride the scan), one
    * bounded ROWS window per doc (state = w rows), a distinct — no
    * corpus-sized join; the later pair-matching self-join runs on the
    * winnowed ~2/(w+1)-density table, not the full gram stream. */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1)
    val t = tokens(col(textCol))
    val grams = df.select(
        col(idCol).as("doc_id"),
        (size(t) - (k - 1)).cast("long").as("ng"),
        posexplode(when(size(t) < k, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), size(t) - k),
            i => concat_ws(" ", slice(t, i + 1, lit(k))))))
          .as(Seq("pos0", "gram")))
      .select(col("doc_id"), col("ng"),
        (col("pos0") + 1).cast("long").as("pos"),
        hash64(col("gram")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("m", min(struct(col("h"), col("pos"))).over(win))
      .filter(col("pos") <= greatest(col("ng") - (w - 1), lit(1L)))
      .select(col("doc_id"),
        col("m.pos").as("gram_pos"), col("m.h").as("gram_hash"))
      .distinct()
  }

  private def hllBucketRho(value: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val width = 60 - p
    val h = hash64(value)
    val rest = h.bitwiseAND(lit((1L << width) - 1))
    val rho = when(rest === 0, lit(width + 1).cast("long"))
      .otherwise(lit(width + 1).cast("long") - length(bin(rest)).cast("long"))
    (shiftright(h, width), rho)
  }

  /** Cardinality estimate from a [[hllRegisters]] table: harmonic-mean
    * raw estimate with the standard small-range linear-counting
    * correction. Driver-side by design — the input is ≤2^p rows (the
    * whole point of the sketch); expected error ≈ 1.04/√(2^p). */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = registers.select(col("bucket"), col("max_rho")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val sum = (0 until m).map(j => math.pow(2.0, -regs.getOrElse(j, 0))).sum
    val raw = alpha * m * m / sum
    val zeros = (0 until m).count(j => regs.getOrElse(j, 0) == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Quantile estimates from a one-row [[graft.functions.KllSketch]]
    * frame (column `sk`): for each target permille φ, the smallest
    * sketch value whose per-value cumulative weight reaches
    * `target_rank = max(1, φ·n div 1000)`.
    *
    * Returns (phi_pm, n, eb, target_rank, est_v, est_wv) where `est_wv`
    * is the sketch's aggregated weight AT `est_v`. The order-independent
    * guarantee callers may pin (q173/q272 discipline): the sketch rank
    * of `est_v` lies in [target_rank, target_rank + est_wv − 1] by
    * construction, and the TRUE rank of `est_v` is within `eb` of the
    * sketch rank — so true_rank(est_v) ∈
    * [target_rank − eb, target_rank + est_wv − 1 + eb] holds for every
    * processing/merge order, while `est_v` itself is order-dependent
    * and must never be hashed.
    *
    * Cost shape: the sketch is ≤ k·levels items, so the per-value
    * aggregate, the single-partition cumulative window, and the
    * phi cross join all run on a few hundred rows — query-time work is
    * independent of the corpus the sketch summarizes. */
  def kllQuantileEstimates(sk: DataFrame, phisPermille: Seq[Int]): DataFrame =
    kllQuantileEstimatesBy(sk, Seq.empty, phisPermille)

  /** Per-group [[kllQuantileEstimates]]: `sks` holds one `sk` sketch
    * struct per `groupCols` combination (a `groupBy(...).agg(kllSketch)`
    * result); `groupCols = Seq.empty` is the one-row global form.
    * Output: groupCols ++ (phi_pm, n, eb, target_rank, est_v, est_wv),
    * one row per (group, φ). */
  def kllQuantileEstimatesBy(
      sks: DataFrame,
      groupCols: Seq[String],
      phisPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(phisPermille.nonEmpty && phisPermille.forall(p => p >= 1 && p <= 999))
    val spark = sks.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val meta = sks.select(g ++ Seq(
      col("sk.n").as("n"), col("sk.err_bound").as("eb"),
      col("sk.items").as("items")): _*)
    val byValue = meta
      .select(g ++ Seq(col("n"), col("eb"), explode(col("items")).as("it")): _*)
      .groupBy(g ++ Seq(col("n"), col("eb"), col("it.v").as("v")): _*)
      .agg(sum(col("it.w")).as("wv"))
    val cum = byValue.withColumn("cumw",
      sum(col("wv")).over(Window.partitionBy(g: _*).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val phis = phisPermille.toDF("phi_pm")
    val targets = meta.select(g :+ col("n"): _*).distinct()
      .crossJoin(phis)
      .select(g ++ Seq(col("phi_pm").cast("long").as("phi_pm"),
        // staged so φ·n never materializes: n = 1000q + r gives
        // floor(φ·n/1000) = φ·q + floor(φ·r/1000) exactly, and both
        // products stay < 999·n — no Long overflow even when n is an
        // accumulated re-ingest weight near 2^63 (the direct φ·n form
        // would wrap past n ≈ 9.2e15)
        greatest(lit(1L),
          expr("phi_pm * (n div 1000) + (phi_pm * (n % 1000)) div 1000"))
          .as("target_rank")): _*)
    val joined =
      if (groupCols.isEmpty) targets.crossJoin(cum)
      else targets.join(cum, groupCols)
    joined.filter(col("cumw") >= col("target_rank"))
      .groupBy(g ++ Seq(col("phi_pm"), col("n"), col("eb"), col("target_rank")): _*)
      .agg(min(struct(col("v"), col("wv"))).as("e"))
      .select(g ++ Seq(col("phi_pm"), col("n"), col("eb"), col("target_rank"),
        col("e.v").as("est_v"), col("e.wv").as("est_wv")): _*)
  }

  /** The shared verification epilogue of the q274/q277/q279 family:
    * join a [[kllQuantileEstimatesBy]] table back against the raw
    * values, compute each estimate's TRUE rank and the exact
    * target-rank quantile (one broadcast pass + one per-group sort —
    * verification-side only, never the production path), and emit the
    * pinned guarantee rows. `within_bound` asserts
    * true_rank(est_v) ∈ [target − eb, target + est_wv − 1 + eb] — a
    * theorem for any processing/merge order (see
    * [[graft.functions.KllSketch]]), so the hashed payload stays
    * order-independent while est_v itself never surfaces. `values`
    * must be groupCols :+ "v"-shaped. Output: groupCols ++
    * (phi_pm, n, target_rank, exact_q, within_bound). */
  def kllVerifyAgainstExact(
      values: DataFrame,
      est: DataFrame,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val joined =
      if (groupCols.isEmpty) values.crossJoin(broadcast(est))
      else values.join(broadcast(est), groupCols)
    val ranks = joined
      .groupBy(g ++ Seq(col("phi_pm"), col("n"), col("eb"), col("target_rank"),
        col("est_v"), col("est_wv")): _*)
      .agg(sum(when(col("v") <= col("est_v"), 1L).otherwise(0L)).as("true_rank"))
    // rename the raw side's group cols so the rank join is never an
    // ambiguous self-reference (both sides descend from `values`)
    val sorted = values
      .select(groupCols.map(c => col(c).as(s"kv_$c")) :+ col("v"): _*)
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCols.map(c => col(s"kv_$c")): _*)
          .orderBy(col("v"))).cast("long"))
    val cond = groupCols
      .map(c => col(s"kv_$c") === col(c))
      .foldLeft(col("rn") === col("target_rank"))(_ && _)
    sorted.join(broadcast(ranks), cond)
      .select(g ++ Seq(col("phi_pm"), col("n"), col("target_rank"),
        col("v").as("exact_q"),
        (col("true_rank") >= col("target_rank") - col("eb") &&
          col("true_rank") <= col("target_rank") + col("est_wv") - 1 + col("eb"))
          .as("within_bound")): _*)
  }

  /** HTML → visible text — the WET-generation step every web-crawl
    * text pipeline runs between the WARC fetch and tokenization,
    * expressed as a chain of CODEGEN'D column expressions (regexp and
    * replace built-ins — no UDF, so the whole stage rides the scan):
    * script and style elements dropped WITH their contents (visible
    * text never includes them), comments dropped, remaining tags
    * stripped, the five predefined entities decoded (amp LAST — the
    * single-pass rule, so "&amp;lt;" yields the literal "&lt;" and is
    * not double-decoded), whitespace collapsed. The regex subset is
    * the Java-regex/RE2 agreement zone (the q127 discipline):
    * non-greedy dotall element bodies, a plain tag class — no
    * backrefs, no lookaround. */
  def extractHtmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** URL canonicalization — the normalize-before-dedup step a crawl
    * frontier and a document-dedup pass both need (the same page
    * arrives as HTTP://Host:80/a?b=2&a=1#frag and http://host/a?a=1&b=2):
    * scheme and host lowercased, default ports stripped (:80 for http,
    * :443 for https), the fragment dropped, query parameters SORTED
    * (order never changes server semantics for idempotent GETs — the
    * standard canonicalizer assumption), and a bare authority given
    * the "/" path. Pure column expressions — regexp_extract +
    * sort_array over the split query — in the Java-regex/RE2
    * agreement subset, so the whole normalization rides the scan. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?]*)", 1))
    val stripped = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_extract(noFrag, "^[A-Za-z]+://[^/?]*([^?]*)", 1)
    val pathNorm = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val queryNorm = when(query === "", lit(""))
      .otherwise(concat(lit("?"),
        concat_ws("&", sort_array(split(query, "&")))))
    concat(scheme, lit("://"), stripped, pathNorm, queryNorm)
  }
}
