package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Functions => F}
import graft.operators.{Graph, Sampling, TextAnalysis}

/** Round-8 batch-2 operators (q253–q256) pinned to sequential reference
  * implementations: DSIR importance weights, portable HLL registers +
  * estimate, mode-label propagation, and Efraimidis–Spirakis weighted
  * sampling. The distributed plans must equal a direct single-threaded
  * restatement of each algorithm — the same style of lock the judge's
  * hash gate applies, but against an in-process oracle that can run on
  * random inputs. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def cases[A](g: Gen[A], n: Int): Seq[A] = GenCases(g, n, 4242)

  // ----- DSIR ----------------------------------------------------------

  /** Sequential DSIR: same tokenization (trim + single-space split,
    * trailing empties kept, matching Spark's split default), same
    * unigram+bigram features, same hash64-mod bucketing, same add-1
    * smoothed integer-ratio log floored to micro-nats. */
  private def refDsir(
      docs: Seq[(Long, String, Boolean)],
      buckets: Int): Map[Long, (Long, Long)] = {
    def feats(text: String): Seq[String] = {
      val t = text.trim.split(" ", -1).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val rows = docs.flatMap { case (id, tx, isT) =>
      feats(tx).map(f => (id, isT, F.md5Hash64Jvm(f) % buckets))
    }
    val ct = rows.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tt = ct.values.sum
    val tr = cr.values.sum
    val b = buckets.toLong
    val lr = cr.keys.map { k =>
      val num = (ct.getOrElse(k, 0L) + 1).toDouble * (tr + b).toDouble
      val den = (cr(k) + 1).toDouble * (tt + b).toDouble
      k -> math.floor(1e6 * math.log(num / den)).toLong
    }.toMap
    rows.groupBy(_._1).view.mapValues { rs =>
      (rs.size.toLong, rs.map(r => lr(r._3)).sum)
    }.toMap
  }

  test("property: dsirWeights == sequential log-likelihood-ratio reference") {
    val docGen = for {
      n <- Gen.choose(1, 10)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
      isT <- Gen.oneOf(true, false)
    } yield (toks.mkString(" "), isT)
    cases(Gen.listOfN(6, docGen), 5).foreach { rand =>
      // adversarial tokenization pinned into every corpus: the empty doc
      // (one empty token, no bigram) and a double space (empty middle
      // token) — Spark split, DuckDB string_split, and the reference's
      // java split(" ", -1) must all see the same token stream
      val ds = rand ++ Seq(("", true), ("aa  bb", false))
      val docs = ds.zipWithIndex.map { case ((tx, isT), i) =>
        (i.toLong, tx, if (isT) "t" else "r")
      }
      val df = docs.toDF("doc_id", "text", "lang")
      val got = TextAnalysis
        .dsirWeights(df, "doc_id", "text",
          org.apache.spark.sql.functions.col("lang") === "t", buckets = 16)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val ref = refDsir(docs.map(d => (d._1, d._2, d._3 == "t")), 16)
      assert(got == ref, s"corpus $ds")
    }
  }

  test("dsirWeights ranks target-distribution docs above off-target (sf0.001)") {
    val df = core.Engine.table(spark, sf, "documents")
    val scored = TextAnalysis.dsirWeights(df, "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .join(df.select($"doc_id", $"lang"), "doc_id")
      .select($"lang" === "en", $"score_micro".cast("double") / $"n_feats")
      .as[(Boolean, Double)].collect()
    val en = scored.filter(_._1).map(_._2)
    val rest = scored.filterNot(_._1).map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    // the whole point of the weight: mean per-feature log-ratio of docs
    // drawn FROM the target distribution exceeds the off-target mean
    assert(en.sum / en.size > rest.sum / rest.size)
  }

  // ----- portable HLL --------------------------------------------------

  private def refHllRegs(values: Seq[String], p: Int): Map[Long, Long] = {
    val width = 60 - p
    values.map(F.md5Hash64Jvm).map { h =>
      val rest = h & ((1L << width) - 1)
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(rest)
      (h >>> width, if (rest == 0) (width + 1).toLong else (width + 1 - bitlen).toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
  }

  test("hllRegisters == sequential reference over sf0.001 shingles") {
    val sh = core.Engine.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        F.wordShingles(org.apache.spark.sql.functions.col("text"), 3)).as("g"))
    val got = TextAnalysis.hllRegisters(sh, $"g", p = 6)
      .select($"bucket", $"max_rho").as[(Long, Long)].collect().toMap
    val ref = refHllRegs(sh.as[String].collect().toSeq, 6)
    assert(got == ref)
  }

  test("hllEstimate lands within the sketch's error bound of exact distinct") {
    val sh = core.Engine.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        F.wordShingles(org.apache.spark.sql.functions.col("text"), 3)).as("g"))
    val exact = sh.distinct().count().toDouble
    val est = TextAnalysis.hllEstimate(TextAnalysis.hllRegisters(sh, $"g", p = 6), 6)
    // m=64 => standard error 1.04/8 = 13%; gate at 3 sigma. Deterministic
    // (hash-derived), so this is a regression pin, not a flaky bound.
    assert(math.abs(est - exact) / exact < 0.39,
      s"estimate $est vs exact $exact")
  }

  test("hllRegisters merges by register max (the 100 TB merge contract)") {
    val docs = core.Engine.table(spark, sf, "documents")
    val sh = docs.select(org.apache.spark.sql.functions.explode(
      F.wordShingles(org.apache.spark.sql.functions.col("text"), 3)).as("g"))
    val whole = TextAnalysis.hllRegisters(sh, $"g", p = 6)
      .select($"bucket", $"max_rho").as[(Long, Long)].collect().toMap
    val parts = Seq($"g".substr(1, 1) < "m", $"g".substr(1, 1) >= "m")
      .map(p => TextAnalysis.hllRegisters(sh.filter(p), $"g", p = 6)
        .select($"bucket", $"max_rho").as[(Long, Long)].collect().toMap)
    val merged = parts.flatMap(_.toSeq).groupBy(_._1).view
      .mapValues(_.map(_._2).max).toMap
    assert(merged == whole)
  }

  test("hllRegistersBy folded by per-bucket max == whole-corpus registers") {
    val docs = core.Engine.table(spark, sf, "documents")
      .select($"source", org.apache.spark.sql.functions.explode(
        F.wordShingles(org.apache.spark.sql.functions.col("text"), 3)).as("g"))
    val whole = TextAnalysis.hllRegisters(docs, $"g", p = 6)
      .select($"bucket", $"max_rho").as[(Long, Long)].collect().toMap
    val bySource = TextAnalysis.hllRegistersBy(docs, "source", $"g", p = 6)
      .select($"bucket", $"max_rho").as[(Long, Long)].collect()
    val folded = bySource.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(folded == whole)
  }

  test("streaming HLL store: split batches + a replay still equal the batch sketch") {
    val docs = core.Engine.table(spark, sf, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft_hll_merge").toString
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    streaming.DocStreams.mergeHllBatch(even, 0L, base, p = 6)
    streaming.DocStreams.mergeHllBatch(odd, 1L, base, p = 6)
    // at-least-once delivery: the replayed batch must be a no-op on the
    // register maxima (the property the scaladoc promises over CMS)
    streaming.DocStreams.mergeHllBatch(odd, 2L, base, p = 6)
    val store = spark.read.parquet(s"$base/current")
      .select($"bucket", $"max_rho").as[(Long, Long)].collect().toMap
    val whole = TextAnalysis.hllRegisters(
        docs.select(org.apache.spark.sql.functions.explode(
          F.wordShingles(org.apache.spark.sql.functions.col("text"), 3)).as("g")),
        $"g", p = 6)
      .select($"bucket", $"max_rho").as[(Long, Long)].collect().toMap
    assert(store == whole)
  }

  // ----- MMR -----------------------------------------------------------

  /** Sequential greedy MMR with the same integer arithmetic. */
  private def refMmr(
      vecs: Seq[(Long, Seq[Long])],
      q: Seq[Long],
      k: Int): Seq[(Long, Long, Long)] = {
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val rel = vecs.map { case (id, v) => (id, v, dot(v, q)) }
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], Long, Long)]
    for (_ <- 1 to k) {
      val cand = rel.filterNot(c => sel.exists(_._1 == c._1)).map { case (id, v, r) =>
        val red = if (sel.isEmpty) 0L else sel.map(s => dot(v, s._2)).max
        (id, v, r, 7 * r - 3 * red)
      }
      sel += cand.minBy(c => (-c._4, c._1))
    }
    sel.toSeq.map(s => (s._1, s._3, s._4))
  }

  test("property: mmrSelect == sequential greedy MMR (pre-quantized ints)") {
    // feed already-integer vectors: quantizeInt8 maps an int vector with
    // maxAbs 127 to itself, so the distributed and sequential sides see
    // identical integer inputs
    val vecGen = Gen.listOfN(4, Gen.choose(-127L, 127L))
      .map(v => if (v.exists(x => math.abs(x) == 127)) v else 127L +: v.tail)
    val setGen = for {
      n <- Gen.choose(4, 9)
      vs <- Gen.listOfN(n, vecGen)
      q <- vecGen
    } yield (vs, q)
    cases(setGen, 5).foreach { case (vs, q) =>
      val ids = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toDouble.toFloat)) }
      val df = ids.toDF("vec_id", "embedding")
      val got = operators.Similarity
        .mmrSelect(df, "vec_id", "embedding", q, k = 3)
        .select($"vec_id", $"rel_dot", $"score").as[(Long, Long, Long)]
        .collect().toSeq
      val ref = refMmr(vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, q, 3)
      assert(got == ref, s"vecs $vs query $q")
    }
  }

  test("mmrSelect diversifies: the redundant clone loses round 2 to the complement") {
    // query at 45° between axes e1 and e2; corpus: three e1 clones plus
    // e2 and e3. All of {0,1,2,3} tie on relevance (16129), so pure
    // top-3-by-(rel, id) would return the clones {0,1,2}. Hand trace of
    // MMR at λ=0.7 (integer scores, 7·rel − 3·maxRed):
    //   r1: all four tie at 7·16129 → smallest id, pick 0
    //   r2: clones red=16129 → 4·16129=64516; id 3 red=0 → 7·16129 → pick 3
    //   r3: clones 64516; id 4 rel=0 → 0 → pick clone 1
    val q = Seq(127L, 127L, 0L, 0L)
    val corpus = Seq(
      (0L, Seq(127L, 0L, 0L, 0L)),
      (1L, Seq(127L, 0L, 0L, 0L)),
      (2L, Seq(127L, 0L, 0L, 0L)),
      (3L, Seq(0L, 127L, 0L, 0L)),
      (4L, Seq(0L, 0L, 127L, 0L)))
    val df = corpus.map { case (id, v) => (id, v.map(_.toDouble.toFloat)) }
      .toDF("vec_id", "embedding")
    val picked = operators.Similarity.mmrSelect(df, "vec_id", "embedding", q, k = 3)
      .select($"rank", $"vec_id").as[(Long, Long)].collect().toSeq
    assert(picked == Seq((1L, 0L), (2L, 3L), (3L, 1L)), picked.toString)
  }

  // ----- cluster-by streaming reducer ----------------------------------

  test("q264 awk reducer: user 0 groups correctly and no field nulls out (sf0.001)") {
    // the two failure modes the entry's awk program guards against:
    // uninitialized-u merging user 0 into a phantom group, and mawk's
    // %.6g scientific output for computed values >= 2^31 nulling the
    // BIGINT read-back
    val rows = Queries.all.toMap.apply("q264_cluster_by_reducer")
      .fn(spark, sf).as[(Long, Long, Long)].collect()
    val exp = core.Engine.table(spark, sf, "events")
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    assert(rows.length == exp.size)
    rows.foreach { case (u, n, g) =>
      assert(exp(u) == n, s"user $u count")
      assert(g >= 0)
    }
    exp.keys.find(_ == 0L).foreach { z =>
      assert(rows.exists(_._1 == z), "user 0 must appear as its own group")
    }
  }

  // ----- skyline -------------------------------------------------------

  test("property: skyline2 == brute-force dominance filter (ties + duplicates)") {
    // small value range forces coordinate collisions — the tie semantics
    // (equal coords co-survive; same-x lower-y loses; equal-y larger-x
    // dominates) are where a window formulation can silently diverge
    val ptGen = Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 6L))
    cases(Gen.listOfN(25, ptGen), 8).foreach { pts =>
      val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = operators.Skyline.skyline2(df, "x", "y")
        .select($"id").as[Long].collect().toSet
      val want = pts.zipWithIndex.collect {
        case ((px, py), i) if !pts.exists { case (qx, qy) =>
          qx >= px && qy >= py && (qx > px || qy > py) } => i.toLong
      }.toSet
      assert(got == want, s"points $pts")
    }
  }

  // ----- winnowing -----------------------------------------------------

  /** Sequential winnowing: k-gram (pos, hash) stream, (hash, pos)
    * lexicographic min per w-window, windows clamped to at least one. */
  private def refWinnow(toks: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
    val grams = toks.sliding(k).zipWithIndex.collect {
      case (g, i) if g.size == k => ((i + 1).toLong, F.md5Hash64Jvm(g.mkString(" ")))
    }.toVector
    if (grams.isEmpty) Set.empty
    else (1 to math.max(grams.size - w + 1, 1)).map { s =>
      grams.slice(s - 1, s - 1 + w).map { case (p, h) => (h, p) }.min
    }.toSet.map { hp: (Long, Long) => (hp._2, hp._1) }
  }

  test("property: winnowFingerprints == sequential winnow; shared-run floor holds") {
    val docGen = for {
      n <- Gen.choose(0, 30)
      toks <- Gen.listOfN(n, Gen.oneOf("u", "v", "w", "x", "y", "z"))
    } yield toks
    cases(Gen.listOfN(4, docGen), 6).foreach { docsToks =>
      val df = docsToks.zipWithIndex
        .map { case (tk, i) => (i.toLong, tk.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = operators.TextAnalysis
        .winnowFingerprints(df, "doc_id", "text", k = 4, w = 4)
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      docsToks.zipWithIndex.foreach { case (tk, i) =>
        val ref = refWinnow(tk, 4, 4)
        assert(got.getOrElse(i.toLong, Set.empty) == ref, s"doc $i toks $tk")
      }
    }
    // the SIGMOD'03 guarantee: a shared run of w + k - 1 = 7 tokens
    // between two docs yields at least one shared selected hash
    val run = Seq("r1", "r2", "r3", "r4", "r5", "r6", "r7")
    val a = Seq("a1", "a2", "a3") ++ run ++ Seq("a4", "a5")
    val b = Seq("b1") ++ run ++ Seq("b2", "b3", "b4", "b5", "b6")
    val fp = operators.TextAnalysis.winnowFingerprints(
        Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long, Long)].collect()
    val ha = fp.filter(_._1 == 1L).map(_._3).toSet
    val hb = fp.filter(_._1 == 2L).map(_._3).toSet
    assert((ha & hb).nonEmpty, s"detection floor violated: $ha vs $hb")
  }

  // ----- fuzzy join ----------------------------------------------------

  test("property: qgramEditJoin == direct cross-join levenshtein (no false dismissals)") {
    // the q-gram count filter must be a pure optimization: random
    // small-alphabet strings (heavy gram repeats — the regime where a
    // distinct-gram bound could in principle over-prune) joined both
    // ways must produce identical pair sets
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // mixed generator: small-alphabet randoms (heavy gram repeats) plus
    // single-char runs — LONG strings with tiny distinct-gram counts,
    // the case where a length-based brute gate under-covers at d ≥ 2
    // ('aaaaaaaaaa' has |G| = 5 at q = 3 no matter the length)
    val strGen = Gen.frequency(
      4 -> (for {
        n <- Gen.choose(1, 9)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString),
      1 -> (for {
        n <- Gen.choose(4, 12)
        ch <- Gen.oneOf('a', 'b')
      } yield ch.toString * n))
    val setGen = Gen.zip(Gen.listOfN(8, strGen), Gen.listOfN(8, strGen))
    for (maxDist <- Seq(1, 2)) {
      cases(setGen, 4).foreach { case (ls, rs) =>
        val l = ls.distinct.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }
          .toDF("id", "s")
        val r = rs.distinct.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }
          .toDF("id", "s")
        val got = operators.FuzzyJoin
          .qgramEditJoin(l, "id", "s", r, "id", "s", q = 3, maxDist = maxDist)
          .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
        val want = (for {
          (a, i) <- ls.distinct.zipWithIndex
          (b, j) <- rs.distinct.zipWithIndex
          if lev(a, b) <= maxDist
        } yield (i.toLong, j.toLong)).toSet
        assert(got == want,
          s"d=$maxDist left $ls right $rs missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  test("qgramEditJoin recovers every corrupted part name (sf0.001)") {
    import org.apache.spark.sql.functions.{col => c, _}
    val parts = core.Engine.table(spark, sf, "part")
    val pos = pmod(F.hash64(c("p_partkey").cast("string")),
      length(c("p_name")).cast("long"))
    val dirty = parts.select(
      c("p_partkey").as("d_id"), c("p_name").as("orig"),
      concat(c("p_name").substr(lit(1), pos.cast("int")),
        c("p_name").substr((pos + lit(2)).cast("int"), length(c("p_name"))))
        .as("d_name"))
    val matched = operators.FuzzyJoin.qgramEditJoin(
        dirty, "d_id", "d_name",
        parts.select(c("p_name")).distinct(), "p_name", "p_name",
        q = 3, maxDist = 1)
      .select($"l_id", $"r_id").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    dirty.select($"d_id", $"orig").as[(Long, String)].collect().foreach {
      case (id, orig) =>
        assert(matched.get(id).exists(_.contains(orig)),
          s"part $id: corrupted form failed to link back to '$orig'")
    }
  }

  // ----- k-center coreset ----------------------------------------------

  /** Sequential k-center greedy: seed = smallest id, then maximin
    * (distance desc, id asc) over exact integer squared-L2. */
  private def refKCenter(
      vecs: Seq[(Long, Seq[Long])],
      k: Int): Seq[(Long, Long)] = {
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], Long)]
    vecs.sortBy(_._1).headOption.foreach(v => sel += ((v._1, v._2, 0L)))
    while (sel.size < k && sel.size < vecs.size) {
      val cand = vecs.filterNot(v => sel.exists(_._1 == v._1)).map { case (id, v) =>
        (id, v, sel.map(s => d2(v, s._2)).min)
      }
      sel += cand.minBy(c => (-c._3, c._1))
    }
    sel.toSeq.map(s => (s._1, s._3))
  }

  test("property: kCenterGreedy == sequential maximin reference") {
    val vecGen = Gen.listOfN(4, Gen.choose(-127L, 127L))
      .map(v => if (v.exists(x => math.abs(x) == 127)) v else 127L +: v.tail)
    val setGen = for {
      n <- Gen.choose(3, 9)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs
    cases(setGen, 5).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toDouble.toFloat)) }
        .toDF("vec_id", "embedding")
      val got = operators.Similarity.kCenterGreedy(df, "vec_id", "embedding", k = 4)
        .select($"vec_id", $"min_d2").as[(Long, Long)].collect().toSeq
      val ref = refKCenter(vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, 4)
      assert(got == ref, s"vecs $vs")
      // maximin picks can only shrink: each added center's distance to
      // the earlier set is <= the previous pick's (greedy invariant)
      got.drop(1).map(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, s"maximin not monotone: $got")
        case _         =>
      }
    }
  }

  // ----- nDCG ----------------------------------------------------------

  test("ndcgAtK: perfect ranking scores exactly 1e6 ppm; known misplacement traced") {
    import org.apache.spark.sql.functions.{col => c}
    val rel = Seq((1L, 10L, 2L), (1L, 11L, 1L), (1L, 12L, 1L))
      .toDF("q_id", "n_id", "gain")
    // ideal order: gains (2,1,1) at ranks 1..3 — ranking them exactly so
    // must give ndcg_ppm = 1000000
    val perfect = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("q_id", "rank", "n_id")
    val p = operators.Similarity.ndcgAtK(perfect, rel, k = 3).head()
    assert(p.getAs[Long]("ndcg_ppm") == 1000000L)
    // put the gain-2 doc last and an irrelevant doc first:
    // disc = floor(1e6/log2(i+1)) = (1000000, 630929, 500000)
    // dcg  = 0*1000000 + 1*630929 + 2*500000 = 1630929
    // idcg = 2*1000000 + 1*630929 + 1*500000 = 3130929
    val flipped = Seq((1L, 1L, 99L), (1L, 2L, 11L), (1L, 3L, 10L))
      .toDF("q_id", "rank", "n_id")
    val f = operators.Similarity.ndcgAtK(flipped, rel, k = 3).head()
    assert(f.getAs[Long]("dcg_micro") == 1630929L)
    assert(f.getAs[Long]("idcg_micro") == 3130929L)
    assert(f.getAs[Long]("ndcg_ppm") == 1630929L * 1000000L / 3130929L)
    assert(operators.Similarity.ndcgDiscountsMicro(3) ==
      Seq(1000000L, 630929L, 500000L))
    // a query with no relevant set has no defined nDCG: dropped
    val orphan = Seq((7L, 1L, 10L)).toDF("q_id", "rank", "n_id")
    assert(operators.Similarity.ndcgAtK(orphan, rel.filter(c("q_id") =!= 7L), 3)
      .count() == 0)
  }

  // ----- label propagation ---------------------------------------------

  /** Sequential synchronous mode-LPA: every node adopts the most frequent
    * in-neighbor label, smallest label on ties. */
  private def refLpa(edges: Set[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val in = edges.toSeq.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lab = edges.map(_._1).map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = in.map { case (node, srcs) =>
        val cnt = srcs.map(lab).groupBy(identity).view.mapValues(_.size).toMap
        node -> cnt.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    lab
  }

  test("property: labelPropagation == sequential synchronous mode-LPA") {
    val edgeGen = for {
      n <- Gen.choose(3, 9)
      pairs <- Gen.listOfN(n * 2, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield pairs.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    cases(edgeGen, 8).filter(_.nonEmpty).foreach { es =>
      val df = es.toSeq.toDF("src", "dst")
      val got = Graph.labelPropagation(df, rounds = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == refLpa(es, 3), s"edges $es")
    }
  }

  test("labelPropagation separates two cliques over a bridge (vs CC's one label)") {
    // two triangles {0,1,2} and {10,11,12} plus bridge 2-10: min-label CC
    // floods everything to 0; mode-LPA keeps each clique on its own
    // majority label because the single bridge edge is outvoted.
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    val es = (clique(Seq(0L, 1L, 2L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((2L, 10L), (10L, 2L))).toDF("src", "dst")
    val labels = Graph.labelPropagation(es, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // each clique agrees internally (label VALUES can drift across the
    // bridge — sync-LPA folklore — but the PARTITION must hold)
    assert(Set(labels(0L), labels(1L), labels(2L)).size == 1)
    assert(Set(labels(10L), labels(11L), labels(12L)).size == 1)
    assert(labels(11L) != labels(1L), "cliques must keep distinct communities")
  }

  // ----- weighted sampling ---------------------------------------------

  test("property: weightedSample == sequential exponential-race top-k") {
    val rowGen = Gen.zip(Gen.choose(0L, 500L), Gen.choose(1L, 1000L))
    cases(Gen.listOfN(40, rowGen), 5).foreach { raw =>
      val rows = raw.distinctBy(_._1)
      val df = rows.toDF("id", "w")
      val got = Sampling.weightedSample(df, "id", "w", k = 10, salt = "es")
        .select($"id", $"es_key_nano").as[(Long, Long)].collect().toSeq
        .sortBy(r => (r._2, r._1))
      val ref = rows.map { case (id, w) =>
        val u = (F.md5Hash64Jvm(s"es:$id") + 1).toDouble / 1152921504606846976.0
        (id, math.floor(-math.log(u) / w.toDouble * 1e9).toLong)
      }.sortBy(r => (r._2, r._1)).take(10)
      assert(got == ref, s"rows $rows")
    }
  }

  test("weightedSample is weight-monotone: boosting a doc pulls it into the sample") {
    val base = (0L until 100L).map(id => (id, 10L))
    val losers = {
      val df = base.toDF("id", "w")
      val kept = Sampling.weightedSample(df, "id", "w", k = 5)
        .select($"id").as[Long].collect().toSet
      base.map(_._1).filterNot(kept)
    }
    val boosted = losers.head
    val df2 = base.map { case (id, w) => (id, if (id == boosted) 1000000L else w) }
      .toDF("id", "w")
    val kept2 = Sampling.weightedSample(df2, "id", "w", k = 5)
      .select($"id").as[Long].collect().toSet
    assert(kept2.contains(boosted))
  }

  test("weightedSample plans TakeOrderedAndProject (no full sort at scale)") {
    val df = core.Engine.table(spark, sf, "documents")
      .select($"doc_id", $"n_chars")
    val plan = Sampling.weightedSample(df, "doc_id", "n_chars", k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
