package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Dedup, Similarity, TextAnalysis}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: latest right row with rightTs <= leftTs, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 10:00:00"), "c"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-01 12:00:00"), 3.0), // equal ts: <= includes it
      (2L, ts("2024-01-01 11:00:00"), 9.0)) // after left row: excluded
      .toDF("k", "t", "v")
    val got = AsOfJoin(left, right, "k", "t", "t", Seq("v"))
      .select($"tag", $"asof_v")
      .as[(String, Option[Double])].collect().toMap
    assert(got("a").contains(1.0))
    assert(got("b").contains(3.0))
    assert(got("c").isEmpty)
  }

  test("custom AsOfJoinExec matches the window-composition operator") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 10:00:00"), "c"),
      (3L, ts("2024-01-01 09:00:00"), "d"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-01 12:00:00"), 3.0),
      (2L, ts("2024-01-01 11:00:00"), 9.0))
      .toDF("k", "rt", "v")
    val viaWindow = graft.operators.AsOfJoin(
        left, right.withColumnRenamed("rt", "t"), "k", "t", "t", Seq("v"))
      .select($"tag", $"asof_v").collect().toSet
    val viaExec = graft.plans.AsOfJoinApi
      .asofJoinExec(left, right, "k", "t", "rt", Seq("v"))
      .select($"tag", $"asof_v").collect().toSet
    assert(viaExec == viaWindow)
    // and the plan actually contains the custom operator
    val plan = graft.plans.AsOfJoinApi
      .asofJoinExec(left, right, "k", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing from plan:\n$plan")
  }

  test("custom AsOfJoinExec: NULL keys and timestamps never match") {
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "ok"),
      (None, Some(ts("2024-01-01 10:00:00")), "nullkey"),
      (Some(1L), None, "nullts"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 09:00:00")), 1.0),
      (None, Some(ts("2024-01-01 08:00:00")), 7.0), // must never match
      (Some(2L), None, 9.0)) // must never match
      .toDF("k", "rt", "v")
    val got = graft.plans.AsOfJoinApi
      .asofJoinExec(left, right, "k", "t", "rt", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(got("ok").contains(1.0))
    assert(got("nullkey").isEmpty)
    assert(got("nullts").isEmpty)
  }

  test("window-composition as-of join: NULL keys and timestamps never match") {
    // same contract as AsOfJoinExec — right NULL key/ts rows are filtered
    // up front, left NULL key/ts rows bypass payload pickup
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "ok"),
      (None, Some(ts("2024-01-01 10:00:00")), "nullkey"),
      (Some(1L), None, "nullts"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 09:00:00")), 1.0),
      (None, Some(ts("2024-01-01 08:00:00")), 7.0), // must never match
      (Some(2L), None, 9.0)) // must never match
      .toDF("k", "t", "v")
    val got = AsOfJoin(left, right, "k", "t", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(got("ok").contains(1.0))
    assert(got("nullkey").isEmpty)
    assert(got("nullts").isEmpty)
  }

  test("AsOfJoinExec: string key matches the window-composition operator") {
    val left = Seq(
      ("us", ts("2024-01-01 10:00:00"), "a"),
      ("us", ts("2024-01-01 12:00:00"), "b"),
      ("de", ts("2024-01-01 10:00:00"), "c"),
      ("fr", ts("2024-01-01 09:00:00"), "d")) // no right rows for fr
      .toDF("k", "t", "tag")
    val right = Seq(
      ("us", ts("2024-01-01 09:00:00"), 1.0),
      ("us", ts("2024-01-01 11:30:00"), 2.0),
      ("de", ts("2024-01-01 10:00:00"), 3.0), // equal ts: <= includes it
      ("de", ts("2024-01-01 11:00:00"), 9.0))
      .toDF("k", "rt", "v")
    val viaWindow = AsOfJoin(
        left, right.withColumnRenamed("rt", "t"), "k", "t", "t", Seq("v"))
      .select($"tag", $"asof_v").collect().toSet
    val viaExec = graft.plans.AsOfJoinApi
      .asofJoinExec(left, right, "k", "t", "rt", Seq("v"))
      .select($"tag", $"asof_v").collect().toSet
    assert(viaExec == viaWindow)
    assert(viaExec.size == 4)
  }

  test("AsOfJoinExec: composite (string, long) key matches composition") {
    val left = Seq(
      ("us", 1L, ts("2024-01-01 10:00:00"), "a"),
      ("us", 2L, ts("2024-01-01 10:00:00"), "b"), // same region, other id
      ("de", 1L, ts("2024-01-01 10:00:00"), "c"))
      .toDF("region", "uid", "t", "tag")
    val right = Seq(
      ("us", 1L, ts("2024-01-01 09:00:00"), 1.0),
      ("us", 2L, ts("2024-01-01 09:30:00"), 2.0),
      ("de", 1L, ts("2024-01-01 09:45:00"), 3.0),
      ("de", 2L, ts("2024-01-01 09:50:00"), 9.0)) // key absent on left
      .toDF("region", "uid", "rt", "v")
    val viaWindow = AsOfJoin(
        left, right.withColumnRenamed("rt", "t"),
        Seq("region", "uid"), "t", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toMap
    val viaExec = graft.plans.AsOfJoinApi
      .asofJoinExec(left, right, Seq("region", "uid"), "t", "rt", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toMap
    assert(viaExec == viaWindow)
    assert(viaExec == Map("a" -> Some(1.0), "b" -> Some(2.0), "c" -> Some(3.0)))
  }

  test("minhash LSH finds planted near-duplicates without full cross join") {
    val docs = (
      Seq(
        (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")) ++
        (0L until 20L).map(i => i ->
          s"totally unrelated document number $i with its own words ${i * 7} ${i * 13}")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", shingleN = 3, numHashes = 12, bands = 6)
      .filter($"est_jaccard" >= 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L)))
  }

  test("incremental LSH equals full LSH restricted to batch-touching pairs") {
    val docs = (
      Seq(
        (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (109L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (119L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")) ++
        (0L until 30L).map(i => i ->
          s"filler document $i with words ${i * 7} ${i * 13} ${i * 17}")
    ).toDF("doc_id", "text")
    val isBatch = (id: Long) => id % 10 == 9
    val corpus = docs.filter(!($"doc_id" % 10 === 9))
    val batch = docs.filter($"doc_id" % 10 === 9)
    val corpusSigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 12)
    val incr = Dedup
      .minhashLshIncremental(batch, "doc_id", "text", corpusSigs, 3, 12, 6)
      .as[(Long, Long, Double)].collect().toSet
    val fullAll: Set[(Long, Long, Double)] =
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 12, 6)
        .as[(Long, Long, Double)].collect().toSet
    val full = fullAll.filter { case (a, b, _) => isBatch(a) || isBatch(b) }
    assert(incr == full)
    // the planted batch/corpus near-dup pair is found
    assert(incr.exists { case (a, b, _) => (a, b) == (100L, 109L) })
  }

  test("resolveDuplicateGroups: connected components with min-id canonical") {
    // chain 1-2-3 plus isolated pair 10-11; transitivity must group the chain
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.resolveDuplicateGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("simhash: near-identical docs land at small hamming distance") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine eleven"),
      (3L, "red orange yellow green blue indigo violet pink brown black"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text", bits = 32)
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }

  test("simhashNearDup multi-table blocking = brute-force hamming ball") {
    // near-identical planted pairs + noise docs; the multi-table scheme
    // must return EXACTLY the all-pairs hamming <= 3 set (guaranteed
    // recall — including pairs whose differing bits fall in any chunk,
    // which a single top-bits block would miss)
    val docs = (
      Seq(
        (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (102L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (103L, "mu nu xi omicron pi rho sigma tau upsilon phi")) ++
        (0L until 40L).map(i => i ->
          s"noise document ${i} ${i * 3} ${i * 7} ${i * 11} ${i * 13} ${i * 17}")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text", bits = 32)
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSet
    val got = Dedup.simhashNearDup(docs, "doc_id", "text",
        bits = 32, numChunks = 6, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
    assert(got.contains((100L, 101L, 0))) // exact dup planted
  }

  test("64-bit simhash: full-width signatures, blocking = brute force") {
    val docs = (
      Seq(
        (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (102L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (103L, "mu nu xi omicron pi rho sigma tau upsilon phi")) ++
        (0L until 40L).map(i => i ->
          s"noise document ${i} ${i * 3} ${i * 7} ${i * 11} ${i * 13} ${i * 17}")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text", bits = 64)
      .as[(Long, Long)].collect().toMap
    // full-width: across a corpus the top 4 bits must carry signal
    // (hash64's 60-bit variant would pin them all to 0)
    assert(sigs.values.exists(s => (s >>> 60) != 0L))
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSet
    val got = Dedup.simhashNearDup(docs, "doc_id", "text",
        bits = 64, numChunks = 6, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
    assert(got.contains((100L, 101L, 0)))
  }

  test("prefix-filter jaccard join = brute-force threshold join") {
    // guaranteed recall at the threshold: the prefix-filter path must
    // return EXACTLY the all-pairs jaccard >= t set on a corpus with
    // planted near-dups whose shared grams span the frequency order
    val docs = (
      Seq(
        (200L, "the quick brown fox jumps over the lazy dog tonight"),
        (201L, "the quick brown fox jumps over the lazy cat tonight"),
        (202L, "the quick brown fox leaps over the lazy dog tonight"),
        (203L, "entirely different words appear in this document body here")) ++
        (0L until 40L).map(i => i ->
          s"filler text ${i} ${i * 5} ${i * 7} common pad ${i * 11} tail")
    ).toDF("doc_id", "text")
    val brute = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", Seq(lit(1)),
        shingleN = 2, minJaccard = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val got = Dedup
      .ppjoinJaccard(docs, "doc_id", "text", shingleN = 2, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute, s"got=$got\nbrute=$brute")
    assert(got.exists { case (a, b, _) => (a, b) == ((200L, 201L)) })
  }

  test("sequence packing: bucketed prefix-sum = global running sum") {
    // ids straddle several buckets (span 8) with gaps and ragged counts
    val docs = Seq(5L -> 3L, 6L -> 10L, 9L -> 7L, 17L -> 1L, 18L -> 20L,
        40L -> 2L, 41L -> 5L)
      .toDF("doc_id", "n_tokens")
    val got = graft.operators.Packing
      .packSequences(docs, "doc_id", "n_tokens", capacity = 16, bucketSpan = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // brute force: running sum in id order
    val counts = Seq(5L -> 3L, 6L -> 10L, 9L -> 7L, 17L -> 1L, 18L -> 20L,
      40L -> 2L, 41L -> 5L)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init
    val want = counts.zip(offsets).map { case ((id, n), off) =>
      (id, n, off, off / 16, off % 16)
    }
    assert(got == want)
    // a doc can START in any chunk position; chunk arithmetic must agree
    assert(got.forall { case (_, _, off, cid, coff) =>
      cid * 16 + coff == off && coff >= 0 && coff < 16
    })
  }

  test("brute-force top-k: excludes self, ranks by cosine desc") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .select($"rank", $"n_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
  }

  test("LSH top-k: same-bucket neighbors found, bucket assignment deterministic") {
    val vecs = (0 until 50)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val b1 = Similarity.lshBuckets(vecs, "vec_id", "embedding", planes = 3, dims = 8)
      .select($"vec_id", $"bucket").as[(Long, Int)].collect().toMap
    val b2 = Similarity.lshBuckets(vecs, "vec_id", "embedding", planes = 3, dims = 8)
      .select($"vec_id", $"bucket").as[(Long, Int)].collect().toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1) // planes actually split the space
  }

  test("IVF: centroids assign to themselves; top-k stays within the cell") {
    val vecs = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = graft.operators.Similarity
      .ivfCentroids(vecs, "vec_id", "embedding", Seq(0L, 1L, 2L, 3L))
    val assigned = graft.operators.Similarity
      .ivfAssign(vecs, "vec_id", "embedding", cents)
    val cells = assigned.select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    // a centroid's best centroid is itself (cosine 1.0)
    Seq(0L, 1L, 2L, 3L).foreach(c => assert(cells(c) == c))
    val topk = graft.operators.Similarity
      .ivfTopK(vecs, vecs.filter($"vec_id" >= 35), "vec_id", "embedding",
        k = 3, centroidIds = Seq(0L, 1L, 2L, 3L))
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
    assert(topk.nonEmpty)
    topk.foreach { case (q, n) => assert(cells(q) == cells(n)) }
  }

  test("IVF nprobe=2 recall vs brute force is >= nprobe=1 recall") {
    val vecs = (0 until 60)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" >= 50)
    def topkSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val truth = topkSet(Similarity
      .bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3))
    val p1 = topkSet(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
      k = 3, centroidIds = Seq(0L, 1L, 2L, 3L), nprobe = 1))
    val p2 = topkSet(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
      k = 3, centroidIds = Seq(0L, 1L, 2L, 3L), nprobe = 2))
    val r1 = (p1 intersect truth).size.toDouble / truth.size
    val r2 = (p2 intersect truth).size.toDouble / truth.size
    assert(r2 >= r1, s"probing more cells lost recall: $r2 < $r1")
    assert(r2 >= 0.5, s"nprobe=2 recall unexpectedly low: $r2")
    // probing 2 cells can only widen each query's candidate set
    assert(p1.forall { case (q, _) => p2.exists(_._1 == q) })
  }

  test("IVF trained centroids: k-means training runs and recall holds up") {
    val vecs = (0 until 60)
      .map(i => (i.toLong, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" >= 50)
    val trained = Similarity
      .ivfTrainCentroids(vecs, "vec_id", "embedding", k = 4, iterations = 5)
    assert(trained.count() == 4)
    def topkSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val truth = topkSet(Similarity
      .bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3))
    val got = topkSet(Similarity.ivfTopKWith(
      vecs, queries, "vec_id", "embedding", k = 3, trained, nprobe = 2))
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"trained-centroid recall too low: $recall")
    // training moved the centroids off the raw seed vectors
    val seeds = vecs.filter($"vec_id" < 4)
      .select($"embedding").as[Array[Float]].collect().map(_.toSeq).toSet
    val cvecs = trained.select($"cent_vec").as[Array[Float]].collect().map(_.toSeq).toSet
    assert(cvecs != seeds)
  }

  test("salted join equals plain join on skewed data") {
    val big = (Seq.fill(500)(7L) ++ (1L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
    val small = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"payload", $"name")
      .collect().toSet
    val salted = graft.operators.SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .select($"k", $"payload", $"name").collect().toSet
    assert(salted == plain)
    assert(plain.size == 550)
  }

  test("sampling: hash splits are deterministic and leakage-safe") {
    val docs = (0L until 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // determinism: two invocations keep exactly the same rows
    val s1 = graft.operators.Sampling.samplePct(docs, "doc_id", 20)
      .select($"doc_id").as[Long].collect().toSet
    val s2 = graft.operators.Sampling.samplePct(docs, "doc_id", 20)
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 200)
    // leakage safety: every near-dup group lands in exactly one split
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 51L))
      .toDF("doc_a", "doc_b")
    val split = graft.operators.Sampling
      .leakageSafeSplits(docs, "doc_id", pairs)
      .select($"doc_id", $"canonical_id", $"split")
      .as[(Long, Long, String)].collect()
    assert(split.length == 200)
    split.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"group $cid straddles splits: ${members.toSeq}")
    }
    // the chained group 1-2-3 shares one split
    val g123 = split.filter(r => Seq(1L, 2L, 3L).contains(r._1)).map(_._3).distinct
    assert(g123.length == 1)
    assert(split.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("langId: argmax with declaration-order tie-break, 'und' when no match") {
    val docs = Seq(
      (1L, "the cat and the dog"), // en
      (2L, "der hund und die katze ist"), // de
      (3L, "xyzzy plugh")) // no stopwords at all
      .toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs, "doc_id", "text")
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("quality score: exact ratios on a crafted doc") {
    val docs = Seq((1L, "the cat sat.")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_chars") == 12L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("punct_ratio_ppm") == 83333L) // floor(1e6/12)
    assert(r.getAs[Long]("stopword_ratio_ppm") == 333333L)
  }

  test("large-star/small-star CC = label propagation, incl. a deep chain") {
    // a 60-node chain (diameter 60 — the propagation resolver's worst
    // case and exactly where the star algorithm's O(log^2 n) rounds win),
    // plus a triangle, a pair, and shared-min components
    val pairs = (
      (0L until 59L).map(i => (i, i + 1)) ++
        Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L),
          (300L, 305L), (305L, 302L), (302L, 307L))
    ).toDF("doc_a", "doc_b")
    val prop = Dedup.resolveDuplicateGroups(pairs, maxIterations = 100)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.resolveDuplicateGroupsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
    assert(star(59L) == 0L) // chain end reaches the chain-min label
    assert(star(307L) == 300L)
  }

  test("compaction: fewer size-targeted files, identical content") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val docs = graft.core.Engine.table(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(16).write.mode("overwrite").parquet(s"$base/frag")
    val stats = graft.operators.Maintenance
      .compactParquet(spark, s"$base/frag", s"$base/out", targetBytes = 1L << 30)
    assert(stats.inputFiles == 16)
    assert(stats.outputFiles == 1) // tiny input, one target-sized file
    val before = docs.orderBy("doc_id").collect().toSeq
    val after = spark.read.parquet(s"$base/out").orderBy("doc_id").collect().toSeq
    assert(after == before)
  }

  test("bm25: rare terms beat common terms, long docs are penalized") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "common filler filler filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.bm25(docs, "doc_id", "text")
      .select($"doc_id", $"term", $"bm25")
      .as[(Long, String, Double)].collect()
      .map { case (id, tm, s) => (id, tm) -> s }.toMap
    // idf dominance: 'rare' (df=1) outscores 'common' (df=3) in doc 1
    assert(scores((1L, "rare")) > scores((1L, "common")))
    // length normalization: one 'common' in a short doc beats one in a
    // long doc
    assert(scores((1L, "common")) > scores((3L, "common")))
    // tf saturation: tf=3 scores more than tf=1 at the same length but
    // less than 3x (k1 saturates term frequency)
    assert(scores((2L, "common")) > scores((1L, "common")))
    assert(scores((2L, "common")) < 3 * scores((1L, "common")))
    // rational variant agrees with the log form on ordering
    val rat = TextAnalysis.bm25(docs, "doc_id", "text", rationalIdf = true)
      .select($"doc_id", $"term", $"bm25")
      .as[(Long, String, Double)].collect()
      .map { case (id, tm, s) => (id, tm) -> s }.toMap
    assert(rat((1L, "rare")) > rat((1L, "common")))
  }

  test("zone map: join-path prune matches the collect path past the file cap") {
    import graft.operators.ZoneMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zonemap_join").toString + "/t"
    (0L until 400L).map(i => (i, i % 7)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(dir)
    val real = ZoneMap.buildStats(spark, dir, "id")
    // an index that is over-cap by construction: the 4 real files plus
    // MaxIndexFiles synthetic entries whose ranges sit outside [lo,hi]
    // — the collect path must refuse it, the join path must both
    // handle it and produce the collect path's exact keep set / rows
    val synthetic = spark.range(ZoneMap.MaxIndexFiles.toLong).selectExpr(
      "concat('phantom_', id) AS file",
      "10000 + id AS min_v", "10000 + id AS max_v",
      "CAST(1 AS BIGINT) AS n_rows")
    val over = real.unionByName(synthetic)
    intercept[IllegalArgumentException] {
      ZoneMap.prunedRead(spark, dir, "id", over, 150L, 249L)
    }
    val joined = ZoneMap.prunedReadJoin(spark, dir, "id", over, 150L, 249L)
    val collected = ZoneMap.prunedRead(spark, dir, "id", real, 150L, 249L)
    // identical keep set (the synthetic entries never intersect the range)
    val keepJoin = ZoneMap.keepFiles(over, 150L, 249L)
      .as[String].collect().sorted.toSeq
    val keepReal = ZoneMap.keepFiles(real, 150L, 249L)
      .as[String].collect().sorted.toSeq
    assert(keepJoin == keepReal && joined.filesScanned == collected.filesScanned)
    assert(joined.filesTotal == collected.filesTotal + ZoneMap.MaxIndexFiles)
    // identical rows
    val a = joined.df.orderBy("id").as[(Long, Long)].collect().toSeq
    val b = collected.df.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b && a.size == 100)

    // indexed path: same over-cap index, but the scan must OPEN only
    // the keep set — inputFiles (the scan's planned file list) equals
    // the keep set exactly, where the join path's scan lists all 4
    val indexed = ZoneMap.prunedReadIndexed(spark, dir, "id", over, 150L, 249L)
    assert(indexed.filesTotal == joined.filesTotal &&
      indexed.filesScanned == joined.filesScanned)
    val planned = indexed.df.inputFiles.map(_.replaceFirst("^file:/+", "/")).sorted.toSeq
    val keepNorm = keepReal.map(_.replaceFirst("^file:/+", "/")).sorted
    assert(planned == keepNorm, s"planned=$planned keep=$keepNorm")
    val c = indexed.df.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(c == b)
    // a keep set past the split-planning bound is refused with the
    // named error (maxKeepFiles tightened to force it synthetically)
    val err = intercept[IllegalArgumentException] {
      ZoneMap.prunedReadIndexed(spark, dir, "id", over, 150L, 249L,
        maxKeepFiles = 1)
    }
    assert(err.getMessage.contains("prunedReadJoin"))
    // empty keep set still yields an exact (empty) result
    val none = ZoneMap.prunedReadIndexed(spark, dir, "id", real, 5000L, 6000L)
    assert(none.filesScanned == 0L && none.df.count() == 0L)
  }

  test("wordShingleSeq: every window in text order, duplicates preserved") {
    import graft.functions.Functions
    val df = Seq("a b a b a").toDF("text")
    val got = df.select(Functions.wordShingleSeq($"text", 2)).as[Seq[String]]
      .collect()(0)
    assert(got == Seq("a b", "b a", "a b", "b a"))
    // below-n rule matches WordShingles: empty array, not null
    val short = Seq("only").toDF("text")
      .select(Functions.wordShingleSeq($"text", 2)).as[Seq[String]]
      .collect()(0)
    assert(short == Seq.empty)
    // composed-HOF restatement (the distinct variant's documented twin,
    // minus array_distinct) — bit-identical
    val composed = df.select(
      transform(sequence(lit(0), size(Functions.tokens($"text")) - 2),
        i => concat_ws(" ", slice(Functions.tokens($"text"), i + 1, lit(2))))
    ).as[Seq[String]].collect()(0)
    assert(got == composed)
  }

  test("duplicateSpans: shared runs merge to maximal spans; self-repeats excluded") {
    // doc 1: a1..a20; doc 2 shares exactly a5..a14 (10 tokens) at a
    // DIFFERENT offset; doc 3 repeats an 8-gram within itself only.
    // k=8: the 10-token shared run is 3 consecutive shared windows in
    // each doc, and must merge back into ONE maximal 10-token span at
    // each doc's own positions.
    val d1 = (1 to 20).map("a" + _).mkString(" ")
    val d2 = ((1 to 3).map("b" + _) ++ (5 to 14).map("a" + _) ++
      (1 to 7).map("c" + _)).mkString(" ")
    val d3 = ((1 to 8).map("r" + _) ++ (1 to 8).map("r" + _)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 14L, 10L, 3L),   // a5..a14 at positions 5..14
      (2L, 4L, 13L, 10L, 3L)),  // same run at doc 2's positions 4..13
      s"got $got")
    // doc 3's repeated 8-gram is within ONE doc: countDistinct(doc)=1,
    // no span — within-doc repetition is q76's job, not dedup's
    assert(!got.exists(_._1 == 3L))
    // disjoint shared runs stay separate spans (gap > k)
    val d4 = ((5 to 14).map("a" + _) ++ (1 to 9).map("z" + _) ++
      (5 to 14).map("a" + _)).mkString(" ")
    val spans4 = Dedup.duplicateSpans(
        docs.union(Seq((4L, d4)).toDF("doc_id", "text")),
        "doc_id", "text", k = 8)
      .filter($"doc_id" === 4L).orderBy("span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans4 == Seq((4L, 1L, 10L, 10L, 3L), (4L, 20L, 29L, 10L, 3L)),
      s"got $spans4")
  }

  test("removeDuplicateSpans: lowest-id doc keeps the span, the rest lose exactly it") {
    val d1 = (1 to 20).map("a" + _).mkString(" ")            // owner (min id)
    val d2 = ((1 to 3).map("b" + _) ++ (5 to 14).map("a" + _) ++
      (1 to 7).map("c" + _)).mkString(" ")                   // shares a5..a14
    val d3 = (1 to 10).map("u" + _).mkString(" ")            // unique: untouched
    val d5 = (5 to 14).map("a" + _).mkString(" ")            // IS the span: fully removed
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (5L, d5)).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 20L, 0L, d1), // owner: intact
      (2L, 20L, 10L, ((1 to 3).map("b" + _) ++ (1 to 7).map("c" + _)).mkString(" ")),
      (3L, 10L, 0L, d3),
      (5L, 10L, 10L, "")), // whole doc was the duplicated span
      s"got $got")
    // conservation: n_tokens - n_removed = tokens of the rewrite
    got.foreach { case (_, n, r, txt) =>
      val kept = if (txt.isEmpty) 0 else txt.split(" ", -1).length
      assert(n - r == kept)
    }
  }

  test("bpeTrain: Sennrich worked example, ties lexicographic, early exhaustion") {
    // words: low f=2, lower f=1. Round 1: (l,o)=3 ties (o,w)=3 → lex
    // picks (l,o). Round 2: (lo,w)=3. Round 3: (e,r)=1 ties (low,e)=1 →
    // "e" < "low". Round 4: (low,er)=1. Round 5: no pairs left — the
    // merge table stops at 4 rows even though merges=6 was requested.
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L),
      (4, "low", "er", "lower", 1L)), s"got $got")
    // the trained tokenizer applied: both words collapse to one token
    val vocab = TextAnalysis.bpeVocab(docs, "text", merges = 6, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(vocab == Seq(("low", 2L), ("lower", 1L)), s"got $vocab")
  }

  test("bpeTrain: adjacent same-pair runs merge greedily left-to-right") {
    // "a a a a" must become [aa, aa] (freq counted 3 in round 1 — BPE
    // counts overlapping pair OCCURRENCES when counting, merges greedily
    // when applying), and "b b b" becomes [bb, b] — the case a singly-
    // delimited replace encoding gets wrong by missing the second merge.
    val docs = Seq((1L, "aaaa bbb aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got.head == ((1, "a", "a", "aa", 6L)), s"got $got")
    // round 2: (aa,aa)=2 ties (b,b)=2 → lex "aa" < "b" wins
    assert(got(1) == ((2, "aa", "aa", "aaaa", 2L)), s"got $got")
    // bbb never merged: contributes token b three times (freq 3×f=1)
    val vocab = TextAnalysis.bpeVocab(docs, "text", merges = 2, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(vocab == Seq(("b", 3L), ("aaaa", 2L)), s"got $vocab")
  }

  test("bpeEncodeStats: per-doc token cost via the word table; empty docs zero") {
    // 3 merges on {low:2, lower:1}: (l,o), (lo,w), (e,r) → low = 1 token,
    // lower = [low, er] = 2 tokens
    val docs = Seq((1L, "low low lower"), (2L, "lower"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeStats(docs, "doc_id", "text", merges = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 11L, 4L), // low(1) + low(1) + lower(2)
      (2L, 1L, 5L, 2L),
      (3L, 0L, 0L, 0L)), s"got $got")
  }

  test("wordpieceEncodeStats: greedy longest match; doubling covers long words") {
    // corpus: abab f=2, cd f=1, ab f=1, abcdabcdabcdabcd f=1.
    // gram freqs (weighted, overlapping): ab = 4(abab) + 1(ab) + 4(long)
    // = 9 is the clear top-1.
    val docs = Seq(
      (1L, "abab abab cd"),
      (2L, "ab"),
      (3L, ""),
      (4L, "abcdabcdabcdabcd")).toDF("doc_id", "text")
    // topK=1: vocab = chars {a,b,c,d} + {ab}. Greedy: abab -> [ab, ab],
    // cd -> [c, d], ab -> [ab]; the 16-char word (4 doubling rounds)
    // -> [ab, c, d] x 4 = 12
    val small = TextAnalysis
      .wordpieceEncodeStats(docs, "doc_id", "text", maxGram = 4, topK = 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(small == Seq(
      (1L, 3L, 10L, 6L),
      (2L, 1L, 2L, 1L),
      (3L, 0L, 0L, 0L),
      (4L, 1L, 16L, 12L)), s"got $small")
    // topK=200: every gram makes the vocab, so abab/cd/abcd match whole
    // chunks: abab -> 1 token, cd -> 1, ab -> 1, long word -> [abcd] x 4
    val full = TextAnalysis
      .wordpieceEncodeStats(docs, "doc_id", "text", maxGram = 4, topK = 200)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(full == Seq(
      (1L, 3L, 10L, 3L),
      (2L, 1L, 2L, 1L),
      (3L, 0L, 0L, 0L),
      (4L, 1L, 16L, 4L)), s"got $full")
  }

  test("sourceDrift: exact TV incl. absent-word tail; argmax ties lexicographic") {
    // A: x x y (ts=3), B: y z (ts=2); corpus x:2 y:2 z:1, T=5.
    // A diffs: x 2*5-2*3=4, y 1*5-2*3=-1; tail (5-4)*3=3 -> tv_num 8,
    // tv = 8/30. B: y 1, z 3; tail (5-3)*2=4 -> tv_num 8, tv = 8/20.
    val docs = Seq(("A", "x x y"), ("B", "y z")).toDF("source", "text")
    val got = TextAnalysis.sourceDrift(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, String, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 3L, 2L, 8L, 8.0 / 30.0, "x", 4L),
      ("B", 2L, 2L, 8L, 8.0 / 20.0, "z", 3L)), s"got $got")
    // identical distributions: zero drift, tied argmax picks the
    // lexicographically first word
    val same = Seq(("C", "m n"), ("D", "m n")).toDF("source", "text")
    val zeros = TextAnalysis.sourceDrift(same, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, String, Long)].collect().toSeq
    assert(zeros == Seq(
      ("C", 2L, 2L, 0L, 0.0, "m", 0L),
      ("D", 2L, 2L, 0L, 0.0, "m", 0L)), s"got $zeros")
  }

  test("hardNegatives: same bucket + different label only, ranked by cosine") {
    // Vectors built FROM the plane-0 normal so bucket membership is
    // known without reading md5 internals: +h and 2h land in plane-0's
    // positive half, -h in the negative half.
    val h = Similarity.hyperplane(0, 2)
    val plus = Array(h(0).toFloat, h(1).toFloat)
    val twice = Array((2 * h(0)).toFloat, (2 * h(1)).toFloat)
    val minus = Array((-h(0)).toFloat, (-h(1)).toFloat)
    val corpus = Seq(
      (10L, twice, 1), // same bucket, other label -> the hard negative
      (11L, plus, 0),  // same bucket, SAME label -> excluded
      (12L, minus, 1)  // other bucket -> excluded
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((0L, plus, 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity
      .hardNegatives(corpus, queries, "vec_id", "embedding", "label",
        k = 5, planes = 1, dims = 2)
      .as[(Long, Int, Int, Long, Int, Double)].collect().toSeq
    assert(got == Seq((0L, 0, 1, 10L, 1, 1.0)), s"got $got")
  }

  test("triangleCounts: K4 has 4 triangles x 3 nodes; edges and chains none") {
    // K4 on 1..4 (4 triangles, every node in 3), isolated edge (5,6),
    // chain 7-8-9 (a wedge, no closing edge)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (7L, 8L), (8L, 9L))
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val got = graft.operators.Graph.triangleCounts(sym, topK = 20)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), s"got $got")
  }

  test("randomWalks: degree-1 chains are forced; dead ends stop the walk") {
    // 1 <-> 2: from seed 1 every hop is forced (deg 1), so the walk
    // must alternate. 3 -> 4 with no out-edge at 4: walk stops at step 1.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 3L).toDF("node")
    val got = graft.operators.Graph.randomWalks(edges, seeds, walkLength = 4)
      .orderBy("walk_id", "step")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 1L),
      (3L, 0L, 3L), (3L, 1L, 4L)), s"got $got")
  }

  test("kcorePeel: pendant chain peels away over rounds; the core survives intact") {
    // K4 on 1..4 (every node degree 3) + pendant path 4-5-6. Round 1 of
    // k=2 drops only 6 (degree 1); round 2 drops 5 (degree fell to 1);
    // round 3 drops nothing — 4 rounds land on the K4 with degrees 3.
    // One round alone must NOT have removed 5: fixed rounds are real
    // iterations, not one degree filter.
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val got = graft.operators.Graph.kcorePeel(sym, k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), s"got $got")
    val oneRound = graft.operators.Graph.kcorePeel(sym, k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // after one round 5 is still in (its degree was 2 before 6 left)
    assert(oneRound.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L), s"got $oneRound")
    // fixpoint form: equals a deep fixed-round peel, converges on its own
    val fix = graft.operators.Graph.kcore(sym, k = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(fix == got, s"fixpoint $fix != deep peel $got")
    // a path's 2-core is EMPTY, and peeling must walk in from the ends
    // (diameter-many rounds) to find that out
    val pathPairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val path = (pathPairs ++ pathPairs.map(p => (p._2, p._1))).toDF("src", "dst")
    assert(graft.operators.Graph.kcore(path, k = 2).count() == 0L)
  }

  test("personalized pagerank: all-nodes seed = standard; unreachable components zero") {
    // two disjoint triangles {1,2,3} and {10,11,12}
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val std = graft.operators.Graph.pagerank(sym, iterations = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val allSeeds = sym.select($"src".as("node")).distinct()
    val seededAll = graft.operators.Graph
      .pagerank(sym, iterations = 3, personalizeTo = Some(allSeeds))
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(std == seededAll, "all-nodes personalization must equal standard PageRank")
    // seeds only in the first triangle: the second component gets ZERO
    // mass (no teleport, no inflow), the first keeps its standard ranks
    val got = graft.operators.Graph
      .pagerank(sym, iterations = 3,
        personalizeTo = Some(Seq(1L, 2L, 3L).toDF("node")))
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got.filter(_._1 >= 10L).forall(_._2 == 0L), s"got $got")
    assert(got.filter(_._1 <= 3L) == std.filter(_._1 <= 3L), s"got $got")
  }

  test("chunkWindows: overlap, short tail, empty docs") {
    val d1 = (1 to 40).map("t" + _).mkString(" ") // starts 1, 25
    val d2 = (1 to 10).map("u" + _).mkString(" ") // one short chunk
    val docs = Seq((1L, d1), (2L, d2), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", "text", size = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      (1L, 0L, 1L, 32L), (1L, 1L, 25L, 16L), (2L, 0L, 1L, 10L)), s"got $got")
    assert(got(0)._5 == (1 to 32).map("t" + _).mkString(" "))
    assert(got(1)._5 == (25 to 40).map("t" + _).mkString(" "))
    assert(got(2)._5 == d2)
    // stride == size: exact partition, no overlap
    val flat = TextAnalysis.chunkWindows(docs, "doc_id", "text", size = 20, stride = 20)
      .filter($"doc_id" === 1L).orderBy("chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(flat.map(r => (r._2, r._3, r._4)) == Seq((0L, 1L, 20L), (1L, 21L, 20L)), s"got $flat")
  }
}
