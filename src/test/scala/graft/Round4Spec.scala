package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Layout, Sampling, Similarity, TextAnalysis}

/** Round-4 operators: contamination audit, PII redaction, repetition
  * metrics, dataset mixing, int8-quantized ANN, z-order layout, AQE
  * skew-join handling, streaming ANN serving. */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contamination: exact overlap ratios on a planted corpus") {
    val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c d x"), // grams {a b c, b c d, c d x}: 2 of 3 in train
      (11L, "p q r s t"), // 0 of 3
      (12L, "a b")        // no 3-grams -> absent from output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(train, eval, "doc_id", "text", shingleN = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 3L, 2L), (11L, 3L, 0L)))
    assert(out(0).getLong(3) == 666666L)  // floor(2/3 * 1e6)
    assert(out(1).getLong(3) == 0L)
  }

  test("pii redaction: emails, SSNs, phones replaced and counted") {
    val df = Seq(
      (1L, "mail a.b@x.io and c@d.org ssn 123-45-6789 call 555-123-4567 ok"),
      (2L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getString(1) ==
      "mail <EMAIL> and <EMAIL> ssn <SSN> call <PHONE> ok")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) == ((2L, 1L, 1L)))
    assert(out(1).getString(1) == "clean text with no pii at all")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) == ((0L, 0L, 0L)))
  }

  test("repetition: exact metrics on a crafted doc") {
    val df = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScore(df, "doc_id", "text").head()
    assert(r.getLong(1) == 4L)        // n_tokens
    assert(r.getLong(2) == 2L)        // n_distinct
    assert(r.getLong(3) == 500000L)   // distinct_ratio_ppm
    assert(r.getLong(4) == 3L)        // max_token_freq ("a")
    // bigrams [a a, a a, a b]: 2 distinct of 3 -> floor((1 - 2/3) * 1e6)
    assert(r.getLong(5) == 333333L)
  }

  test("mix: scarcest source binds; membership deterministic; rates near target") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val w = Map("src0" -> 60L, "src1" -> 30L, "src2" -> 10L)
    // counts are 100 each; T = min(100*100/60, 100*100/30, 100*100/10) = 166
    val plan = Sampling.mixPlan(df, "source", w)
    assert(plan == Seq(
      ("src0", 100L, 990000L), ("src1", 100L, 490000L), ("src2", 100L, 160000L)))
    val s1 = Sampling.mixSources(df, "source", "id", w)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.mixSources(df, "source", "id", w)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash membership must be reproducible")
    val bySource = Sampling.mixSources(df, "source", "id", w)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash sampling is approximate; 100-row sources stay within +-15
    assert(math.abs(bySource("src0") - 99L) <= 15)
    assert(math.abs(bySource("src1") - 49L) <= 15)
    assert(math.abs(bySource("src2") - 16L) <= 15)
  }

  test("quantizeInt8: maxabs scaling, exact integer levels") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(df, "vec_id", "embedding").head()
    // m=1.0: 0.5*127+0.5 -> floor(64.0)=64; -127+0.5 -> floor(-126.5)=-127;
    // 31.75+0.5 -> 32; 0.5 -> 0
    assert(r.getSeq[Long](1) == Seq(64L, -127L, 32L, 0L))
    assert(r.getDouble(2) == 0.007874) // round(1/127, 6)
  }

  test("quantized top-k tracks full-precision top-k closely") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i.toDouble * 37 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 5)
    def top1(df: org.apache.spark.sql.DataFrame) = df
      .filter($"rank" === 1).select($"q_id", $"n_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = top1(Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", k = 3))
    val quant = top1(Similarity.quantizedTopK(vecs, qs, "vec_id", "embedding", k = 3))
    // int8 quantization can flip near-ties, but most top-1s must agree
    val agree = exact.keys.count(q => exact(q) == quant(q))
    assert(agree >= 4, s"only $agree/5 top-1 neighbors survived quantization")
  }

  test("zorderKey2 interleaves bits") {
    val df = Seq((5L, 3L)).toDF("a", "b")
    // a=101 -> positions 0,4; b=011 -> positions 1,3 => 1+16+2+8 = 27
    val z = df.select(Layout.zorderKey2($"a", $"b", 3).as("z")).head().getLong(0)
    assert(z == 27L)
    val z2 = Seq((0L, 7L)).toDF("a", "b")
      .select(Layout.zorderKey2($"a", $"b", 3).as("z")).head().getLong(0)
    assert(z2 == (2L + 8L + 32L)) // b bits at odd positions 1,3,5
  }

  test("zorder layout bounds per-file spans on BOTH dimensions") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Engine.table(spark, sf, "orders")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    Layout.zorderWrite(orders, "o_custkey", "o_orderdate", s"$base/z", numFiles = 8)
    // linear baseline: range-sorted by custkey only
    orders.repartitionByRange(8, $"o_custkey")
      .sortWithinPartitions($"o_custkey")
      .write.mode("overwrite").parquet(s"$base/lin")
    def spans(dir: String): (Double, Double) = {
      val df = spark.read.parquet(dir)
        .select(input_file_name().as("f"), $"o_custkey",
          unix_micros($"o_orderdate".cast("timestamp")).as("d"))
      val g = df.agg(
        (max($"o_custkey") - min($"o_custkey")).cast("double").as("ck"),
        (max($"d") - min($"d")).cast("double").as("dd")).head()
      val per = df.groupBy($"f").agg(
        (max($"o_custkey") - min($"o_custkey")).cast("double").as("ck"),
        (max($"d") - min($"d")).cast("double").as("dd"))
        .agg(avg($"ck"), avg($"dd")).head()
      (per.getDouble(0) / g.getDouble(0), per.getDouble(1) / g.getDouble(1))
    }
    val (zck, zdd) = spans(s"$base/z")
    val (lck, ldd) = spans(s"$base/lin")
    // linear: razor-sharp on custkey, useless on date
    assert(lck < 0.3 && ldd > 0.85, s"baseline unexpected: ck=$lck dd=$ldd")
    // z-order: bounded on BOTH dimensions
    assert(zck < 0.7, s"zorder custkey span too wide: $zck")
    assert(zdd < 0.7, s"zorder date span too wide: $zdd")
  }

  test("AQE splits a skewed sort-merge join partition") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(0, 400000).select(
        when($"id" < 360000, 0L).otherwise($"id" % 64).as("k"),
        $"id".as("payload"))
      val small = spark.range(0, 64).select($"id".as("k"), ($"id" * 10).as("v"))
      val j = big.join(small, "k")
      // execute THIS query's physical plan (a .count() would build a
      // separate aggregate query and finalize that plan, not this one)
      val qe = j.queryExecution
      qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-handled join in:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming ANN serving over multiple micro-batches = batch top-k") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.core.Engine.table(spark, sf, "embeddings")
    // split the queries across two files; maxFilesPerTrigger=1 forces at
    // least two micro-batches through the serving loop
    val qdir = java.nio.file.Files.createTempDirectory("graft_ann_q").toString
    emb.filter($"vec_id" < 5).coalesce(1).write.mode("overwrite").parquet(s"$qdir/in")
    emb.filter($"vec_id" >= 5 && $"vec_id" < 10).coalesce(1)
      .write.mode("append").parquet(s"$qdir/in")
    val served = graft.streaming.AnnServing.serveTopK(
        spark, emb, s"$qdir/in",
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
        queryFilter = lit(true), "vec_id", "embedding", k = 3,
        maxFilesPerTrigger = Some(1))
      .select($"q_id", $"rank", $"n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batch = Similarity.bruteForceTopK(
        emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3)
      .select($"q_id", $"rank", $"n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == batch)
  }

  test("semanticDedup: planted near-identical vectors dropped, keep-first") {
    // two tight groups far apart + one singleton; ids 0 and 3 are the
    // cluster seeds (centroids)
    val vs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.999f, 0.01f, 0f, 0f)),  // near-dup of 0
      (2L, Array(0.998f, -0.02f, 0f, 0f)), // near-dup of 0 and 1
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f))          // own direction, cell of 3 or 0
    ).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vs, "vec_id", "embedding", Seq(0L, 3L))
    val res = Similarity.semanticDedup(vs, "vec_id", "embedding", cents, 0.99)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(res.toSeq == Seq(
      (0L, 0L, true),   // kept: no lower-id mate
      (1L, 1L, false),  // dup of 0
      (2L, 2L, false),  // dup of 0 and 1
      (3L, 0L, true),
      (4L, 0L, true)))  // cosine to mates below threshold
  }

  test("chunkDupStats: shared boilerplate chunk detected across docs") {
    // with divisor=1 every token is a boundary -> every token is a chunk:
    // shared chunks are exactly shared tokens (cross-doc)
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta"),
      (3L, "epsilon zeta")).toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(docs, "doc_id", "text", divisor = 1)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("bigramLmScore: MLE micro-unit scores on a counted corpus") {
    // bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b),(b,c); doc3 none.
    // C(a,b)=3 C(b,a)=1 C(b,c)=1; C(a.)=3 C(b.)=2
    // P(b|a)=1 -> 1e6; P(a|b)=P(c|b)=0.5 -> 500000
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2500000L), (2L, 2L, 1500000L), (3L, 0L, 0L)))
  }

  test("perSourceCap: two-level top-k equals the one-window form") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 200L).map(i => (i, if (i % 4 == 0) "big" else s"s${i % 3}"))
      .toDF("doc_id", "source")
    val capped = Sampling.perSourceCap(docs, "doc_id", "source", cap = 7)
      .select($"doc_id", $"source", $"rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // naive single-window reference under the same (hash, id) order
    val h = graft.functions.Functions.hash64(concat(lit("cap:"), $"doc_id".cast("string")))
    val naive = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy(h.asc, $"doc_id".asc)).cast("long"))
      .filter($"rk" <= 7)
      .select($"doc_id", $"source", $"rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(capped == naive)
    assert(capped.groupBy(_._2).forall(_._2.size == 7))
  }

  test("corpusStats: histogram quantiles are the exact disc values") {
    val docs = Seq(
      (1L, "a", "s"), (2L, "ab", "s"), (3L, "abc", "s"),
      (4L, "abcd", "s"), (5L, "abcde", "s"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.corpusStats(docs, "doc_id", "text", "source").collect()(0)
    // (source, n_docs, n_tokens, min, max, median, p90)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (("s", 5L, 5L, 1L, 5L, 3L, 5L)))
  }

  test("randomProject: exact milli-unit sign sums; dup ranks first in top-k") {
    val signs = Similarity.rpSigns(1, 4, 2)
    val v = Array(0.5f, -0.25f, 1f, 0f)
    val iv = v.map(x => math.floor(x.toDouble * 1000.0))
    val expected = (0 until 2).map(j =>
      iv.zip(signs(j)).map { case (a, s) => a * s }.sum)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val proj = Similarity.randomProject(df, "vec_id", "embedding", 2, seed = 1, dims = 4)
      .collect()(0).getSeq[Double](1)
    assert(proj == expected)
    // an exact duplicate of query 0 must rank first with cosine 1.0
    val corpus = Seq(
      (0L, v), (10L, v),
      (11L, Array(-1f, 2f, 0.5f, -0.125f)), (12L, Array(0f, 0f, 0.25f, 1f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.projectedTopK(
        corpus, corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        outDims = 2, seed = 1, k = 1, dims = 4)
      .collect()(0)
    assert(top.getLong(1) == 10L && top.getDouble(2) == 1.0)
  }

  test("Prep.run: split-partitioned layout, deterministic rerun") {
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_prep").toString
    val report = graft.pipeline.Prep
      .run(spark, s"$sf/documents.parquet", out, cap = 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(report.nonEmpty && report.map(_._3).sum > 0)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("split=")))
    // deterministic: a second run produces the identical report
    val again = graft.pipeline.Prep
      .run(spark, s"$sf/documents.parquet", out, cap = 30)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(report.toSeq == again.toSeq)
  }

  test("IngestDedup.runBatchDir: file-drop batches equal full-corpus pairs") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 60)
    val base = java.nio.file.Files.createTempDirectory("graft_bdir").toString
    docs.filter(col("doc_id") < 30).coalesce(1)
      .write.parquet(s"$base/in/b0.parquet")
    docs.filter(col("doc_id") >= 30).coalesce(1)
      .write.parquet(s"$base/in/b1.parquet")
    // the writes above create DIRECTORIES named *.parquet; runBatchDir
    // lists files, so re-drop each as a single file
    val fs = new java.io.File(s"$base/in")
    val drop = new java.io.File(s"$base/drop"); drop.mkdirs()
    fs.listFiles().filter(_.isDirectory).foreach { d =>
      val part = d.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(drop, d.getName).toPath)
    }
    val n = graft.streaming.IngestDedup.runBatchDir(
      spark, drop.toString, "doc_id", "text", s"$base/store", s"$base/pairs")
    assert(n == 2)
    val incr = spark.read.parquet(s"$base/pairs")
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == full)
  }

  test("vocabulary + oovRate: total-order cut, exact OOV counts") {
    val docs = Seq(
      (1L, "a a a b b c"),   // freq: a=3 b=2 c=1(+1 below)=2
      (2L, "c d")            // d=1
    ).toDF("doc_id", "text")
    // top-2 vocab: a(3), then b(2) vs c(2) tie -> b by token order
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", 2)
      .collect().map(_.getString(0)).toSeq
    assert(v == Seq("a", "b"))
    val oov = TextAnalysis.oovRate(docs, "doc_id", "text", 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: 6 tokens, oov = c -> 1; doc2: 2 tokens, oov = c,d -> 2
    assert(oov.toSeq == Seq((1L, 6L, 1L), (2L, 2L, 2L)))
  }

  test("tokenBudgetSample: bucketed prefix-sum equals the one-window form") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 300L).map(i => (i, s"s${i % 3}", 1L + i % 7))
      .toDF("doc_id", "source", "w")
    val sampled = Sampling
      .tokenBudgetSample(rows, "doc_id", "source", "w", budget = 120L, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val h = graft.functions.Functions.hash64(
      concat(lit("budget:"), $"doc_id".cast("string")))
    val naive = rows
      .withColumn("cum", sum($"w").over(
        Window.partitionBy($"source").orderBy(h, $"doc_id")))
      .filter($"cum" <= 120L)
      .select($"doc_id", $"source", $"cum".cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(sampled == naive && sampled.nonEmpty)
    // inclusive boundary: every source's max cum is <= budget and the
    // NEXT doc in hash order would cross it (cap actually binds)
    assert(sampled.groupBy(_._2).forall { case (_, s) => s.map(_._3).max <= 120L })
  }

  test("countMinSketch: est >= exact for all; equal when width >> vocab") {
    val docs = Seq((1L, "a a a b b c d e"), (2L, "a b c f g")).toDF("doc_id", "text")
    val exact = Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L, "e" -> 1L,
      "f" -> 1L, "g" -> 1L)
    val sketch = TextAnalysis.countMinSketch(docs, "doc_id", "text", depth = 4, width = 256)
    // total mass per row must equal total token count
    val mass = sketch.groupBy($"r").agg(sum($"cnt")).collect().map(_.getLong(1))
    assert(mass.toSeq == Seq.fill(4)(13L))
    val q = exact.keys.toSeq.map(Tuple1(_)).toDF("tok")
    val est = TextAnalysis.cmsEstimate(sketch, q).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) => assert(est(t) >= c, s"underestimate for $t") }
    // 7 tokens in 256 cells: no collisions expected -> exact
    assert(est == exact)
  }

  test("streaming quality gate: two micro-batches equal the batch verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val weights = Seq("n_tokens" -> 1.0, "stopword_ratio" -> 3.0)
    val b1 = Seq((1L, "the cat sat"), (2L, "x"))
    val b2 = Seq((3L, "a dog runs far"), (4L, "y z"))
    val input = MemoryStream[(Long, String)]
    val name = "r4_stream_quality"
    spark.catalog.dropTempView(name)
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocStreams
      .qualityGate(stream, weights, intercept = -3.5)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try Seq(b1, b2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.TextAnalysis
      .qualityClassifier((b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text",
        weights, intercept = -3.5)
      .filter($"keep").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("bloomContamination: eval-identical doc fully flagged, never a false negative") {
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c d e"),      // identical: every gram in the filter
      (2L, "p q r s t u"),    // disjoint: flags only from FP collisions
      (3L, "a b c x y z")     // shares gram "a b c"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bloomContamination(train, eval, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: 3 grams all present -> all flagged (guaranteed, not probabilistic)
    assert(out(0) == ((1L, 3L, 3L)))
    // doc3 shares "a b c": n_flagged >= 1 (present grams can never miss)
    assert(out(2)._1 == 3L && out(2)._3 >= 1L)
    // 4096 bits vs 3 eval grams: doc2's disjoint grams should not collide
    assert(out(1) == ((2L, 4L, 0L)))
  }

  test("packCurriculum: level-major prefix-sum equals the one-window form") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 500L).map(i => (i, 1L + i % 5, (i * 7) % 3))
      .toDF("doc_id", "ntok", "level")
    val packed = graft.operators.Packing
      .packCurriculum(rows, "doc_id", "ntok", "level", capacity = 16L,
        bucketSpan = 64L, idStride = 16L)
      .select($"doc_id", $"start_offset", $"chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.orderBy($"level", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = rows
      .withColumn("start_offset", coalesce(sum($"ntok").over(w), lit(0L)))
      .select($"doc_id", $"start_offset",
        ($"start_offset" / 16L).cast("long").as("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(packed == naive)
    // stride guard: ids overflowing the reserved ranges must fail loudly
    intercept[Exception] {
      graft.operators.Packing.packCurriculum(
        rows, "doc_id", "ntok", "level", 16L, bucketSpan = 1L, idStride = 4L)
        .count()
    }
  }

  test("pq: codes pick the nearest centroid; identical vector has adc 0") {
    // 4 dims, m=2 subspaces of 2; training vecs 0 and 1 are the codebook
    val vs = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),
      (1L, Array(0f, 1f, 1f, 0f)),
      (10L, Array(1f, 0f, 1f, 0f)),  // subspace 0 -> centroid 0, subspace 1 -> centroid 1
      (11L, Array(1f, 0f, 0f, 1f))   // identical to vec 0
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(vs, "vec_id", "embedding", Seq(0L, 1L), m = 2, dims = 4)
    assert(cb.length == 2 * 2 && cb.forall(_._2.length == 2))
    val codes = Similarity.pqEncode(vs, "vec_id", "embedding", cb, m = 2, dims = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes((10L, 0)) == 0 && codes((10L, 1)) == 1)
    assert(codes((11L, 0)) == 0 && codes((11L, 1)) == 0)
    // query = vec 0: its exact duplicate (11) must rank first with adc 0
    val top = Similarity.pqTopK(vs, vs.filter($"vec_id" === 0L),
        "vec_id", "embedding", cb, m = 2, k = 1, dims = 4)
      .collect()(0)
    assert(top.getLong(1) == 11L && top.getLong(2) == 0L)
  }

  test("recallAtK: perfect index scores 1.0, disjoint index 0.0") {
    val exact = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("q_id", "n_id")
    val perfect = Similarity.recallAtK(exact, exact, k = 2)
      .orderBy($"q_id").collect()
    assert(perfect.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    val disjoint = Seq((0L, 9L), (1L, 9L)).toDF("q_id", "n_id")
    val zero = Similarity.recallAtK(disjoint, exact, k = 2)
      .orderBy($"q_id").collect()
    assert(zero.forall(_.getLong(2) == 0L))
    // l2TopK ground truth: an exact duplicate is the 1-NN with d2 = 0
    val vs = Seq(
      (0L, Array(1f, 2f, 3f, 4f)), (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(9f, 9f, 9f, 9f))).toDF("vec_id", "embedding")
    val nn = Similarity.l2TopK(vs, vs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 1).collect()(0)
    assert(nn.getLong(1) == 1L && nn.getLong(2) == 0L)
  }

  test("streaming count-min: per-batch merge equals the whole-corpus sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq((1L, "a a b c"), (2L, "d e"))
    val b2 = Seq((3L, "a b f"), (4L, "g g g"))
    val base = java.nio.file.Files.createTempDirectory("graft_scms").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.startCountMin(
      input.toDF().toDF("doc_id", "text"), s"$base/store", s"$base/ckpt")
    try Seq(b1, b2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.read.parquet(s"$base/store/current")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = TextAnalysis.countMinSketch(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("blocklistFilter: inline and broadcast paths agree on verdicts") {
    val docs = Seq(
      (1L, "good clean text"), (2L, "contains bad word"), (3L, "bad bad")
    ).toDF("doc_id", "text")
    val inline = TextAnalysis.blocklistFilter(docs, "doc_id", "text", Seq("bad"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(inline == Seq((1L, 0L, true), (2L, 1L, false), (3L, 2L, false)))
    val bcast = TextAnalysis.blocklistFilter(docs, "doc_id", "text", Seq("bad"),
        maxInline = 0)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(bcast == inline)
  }

  test("phraseSearch: consecutive-only matches with occurrence counts") {
    val docs = Seq(
      (1L, "the quick brown fox"),     // "quick brown" once
      (2L, "quick and brown"),         // not consecutive
      (3L, "quick brown quick brown")  // twice
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalIndex(docs, "doc_id", "text")
    val hits = TextAnalysis.phraseSearch(idx, Seq("quick", "brown"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits == Seq((1L, 1L), (3L, 2L)))
    // 3-term phrase spans the chain join
    val tri = TextAnalysis.phraseSearch(idx, Seq("the", "quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tri == Seq((1L, 1L)))
    // proximity: doc2's "quick ... brown" (distance 2) hits NEAR/2 but
    // not NEAR/1; either order counts
    val near2 = TextAnalysis.proximitySearch(idx, "brown", "quick", window = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(near2 == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 3L, 1L)))
    val near1 = TextAnalysis.proximitySearch(idx, "brown", "quick", window = 1)
      .orderBy($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(near1 == Seq(1L, 3L))
  }

  test("labelCentroids: exact micro-unit means, dims in order") {
    val vs = Seq(
      (0L, Array(1f, 0f), 7),
      (1L, Array(0f, 1f), 7),     // label 7 mean = (0.5, 0.5)
      (2L, Array(0.25f, 0.5f), 9) // label 9 singleton
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(vs, "label", "embedding")
      .orderBy($"label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    assert(out.toSeq == Seq(
      (7, 2L, Seq(500000L, 500000L)),
      (9, 1L, Seq(250000L, 500000L))))
  }

  test("clusterTopTerms: cluster-exclusive terms outrank shared ones") {
    val docs = Seq(
      (1L, "aaa aaa shared", "c1"),
      (2L, "bbb shared shared", "c2")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.clusterTopTerms(docs, "doc_id", "text", "source", topK = 2)
      .orderBy($"cluster", $"rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // exclusive terms (df=1) beat "shared" (df=2) in both clusters
    assert(out == Seq(
      ("c1", 1L, "aaa"), ("c1", 2L, "shared"),
      ("c2", 1L, "bbb"), ("c2", 2L, "shared")))
  }

  test("prototypeReport: separable labels classify perfectly") {
    // two tight orthogonal classes: prototypes = axis directions
    val vs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 1), (1L, Array(0.9f, 0.1f, 0f, 0f), 1),
      (2L, Array(0f, 0f, 1f, 0f), 2), (3L, Array(0f, 0.1f, 0.9f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val rep = Similarity.prototypeReport(vs, "vec_id", "embedding", "label")
      .orderBy($"label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq == Seq((1, 2L, 2L, 1000000L), (2, 2L, 2L, 1000000L)))
  }

  test("funnel: ordered reachability, strictly increasing time") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")
    val ev = Seq(
      // user 1 completes a->b->c in order
      (1L, "a", ts(0)), (1L, "b", ts(5)), (1L, "c", ts(9)),
      // user 2: b BEFORE a -> reaches only step a
      (2L, "b", ts(1)), (2L, "a", ts(2)),
      // user 3: a then c (no b) -> step 1 only
      (3L, "a", ts(0)), (3L, "c", ts(1)),
      // user 4: greedy completeness — a(0), b(1), b(6), c(3):
      // earliest-b(1) still allows c(3); must count as completed
      (4L, "a", ts(0)), (4L, "b", ts(1)), (4L, "b", ts(6)), (4L, "c", ts(3)),
      // user 5 never does a
      (5L, "b", ts(0)), (5L, "c", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.operators.EventAnalytics
      .funnel(ev, "user_id", "event_type", "ts", Seq("a", "b", "c"))
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a", 4L), (2L, "b", 2L), (3L, "c", 2L)))
  }

  test("cohortRetention and transitionMatrix: exact counts on crafted streams") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int = 0) = Timestamp.valueOf(f"2024-06-$d%02d $h%02d:00:00")
    val ev = Seq(
      // user 1 signs up day 3, active again 8 days later (next week)
      (1L, 1L, "signup", ts(3)), (2L, 1L, "click", ts(11)),
      // user 2 signs up day 4, never returns
      (3L, 2L, "signup", ts(4)),
      // user 3 never signs up -> no cohort
      (4L, 3L, "click", ts(5))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val ret = graft.operators.EventAnalytics
      .cohortRetention(ev, "user_id", "event_type", "ts", "signup")
      .orderBy($"cohort_week", $"week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // both cohort users active at offset 0; user 1 also at offset 1
    assert(ret == Seq((0L, 2L), (1L, 1L)))
    // transitions: same-timestamp tie broken by event_id
    val ev2 = Seq(
      (1L, 9L, "a", ts(1)), (2L, 9L, "b", ts(1)), (3L, 9L, "c", ts(2)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val tm = graft.operators.EventAnalytics
      .transitionMatrix(ev2, "user_id", "event_type", "ts", "event_id")
      .orderBy($"from_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(tm == Seq(("a", "b", 1L), ("b", "c", 1L)))
  }

  test("rateAnomalies flags the spike; rollingActiveUsers covers the window") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-06-$d%02d $h%02d:30:00")
    // type "x": nine hours of 1 plus one hour of 10 -> z = 3.0 for the
    // spike (population z of one outlier is bounded by sqrt(n-1), so a
    // long-enough baseline is needed for the flag to trip)
    val ev = ((1 to 9).map(h => Seq((1L, "x", ts(1, h)))) :+
      (1 to 10).map(i => (i.toLong, "x", ts(1, 11)))).flatten
      .toDF("user_id", "event_type", "ts")
    val an = graft.operators.EventAnalytics.rateAnomalies(ev, "event_type", "ts")
      .filter($"is_anomaly").collect()
    assert(an.length == 1 && an(0).getLong(2) == 10L)
    // WAU: user 1 active day 1, user 2 active day 5 -> day 5 window
    // [d5-6, d5] catches both; day 1 only user 1
    val ev2 = Seq((1L, "a", ts(1, 1)), (2L, "a", ts(5, 1)))
      .toDF("user_id", "event_type", "ts")
    val wau = graft.operators.EventAnalytics
      .rollingActiveUsers(ev2, "user_id", "ts")
      .orderBy($"day_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val d1 = wau.keys.min
    assert(wau(d1) == 1L && wau(d1 + 4) == 2L && wau.keys.max == d1 + 4)
  }

  test("qualityClassifier: logit is the literal dot product; keep at 0") {
    val docs = Seq((1L, "the cat sat"), (2L, "x")).toDF("doc_id", "text")
    // weights chosen so doc 1 (3 tokens, has stopword) crosses 0
    val res = TextAnalysis.qualityClassifier(
        docs, "doc_id", "text",
        Seq("n_tokens" -> 1.0, "stopword_ratio" -> 3.0), intercept = -3.5)
      .orderBy($"doc_id").collect()
    // doc1: floor((-3.5 + 3 + 3*round(1/3,6)) * 1e6) = 499999 -> keep
    assert(res(0).getLong(1) == 499999L && res(0).getBoolean(2))
    // doc2: -3.5 + 1 + 0 = -2.5 -> -2500000 micros -> drop
    assert(res(1).getLong(1) == -2500000L && !res(1).getBoolean(2))
  }
}
