package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Codecs

/** Round-6 additions: bench pass merging, upsert marker-corruption
  * detection, BMP header-overflow hardening, bloom empty-build-side
  * degradation, q177 conf only-raise. */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bench mergePasses: min, spread, crash, and budget-skip semantics") {
    val got = Bench.mergePasses(
      Seq("a", "b", "c", "d", "e"),
      Seq(Seq(2.0, 5.0, -1.0, -1.0, 6.0),
          Seq(3.0, 4.0, 7.0, -1.0, Double.NaN)))
    // a: clean min + spread; b: min comes from pass 2
    assert(got(0) == ("a", 2.0, 1.0, 2, 2))
    assert(got(1) == ("b", 4.0, 1.0, 2, 2))
    // c crashed once, succeeded once: the success is recorded, spread 0
    // — ok (1) < attempts (2) is what distinguishes this from a clean
    // entry in the artifact
    assert(got(2) == ("c", 7.0, 0.0, 1, 2))
    // d crashed in every pass: stays -1 (distinguishable from fast)
    assert(got(3) == ("d", -1.0, 0.0, 0, 2))
    // e was SKIPPED by pass 2's budget (NaN): one clean attempt, spread
    // 0, and ok == attempts — a skip must never read as flakiness
    assert(got(4) == ("e", 6.0, 0.0, 1, 1))
  }

  test("upsert state: all-partial version dirs fail loudly, not as empty state") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_upsert_nomark").toString + "/state"
    // a pre-existing state dir whose versions ALL lack _SUCCESS (e.g.
    // written under marksuccessfuljobs=false) — reading it as "no
    // state" would silently restart state from empty
    for (v <- Seq(0, 1)) {
      assert(new java.io.File(s"$dir/v=$v").mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/v=$v/part-00000.parquet"),
        Array[Byte](1, 2, 3))
    }
    val e = intercept[IllegalStateException] {
      graft.streaming.UpsertSink.currentState(spark, dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
    val e2 = intercept[IllegalStateException] {
      graft.streaming.UpsertSink.processBatch(
        spark, Seq((1L, 1L, 1L, 1.0)).toDF("user_id", "ts", "event_id", "value"),
        5L, dir, "user_id", "ts", "event_id", Seq("value"))
    }
    assert(e2.getMessage.contains("_SUCCESS"))
  }

  test("bmp resize: corrupt header with overflowing dims is skipped, not thrown") {
    def withWidth(src: Array[Byte], w: Long): Array[Byte] = {
      val b = src.clone()
      b(18) = w.toByte; b(19) = (w >>> 8).toByte
      b(20) = (w >>> 16).toByte; b(21) = (w >>> 24).toByte
      b
    }
    val good = Codecs.encodeBmp(4, 4, seed = 7L)
    assert(Codecs.resizeBmp(good, 2, 2).isDefined)
    // width 0x30000000: 3*w overflows Int to negative — the old Int
    // completeness bound PASSED and the pixel loop threw AIOOBE
    assert(Codecs.resizeBmp(withWidth(good, 0x30000000L), 2, 2).isEmpty)
    // large but non-overflowing corrupt width: > MaxDim, also skipped
    assert(Codecs.resizeBmp(withWidth(good, 100000L), 2, 2).isEmpty)
    assert(Codecs.resizeBmpScale(withWidth(good, 0x30000000L), 2).isEmpty)
    // absurd TARGET dims are refused rather than allocating > 2^31
    assert(Codecs.resizeBmp(good, 70000, 2).isEmpty)
  }

  test("bloom anti probe: empty build side degrades to the exact anti join") {
    graft.core.Engine.attach(spark)
    Seq((1L, "1-URGENT"), (2L, "2-HIGH"))
      .toDF("o_custkey", "o_orderpriority")
      .createOrReplaceTempView("r7_orders")
    Seq((1L, "AUTOMOBILE")).toDF("c_custkey", "c_mktsegment")
      .createOrReplaceTempView("r7_customer")
    // no BUILDING rows: bloom_agg over zero rows is NULL and the raw
    // probe is NULL — without coalesce both branches drop every row.
    // The q198/q199 pattern pins it to false: every row takes the
    // exact-check branch and the anti join returns ALL orders.
    val n = spark.sql(
      """WITH probed AS (
        |  SELECT o_orderpriority,
        |    coalesce(bloom_might_contain(
        |      (SELECT bloom_agg(CAST(c_custkey AS BIGINT), 8192L, 131072L)
        |       FROM r7_customer WHERE c_mktsegment = 'BUILDING'),
        |      CAST(o_custkey AS BIGINT)), false) AS maybe
        |  FROM r7_orders)
        |SELECT count(*) FROM probed WHERE NOT maybe""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 2L, s"empty build side must keep all anti rows, got $n")
  }

  test("zone map: an index past the file cap fails with a message, not an OOM") {
    import graft.operators.ZoneMap
    val over = spark.range(ZoneMap.MaxIndexFiles + 1L).selectExpr(
      "concat('f', id) AS file", "id AS min_v", "id AS max_v", "1L AS n_rows")
    val e = intercept[IllegalArgumentException] {
      ZoneMap.prunedRead(spark, "/nonexistent", "k", over, 0L, 10L)
    }
    assert(e.getMessage.contains("driver-side collect bound"))
  }

  test("q150: the rerank runs on the codegen dot_product expression") {
    val df = Queries.all.toMap.apply("q150_hybrid_retrieval")
      .fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"),
      s"expected the codegen DotProduct in the rerank, plan:\n$plan")
    // interpreted HOF lambdas are exactly what the swap removed
    assert(!plan.toLowerCase.contains("zip_with"))
    assert(df.count() > 0)
  }

  test("q177: a caller's higher recursion limit is never lowered") {
    val key = "spark.sql.cteRecursionLevelLimit"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "9999")
      // sf0.001 events span ~1 month -> needed ~100 < 9999: must not lower
      val df = Queries.all.toMap.apply("q177_recursive_cte")
        .fn(spark, "/root/testdata/sf0.001")
      assert(df.count() > 0)
      assert(spark.conf.get(key) == "9999")
    } finally spark.conf.set(key, before)
  }
}
