package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch-2 additions (q207–q218): the traps each entry's
  * hash-gate design depends on, locked as unit tests. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ansi=false turns size(null) into legacy -1 (the q218 trap)") {
    // The catalog session runs ansi off (Hive NULL-on-bad-cast parity,
    // SURVEY S14). Under that flag size() takes the legacy path and
    // returns -1 for a null array — coalesce(size(x), 0) never sees a
    // NULL. q218 (and any future entry counting possibly-null lists)
    // must branch on IS NULL explicitly.
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
    val got = spark.sql("SELECT size(CAST(NULL AS ARRAY<STRING>)) AS s")
      .collect()(0).getInt(0)
    assert(got == -1)
  }

  test("q218 from_xml list counting matches the relational statement") {
    val df = Queries.all.toMap.apply("q218_from_xml").fn(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(3))).toMap
    val exp = graft.core.Engine.table(spark, sf, "orders")
      .selectExpr("o_orderpriority AS pri", "o_orderkey % 4 AS m")
      .groupBy("pri").sum("m").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exp)
  }

  test("q208 width_bucket equals the floor(v/step)+1 restatement") {
    // Spark computes floor((v-lo)/((hi-lo)/n))+1; the oracle restates
    // floor(v/step)+1. Assert bit-identity over a range that includes
    // exact step multiples (the only candidates for divergence).
    val rows = spark.sql(
      """SELECT v,
        |  width_bucket(CAST(v AS DOUBLE), 0D, 60000000D, 12) AS wb,
        |  CASE WHEN CAST(v AS DOUBLE) >= 60000000.0 THEN 13L
        |       WHEN CAST(v AS DOUBLE) < 0.0 THEN 0L
        |       ELSE CAST(floor(CAST(v AS DOUBLE) / 5000000.0)
        |              AS BIGINT) + 1 END AS re
        |FROM (SELECT explode(array(
        |  0L, 1L, 4999999L, 5000000L, 5000001L, 25000000L, 42424242L,
        |  55000000L, 59999999L, 60000000L, 60000001L, -1L)) AS v)
        |""".stripMargin).collect()
    rows.foreach { r => assert(r.getLong(1) == r.getLong(2), s"v=${r.getLong(0)}") }
  }

  test("q210 SQL UDFs are inlined by the analyzer (no UDF call at runtime)") {
    val df = Queries.all.toMap.apply("q210_sql_udf").fn(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("q210_disc"),
      "SQL UDF body should be inlined, not invoked by name")
  }

  test("q213 collation grouping folds exactly the 3 case variants per segment") {
    val rows = Queries.all.toMap.apply("q213_collation_group").fn(spark, sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r => assert(r.getLong(2) == 3L, r.getString(0)) }
  }

  test("q214 dyadic EWMA: constant series converges to cents * 2047") {
    import spark.implicits._
    val df = (1 to 14).map(i => (f"2000-$i%02d", 100L)).toDF("ym", "cents")
    df.createOrReplaceTempView("r8_const")
    val got = spark.sql(
      """SELECT ym, CAST(cents * 1024
        |  + coalesce(lag(cents, 1) OVER w, 0) * 512
        |  + coalesce(lag(cents, 2) OVER w, 0) * 256
        |  + coalesce(lag(cents, 3) OVER w, 0) * 128
        |  + coalesce(lag(cents, 4) OVER w, 0) * 64
        |  + coalesce(lag(cents, 5) OVER w, 0) * 32
        |  + coalesce(lag(cents, 6) OVER w, 0) * 16
        |  + coalesce(lag(cents, 7) OVER w, 0) * 8
        |  + coalesce(lag(cents, 8) OVER w, 0) * 4
        |  + coalesce(lag(cents, 9) OVER w, 0) * 2
        |  + coalesce(lag(cents, 10) OVER w, 0) AS BIGINT) AS e
        |FROM r8_const WINDOW w AS (ORDER BY ym) ORDER BY ym
        |""".stripMargin).collect()
    // from the 11th row on, all 11 taps are populated: 100 * 2047
    got.drop(10).foreach(r => assert(r.getLong(1) == 204700L))
    // first row: only the j=0 tap
    assert(got.head.getLong(1) == 102400L)
  }

  test("q219 full outer: both unmatched classes survive the watermark gate") {
    val rows = Queries.all.toMap.apply("q219_stream_full_outer")
      .fn(spark, "/root/testdata/sf0.01").collect()
    val unmatchedClicks = rows.count(r => r.isNullAt(4)) // err_ms null
    val unmatchedErrors = rows.count(r => r.isNullAt(2)) // click_ms null
    val matched = rows.length - unmatchedClicks - unmatchedErrors
    assert(matched > 0 && unmatchedClicks > 0 && unmatchedErrors > 0,
      s"m=$matched uc=$unmatchedClicks ue=$unmatchedErrors")
    // every row is exactly one class: no row with both sides null
    assert(!rows.exists(r => r.isNullAt(2) && r.isNullAt(4)))
  }

  test("q222 trap: try_element_at throws on subscript 0 (not nulled)") {
    intercept[Exception] {
      spark.sql("SELECT try_element_at(array('a'), 0)").collect()
    }
  }

  test("q220 trap: to_char '9' format renders ZERO as all spaces, breaking to_number") {
    // leading '9' positions render as spaces; non-zero values still
    // parse back, but the value 0 becomes an ALL-SPACES string that
    // to_number rejects outright. The zero-pad '0' format is the
    // round-trippable one q220 uses (orders has an o_orderkey = 0).
    val blank = spark
      .sql("SELECT to_char(CAST(0 AS DECIMAL(6,0)), '999999')")
      .collect()(0).getString(0)
    assert(blank.trim.isEmpty && blank.length == 6)
    intercept[Exception] {
      spark.sql("SELECT to_number('      ', '999999')").collect()
    }
    val ok = spark.sql(
      "SELECT to_number(to_char(CAST(0 AS DECIMAL(6,0)), '000000'), '000000')")
      .collect()(0).getDecimal(0)
    assert(ok.longValue == 0L)
  }

  test("q225 trap: Spark chr() wraps mod 256; only codepoints < 256 are portable") {
    val r = spark
      .sql("SELECT chr(8364), chr(8364 % 256), chr(233)").collect()(0)
    assert(r.getString(0) == r.getString(1)) // 8364 -> '¬', not '€'
    assert(r.getString(0) == "¬" && r.getString(2) == "é")
  }

  test("q224 trap: timestampadd on a parquet NTZ column yields TIMESTAMP_NTZ") {
    // unix_millis requires TIMESTAMP(LTZ); q224 casts explicitly.
    val dt = graft.core.Engine.table(spark, sf, "orders")
      .selectExpr("timestampadd(DAY, 30, o_orderdate) AS t")
      .schema("t").dataType
    assert(dt == org.apache.spark.sql.types.TimestampNTZType)
  }

  test("q223 session variables: DECLARE default, SET VAR overrides, read-back") {
    spark.sql(
      "DECLARE OR REPLACE VARIABLE r8_v BIGINT DEFAULT 7")
    assert(spark.sql("SELECT r8_v").collect()(0).getLong(0) == 7L)
    spark.sql("SET VAR r8_v = 42")
    assert(spark.sql("SELECT r8_v").collect()(0).getLong(0) == 42L)
  }

  test("q227 region-level sketch union stays within the pinned tolerance") {
    val rows = Queries.all.toMap.apply("q227_hll_union").fn(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), s"region ${r.get(0)}"))
  }

  test("q230 trap: observed metrics reject DISTINCT aggregates") {
    import org.apache.spark.sql.functions.{countDistinct, col}
    val obs = new org.apache.spark.sql.Observation()
    intercept[Exception] {
      graft.core.Engine.table(spark, sf, "orders")
        .observe(obs, countDistinct(col("o_custkey")).as("d"))
        .count()
    }
  }

  test("q229 _metadata.file_name reflects the scanned parquet file") {
    val rows = Queries.all.toMap.apply("q229_file_metadata").fn(spark, sf)
      .collect()
    assert(rows.length == 1 && rows(0).getString(0) == "orders.parquet")
  }

  test("q231 DataFrame groupingSets equals the SQL GROUPING SETS result") {
    val df = Queries.all.toMap.apply("q231_df_grouping_sets").fn(spark, sf)
    graft.core.Engine.table(spark, sf, "orders")
      .createOrReplaceTempView("r8_orders")
    val sqlRows = spark.sql(
      """SELECT o_orderpriority AS pri,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n
        |FROM r8_orders
        |GROUP BY GROUPING SETS ((o_orderpriority, year(o_orderdate)),
        |  (o_orderpriority), ())
        |ORDER BY pri NULLS FIRST, yr NULLS FIRST""".stripMargin).collect()
    val apiRows = df.collect()
    assert(apiRows.length == sqlRows.length)
    apiRows.zip(sqlRows).foreach { case (a, b) =>
      assert(a.get(0) == b.get(0) && a.get(1) == b.get(1) &&
        a.getLong(2) == b.getLong(2))
    }
  }

  test("upsert state: a SINGLE torn first write recovers instead of bricking") {
    import spark.implicits._
    // crash mid-FIRST-write leaves exactly one v=0 dir with no
    // _SUCCESS and no prior good version. That must read as "no state"
    // (warn) so the replayed batch's Overwrite can recover — throwing
    // here would fail the query on every restart. Multiple marker-less
    // dirs (the Round7Spec case) still fail loudly.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_upsert_torn0").toString + "/state"
    assert(new java.io.File(s"$dir/v=0").mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/v=0/part-00000.parquet"),
      Array[Byte](1, 2, 3))
    // reads as "no usable state" (currentState's nonEmpty contract),
    // NOT as the marker-corruption IllegalStateException
    val e = intercept[IllegalArgumentException] {
      graft.streaming.UpsertSink.currentState(spark, dir)
    }
    assert(e.getMessage.contains("no state versions"))
    graft.streaming.UpsertSink.processBatch(
      spark, Seq((1L, 1L, 1L, 1.0)).toDF("user_id", "ts", "event_id", "value"),
      0L, dir, "user_id", "ts", "event_id", Seq("value"))
    assert(graft.streaming.UpsertSink.currentState(spark, dir).count() == 1)
  }

  test("q235 explode reformulation stays an equi-join — no nested loop in the plan") {
    val plan = Queries.all.toMap.apply("q235_array_overlap_join")
      .fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(400))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("q217 unionByName null-fills the missing column by NAME, not position") {
    import spark.implicits._
    val a = Seq(("p1", 10L)).toDF("pri", "n_1995")
    val b = Seq(("p1", 7L)).toDF("pri", "n_1996")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.toSeq == Seq("pri", "n_1995", "n_1996"))
    val rows = u.collect()
    assert(rows(0).getLong(1) == 10L && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getLong(2) == 7L)
  }
}
