package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-proofing locks: the plan shapes and guards the q234-weak fix
  * round pinned so a refactor can't silently reintroduce the
  * scale hazards the round removed. */
class ScaleGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q234 carries no per-row collection state — fan-out + distinct agg only") {
    // The round-6 `weak`: per-(pri,month) collect_set merged across a
    // 3-row window frame is state that grows with corpus cardinality.
    // The replacement fans each key out to its (constant) 3 target
    // frames and counts distinct — assert the optimized plan has no
    // collect_set/collect_list anywhere and does have the explode.
    val qe = Queries.all.toMap.apply("q234_window_distinct")
      .fn(spark, sf).queryExecution
    val optimized = qe.optimizedPlan.toString
    assert(!optimized.contains("collect_set") &&
      !optimized.contains("collect_list"), optimized.take(400))
    val physical = qe.executedPlan.toString
    assert(physical.contains("Generate") && physical.contains("explode"),
      physical.take(400))
  }

  test("q234 fan-out shape equals the window collect_set restatement") {
    // Semantics check at spec scale: the old (scale-unsafe but locally
    // correct) window-merge shape is an independent restatement of the
    // same rolling-3-frame distinct. Bit-identical results required.
    graft.core.Engine.table(spark, sf, "orders")
      .createOrReplaceTempView("r9_orders")
    val windowed = spark.sql(
      """WITH base AS (
        |  SELECT DISTINCT o_orderpriority AS pri,
        |    date_format(o_orderdate, 'yyyy-MM') AS ym,
        |    o_custkey AS ck
        |  FROM r9_orders WHERE year(o_orderdate) = 1995),
        |ms AS (SELECT pri, ym, collect_set(ck) AS s
        |       FROM base GROUP BY pri, ym)
        |SELECT pri, ym,
        |  CAST(size(array_distinct(flatten(collect_list(s)
        |    OVER (PARTITION BY pri ORDER BY ym
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))))
        |    AS BIGINT) AS dist3m
        |FROM ms ORDER BY pri, ym""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val fanned = Queries.all.toMap.apply("q234_window_distinct")
      .fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(fanned.toSeq == windowed.toSeq)
  }

  test("q187/q206 collect-free bench twins are bit-identical to the verified entries") {
    // the verified paths exercise the HOF / array-set-algebra surface
    // (which requires materialized arrays); the TIMED paths are the
    // conditional-aggregate / relational restatements a 100 TB run
    // uses. Identical rows or the bench is timing different semantics.
    for (name <- Seq("q187_higher_order_fns", "q206_array_setops")) {
      val q = Queries.all.toMap.apply(name)
      val a = q.fn(spark, sf).collect().toSeq
      val b = q.benchFn.get(spark, sf).collect().toSeq
      assert(a == b, s"$name: verified=${a.take(3)} bench=${b.take(3)}")
    }
  }

  test("q237 right outer: matched and unmatched-error classes both present, no click-only rows") {
    // columns: click_id, click_ms, err_id, user_id, err_ms, err_value
    val rows = Queries.all.toMap.apply("q237_stream_right_outer")
      .fn(spark, "/root/testdata/sf0.01").collect()
    val unmatchedErrors = rows.count(r => r.isNullAt(1)) // click_ms null
    val matched = rows.length - unmatchedErrors
    assert(matched > 0 && unmatchedErrors > 0,
      s"m=$matched ue=$unmatchedErrors")
    // a right outer must never emit a click-only row: err side always set
    assert(!rows.exists(r => r.isNullAt(4)))
  }

  test("bench ceiling on a STREAMING entry: watchdog stops the query, entry records -1") {
    // The watchdog can't cancel a stream's micro-batch jobs through the
    // entry's job group (they run under the stream execution thread's
    // own runId group) — it stops the active queries instead
    // (Bench.timeEntry's streaming branch). Prove that end to end: an
    // entry that would drain a rate source forever must be cut at the
    // ceiling, record -1, and leave no active query behind.
    val drainForever = () => {
      val q = spark.readStream.format("rate")
        .option("rowsPerSecond", "10").load()
        .writeStream.format("noop")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft_wd_stream").toString)
        .start()
      // blocks until something stops the query (processAllAvailable
      // would be racy here: a just-started rate source can report zero
      // available data and return instantly in a warm session)
      q.awaitTermination()
      // a query the watchdog stopped "completes" with partial output —
      // timeEntry's elapsed >= ceiling guard must still record -1
      ()
    }
    val t0 = System.nanoTime()
    val t = Bench.timeEntry(spark, "stream_pathological", drainForever,
      ceilingSec = 3.0)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(t == -1.0, s"recorded $t")
    assert(wall < 60.0, s"watchdog did not stop the stream: ${wall}s")
    assert(spark.streams.active.isEmpty, "stream left running after the cut")
    // the session must still run the next (batch) entry normally
    val ok = Bench.timeEntry(spark, "healthy_after_stream",
      () => assert(spark.range(1000).count() == 1000L), ceilingSec = 60.0)
    assert(ok >= 0.0)
  }

  test("bench per-entry ceiling: a pathological entry records -1, the next runs clean") {
    // a run that would take minutes (driver-side sleep per partition
    // inside a task) must be cancelled at the ceiling and surface as a
    // crash (-1), NOT eat the bench window; the helper's job-group
    // scoping must leave the session healthy for the following entry.
    import spark.implicits._
    val slow = () => {
      spark.range(0, 64, 1, 8).mapPartitions { it =>
        Thread.sleep(120000L); it
      }.write.format("noop").mode("overwrite").save()
    }
    val t0 = System.nanoTime()
    val t = Bench.timeEntry(spark, "pathological", slow, ceilingSec = 2.0)
    val wall = (System.nanoTime() - t0) / 1e9
    assert(t == -1.0)
    assert(wall < 30.0, s"watchdog did not cut the entry: ${wall}s")
    // the session must still run the next entry normally
    val ok = Bench.timeEntry(spark, "healthy",
      () => assert(spark.range(1000).count() == 1000L), ceilingSec = 60.0)
    assert(ok >= 0.0)
  }
}
