package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cdc, EventAnalytics, Graph, Quality, Sampling, ZoneMap}

/** Round-5 operators: integer PageRank, co-occurrence edges, exact-quota
  * stratified sampling, time-to-conversion. */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank: hand-computed integer ranks on a 3-node chain") {
    // 1 <-> 2, 2 <-> 3 (undirected as two directed edges each)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r1 = Graph.pagerank(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deg(1)=1, deg(2)=2, deg(3)=1; p0 = 1e6 each
    // node1: 150000 + 850*(1000000 div 2) div 1000 = 150000 + 425000
    // node2: 150000 + 850*(1000000 + 1000000) div 1000 = 150000 + 1700000
    // node3: symmetric with node1
    assert(r1 == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    val r2 = Graph.pagerank(edges, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2: node1: 150000 + 850*(1850000 div 2) div 1000 = 936250
    // node2: 150000 + 850*(575000 + 575000) div 1000 = 1127500
    assert(r2 == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("pagerank: reliable checkpointEvery knob yields bit-identical ranks") {
    // the 100 TB durability path (Graph.pagerank scaladoc): reliable
    // checkpoint() for the static edge structures and every k-th
    // round's ranks must not move a single rank bit vs the all-local
    // default — both checkpoint flavors preserve the partitioned layout
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L))
        .toDF("src", "dst")
      val local = Graph.pagerank(edges, iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val durable = Graph.pagerank(edges, iterations = 4, checkpointEvery = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(durable == local)
      // the knob actually wrote durable state, not just local blocks
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, s"no reliable checkpoint under $dir")
    } finally hadCkpt match {
      // restore EXACTLY (same rationale as Round9Spec): a leaked dir
      // flips later checkpointEvery>0 paths to the reliable flavor
      case Some(d) => spark.sparkContext.setCheckpointDir(d)
      case None =>
        org.apache.spark.sql.graftbridge.Bridge.clearCheckpointDir(spark)
    }
  }

  test("co-occurrence edges: pairs within groups only, no self-pairs") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "z"))
      .toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e == Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
  }

  test("stratified sample: exact per-stratum quotas, deterministic membership") {
    val df = (0L until 100L).map(i => (i, if (i < 70) "big" else "small"))
      .toDF("id", "stratum")
    val out = Sampling.stratifiedSample(df, "id", "stratum", ppm = 300000)
    val byStratum = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("big" -> 21L, "small" -> 9L)) // floor(70*.3), floor(30*.3)
    // deterministic: same call, same membership
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(df, "id", "stratum", ppm = 300000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // quota column matches the kept count
    assert(out.filter(col("stratum") === "big").select("quota").head().getLong(0) == 21L)
  }

  test("time to conversion: first from -> first later to, non-converters absent") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "purchase", ts("2024-01-01 00:10:00")), // converts in 10 min
      (1L, "purchase", ts("2024-01-02 00:00:00")), // later purchase ignored
      (2L, "purchase", ts("2024-01-01 00:00:00")), // purchase BEFORE signup
      (2L, "signup", ts("2024-01-01 01:00:00")),   // -> no conversion
      (3L, "signup", ts("2024-01-01 00:00:00")))   // never purchases
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics
      .timeToConversion(ev, "user_id", "event_type", "ts", "signup", "purchase")
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getLong(3) == 600000L) // 10 min in ms
  }

  test("zone map: range query skips non-intersecting files, result exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zonemap_spec").toString + "/t"
    // disjoint contiguous id ranges per file (range partitioning)
    (0L until 400L).map(i => (i, i % 7)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(dir)
    val stats = ZoneMap.buildStats(spark, dir, "id")
    val scan = ZoneMap.prunedRead(spark, dir, "id", stats, 150L, 249L)
    assert(scan.filesTotal >= 3L)
    assert(scan.filesScanned < scan.filesTotal) // the index actually pruned
    val got = scan.df.agg(count(lit(1)), sum(col("v"))).head()
    val want = spark.read.parquet(dir).filter(col("id").between(150, 249))
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(got.getLong(0) == 100L && got == want)
    // empty intersection -> zero files, zero rows
    val none = ZoneMap.prunedRead(spark, dir, "id", stats, 5000L, 6000L)
    assert(none.filesScanned == 0L && none.df.count() == 0L)
  }

  test("z-order + zone map: file pruning works on BOTH clustered dimensions") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder_zm").toString + "/t"
    // two independent uniform dimensions; z-order clusters on both
    val df = (0L until 4096L)
      .map(i => (i, (i * 2654435761L) % 4096L))
      .toDF("a", "b")
    graft.operators.Layout.zorderWrite(df, "a", "b", dir, numFiles = 16, bits = 12)
    val statsA = graft.operators.ZoneMap.buildStats(spark, dir, "a")
    val statsB = graft.operators.ZoneMap.buildStats(spark, dir, "b")
    val scanA = graft.operators.ZoneMap.prunedRead(spark, dir, "a", statsA, 0L, 255L)
    val scanB = graft.operators.ZoneMap.prunedRead(spark, dir, "b", statsB, 0L, 255L)
    // a narrow range on EITHER dimension must skip files — the whole
    // point of the 2-d clustering (a linear sort would prune on one only)
    assert(scanA.filesTotal >= 8L)
    assert(scanA.filesScanned < scanA.filesTotal,
      s"dimension a not pruned: ${scanA.filesScanned}/${scanA.filesTotal}")
    assert(scanB.filesScanned < scanB.filesTotal,
      s"dimension b not pruned: ${scanB.filesScanned}/${scanB.filesTotal}")
    // exactness: pruned read equals plain filter on both dimensions
    assert(scanA.df.count() ==
      spark.read.parquet(dir).filter(col("a").between(0, 255)).count())
    assert(scanB.df.count() ==
      spark.read.parquet(dir).filter(col("b").between(0, 255)).count())
  }

  test("scd2: update closes v1 and opens v2, delete closes, insert opens") {
    val snap = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "bal")
    val changes = Seq(
      (1L, "upsert", 11L), // update
      (2L, "delete", 0L),  // delete
      (9L, "upsert", 90L)) // insert
      .toDF("id", "op", "bal")
    val out = Cdc.scd2Apply(snap, changes, "id", Seq("bal"))
      .orderBy("id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 10L, 1L, 2L, false),  // closed by update
      (1L, 2L, 11L, 2L, -1L, true),  // new version
      (2L, 1L, 20L, 1L, 2L, false),  // closed by delete, no successor
      (3L, 1L, 30L, 1L, -1L, true),  // untouched
      (9L, 2L, 90L, 2L, -1L, true))) // inserted at v2
  }

  test("quality report: null/range/unique/referential violation counts") {
    val child = Seq(
      (1L, Some(5L)), (1L, Some(60L)), // dup key 1; 60 out of range
      (2L, None),                      // null value
      (9L, Some(7L)))                  // 9 has no parent
      .toDF("k", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.report(Seq(
        Quality.rowChecks(child, Seq(
          Quality.RowCheck("v_not_null", col("v").isNull),
          Quality.RowCheck("v_range_0_50", !col("v").between(0, 50)))),
        Quality.uniqueCheck(child, Seq("k"), "k_unique"),
        Quality.referentialCheck(child, "k", parent, "pk", "k_in_parent")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("v_not_null") == ((1L, false)))
    // NULL v fails between() as NULL, not true -> only 60 violates range
    assert(out("v_range_0_50") == ((1L, false)))
    assert(out("k_unique") == ((1L, false)))    // one surplus row on k=1
    assert(out("k_in_parent") == ((1L, false))) // k=9 orphan
  }

  test("streaming upsert: 3-batch split converges to batch answer; redelivery idempotent") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec").toString + "/state"
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.5),
      (1L, ts("2024-01-03 00:00:00"), 30L, 3.5), // latest for user 1
      (1L, ts("2024-01-02 00:00:00"), 20L, 2.5),
      (2L, ts("2024-01-01 00:00:00"), 11L, 9.0), // only row for user 2
      (3L, ts("2024-01-05 00:00:00"), 50L, 7.0),
      (3L, ts("2024-01-05 00:00:00"), 51L, 8.0)) // same ts: event_id breaks tie
      .toDF("user_id", "ts", "event_id", "value")
    // deliver OUT of latest-last order across 3 batches
    val batches = Seq(Seq(1, 3), Seq(0, 5), Seq(2, 4))
      .map(ix => rows.collect().zipWithIndex.filter(p => ix.contains(p._2)).map(_._1))
      .map(rs => spark.createDataFrame(
        spark.sparkContext.parallelize(rs.toIndexedSeq), rows.schema))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.UpsertSink.processBatch(
        spark, b, i.toLong, dir, "user_id", "ts", "event_id", Seq("value"))
    }
    def state() = graft.streaming.UpsertSink.currentState(spark, dir)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val got = state()
    assert(got.toSeq == Seq((1L, 30L, 3.5), (2L, 11L, 9.0), (3L, 51L, 8.0)))
    // redelivery of batch 1 (same id, same data): state unchanged
    graft.streaming.UpsertSink.processBatch(
      spark, batches(1), 1L, dir, "user_id", "ts", "event_id", Seq("value"))
    assert(state().toSeq == got.toSeq)
  }

  test("streaming upsert: restart from checkpoint resumes, state complete") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_upsert_restart").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val schema = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "value").schema
    def file(n: Int, rows: Seq[(Long, java.sql.Timestamp, Long, Double)]): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq.map(
            r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4))), schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/src/f$n")
    def run(): Unit = {
      val st = spark.readStream.schema(schema)
        .parquet(s"$base/src/*")
      val q = graft.streaming.UpsertSink.start(st, s"$base/state",
        s"$base/ckpt", "user_id", "ts", "event_id", Seq("value"))
      try q.processAllAvailable() finally q.stop()
    }
    file(1, Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (2L, ts("2024-01-01 00:00:00"), 2L, 2.0)))
    run() // first lifetime: processes f1, then "crashes" (stop)
    file(2, Seq((1L, ts("2024-01-02 00:00:00"), 3L, 9.0))) // newer for user 1
    run() // second lifetime: SAME checkpoint — must only process f2
    val got = graft.streaming.UpsertSink.currentState(spark, s"$base/state")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 9.0), (2L, 2L, 2.0)))
  }

  test("misra-gries: SQL-registered name aggregates through spark.sql") {
    import org.apache.spark.sql.functions._
    graft.core.Engine.attach(spark)
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("mg_sql_spec")
    val out = spark
      .sql("SELECT misra_gries(t, 4) AS sk FROM mg_sql_spec")
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 2L, "y" -> 1L))
  }

  test("misra-gries: exact when distinct <= k; heavy hitter guaranteed under skew") {
    import org.apache.spark.sql.functions._
    // distinct <= k: the sketch IS the exact count table
    val small = Seq("a", "a", "b", "a", "c", "b").toDF("t").repartition(3)
    val sk1 = small.agg(graft.functions.Functions.misraGries(col("t"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk1 == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    // planted skew with k=2 over many distinct: the majority item must
    // survive (count 500 > N/(k+1) = 1000/3) with est undercounting by
    // at most N/(k+1), regardless of partitioning/order
    val rows = (0 until 500).map(_ => "hot") ++ (0 until 500).map(i => s"cold$i")
    val df = rows.toDF("t").repartition(7)
    val sk2 = df.agg(graft.functions.Functions.misraGries(col("t"), 2).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk2.contains("hot"), s"majority item evicted: $sk2")
    assert(sk2("hot") <= 500L && sk2("hot") >= 500L - 1000L / 3 - 1)
  }

  test("incremental MV merge equals full recompute") {
    val base = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("k", "n", "s")
    val delta = Seq(("a", 3L, 30L), ("c", 1L, 5L)).toDF("k", "n", "s")
    val out = Cdc.mergeAggDelta(base, delta, Seq("k"), Seq("n", "s"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 4L, 40L), ("b", 2L, 20L), ("c", 1L, 5L)))
  }
}
