package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics, Graph, Sampling}

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
}
