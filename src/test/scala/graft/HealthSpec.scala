package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Health

/** The health verb's exit contract: `report` returns false (and Main
  * exits non-zero) exactly when a named check crosses its threshold —
  * the reference's aggregated NodeHealthReport semantics
  * (playground.py:330-431). */
class HealthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("healthy host passes the full battery (relaxed resource floors)") {
    // resource thresholds relaxed to always-satisfiable so this test
    // asserts the battery/verdict plumbing, not the CI host's disk state
    // (a 98%-full runner would otherwise red the suite with no bug)
    val t = Health.Thresholds(minDiskBytes = 0L, maxDiskUsedFraction = 1.0)
    val checks = Health.run(spark, t)
    assert(checks.nonEmpty)
    val failing = checks.filter(!_.healthy)
    assert(failing.isEmpty, s"unexpected failures: $failing")
    assert(checks.map(_.name).toSet == Set(
      "scheduler", "executors", "storage-memory", "local-disk",
      "disk-capacity", "volumes", "sql"))
    assert(Health.report(spark, t))
  }

  test("disk floor breach flips local-disk and the overall verdict") {
    val t = Health.Thresholds(minDiskBytes = Long.MaxValue)
    val checks = Health.run(spark, t)
    assert(!checks.find(_.name == "local-disk").get.healthy)
    // unrelated checks unaffected
    assert(checks.find(_.name == "sql").get.healthy)
    assert(!Health.report(spark, t))
  }

  test("capacity-fraction breach flips disk-capacity") {
    val t = Health.Thresholds(maxDiskUsedFraction = -0.1)
    val checks = Health.run(spark, t)
    assert(!checks.find(_.name == "disk-capacity").get.healthy)
    assert(!Health.report(spark, t))
  }

  test("expected-executor shortfall flips executors") {
    val t = Health.Thresholds(expectedExecutors = Int.MaxValue)
    val checks = Health.run(spark, t)
    val ex = checks.find(_.name == "executors").get
    assert(!ex.healthy)
    assert(ex.message.contains("/2147483647"))
    assert(!Health.report(spark, t))
  }
}
