package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every catalog query runs at sf0.001 and yields rows; oracle
  * coverage is tracked (value-level compare runs in the driver / via
  * tools/check_oracle.py at sf0.01). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  Queries.all.foreach { case (name, q) =>
    test(s"$name runs and returns rows") {
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle unless structurally non-SQL-expressible") {
    val noOracle = Queries.all.filter(_._2.oracle.isEmpty).map(_._1)
    assert(
      noOracle == Seq(
        "q34_m33_pipeline", "q35_streaming_windows", "q43_approx_distinct"),
      s"unexpected oracle-less: $noOracle")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
