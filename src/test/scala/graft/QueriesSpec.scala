package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every catalog query runs at sf0.001 and yields rows; oracle
  * coverage is tracked (value-level compare runs in the driver / via
  * tools/check_oracle.py at sf0.01). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  Queries.all.foreach { case (name, q) =>
    test(s"$name runs, returns rows, and every output column is atomic") {
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val df = q.fn(spark, sf)
      // the oracle harness hashes pandas frames; array/map/struct cells
      // are unhashable there (the r04 q101 red) — checked here on the
      // SAME DataFrame the smoke uses, no second execution
      val offenders = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(offenders.isEmpty,
        s"non-atomic output columns: ${offenders.mkString(", ")}")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle — no rows-only entries left") {
    // q34 oracles through read_csv on its CTAS output, q43 through exact
    // counts + a tolerance predicate, q35 through the final-watermark
    // filter over the batch aggregate
    val noOracle = Queries.all.filter(_._2.oracle.isEmpty).map(_._1)
    assert(noOracle.isEmpty, s"unexpected oracle-less: $noOracle")
  }

  test("approx_count_distinct stays within 5% of exact (q43 contract)") {
    import org.apache.spark.sql.functions._
    val df = graft.core.Engine.table(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    df.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL drift: approx=$approx exact=$exact")
    }
  }

  test("q55 approx bench variant agrees with exact within 1% on medians") {
    val exact = Queries.all.find(_._1 == "q55_stat_aggregates").get._2
    val got = exact.benchFn.get(spark, sf)
      .select("l_returnflag", "median_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = exact.fn(spark, sf)
      .select("l_returnflag", "median_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) / v <= 0.01, s"$k: approx=${got(k)} exact=$v")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
