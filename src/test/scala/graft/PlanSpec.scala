package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the optimizations the 100 TB design
  * depends on must be visible in the physical plan, not assumed. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.all.find(_._1 == name).get._2
      .fn(spark, sf).queryExecution.executedPlan.toString

  test("filters and column pruning reach the parquet scan") {
    import org.apache.spark.sql.functions._
    val df = graft.core.Engine.table(spark, sf, "lineitem")
      .filter(col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_quantity"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("dimension joins broadcast (no shuffle of the big side)") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q03_top_orders").contains("TakeOrderedAndProject"))
  }

  test("custom expressions run inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    val df = graft.core.Engine.table(spark, sf, "documents")
      .select(graft.functions.Functions.field(col("lang"), lit("en"), lit("de")).as("f"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"field() fell out of codegen:\n$p")
  }

  test("minhash groupBy reuses the repartition (single exchange per side)") {
    val p = plan("q22_minhash_lsh")
    // signature aggregation must not add an exchange on top of the
    // doc_id repartition: hashpartitioning(doc_id) appears, and no
    // exchange sits between the partial and final HashAggregate
    assert(p.contains("hashpartitioning(doc_id"))
  }

  test("as-of exec plans its required exchanges and sorts") {
    val p = plan("q45_asof_custom")
    assert(p.contains("AsOfJoin"))
    assert(p.contains("Sort ["))
  }
}
