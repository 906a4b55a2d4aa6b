package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Statements

class StatementsSpec extends AnyFunSuite {

  test("split on semicolons, dropping empties") {
    assert(Statements.split("SELECT 1; SELECT 2;;") == Seq("SELECT 1", "SELECT 2"))
  }

  test("split ignores semicolons inside quotes") {
    assert(Statements.split("SELECT 'a;b'; SELECT \"c;d\"") ==
      Seq("SELECT 'a;b'", "SELECT \"c;d\""))
  }

  test("split strips line comments") {
    val s = "SELECT 1 -- trailing; comment\n; SELECT 2"
    assert(Statements.split(s) == Seq("SELECT 1", "SELECT 2"))
  }

  test("preprocess rewrites INPUT__FILE__NAME to input_file_name()") {
    assert(Statements.preprocess("SELECT INPUT__FILE__NAME FROM t") ==
      "SELECT input_file_name() FROM t")
    assert(Statements.preprocess("SELECT input__file__name FROM t") ==
      "SELECT input_file_name() FROM t")
  }

  test("exec runs a preprocessed statement") {
    val got = Statements.exec(TestSpark.spark, "SELECT 1 AS x").head().getInt(0)
    assert(got == 1)
  }

  test("TRANSFORM ... USING script runs through the -e/-f text surface (q238 SQL)") {
    // the beeline-typable HiveQL script-transform form, as a user would
    // paste it into `-e` — multi-statement (view + query), with the
    // script string's '-' and '\t' literals surviving the quote-aware
    // splitter. Checked against the relational restatement.
    val spark = graft.core.Engine.attach(TestSpark.spark)
    graft.core.Engine.table(spark, "/root/testdata/sf0.001", "orders")
      .createOrReplaceTempView("stmt_orders")
    val script =
      """SELECT 1 AS warm;
        |SELECT TRANSFORM(o_orderkey, o_orderpriority)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        |  USING 'sed s/-/_/'
        |  AS (k BIGINT, pri STRING)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        |FROM stmt_orders""".stripMargin
    val got = Statements.execScript(spark, script).get
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = spark.sql(
      """SELECT o_orderkey AS k, replace(o_orderpriority, '-', '_') AS pri
        |FROM stmt_orders""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.length == want.length && got.sameElements(want))
    assert(got.exists(_._2.contains("_"))) // the script actually ran
  }
}
