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
}
