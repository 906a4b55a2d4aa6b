package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.M33Pipeline
import graft.sources.{HeaderSkipText, M33Fixture}

/** Golden assertions for the m33 parity pipeline (SURVEY §5.1): schema
  * types from the reference log (examples/example-output.log:785), head
  * wavelengths 3000.00.., per-file row counts, partition flag recode. */
class M33PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val base: String = new File(TestSpark.baseDir, "m33base").getAbsolutePath
  lazy val root: String = M33Fixture.generate(base, rowsPerFile = 500)

  test("header skip is positional: 3 lines per file, no data rows lost") {
    val raw = HeaderSkipText.read(spark, s"$root/cp", skipLines = 3)
    // 2 files x 500 data rows; headers gone even though they'd also fail parse
    assert(raw.count() == 1000)
    assert(raw.filter(col("row_str").startsWith("#")).count() == 0)
  }

  test("raw table carries partition column and file path") {
    val raw = M33Pipeline.rawTable(spark, root)
    assert(raw.columns.toSet == Set("row_str", "input_file", "peculiarity"))
    val parts = raw.select("peculiarity").distinct().as[String].collect().toSet
    assert(parts == Set("cp", "nocp"))
  }

  test("schem view: golden schema and values") {
    val m33 = M33Pipeline.schemView(M33Pipeline.rawTable(spark, root))
    assert(m33.schema.simpleString ==
      "struct<age_mil:bigint,wavelength:double,flam:double,is_peculiar:int>")
    val head = m33
      .filter(col("age_mil") === 11 && col("is_peculiar") === 1)
      .orderBy(col("wavelength"))
      .limit(3)
      .as[(Long, Double, Double, Int)].collect()
    assert(head.map(_._2).toSeq == Seq(3000.0, 3000.01, 3000.02))
    // flam formula spot check (M33Fixture.flam is the fixture contract)
    assert(head(0)._3 == M33Fixture.flam(300000L, 11, peculiar = true))
    // filename age extraction: hmix.a000011z0790 -> 11; dir cp -> 1
    assert(m33.select("age_mil").distinct().as[Long].collect().toSet == Set(11L, 12L))
    assert(m33.select("is_peculiar").distinct().as[Int].collect().toSet == Set(0, 1))
  }

  test("API pipeline: CTAS CSV round-trip preserves all rows and types") {
    val m33 = M33Pipeline.runApi(spark, root, new File(base, "wh_api").getAbsolutePath)
    assert(m33.count() == 4 * 500)
    assert(m33.schema.simpleString ==
      "struct<age_mil:bigint,wavelength:double,flam:double,is_peculiar:int>")
    // LIMIT without ORDER BY: assert as set per SURVEY §5 (golden caveat)
    val sample = m33.limit(100).collect()
    assert(sample.length == 100)
  }

  test("SQL pipeline: HiveQL DDL end-to-end (S3-S5, S17)") {
    val t = M33Pipeline.runSql(spark, root)
    assert(t.count() == 4 * 500)
    assert(spark.table("m33_schem").schema.simpleString ==
      "struct<age_mil:bigint,wavelength:double,flam:double,is_peculiar:int>")
    // fetch-only LIMIT path (S16)
    assert(spark.sql("SELECT * FROM m33_schem LIMIT 100").collect().length == 100)
    // catalog holds table + view + partitions (S3-S5)
    val tables = spark.sql("SHOW TABLES").select("tableName").as[String].collect().toSet
    assert(Set("m33_raw", "m33_schem", "m33").subsetOf(tables))
    val parts = spark.sql("SHOW PARTITIONS m33_raw").as[String].collect().toSet
    assert(parts == Set("peculiarity=cp", "peculiarity=nocp"))
  }

  test("header-skip rule: DDL table scan skips headers positionally, prunes partitions") {
    M33Pipeline.runSql(spark, root)
    // no parse-based filtering in the view anymore: counts prove the
    // rule-level positional skip (4 files x 500 data rows)
    assert(spark.sql("SELECT count(*) FROM m33_raw").head().getLong(0) == 2000L)
    val pruned = spark.sql("SELECT * FROM m33_raw WHERE peculiarity = 'cp'")
    assert(pruned.count() == 1000L)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("graft_text_skip"), s"rule did not rewrite the scan:\n$plan")
    assert(!plan.contains("HiveTableScan"))
    // partition pruning: only the cp branch's files are scanned
    assert(!plan.contains("nocp"), s"nocp partition not pruned:\n$plan")
  }

  test("csv rendering matches Hive double format (3000.1 not 3000.100000)") {
    val whDir = new File(base, "wh_fmt").getAbsolutePath
    val path = M33Pipeline.ctasCsv(
      M33Pipeline.schemView(M33Pipeline.rawTable(spark, root)), whDir)
    val line = new File(path).listFiles().filter(_.getName.endsWith(".csv")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
      .find(_.startsWith("11,3000.01,")).get
    val cols = line.split(",")
    assert(cols.length == 4)
    assert(cols(1) == "3000.01")
    assert(!cols(2).contains("E") || cols(2).matches("[0-9.E-]+"))
  }
}
