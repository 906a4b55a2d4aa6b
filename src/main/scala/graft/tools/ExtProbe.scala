package graft.tools

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.pipeline.M33Pipeline
import graft.sources.M33Fixture

/** Scratch probe: the packaged `GraftExtensions` entry point — a session
  * built with `.withExtensions` (no Engine.hiveSession wiring) must get
  * both the as-of strategy and the header-skip rule. */
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val base = Files.createTempDirectory("graft_ext_probe").toFile
    val root = M33Fixture.generate(base.getAbsolutePath, rowsPerFile = 500)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ext-probe")
      .withExtensions(new graft.plans.GraftExtensions)
      .enableHiveSupport()
      .config("spark.sql.warehouse.dir", new File(base, "wh").getAbsolutePath)
      .config(
        "javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${new File(base, "ms").getAbsolutePath}/metastore_db;create=true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Functions.registerAll(spark)
    M33Pipeline.runSql(spark, root)
    println("EXT_RAW_COUNT=" + spark.sql("SELECT count(*) FROM m33_raw").head().getLong(0))
    val plan = spark.sql("SELECT * FROM m33_raw").queryExecution.executedPlan.toString
    println("EXT_RULE_ACTIVE=" + plan.contains("graft_text_skip"))
    spark.stop()
  }
}
