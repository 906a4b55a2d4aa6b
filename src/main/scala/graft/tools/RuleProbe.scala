package graft.tools

import java.io.File
import java.nio.file.Files

import graft.core.Engine
import graft.pipeline.M33Pipeline
import graft.sources.M33Fixture

/** Scratch probe: header-skip rule plan shape + partition pruning. */
object RuleProbe {
  def main(args: Array[String]): Unit = {
    val base = Files.createTempDirectory("graft_rule_probe").toFile
    val root = M33Fixture.generate(base.getAbsolutePath, rowsPerFile = 1000)
    val spark = Engine.hiveSession(
      new File(base, "wh").getAbsolutePath,
      new File(base, "ms").getAbsolutePath,
      master = "local[8]")
    M33Pipeline.runSql(spark, root)
    val all = spark.sql("SELECT count(*) AS n FROM m33_schem")
    println("ALL=" + all.head().getLong(0))
    val onePart = spark.sql("SELECT count(*) AS n FROM m33_schem WHERE is_peculiar = 1")
    println("CP_ONLY=" + onePart.head().getLong(0))
    val plan = spark.sql("SELECT * FROM m33_raw WHERE peculiarity = 'cp'")
    plan.explain("formatted")
    println("PRUNED_COUNT=" + plan.count())
    spark.stop()
  }
}
