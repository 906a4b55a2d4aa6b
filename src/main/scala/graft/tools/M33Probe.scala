package graft.tools

import java.io.File
import java.nio.file.Files

import graft.core.Engine
import graft.pipeline.M33Pipeline
import graft.sources.M33Fixture

/** Scratch probe for the m33 parity pipeline (API + Hive-SQL modes). */
object M33Probe {
  def main(args: Array[String]): Unit = {
    val base = Files.createTempDirectory("graft_m33_probe").toFile
    val root = M33Fixture.generate(base.getAbsolutePath, rowsPerFile = 2000)
    println(s"FIXTURE=$root")

    // API mode on a plain session
    val spark = Engine.hiveSession(
      new File(base, "warehouse").getAbsolutePath,
      new File(base, "metastore").getAbsolutePath,
      master = "local[8]")
    val m33 = M33Pipeline.runApi(spark, root, new File(base, "wh_api").getAbsolutePath)
    m33.createOrReplaceTempView("m33_api")
    println("API_SCHEMA=" + m33.schema.simpleString)
    println("API_COUNT=" + m33.count()) // expect 4 files x 2000
    spark.sql(
      "SELECT age_mil, is_peculiar, count(*) n, min(wavelength) lo, max(wavelength) hi FROM m33_api GROUP BY 1,2 ORDER BY 1,2")
      .show()

    // SQL mode (Hive catalog): DDL text incl. header-skip table + view
    try {
      val t = M33Pipeline.runSql(spark, root)
      println("SQL_SCHEMA=" + t.schema.simpleString)
      println("SQL_COUNT=" + t.count())
      spark.sql("SELECT * FROM m33_schem LIMIT 5").show()
      spark.sql("SELECT min(wavelength) lo, max(wavelength) hi, count(*) n FROM m33").show()
    } catch {
      case e: Throwable =>
        println("SQL_MODE_FAILED: " + e.getMessage)
        e.printStackTrace()
    }
    spark.stop()
  }
}
