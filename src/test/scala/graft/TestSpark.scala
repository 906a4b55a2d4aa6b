package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.core.Engine

/** One shared Hive-catalog session for the whole test JVM (Spark sessions
  * can't change catalog implementation after the first builds). */
object TestSpark {
  lazy val baseDir: String =
    Files.createTempDirectory("graft_test").toFile.getAbsolutePath

  lazy val spark: SparkSession = Engine.hiveSession(
    warehouseDir = s"$baseDir/warehouse",
    metastoreDir = s"$baseDir/metastore",
    master = "local[8]")
}
