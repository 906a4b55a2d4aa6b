package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.M33Pipeline
import graft.sinks.JdbcSink
import graft.sources.M33Fixture

/** S18-S20 export path against embedded Derby (the sandbox stand-in for
  * the reference's SQL Server sink; SURVEY §7.6). */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("DDL passthrough + 4-way parallel export + read-back") {
    val base = new File(TestSpark.baseDir, "jdbc").getAbsolutePath
    val root = M33Fixture.generate(base, rowsPerFile = 200)
    val csvPath = M33Pipeline.ctasCsv(
      M33Pipeline.schemView(M33Pipeline.rawTable(spark, root)), s"$base/wh")
    val url = s"jdbc:derby:$base/sinkdb;create=true"

    // S19: landing DDL over a plain JDBC connection
    JdbcSink.execStatements(url, Seq(
      "CREATE TABLE m33 (age_mil BIGINT, wavelength DOUBLE, flam DOUBLE, is_peculiar INT)"))

    // S18: batched parallel append (Sqoop-export analog, 4 mappers)
    val df = M33Pipeline.readM33Csv(spark, csvPath)
    JdbcSink.export(df, url, "m33", numMappers = 4)

    // S20: TOP-100-style unordered read-back
    val back = JdbcSink.readBack(spark, url, "m33", n = 100)
    assert(back.count() == 100)
    val full = spark.read.format("jdbc").option("url", url).option("dbtable", "m33").load()
    assert(full.count() == 4 * 200)
    assert(full.schema.fieldNames.map(_.toLowerCase).toSet ==
      Set("age_mil", "wavelength", "flam", "is_peculiar"))
  }

  test("SQL Server dialect shim generates the reference's exact T-SQL") {
    import graft.sinks.SqlServerDialect
    import org.apache.spark.sql.types.StructType
    // the m33 export schema, as the pipeline reads it back
    val schema = StructType.fromDDL(M33Pipeline.m33Schema)
    // create_m33_tbl.sql:2 — byte-for-byte the reference's DDL body
    assert(SqlServerDialect.createTableDdl("m33", schema) ==
      "CREATE TABLE m33 (age_mil BIGINT, wavelength FLOAT, flam FLOAT, is_peculiar INT)")
    // create_astro_database.sql
    assert(SqlServerDialect.createDatabaseDdl("astroDB") ==
      "CREATE DATABASE astroDB")
    // playground.py:715 — the URL Sqoop's export is invoked with
    assert(SqlServerDialect.jdbcUrl("sql", "astroDB") ==
      "jdbc:sqlserver://sql;databaseName=astroDB")
    // runall.py:73 — the verification read-back
    assert(SqlServerDialect.topNSql("m33", 100) == "SELECT TOP 100 * FROM m33")
    // the prepared statement the batched export executes per row
    assert(SqlServerDialect.insertSql("m33", schema) ==
      "INSERT INTO m33 (age_mil, wavelength, flam, is_peculiar) VALUES (?, ?, ?, ?)")
    // unmappable types fail loudly, never emit guessed DDL
    intercept[IllegalArgumentException] {
      SqlServerDialect.sqlType(org.apache.spark.sql.types.CalendarIntervalType)
    }
  }
}
