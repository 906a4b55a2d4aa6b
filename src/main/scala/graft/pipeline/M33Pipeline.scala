package graft.pipeline

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.sources.HeaderSkipText
import graft.sql.Statements

/** The reference's exercised pipeline (SURVEY §2.A, S1-S17), re-expressed
  * Spark-first: raw partitioned text -> typed view -> CSV warehouse table.
  *
  * Two equivalent modes:
  *  - [[runApi]]: pure DataFrame composition — works on any session
  *    (in-memory catalog), used by the `m33_pipeline` query entry;
  *  - [[sqlStatements]]/[[runSql]]: the same pipeline as HiveQL DDL text
  *    through `spark.sql` with a Hive catalog (S3-S5, S17 exercised as
  *    DDL; statements mirror the three reference DDL files under
  *    examples/src/hive/).
  */
object M33Pipeline {

  val m33Schema = "age_mil BIGINT, wavelength DOUBLE, flam DOUBLE, is_peculiar INT"

  /** S2: the raw external table surface (row_str + partition + file). */
  def rawTable(spark: SparkSession, dataRoot: String): DataFrame =
    HeaderSkipText.readPartitioned(
      spark,
      partitionCol = "peculiarity",
      partitionDirs = Map("cp" -> s"$dataRoot/cp", "nocp" -> s"$dataRoot/nocp"),
      skipLines = 3)

  /** S5-S15: the m33_schem view transform (two-stage parse -> cast;
    * reference: examples/src/hive/create_m33_schem_view.hql). Casts are
    * non-ANSI (NULL on malformed), matching Hive. */
  def schemView(raw: DataFrame): DataFrame =
    raw
      .select(
        regexp_extract(col("input_file"), "(hmix\\.a)(\\d*)", 2).as("age"),
        split(trim(col("row_str")), "  ").as("data"),
        (F.field(col("peculiarity"), lit("nocp"), lit("cp")) - 1).as("is_peculiar"))
      .select(
        col("age").cast("bigint").as("age_mil"),
        col("data").getItem(0).cast("double").as("wavelength"),
        col("data").getItem(1).cast("double").as("flam"),
        col("is_peculiar"))

  /** S17: CTAS into the warehouse as comma-delimited text. Returns the
    * table path. */
  def ctasCsv(view: DataFrame, warehouseDir: String, table: String = "m33"): String = {
    val path = new File(warehouseDir, table).getAbsolutePath
    view.write.mode(SaveMode.Overwrite).option("delimiter", ",").csv(path)
    path
  }

  /** Read the warehouse CSV back with the declared sink schema (what the
    * export job parses; SURVEY §3.2). */
  def readM33Csv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(m33Schema).option("delimiter", ",").csv(path)

  /** Full API-mode pipeline: raw scan -> view -> CSV CTAS -> read back. */
  def runApi(spark: SparkSession, dataRoot: String, warehouseDir: String): DataFrame = {
    val path = ctasCsv(schemView(rawTable(spark, dataRoot)), warehouseDir)
    readM33Csv(spark, path)
  }

  /** The pipeline as HiveQL statements (S3, S4, S5, S17; semantics of
    * examples/src/hive/create_m33_raw_ext_tbl.hql /
    * create_m33_schem_view.hql / create_insert_m33_tbl.hql, paths
    * parameterized). Requires a Hive-catalog session. */
  def sqlStatements(dataRoot: String): Seq[String] = Seq(
    // Spark (unlike Hive) requires LOCATION on external tables; the
    // per-partition LOCATIONs below still bind the actual data dirs.
    s"""CREATE EXTERNAL TABLE m33_raw (row_str STRING)
       |  COMMENT 'raw m33 spectra, schema-on-read'
       |  PARTITIONED BY (peculiarity STRING)
       |  ROW FORMAT DELIMITED
       |  STORED AS TEXTFILE
       |  LOCATION '$dataRoot'
       |  TBLPROPERTIES ('skip.header.line.count'='3')""".stripMargin,
    s"ALTER TABLE m33_raw ADD PARTITION (peculiarity = 'cp') LOCATION '$dataRoot/cp'",
    s"ALTER TABLE m33_raw ADD PARTITION (peculiarity = 'nocp') LOCATION '$dataRoot/nocp'",
    // Hive auto-names unaliased view expressions (_c0.._c2, see the
    // reference golden log line 785); Spark requires explicit aliases.
    // Header rows never reach this view: the ResolveHeaderSkipTextTables
    // rule gives the raw table real skip.header.line.count semantics
    // (positional, per file), so the view is the reference transform
    // verbatim — no parse-based filtering.
    """CREATE VIEW m33_schem (age_mil, wavelength, flam, is_peculiar) AS
      |  SELECT
      |    cast(cleaned_data.age AS BIGINT) AS _c0,
      |    cast(cleaned_data.data[0] AS DOUBLE) AS _c1,
      |    cast(cleaned_data.data[1] AS DOUBLE) AS _c2,
      |    cleaned_data.is_peculiar
      |  FROM (
      |    SELECT
      |      regexp_extract(INPUT__FILE__NAME, '(hmix\\.a)(\\d*)', 2) AS age,
      |      split(trim(row_str), '  ') AS data,
      |      field(peculiarity, 'nocp', 'cp') - 1 AS is_peculiar
      |    FROM m33_raw
      |  ) cleaned_data""".stripMargin,
    """CREATE TABLE m33
      |  ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
      |  STORED AS TEXTFILE
      |AS SELECT * FROM m33_schem""".stripMargin)

  /** Run the SQL-mode pipeline on a Hive-catalog session; returns the
    * materialized m33 table. */
  def runSql(spark: SparkSession, dataRoot: String): DataFrame = {
    spark.sql("DROP TABLE IF EXISTS m33")
    spark.sql("DROP VIEW IF EXISTS m33_schem")
    spark.sql("DROP TABLE IF EXISTS m33_raw")
    sqlStatements(dataRoot).foreach(Statements.exec(spark, _))
    spark.table("m33")
  }
}
