package graft.sinks

import org.apache.spark.sql.types._

/** T-SQL dialect shim for the reference's REAL sink — SQL Server 2019
  * reached through sqlcmd + Sqoop's JDBC export
  * (`/root/reference/playground.py:695-719`,
  * `/root/reference/examples/src/sql/create_m33_tbl.sql:2`,
  * `/root/reference/examples/runall.py:73`). No SQL Server exists in
  * this sandbox, so the m33x benchmark exports into embedded Derby
  * ([[JdbcSink]]); this shim makes the export path provably READY for
  * the reference's sink: the exact DDL, connection URL, batched-INSERT
  * shape, and TOP-n read-back the reference's scripts use are generated
  * from the Spark schema and unit-tested against the reference's own
  * literals (JdbcSpec). Pointing [[JdbcSink.export]] at a real server
  * is these strings plus the driver jar — no engine change. */
object SqlServerDialect {

  /** Spark → T-SQL column type. DOUBLE maps to FLOAT — T-SQL `FLOAT`
    * defaults to float(53), a full IEEE double, and is what the
    * reference's m33 DDL declares for its double columns
    * (create_m33_tbl.sql:2). */
  def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case DoubleType | FloatType => "FLOAT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case BooleanType => "BIT"
    case StringType => "NVARCHAR(MAX)"
    case TimestampType => "DATETIME2"
    case DateType => "DATE"
    case BinaryType => "VARBINARY(MAX)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no T-SQL mapping for $other")
  }

  /** `CREATE DATABASE astroDB` — create_astro_database.sql. */
  def createDatabaseDdl(db: String): String = s"CREATE DATABASE $db"

  /** `CREATE TABLE t (c1 T1, c2 T2, …)` from a Spark schema — the
    * create_m33_tbl.sql shape. */
  def createTableDdl(table: String, schema: StructType): String =
    schema.fields
      .map(f => s"${f.name} ${sqlType(f.dataType)}")
      .mkString(s"CREATE TABLE $table (", ", ", ")")

  /** The SQL Server JDBC URL Sqoop is invoked with —
    * `jdbc:sqlserver://<host>;databaseName=<db>` (playground.py:715). */
  def jdbcUrl(host: String, db: String): String =
    s"jdbc:sqlserver://$host;databaseName=$db"

  /** The per-batch prepared INSERT both Sqoop's export mappers and
    * Spark's JDBC writer execute against the sink. */
  def insertSql(table: String, schema: StructType): String =
    s"INSERT INTO $table (${schema.fieldNames.mkString(", ")}) " +
      s"VALUES (${schema.fields.map(_ => "?").mkString(", ")})"

  /** The verification read-back — `SELECT TOP 100 * FROM m33`
    * (runall.py:73; TOP-n is T-SQL's LIMIT). */
  def topNSql(table: String, n: Int): String = s"SELECT TOP $n * FROM $table"
}
