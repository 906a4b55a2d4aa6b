package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HiveQL script execution — SURVEY §2.A S22 (`-f` / `-e`) plus the text
  * compatibility shims (§7 hard part 3) needed to run the reference's
  * unmodified `.hql` files on Spark:
  *
  *  - `INPUT__FILE__NAME` (Hive virtual column;
  *    reference: examples/src/hive/create_m33_schem_view.hql:10) is
  *    rewritten to Spark's `input_file_name()`;
  *  - `field()` resolves because [[graft.functions.FieldIndex]] is
  *    registered by [[graft.core.Engine.attach]].
  */
object Statements {

  /** Split a multi-statement script on `;`, honoring single/double quotes
    * and `--` line comments (the reference splits beeline scripts the
    * same way; playground.py:738-750). Drops empty statements. */
  def split(script: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    var quote: Char = 0
    var lineComment = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (lineComment) {
        if (c == '\n') { lineComment = false; cur.append(c) }
      } else if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
        else if (c == '\\' && i + 1 < script.length) { cur.append(script.charAt(i + 1)); i += 1 }
      } else if (c == '\'' || c == '"') { quote = c; cur.append(c) }
      else if (c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') {
        lineComment = true; i += 1
      } else if (c == ';') { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Hive-text → Spark-text preprocessing. */
  def preprocess(stmt: String): String =
    stmt.replaceAll("(?i)INPUT__FILE__NAME", "input_file_name()")

  /** Execute one statement (preprocessed) via `spark.sql`. */
  def exec(spark: SparkSession, stmt: String): DataFrame =
    spark.sql(preprocess(stmt))

  /** Execute a multi-statement script; returns the last statement's
    * result. */
  def execScript(spark: SparkSession, script: String): Option[DataFrame] =
    split(script).foldLeft(Option.empty[DataFrame]) { (_, s) => Some(exec(spark, s)) }

  /** Execute a script file (S22 `-f`). */
  def execFile(spark: SparkSession, path: String): Option[DataFrame] =
    execScript(spark, new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
