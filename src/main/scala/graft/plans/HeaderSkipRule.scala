package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge, HeaderSkipTextFileFormat}
import org.apache.spark.sql.types.StringType

/** Catalyst rule giving Hive text tables real `skip.header.line.count`
  * semantics (SURVEY §7 hard part #1): Spark's Hive scan ignores the
  * property, so any `CREATE EXTERNAL TABLE ... TBLPROPERTIES
  * ('skip.header.line.count'='N')` would silently ingest header lines.
  *
  * The rule rewrites such a [[HiveTableRelation]] (single string data
  * column, text serde — the schema-on-read raw-table pattern) into a
  * union of [[HeaderSkipTextFileFormat]] scans, one per catalog
  * partition, each tagging its partition value as a literal column. The
  * output is aliased back onto the relation's attribute ids, so
  * downstream operators (views, CTAS) are untouched. Partition pruning
  * survives: a filter on the partition column constant-folds against
  * each branch's literal and prunes the branch.
  */
case class ResolveHeaderSkipTextTables(spark: SparkSession) extends Rule[LogicalPlan] {

  // Try-parse: a malformed property value (e.g. 'abc') must degrade to
  // "no skip" (the rule's fallback contract), not throw inside the match
  // guard and fail planning for every query over the table
  private def skipCount(rel: HiveTableRelation): Int =
    rel.tableMeta.properties.get("skip.header.line.count")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(0)

  private def isTextSerde(rel: HiveTableRelation): Boolean =
    rel.tableMeta.storage.inputFormat.exists(_.contains("TextInputFormat"))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case rel: HiveTableRelation
        if isTextSerde(rel) && skipCount(rel) > 0 &&
          rel.dataCols.size == 1 && rel.dataCols.head.dataType == StringType =>
      rewrite(rel).getOrElse(rel)
  }

  private def scan(location: String, skip: Int, dataColName: String): DataFrame =
    spark.read
      .format(classOf[HeaderSkipTextFileFormat].getName)
      .option("skipLines", skip.toString)
      .load(location)
      .withColumnRenamed("value", dataColName)

  private def rewrite(rel: HiveTableRelation): Option[LogicalPlan] =
    try {
      val skip = skipCount(rel)
      val dataCol = rel.dataCols.head
      val frames: Seq[DataFrame] =
        if (rel.partitionCols.isEmpty) {
          Seq(scan(rel.tableMeta.location.toString, skip, dataCol.name))
        } else {
          // PruneHiveTablePartitions runs earlier: when a partition
          // filter already narrowed the relation, only scan those
          // partitions (true partition pruning, not row-level filtering)
          val parts = rel.prunedPartitions.getOrElse(
            spark.sessionState.catalog.listPartitions(rel.tableMeta.identifier))
          parts.map { p =>
            rel.partitionCols.foldLeft(
              scan(p.location.toString, skip, dataCol.name)) { (df, pc) =>
              df.withColumn(pc.name, lit(p.spec(pc.name)).cast(pc.dataType))
            }
          }
        }
      if (frames.isEmpty) None // table has no partitions yet
      else {
        val ordered = frames
          .reduce(_.unionByName(_))
          .select((rel.dataCols ++ rel.partitionCols).map(a => col(a.name)): _*)
        val lp = Bridge.logicalPlan(ordered)
        Some(Project(
          rel.output.zip(lp.output).map { case (orig, cur) =>
            Alias(cur, orig.name)(exprId = orig.exprId)
          },
          lp))
      }
    } catch { case NonFatal(_) => None }
}
