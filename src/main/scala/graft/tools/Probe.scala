package graft.tools

/** Scratch verification probe: exercises the public API surface the way
  * the driver does (session bootstrap, SQL-registered functions, entry
  * smoke, plan inspection). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.session(master = "local[4]", shufflePartitions = 4)
    spark.sql(
      "SELECT field('cp','nocp','cp') AS f, field('zz','nocp','cp') AS nf, field(NULL,'a') AS nu")
      .show()
    spark.sql(
      "SELECT cosine_sim(array(1.0D,2.0D), array(1.0D,2.0D)) AS c1, " +
        "cosine_sim(array(1.0D,0.0D), array(0.0D,1.0D)) AS c0, " +
        "cosine_sim(array(0.0D), array(1.0D)) AS cn")
      .show()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    val df = spark.sql(
      "SELECT field(lang,'en','de') AS f FROM parquet.`/root/testdata/sf0.001/documents.parquet` WHERE doc_id > 5")
    df.explain("formatted")
    spark.stop()
  }
}
