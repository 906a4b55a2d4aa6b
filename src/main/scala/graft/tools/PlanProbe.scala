package graft.tools

import graft.core.Engine

/** Scratch probe: physical plans of the slow dedup queries. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(master = "local[8]", shufflePartitions = 8)
    val sf = "/root/testdata/sf0.01"
    for (name <- args.toSeq) {
      println(s"===== $name =====")
      val df = graft.Queries.all.find(_._1 == name).get._2.fn(spark, sf)
      df.explain("formatted")
    }
    spark.stop()
  }
}
