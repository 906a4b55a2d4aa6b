package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events table. */
object EventAnalytics {

  /** Funnel analysis: how many users complete each prefix of an ordered
    * step sequence — step i counts users with events
    * `steps(0) < steps(1) < … < steps(i)` in strictly increasing event
    * time (ordered reachability; greedy earliest-next chaining, which is
    * complete for pure ordering constraints: if ANY increasing
    * assignment exists, the earliest-first one does too, so no user is
    * undercounted). Returns (step, event_type, n_users), step 1-based.
    *
    * Scale shape: each step is one filter (pushed to the scan), one
    * keyed join on user against the previous step's (user, t) frame —
    * which only ever SHRINKS — and a min-aggregate; counts are
    * per-frame scalar aggregates. No windows over whole users'
    * histories, no per-user state. */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user")).agg(min(col(tsCol)).as("t"))
    val chain = steps.drop(1).foldLeft(List(first)) { case (acc, st) =>
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol).as("user"), col(tsCol).as("ts2"))
        .join(acc.head, "user")
        .filter(col("ts2") > col("t"))
        .groupBy(col("user")).agg(min(col("ts2")).as("t"))
      nxt :: acc
    }.reverse
    chain.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }
}
