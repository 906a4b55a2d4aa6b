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

  /** Cohort retention: users grouped by the week of their first
    * `cohortType` event; cell (cohort_week, week_offset) counts cohort
    * members active (any event) that many weeks later. Weeks are pure
    * integer epoch arithmetic (`epoch_ms div 86400000 div 7`) — calendar
    * `date_trunc('week')` has engine-varying week-start conventions,
    * integer weeks do not. Returns (cohort_week, week_offset, n_users).
    *
    * Scale shape: first-event min-agg on user; per-user-week activity is
    * a distinct on (user, week) — both single shuffles keyed on user;
    * the matrix is cohorts × offsets rows. */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      cohortType: String): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol).as("user"))
      .agg(min(expr(s"(unix_millis($tsCol) div 86400000L) div 7L")).as("cohort_week"))
    val active = events
      .select(col(userCol).as("user"),
        expr(s"(unix_millis($tsCol) div 86400000L) div 7L").as("week"))
      .distinct()
    cohorts.join(active, "user")
      .filter(col("week") >= col("cohort_week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Hourly-rate anomaly report per event type: each (type, hour) bucket
    * count is z-scored against the type's own mean/variance and flagged
    * at |z| ≥ `sigma`. The moment math is population variance computed
    * from integer sums (`(Σx² − (Σx)²/n) / n`) — every step exactly
    * rounded from integer inputs, so the z-score (emitted in ppm) is
    * engine-deterministic; zero-variance types flag nothing. Returns
    * (event_type, hour_idx, n, z_ppm, is_anomaly).
    *
    * Scale shape: one (type, hour) count aggregate, one per-type moment
    * aggregate over the (small) bucket table, broadcast join back. */
  def rateAnomalies(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      sigma: Double = 2.0): DataFrame = {
    val buckets = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"unix_millis($tsCol) div 3600000L").as("hour_idx"))
      .agg(count(lit(1)).as("n"))
    val stats = buckets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nb"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
      .select(col("event_type"),
        (col("s").cast("double") / col("nb")).as("mean"),
        ((col("ss").cast("double") - col("s").cast("double") * col("s") / col("nb")) /
          col("nb")).as("variance"))
    val z = (col("n").cast("double") - col("mean")) / sqrt(col("variance"))
    buckets.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("hour_idx"), col("n"),
        when(col("variance") === 0d, lit(0L))
          .otherwise(floor(lit(1e6) * z).cast("long")).as("z_ppm"),
        when(col("variance") === 0d, lit(false))
          .otherwise(abs(z) >= lit(sigma)).as("is_anomaly"))
  }

  /** Rolling 7-day distinct active users per day (the WAU-by-day series):
    * day d counts users with any event in `[d-6, d]`. Exact, not
    * sketched: each (user, day) activity row fans out to the 7 window
    * days it contributes to, then one distinct + count per window day —
    * bounded 7× amplification of the (already user×day-deduped) activity
    * table, no self-join of day ranges. Returns (day_idx, wau). */
  def rollingActiveUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1)
    val activity = events
      .select(col(userCol).as("user"),
        expr(s"unix_millis($tsCol) div 86400000L").as("day"))
      .distinct()
    val bounds = activity.agg(max(col("day")).as("max_day"))
    activity
      .select(col("user"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
          .as("day_idx"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("day_idx") <= col("max_day"))
      .groupBy(col("day_idx"))
      .agg(count(lit(1)).as("wau"))
  }

  /** Time-to-conversion: per-user delay from the first `fromType` event
    * to the first `toType` event strictly after it. Returns one row per
    * converted user: (user, t_from_ms, t_to_ms, delay_ms). The q104
    * funnel counts WHO converts; this measures HOW LONG conversion takes
    * (the input to conversion-latency SLOs and attribution windows).
    *
    * Scale shape: two filtered min-aggregates keyed on user and one join
    * — the same shrinking-frame chaining as [[funnel]], no windows over
    * full user histories. */
  def timeToConversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      fromType: String,
      toType: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("user")).agg(min(col(tsCol)).as("t_from"))
    val conv = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("user"), col(tsCol).as("t2"))
      .join(first, "user")
      .filter(col("t2") > col("t_from"))
      .groupBy(col("user"), col("t_from")).agg(min(col("t2")).as("t_to"))
    conv.select(
      col("user"),
      unix_millis(col("t_from")).as("t_from_ms"),
      unix_millis(col("t_to")).as("t_to_ms"),
      (unix_millis(col("t_to")) - unix_millis(col("t_from"))).as("delay_ms"))
  }

  /** Event-type transition counts (the first-order Markov matrix of user
    * behavior): for each user's time-ordered event stream, count
    * (from_type, to_type) adjacencies. Order is total — (ts, event id) —
    * so duplicate timestamps cannot make the lag nondeterministic.
    * Returns (from_type, to_type, n). One window shuffle keyed on user,
    * one small aggregate — state per task is a single previous row. */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
