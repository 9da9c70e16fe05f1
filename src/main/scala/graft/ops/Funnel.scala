package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each user, the
  * earliest chain of step timestamps with each step STRICTLY after its
  * predecessor (`signup → click → purchase` with t₁ < t₂ < t₃), plus the
  * per-step reach/conversion rollup.
  *
  * Scale design: ONE shuffle. Events are filtered to the step types at
  * the scan (predicate pushdown — other types never leave the files),
  * grouped per user, and the greedy chain is computed by array
  * expressions over the per-user event list — no per-step self-join
  * cascade (m joins × m shuffles), no window sort over all events. The
  * greedy earliest-completion chain is OPTIMAL for funnels (taking the
  * earliest qualifying event for step i never prevents a later step that
  * any other choice would allow), so this one-pass form computes exactly
  * the iterated `min(ts > prev)` definition the oracle replays.
  *
  * Per-user state is O(that user's step-type events) — the same bound
  * sessionization carries; timestamps stay whatever flavor the source
  * has (TIMESTAMP or TIMESTAMP_NTZ — comparisons are flavor-agnostic,
  * no epoch casts).
  */
object Funnel {

  /** Per-user step times: `(user_id, step_1 … step_m)`, null from the
    * first uncompleted step on. Users with no step-1 event are absent
    * (they never entered the funnel).
    */
  def userFunnel(events: DataFrame, steps: Seq[String],
                 userCol: String = "user_id", tsCol: String = "ts",
                 typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val byUser = events
      .select(col(userCol).as("user_id"), col(tsCol).as("ts"), col(typeCol).as("step"))
      .where(col("step").isInCollection(steps))
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts"), col("step"))).as("evts"))

    // step_i = min ts of a step-i event strictly after step_{i-1}
    val withSteps = steps.zipWithIndex.foldLeft(byUser) { case (df, (s, i)) =>
      val prev: Option[Column] = if (i == 0) None else Some(col(s"step_${i}"))
      val qualifying = filter(col("evts"), e =>
        prev match {
          case None => e.getField("step") === s
          case Some(p) => e.getField("step") === s && e.getField("ts") > p
        })
      df.withColumn(s"step_${i + 1}",
        array_min(transform(qualifying, _.getField("ts"))))
    }
    withSteps.drop("evts").where(col("step_1").isNotNull)
  }

  /** The funnel rollup: users reaching each step + conversion from the
    * previous step. Driver-sized output (one row per step).
    */
  def funnelCounts(events: DataFrame, steps: Seq[String],
                   userCol: String = "user_id", tsCol: String = "ts",
                   typeCol: String = "event_type"): DataFrame = {
    val per = userFunnel(events, steps, userCol, tsCol, typeCol)
    val reached = per.select(
      steps.indices.map(i => count(col(s"step_${i + 1}")).as(s"n_${i + 1}")): _*)
    val stepRows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
        col(s"n_${i + 1}").cast("long").as("n_users"),
        round(col(s"n_${i + 1}") /
          (if (i == 0) col("n_1") else col(s"n_$i")), 4).as("conversion"))
    }
    reached.select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"), col("r.conversion"))
  }

  /** Event path analysis: the user-journey transition matrix. Each user's
    * events, ordered by (ts, event id), contribute their adjacent pairs;
    * the output is one row per `(from_step, to_step)` with the transition
    * count and its share of the from-step's outgoing edges — the data
    * behind sankey/next-action views.
    *
    * Scale design: ONE shuffle (group by user), per-user state bounded by
    * that user's event count; the pair enumeration is an in-array
    * projection (`array_sort` + `zip_with` of the sequence with its own
    * tail — no window sort over the event log, no self-join). The window
    * computing `share` runs over the AGGREGATED transition matrix, which
    * is |event types|² — driver-sized — rows.
    */
  def pathTransitions(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts", typeCol: String = "event_type",
                      idCol: String = "event_id"): DataFrame = {
    val seq = events
      .select(col(userCol).as("u"),
        struct(col(tsCol).as("ts"), col(idCol).as("eid"),
          col(typeCol).as("step")).as("e"))
      .groupBy("u").agg(array_sort(collect_list(col("e"))).as("seq"))
    val pairs = seq
      .where(size(col("seq")) >= 2)
      .select(explode(zip_with(
        slice(col("seq"), lit(1), size(col("seq")) - 1),
        slice(col("seq"), lit(2), size(col("seq")) - 1),
        (a, b) => struct(a.getField("step").as("from_step"),
          b.getField("step").as("to_step")))).as("p"))
    val counts = pairs.groupBy(col("p.from_step").as("from_step"),
        col("p.to_step").as("to_step"))
      .agg(count(lit(1)).as("n"))
    val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_step")
    counts.withColumn("share",
      round(col("n").cast("double") / sum("n").over(byFrom), 4))
  }

  /** Cohort retention: users grouped by FIRST-activity day (the cohort),
    * counted per day-offset of later activity — the classic retention
    * triangle. Two hash aggregates (per-user first day over user-day
    * pairs, then cohort×offset counts) and one co-keyed join; no window
    * over the event log, so the event volume rides the shuffle only as
    * distinct (user, day) pairs. Output: (cohort_day, day_offset,
    * n_users, retention = n / day-0 cohort size).
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0, got $maxOffsetDays")
    val userDays = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val firstDay = userDays.groupBy("u").agg(min("day").as("cohort_day"))
    val offsets = userDays.join(firstDay, "u")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .where(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
    val base = offsets.where(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("n_base"))
    offsets.join(base, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("n_base"), 4).as("retention"))
  }
}
