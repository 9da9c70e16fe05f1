package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators: resampling an event stream onto
  * fixed buckets and filling the gaps (dense grid + last-observation-
  * carried-forward) — the feature-engineering shape that turns raw events
  * into model-ready per-entity series.
  *
  * Scale design:
  *  - [[resample]] is ONE hash aggregate over (keys, truncated ts) with
  *    map-side partial aggregation — no window, no shuffle beyond the
  *    grouping;
  *  - [[gapFillLocf]] builds the dense grid from each key's OWN
  *    [min, max] bucket range via `sequence` + `explode` — one row per
  *    key fans out to exactly its grid, so there is no global calendar
  *    cross join and the output is Σ per-key grid sizes, never
  *    |keys| × |global range|;
  *  - the carry-forward is `last(col, ignoreNulls) OVER (PARTITION BY
  *    keys ORDER BY bucket)` — a per-key sort, which is the minimal work
  *    the LOCF semantics admit; keys partition the shuffle, so 1000
  *    executors each sort their own key ranges.
  *
  * The reference engine has no time-series surface (s3parq is
  * publish/fetch only); this extends graft's analytics core.
  */
object TimeSeries {

  /** Aggregate events onto a fixed grid: one row per (keys, `date_trunc
    * (unit, tsCol)`), with caller-chosen aggregate columns. `unit` is any
    * Spark `date_trunc` unit ("minute", "hour", "day", "week", …); the
    * bucket lands in column `bucket`.
    */
  def resample(df: DataFrame, tsCol: String, unit: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "resample needs at least one aggregate column")
    df.groupBy(keys.map(col) :+ date_trunc(unit, col(tsCol)).as("bucket"): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Z-score anomaly flags over a bucketed series: per key, each value's
    * deviation from the key's own mean in sample-stddev units;
    * `is_anomaly` when |z| ≥ `zThreshold`. A key with fewer than two
    * points (stddev undefined) or zero variance yields null z and FALSE —
    * a constant series has no outliers.
    *
    * Scale: one hash aggregate for the per-key stats (map-side partial)
    * and one equi-join back — no window sort over the series; with no
    * keys the single stats row broadcasts.
    */
  def anomalies(series: DataFrame, keys: Seq[String], valueCol: String,
                zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0.0, s"zThreshold must be positive, got $zThreshold")
    val v = col(valueCol).cast("double")
    val stats =
      if (keys.isEmpty) series.agg(avg(v).as("__mu"), stddev_samp(v).as("__sd"))
      else series.groupBy(keys.map(col): _*)
        .agg(avg(v).as("__mu"), stddev_samp(v).as("__sd"))
    val joined =
      if (keys.isEmpty) series.crossJoin(broadcast(stats))
      else series.join(stats, keys)
    joined
      .withColumn("zscore",
        when(col("__sd") > 0.0, (v - col("__mu")) / col("__sd")))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) >= zThreshold, lit(false)))
      .drop("__mu", "__sd")
  }

  /** Densify a (keys, bucket) series onto a regular grid and carry the
    * last observation forward into the gaps.
    *
    * Input: one row per observed (keys, `bucketCol`) — e.g. a
    * [[resample]] result. For every key, emits one row per `step`
    * (an interval literal, e.g. "1 hour") between that key's first and
    * last observed bucket. `valueCols` are null in inserted rows before
    * LOCF and carried forward after; every other input column is dropped
    * (a gap row has no value for them). The `filled` column marks
    * inserted rows.
    */
  def gapFillLocf(series: DataFrame, keys: Seq[String], bucketCol: String,
                  step: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "gapFillLocf needs at least one value column")
    val kc = keys.map(col)
    val obs = series.select(kc ++ (col(bucketCol) +: valueCols.map(col)): _*)
    val grid = obs.groupBy(kc: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .select(kc :+ explode(sequence(col("__lo"), col("__hi"),
        expr(s"interval $step"))).as(bucketCol): _*)
    val joined = grid.join(
      obs.withColumn("__obs", lit(true)),
      keys :+ bucketCol, "left")
    val w = Window.partitionBy(kc: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .withColumn("filled", col("__obs").isNull)
      .drop("__obs")
  }
}
