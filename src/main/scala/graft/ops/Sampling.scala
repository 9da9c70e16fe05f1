package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: train/val/test
  * splits and per-source mixture downsampling. Everything is a pure
  * projection/filter over a 10000-slot assignment derived from the row's
  * own key — no rand() (reruns and retried tasks assign identically), no
  * shuffle, no driver state; exactly as cheap at 100 TB as a filter.
  */
object Sampling {

  val Slots = 10000

  /** Default slot assignment: xxhash64 of the id column (uniform,
    * key-deterministic). Any custom slot expression in [0, Slots) works —
    * e.g. a modulo form when cross-engine reproducibility matters.
    */
  def hashSlot(idCol: Column, seed: Int = 0): Column =
    pmod(xxhash64(idCol, lit(seed)), lit(Slots))

  /** Add a `split` column assigning each row to `names(i)` with
    * probability `weights(i)` (weights sum to 1), by cumulative ranges
    * over the slot expression.
    */
  def withSplit(df: DataFrame, slot: Column, weights: Seq[Double],
                names: Seq[String]): DataFrame = {
    require(weights.length == names.length && weights.nonEmpty, "weights/names must align")
    require(math.abs(weights.sum - 1.0) < 1e-9, "weights must sum to 1")
    val bounds = weights.scanLeft(0.0)(_ + _).tail.map(w => math.round(w * Slots))
    val assigned = names.zip(bounds).foldRight(lit(names.last): Column) {
      case ((name, bound), acc) => when(slot < bound, name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Downsample each source to its configured keep-rate (default 1.0):
    * row kept iff its slot falls under rate×Slots for its source — the
    * "data mixing" op that rebalances corpus composition without a
    * shuffle or a count.
    */
  def mixture(df: DataFrame, slot: Column, sourceCol: String,
              rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"keep-rate $r must be in [0, 1]"))
    val threshold = rates.foldLeft(lit(math.round(defaultRate * Slots)): Column) {
      case (acc, (src, rate)) =>
        when(col(sourceCol) === src, math.round(rate * Slots)).otherwise(acc)
    }
    df.where(slot < threshold)
  }

  /** EXACTLY `n` rows per stratum (fewer only when the stratum is
    * smaller), deterministically: rows rank by (`orderCol`, `tieCol`)
    * within each stratum and the first n survive. Rate-based sampling
    * ([[mixture]]) can't hit exact per-group counts; this is the
    * eval-set / per-source-quota op. One shuffle on the stratum column;
    * a stratum's candidates sort within one task, so n and stratum sizes
    * are assumed moderate (for top-n over a HUGE skewed stratum, the
    * [[graft.functions.TopKPairs]] partial aggregate is the map-side
    * alternative).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, n: Int,
                       orderCol: Column, tieCol: Column): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(orderCol, tieCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Keep the top `keepFraction` of rows by `scoreCol` — the
    * quality-threshold curation step ("train on the best 25 % by quality
    * score"): ONE percentile aggregate finds the value cutoff, then a
    * pure filter keeps `score >= cutoff`. Ties at the cutoff are all
    * kept (value semantics, deterministic — never a row-count quota that
    * would need a global sort). `exact = false` (default) uses
    * `approx_percentile` — bounded-memory sketch, the 100 TB path;
    * `exact = true` uses the exact percentile aggregate (buffers the
    * column per partition — fine to a few hundred million rows, and
    * cross-engine reproducible for auditing).
    */
  def keepTopQuantile(df: DataFrame, scoreCol: String, keepFraction: Double,
                      exact: Boolean = false): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0, 1], got $keepFraction")
    if (keepFraction == 1.0) return df
    val p = 1.0 - keepFraction
    val v = col(scoreCol).cast("double")
    val cutoff = (
      if (exact) df.agg(expr(s"percentile($scoreCol, $p)"))
      else df.agg(approx_percentile(v, lit(p), lit(10000)))
    ).head().getDouble(0)
    df.where(v >= cutoff)
  }

  /** [[keepTopQuantile]] PER GROUP — the per-language/per-source form
    * ("keep each language's best 25 %"): one grouped percentile
    * aggregate (group count = driver-sized by contract) finds each
    * group's own cutoff, broadcast-joined back, then the pure filter.
    * Groups too small for the percentile to split (a single row) keep
    * everything at or above their cutoff — same value semantics as the
    * global form.
    */
  def keepTopQuantileByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                             keepFraction: Double,
                             exact: Boolean = false): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0, 1], got $keepFraction")
    if (keepFraction == 1.0) return df
    val p = 1.0 - keepFraction
    val v = col(scoreCol).cast("double")
    val cutoffs = df.groupBy(col(groupCol))
      .agg((if (exact) expr(s"percentile($scoreCol, $p)")
            else approx_percentile(v, lit(p), lit(10000))).as("__cut"))
    df.join(broadcast(cutoffs), Seq(groupCol))
      .where(v >= col("__cut"))
      .drop("__cut")
  }

  /** Temperature-based source rebalancing (the multilingual-LM sampling-α
    * rule, XLM-R eq. 1: sample sources ∝ n_s^α): downsample-only rates
    * `rate_s = (n_s / n_min)^(α-1)` — the smallest source keeps 100 %,
    * bigger sources keep proportionally less, and the surviving corpus
    * composition is ∝ n_s^α. α = 1 keeps everything (natural mix); α → 0
    * approaches uniform-per-source. ONE count aggregate (per-source counts
    * are driver-sized by contract), then the same slot-threshold filter as
    * [[mixture]]: deterministic, shuffle-free, rerun-stable.
    */
  def temperatureMixture(df: DataFrame, slot: Column, sourceCol: String,
                         alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toSeq
    require(counts.nonEmpty, "temperatureMixture over an empty corpus")
    val nMin = counts.map(_._2).min.toDouble
    val rates = counts.map { case (src, n) =>
      src -> math.pow(n / nMin, alpha - 1.0)
    }.toMap
    mixture(df, slot, sourceCol, rates, defaultRate = 1.0)
  }

  /** Weighted sampling WITHOUT replacement, k rows, inclusion probability
    * proportional to `weight` — Efraimidis–Spirakis A-RES: each row draws
    * a deterministic uniform u from an md5 of its key (+ seed) and ranks
    * by ln(u)/w; the top k win. Exactly reproducible across reruns,
    * retried tasks AND engines (md5 is everywhere — an external auditor
    * can recompute the sample in SQL). Rows with NULL or non-positive
    * weight are excluded. One scan + a distributed top-k (partial per
    * partition, merged on the driver's single k-row heap) — no full sort,
    * no shuffle of the corpus; the token-budget corpus sampler at 100 TB.
    */
  def weightedSample(df: DataFrame, weight: Column, k: Int, seed: Long,
                     keyCols: Seq[String]): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    require(keyCols.nonEmpty, "weightedSample needs key columns for the draw")
    // u = first 52 bits of md5(key:seed) / 2^52  (0 ≤ u < 1; DuckDB form:
    // ('0x' || substr(md5(...),1,13))::BIGINT / 4503599627370496.0)
    val u = conv(substring(md5(
        concat_ws(":", keyCols.map(col) :+ lit(seed): _*)), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0)
    val key = log(u) / weight.cast("double")
    df.where(weight.isNotNull && weight.cast("double") > 0.0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(keyCols.head))
      .limit(k)
      .drop("__wkey")
  }
}
