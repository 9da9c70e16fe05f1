package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join shapes Spark has no native operator for, built so the
  * physical plan stays a single keyed shuffle — never a broadcast
  * nested-loop or cartesian, which is what a naive inequality join
  * degenerates to and the non-starter at 100 TB.
  */
object TemporalJoins {

  /** Backward as-of join: each left row picks the LATEST right row with
    * `rightTs <= leftTs` within the same key (ties at equal ts match; a
    * left row with no prior right row gets nulls — i.e. LEFT OUTER as-of).
    *
    * Implementation is the union-window trick rather than a per-key
    * nested loop: tag both sides, union them, and run ONE window pass per
    * key ordered by (ts, side) taking `last(right payload, ignoreNulls)` —
    * right rows sort before left rows at equal ts, so the running "last
    * seen right payload" at each left row IS the as-of match. Cost: one
    * hash shuffle on the key + one per-partition sort, identical to any
    * keyed window aggregation; no row multiplication at any point.
    *
    * `rightCols` are the right-side columns to attach (suffixed to avoid
    * collisions). Right rows sharing an identical (key, ts) are not
    * ordered among themselves — attach only columns whose value is
    * deterministic under that tie (or ensure ts uniqueness upstream).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               suffix: String = "_r"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equality key")
    val rightStruct = struct(rightCols.map(col).toIndexedSeq: _*)
    val rightType = right.select(rightStruct).schema.head.dataType

    val lpart = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(rightType).as("__r")): _*)
    val rpart = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.select(struct(left.columns.map(col).toIndexedSeq: _*)).schema.head.dataType).as("__l"),
        rightStruct.as("__r")): _*)
      // a null right timestamp would sort BEFORE every row (asc
      // nulls-first) and become the spurious "latest prior" match for
      // left rows that should get nulls — dirty rows can't be as-of
      // matched at all, drop them
      .where(col("__ts").isNotNull)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lpart.unionByName(rpart)
      .withColumn("__match", last("__r", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c")) ++
        rightCols.map(c => col(s"__match.$c").as(c + suffix)): _*)
  }

  /** Point-in-interval join: rows of `points` matched to every row of
    * `intervals` with the same key whose `[startCol, endCol]` contains
    * `ptCol` (timestamps; bounds inclusive).
    *
    * Sparks's own plan for the containment predicate is a broadcast
    * nested loop (or worse); instead both sides are BUCKETIZED on time:
    * each interval explodes into the `bucketSeconds`-wide buckets it
    * covers, each point maps to exactly ONE bucket, and the join runs as
    * a plain equi-join on (keys, bucket) + an exact containment filter.
    * The point's single bucket means a (point, interval) pair can match
    * at most once — no dedup shuffle. Shuffle volume is
    * |points| + Σ interval spans/bucketSeconds; pick `bucketSeconds` near
    * the TYPICAL interval length so most intervals explode into O(1)
    * buckets.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      ptCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val pb = points.withColumn("__bucket",
      floor(unix_timestamp(col(ptCol)) / bucketSeconds))
    // inverted intervals (end < start, corrupted rows) must explode into
    // ZERO buckets: sequence(a, b) with a > b would otherwise generate a
    // huge DESCENDING range (|span| buckets of skew for a row whose
    // correct match set is empty)
    val startB = floor(unix_timestamp(col(startCol)) / bucketSeconds)
    val endB = floor(unix_timestamp(col(endCol)) / bucketSeconds)
    val ib = intervals.withColumn("__bucket",
      explode(when(startB <= endB, sequence(startB, endB))
        .otherwise(array().cast("array<bigint>"))))
    pb.join(ib, keys :+ "__bucket")
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
