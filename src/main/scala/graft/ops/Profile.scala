package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column min/max/distinct/null stats for numeric
  * columns, computed in ONE pass — a single wide aggregate row (every
  * stat is a partial-aggregating function, so the scan streams once with
  * map-side combine) reshaped driver-side into one row per column. The
  * reshape touches only #cols × 4 scalars; nothing per-row reaches the
  * driver.
  */
object Profile {

  def numericProfile(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(round(min(d), 4).as(s"min_$c"), round(max(d), 4).as(s"max_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    def opt(name: String): Option[Double] =
      if (row.isNullAt(row.fieldIndex(name))) None
      else Some(row.getAs[Double](name))
    // Option fields encode as nullable doubles — an all-null column
    // reports null min/max instead of crashing the non-nullable encoder.
    cols.map { c =>
      (c, opt(s"min_$c"), opt(s"max_$c"),
        row.getAs[Long](s"nd_$c"), row.getAs[Long](s"nn_$c"))
    }.toDF("col", "min", "max", "n_distinct", "n_nulls")
  }
}
