package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-cell timing probe: runs the named SparkEntry query on a
  * given sf dir and prints seconds + row count.
  * Usage: tools/run_main.sh graft.ProbeCell <sfDir> <query> [query...]
  */
object ProbeCell {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args(0)).count()
      println(f"PROBE $q%-24s ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
    }
    spark.stop()
  }
}
