package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc DV read-path cost breakdown on an existing ×N dv dataset:
  * plain count vs metadata-materializing count vs the full DV probe.
  * Usage: tools/run_main.sh graft.ProbeDvScan <dvRoot>
  */
object ProbeDvScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = args(0)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    timed("fetch_dv_count")(graft.core.Fetch.fetch(spark, root).count())
    timed("fetch_dv_count_warm")(graft.core.Fetch.fetch(spark, root).count())
    val raw = spark.read.parquet(root)
    timed("raw_count")(raw.count())
    val withMeta = raw
      .withColumn("f", col("_metadata.file_path"))
      .withColumn("i", col("_metadata.row_index"))
    timed("meta_count")(withMeta.count())
    timed("meta_filter_count")(
      withMeta.where(!(col("i") === -1L && col("f") === "")).count())
    timed("meta_hash_filter_count")(
      withMeta.where(xxhash64(col("f"), col("i")) =!= 0L).count())
    spark.stop()
  }
}
