package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc ×N recall probe: run the ann_recall artifact cell against a
  * stress dir and print the per-method minimum recall — the fast feedback
  * loop for tuning [[graft.ops.Similarity.autoNprobe]] without a full
  * StressScale pass. Usage: tools/run_main.sh graft.ProbeRecall <sfDir>
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = SparkEntry.queries("ann_recall")(spark, args(0)).collect()
    println(f"PROBE ann_recall rows=${rows.length} took=${(System.nanoTime() - t0) / 1e9}%.1fs")
    rows.groupBy(_.getAs[String]("method")).toSeq.sortBy(_._1).foreach { case (m, rs) =>
      println(f"PROBE min_recall $m%-16s ${rs.map(_.getAs[Double]("recall")).min}%.4f n=${rs.length}")
    }
    spark.stop()
  }
}
