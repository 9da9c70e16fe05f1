package graft

import org.apache.spark.sql.SparkSession

/** Debug main: time named SparkEntry cells against an arbitrary sf dir.
  * Usage: ProbeCellTime <sfDir> <cell[,cell...]> — one warmup + one timed
  * run each, prints seconds.
  */
object ProbeCellTime {
  def main(args: Array[String]): Unit = {
    val Array(dir, cells) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cells.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
