package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for semanticDedup at a stress corpus. */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sem] $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = time("count")(embs.count())
    val k = math.min(4096L, math.max(8L, n / 500)).toInt
    println(s"[sem] n=$n k=$k")
    val assigned = time("kmeansAssign") {
      val a = graft.ops.Clustering.kmeansAssign(embs, k)
      a.cache().count(); a
    }
    val sizes = assigned.groupBy("cluster").count()
      .agg(min("count"), max("count"), avg("count"),
        sum(when(col("count") > 2000, col("count")).otherwise(0)).as("capped"))
      .head()
    println(s"[sem] cluster sizes min/max/avg/cappedRows: $sizes")
    time("full semanticDedup") {
      graft.ops.Dedup.semanticDedup(embs).write.mode("overwrite")
        .format("noop").save()
    }
    spark.stop()
  }
}
