package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** One-off stage timing for the PQ pipeline (not part of sbt test).
  * Usage: tools/run_main.sh graft.PqTimingProbe <sfDir>
  */
object PqTimingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    embs.count()
    val queries = embs.where(col("vec_id") < 8)
    val model = time("fit")(Similarity.pqFit(embs, m = 8, ksub = 64, maxFitSample = 10000))
    val encoded = time("encode") {
      val e = Similarity.pqEncode(model, embs); e.count(); e
    }
    val out = time("build")(
      Similarity.pqQuery(model, encoded, embs, queries, 5, refineFactor = 4))
    time("pq-exec")(out.collect().length)
    time("ivfpq-exec")(Similarity.ivfPqTopK(embs, queries, 5,
      nlist = 16, nprobe = 4, m = 8, ksub = 64, refineFactor = 4,
      maxFitSample = 10000).collect().length)
    spark.stop()
  }
}
