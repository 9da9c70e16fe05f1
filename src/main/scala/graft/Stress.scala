package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress dataset builder: replicate a driver-generated sf directory
  * `factor`× with CONSISTENT key remapping — each replica i shifts every
  * key by i·span(keyspace), so FK joins match within a replica and never
  * across replicas, distinct-key counts scale ×factor, and the TPC-H-ish
  * fixed dimensions (nation/region) stay fixed, exactly as a real larger
  * scale factor behaves. Output keeps the driver's file layout (one
  * parquet file per table) so Verify, tools/check.py, and Bench run on it
  * UNCHANGED.
  *
  * Stress-only tooling: correctness inputs remain the driver's own
  * testdata; this exists to measure how query time scales one order of
  * magnitude past the benchmark sf (evidence for the 100×-scale design
  * arguments in SURVEY §4).
  *
  * Usage: runMain graft.Stress <srcSfDir> <destDir> <factor>
  */
object Stress {

  /** keyspace → (owning table, key column): the span every shifted copy
    * of that keyspace advances by.
    */
  private val keyspaces: Map[String, (String, String)] = Map(
    "custkey" -> ("customer", "c_custkey"),
    "orderkey" -> ("orders", "o_orderkey"),
    "partkey" -> ("part", "p_partkey"),
    "suppkey" -> ("supplier", "s_suppkey"),
    "docid" -> ("documents", "doc_id"),
    "vecid" -> ("embeddings", "vec_id"),
    "eventid" -> ("events", "event_id"),
    "userid" -> ("events", "user_id"))

  /** table → (column → keyspace). Unlisted tables (nation/region) are
    * fixed dimensions and copy through unreplicated.
    */
  private val shiftCols: Map[String, Map[String, String]] = Map(
    "customer" -> Map("c_custkey" -> "custkey"),
    "orders" -> Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem" -> Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
      "l_suppkey" -> "suppkey"),
    "part" -> Map("p_partkey" -> "partkey"),
    "supplier" -> Map("s_suppkey" -> "suppkey"),
    "documents" -> Map("doc_id" -> "docid"),
    "embeddings" -> Map("vec_id" -> "vecid"),
    "events" -> Map("event_id" -> "eventid", "user_id" -> "userid"))

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Stress <srcSfDir> <destDir> <factor>")
    val (src, dest, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path(dest).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dest))

    def table(n: String): DataFrame = {
      val df = spark.read.parquet(s"$src/$n.parquet")
      // TIMESTAMP(NANOS) arrives as long under nanosAsLong: write the copy
      // as a true µs timestamp (same truncation Spark-side queries apply),
      // so the replicated table reads identically in Spark AND DuckDB
      if (n == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    }

    val spans: Map[String, Long] = keyspaces.map { case (ks, (tbl, c)) =>
      // cast to long in the agg: the key column may be int-typed in some
      // sf dirs, and max() is NULL on an empty table — treat that as span 1
      val r = table(tbl).agg(max(col(c).cast("long"))).head()
      ks -> (if (r.isNullAt(0)) 1L else r.getLong(0) + 1)
    }

    // single named file per table, like the driver's layout
    def writeOne(name: String, df: DataFrame): Long = {
      val tmp = s"$dest/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*.parquet")).head.getPath
      val out = new Path(s"$dest/$name.parquet")
      fs.delete(out, false)
      require(fs.rename(part, out), s"could not move $part to $out")
      fs.delete(new Path(tmp), true)
      spark.read.parquet(out.toString).count()
    }

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val base = table(name)
      val out = shiftCols.get(name) match {
        case None => base // fixed dimension
        case Some(shifts) =>
          (0 until factor).map { i =>
            base.select(base.columns.map { c =>
              shifts.get(c) match {
                case Some(ks) if i > 0 => (col(c) + lit(i * spans(ks))).as(c)
                case _ => col(c)
              }
            }: _*)
          }.reduce(_ unionByName _)
      }
      val rows = writeOne(name, out)
      println(s"[stress] $name: $rows rows")
    }
    spark.stop()
  }
}
