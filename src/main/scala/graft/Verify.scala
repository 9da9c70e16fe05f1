package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query value hash over the dumped parquet (columns sorted by name,
    // rows in written order, everything stringified) — a driver-side
    // hash_match=false can then be diffed against the hash of a local run
    // of the same build instead of being unreproducible (round 2 pain).
    val localHashes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // ×N stress escape hatch, same contract as Bench's: driver runs set no
    // skip and dump everything; a skipped query's dump dir is simply
    // absent, so the compare covers exactly what ran.
    // SPARK_GRAFT_ONLY: local-iteration inverse of SKIP — run just the
    // named queries (the driver never sets it; check.py's onlyCsv pairs
    // with it for a fast single-cell loop).
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val skip: Set[String] =
      sys.env.get("SPARK_GRAFT_SKIP")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)
    val unknown = skip -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"SPARK_GRAFT_SKIP names unknown queries: ${unknown.mkString(",")}")
    // the contract "a skipped query's dump dir is absent" must hold for a
    // REUSED outDir too — stale dumps would read as this run's output
    skip.foreach { name =>
      val d = Paths.get(outDir, name)
      if (Files.exists(d)) {
        import scala.jdk.CollectionConverters._
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    SparkEntry.queries
      .filterNot(kv => skip(kv._1))
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // SPARK_GRAFT_NO_LOCAL_HASH skips the diagnostic value hash below:
        // it is a single-threaded driver loop (~20 min for a 40M-row ×100
        // dump) that exists only to make a DRIVER-side hash_match=false
        // reproducible locally — a local ×N gate compares values through
        // check.py anyway. The driver never sets this.
        if (!sys.env.contains("SPARK_GRAFT_NO_LOCAL_HASH")) {
        val back = spark.read.parquet(s"$outDir/$name")
        val cols = back.columns.sorted.map(c =>
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.col(c).cast("string"),
            org.apache.spark.sql.functions.lit("\u0000")))
        val md = java.security.MessageDigest.getInstance("MD5")
        // toLocalIterator, not collect(): the hash is order-sequential by
        // contract, but the driver only ever needs ONE partition in
        // memory -- a collect() of a multi-million-row xN-scale dump blew
        // spark.driver.maxResultSize (measured at x100: 1.2 GiB for
        // fetch_filter_in) and the query read as failed
        back.select(cols.toIndexedSeq: _*).toLocalIterator().forEachRemaining { r =>
          md.update(r.mkString("\u0001").getBytes("UTF-8")); md.update(2.toByte)
        }
        localHashes(name) = md.digest().map("%02x".format(_)).mkString
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val hashJson = localHashes
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/value_hashes.json"), hashJson)
    spark.stop()
  }
}
