package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    require(args.length == 3 || (args.length == 4 && args(3) == "--fresh-corpus"),
      "usage: Stress <srcSfDir> <destDir> <factor> [--fresh-corpus]")
    val (src, dest, factor) = (args(0), args(1), args(2).toInt)
    // --fresh-corpus: documents/embeddings/events are GENERATED at target
    // scale (hash-deterministic, duplicates planted at a fixed ~2 % rate)
    // instead of replicated. Replication makes every doc a factor-way
    // exact duplicate, so pair-emitting dedup output grows ~quadratically
    // in factor — a generator artifact, not a real corpus shape. The fresh
    // corpus keeps near-dup pairs O(n), letting dedup_minhash /
    // dedup_simhash / dedup_embedding / q_interval_join run un-skipped at
    // ×100.
    val freshCorpus = args.length == 4
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

    val freshTables = if (freshCorpus) Set("documents", "embeddings", "events")
                      else Set.empty[String]
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val base = table(name)
      val out =
        if (freshTables(name)) FreshCorpus.generate(spark, name, base, factor)
        else shiftCols.get(name) match {
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

/** Fresh-at-scale corpus generation for the stress harness: every value is
  * a pure hash of (id, position, seed) — deterministic, distributed (a
  * `spark.range` projection, no driver-side data), and re-runnable.
  *
  * Shape mirrors the driver's sf tables (same schemas, same marginals:
  * word-count 10-100, five event types, unit 64-dim embeddings, labels
  * 0-9) with two deliberate differences:
  *
  *  - VOCABULARY: ~10 % of words come from the driver's 31-word common
  *    vocab, the rest from a 200 k-word tail. The driver's tiny closed
  *    vocab makes random docs' token DISTRIBUTIONS collide (pairwise
  *    simhash-vote cosine ≈ 0.64), which at 500 k docs would manufacture
  *    millions of "natural" hamming ≤ 3 pairs — a small-vocab artifact no
  *    real corpus has. The Zipf-ish split keeps signatures decorrelated,
  *    as real text is.
  *  - PLANTED DUPLICATES at a fixed rate, independent of scale factor:
  *    ids ≡ 1 (mod 100) are exact twins of id-1 (minhash jaccard 1.0,
  *    simhash hamming 0, embedding cosine ≈ 0.98); ids ≡ 51 (mod 100)
  *    are NEAR twins (last 3 words replaced ⇒ jaccard ≈ 0.8-0.9; 0.4
  *    vector perturbation ⇒ cosine ≈ 0.93, a sub-threshold near-miss).
  *    Pair-emitting operators therefore produce O(n) output at every
  *    scale, and the oracles see both sides of each threshold.
  */
object FreshCorpus {

  private val CommonWords = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan", "slow",
    "small", "sort", "spark", "stream", "table", "the", "value", "vector",
    "window")

  private def h(seed: Int, cols: Column*): Column =
    abs(xxhash64((cols :+ lit(seed)): _*))

  def generate(spark: SparkSession, name: String, src: DataFrame, factor: Int): DataFrame = {
    val srcRows = src.count()
    val n = srcRows * factor
    name match {
      case "documents" => documents(spark, n)
      case "embeddings" =>
        val labels = 10
        embeddings(spark, n, labels)
      case "events" =>
        val users = {
          val r = src.agg(max(col("user_id").cast("long"))).head()
          (if (r.isNullAt(0)) 1L else r.getLong(0) + 1L) * factor
        }
        events(spark, n, users)
      case other => sys.error(s"no fresh generator for table $other")
    }
  }

  /** Twin structure shared by documents and embeddings: ids ≡ 1 and ≡ 51
    * (mod 100) derive from id-1 (which is never itself a twin).
    */
  private def baseId(id: Column): Column =
    when(pmod(id, lit(100)) === 1 || pmod(id, lit(100)) === 51, id - 1).otherwise(id)

  private def word(id: Column, k: Column, seedA: Int, seedB: Int): Column =
    when(h(seedA, id, k) % 10 === 0,
      element_at(typedLit(CommonWords), (h(seedB, id, k) % CommonWords.size).cast("int") + 1))
      .otherwise(concat(lit("w"), h(seedB, id, k) % 200000))

  def documents(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val base = baseId(id)
    val isNear = pmod(id, lit(100)) === 51
    val nWords = (h(11, base) % 91 + 10).cast("int")
    val words = transform(sequence(lit(0), nWords - 1), k =>
      // near twins: fresh last 3 words (re-hashed on the twin's OWN id)
      when(isNear && k >= nWords - 3, word(id, k, 23, 27))
        .otherwise(word(base, k, 13, 17)))
    val text = array_join(words, " ")
    spark.range(n).select(
      col("id").as("doc_id"),
      text.as("text"),
      when(h(29, id) % 100 < 40, "en")
        .otherwise(element_at(typedLit(Seq("de", "es", "fr", "zh")),
          (h(37, id) % 4).cast("int") + 1)).as("lang"),
      concat(lit("src"), h(31, id) % 20).as("source"),
      length(text).cast("long").as("n_chars"))
  }

  def embeddings(spark: SparkSession, n: Long, labels: Int): DataFrame = {
    val id = col("id")
    val base = baseId(id)
    def raw(i: Column, seed: Int): Column = transform(sequence(lit(0), lit(63)),
      k => (h(seed, i, k) % 2000001).cast("double") / 1000000.0 - 1.0)
    // exact twins get a 0.2-norm-ratio perturbation (cosine ≈ 0.98),
    // near-miss twins 0.4 (cosine ≈ 0.93 — below the 0.95 threshold)
    val eps = when(pmod(id, lit(100)) === 1, 0.2)
      .when(pmod(id, lit(100)) === 51, 0.4).otherwise(0.0)
    val combined = zip_with(raw(base, 41), raw(id, 43), (a, b) => a + eps * b)
    val norm = sqrt(aggregate(combined, lit(0.0), (acc, x) => acc + x * x))
    // materialize (vector, norm) BEHIND a shuffle barrier: project collapse
    // would otherwise re-inline `combined` into the normalizing transform's
    // lambda, re-deriving the 128-hash vector PER ELEMENT (64×) — and the
    // final coalesce(1) write would then run that blow-up single-threaded
    spark.range(n).select(
      col("id").as("vec_id"),
      combined.as("c"),
      norm.as("nrm"),
      (h(47, id) % labels).cast("int").as("label"))
      .repartition(64)
      .select(
        col("vec_id"),
        transform(col("c"), x => (x / col("nrm")).cast("float")).as("embedding"),
        col("label"))
  }

  def events(spark: SparkSession, n: Long, users: Long): DataFrame = {
    val id = col("id")
    val epochStart = 1704067200000000L // 2024-01-01T00:00:00Z µs
    val windowMicros = 30L * 24 * 3600 * 1000000L
    spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(epochStart) + h(5, id) % windowMicros).as("ts"),
      (h(3, id) % users).as("user_id"),
      element_at(typedLit(Seq("view", "click", "purchase", "signup", "error")),
        (h(7, id) % 5).cast("int") + 1).as("event_type"),
      round((h(9, id) % 56022).cast("double") / 100.0, 2).as("value"),
      concat(lit("{\"k\": "), h(13, id) % 100, lit("}")).as("props"))
  }
}
