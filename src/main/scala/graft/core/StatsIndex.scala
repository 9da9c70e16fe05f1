package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level min/max data-skipping index — the lakehouse-manifest idea
  * (Delta `stats`, Iceberg manifest metrics) as a graft sidecar.
  *
  * Partition pruning answers predicates on PARTITION columns for free;
  * predicates on data columns normally read every file and rely on
  * row-group stats inside each one. This index lifts per-FILE min/max of
  * chosen data columns into one tiny parquet sidecar (`_graft_stats`,
  * underscore-hidden from every data listing), so the driver can drop
  * whole files from the scan's split list before any task launches. It
  * composes multiplicatively with z-order publish: clustering makes the
  * per-file ranges tight, the index makes the driver act on them —
  * together a range predicate on any z-ordered column touches only the
  * files whose hyper-rectangle intersects it.
  *
  * Build cost is one distributed pass at publish time (a groupBy on
  * `input_file_name`); the sidecar holds one row per (file, column) and at
  * pathological file counts would itself become a partitioned manifest —
  * out of scope here, noted for honesty.
  *
  * Skipping is CONSERVATIVE and therefore always correct: a file is
  * dropped only when NO value in [min, max] can satisfy the predicate;
  * files unknown to the index (e.g. appended after the build) and columns
  * it doesn't cover always stay in. Null rows never satisfy a comparison
  * (SQL semantics), so null-only files are skippable like any other
  * out-of-range file. Row-level exactness is enforced by the normal
  * post-scan filter either way.
  */
object StatsIndex {

  val DirName = "_graft_stats"

  /** Indexable column types: need a total order with a numeric embedding. */
  private[core] def indexable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType => true
    case _ => false
  }

  private def statsSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("column", StringType, nullable = false),
    StructField("min_v", DoubleType, nullable = true),
    StructField("max_v", DoubleType, nullable = true)))

  /** One distributed pass: per-file min/max of every indexable `cols`
    * member, written (overwrite) as the `_graft_stats` sidecar.
    */
  def build(spark: SparkSession, root: String, cols: Seq[String]): Unit = {
    val meta = DatasetMeta.read(spark, root).getOrElse(
      throw new MissingGraftMetadata(s"Dataset at $root is missing graft metadata."))
    val target = cols.filter(c => meta.dataColumns.contains(c))
    target.foreach { c =>
      require(indexable(meta.schema(c).dataType),
        s"stats column $c must be numeric/date/timestamp, got ${meta.schema(c).dataType}")
    }
    require(target.nonEmpty, s"no indexable data columns among ${cols.mkString(",")}")
    val df = spark.read.schema(meta.schema).parquet(root)
    val aggs = target.flatMap { c =>
      val n = normalized(col(c), meta.schema(c).dataType)
      Seq(min(n).as(s"min_$c"), max(n).as(s"max_$c"))
    }
    val perFile = df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per data file
    val rows = perFile.flatMap { r =>
      val file = new Path(r.getString(0)).toUri.getPath
      target.zipWithIndex.map { case (c, i) =>
        Row(file, c,
          if (r.isNullAt(1 + 2 * i)) null else r.getDouble(1 + 2 * i),
          if (r.isNullAt(2 + 2 * i)) null else r.getDouble(2 + 2 * i))
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), statsSchema)
      .write.mode("overwrite").parquet(s"$root/$DirName")
  }

  /** The index contents, or None when the dataset has no stats sidecar. */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = new Path(s"$root/$DirName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None else Some(spark.read.schema(statsSchema).parquet(p.toString))
  }

  /** Data files that MIGHT satisfy every filter: the full listing minus
    * files the index proves out. No index ⇒ the full listing.
    */
  def candidateFiles(spark: SparkSession, root: String, meta: DatasetMeta,
                     dataFilters: Seq[ColFilter]): Seq[String] = {
    val all = Publish.listDataFiles(spark, root)
    val relevant = dataFilters.filter(f => indexable(meta.schema(f.partition).dataType))
    if (relevant.isEmpty) return all
    read(spark, root) match {
      case None => all
      case Some(stats) =>
        // (file, column) -> [min, max]; tiny (one row per file per column)
        val byFile: Map[(String, String), (Option[Double], Option[Double])] =
          stats.collect().map { r =>
            (r.getString(0), r.getString(1)) ->
              (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
                if (r.isNullAt(3)) None else Some(r.getDouble(3)))
          }.toMap
        all.filter { f =>
          relevant.forall { flt =>
            byFile.get((f, flt.partition)) match {
              case None => true // file/column unknown to the index: keep
              case Some((None, _)) | Some((_, None)) => false // all-null file: no row matches
              case Some((Some(lo), Some(hi))) => mightMatch(flt, lo, hi, meta)
            }
          }
        }
    }
  }

  /** The numeric embedding stats are stored in: timestamps as epoch
    * seconds (Spark's timestamp→double cast), dates as epoch days
    * (`unix_date` — ANSI mode rejects a direct date→numeric cast).
    * [[mightMatch]] embeds filter values with the SAME mapping — keep the
    * two in lockstep or skipping silently drops matching files.
    */
  private def normalized(c: org.apache.spark.sql.Column, dt: DataType): org.apache.spark.sql.Column =
    dt match {
      case DateType => unix_date(c).cast("double")
      case _ => c.cast("double")
    }

  /** Can any value in [lo, hi] satisfy the filter? (OR across the value
    * list, mirroring the reference's per-value union semantics.)
    */
  private[graft] def mightMatch(f: ColFilter, lo: Double, hi: Double, meta: DatasetMeta): Boolean = {
    val dt = meta.schema(f.partition).dataType
    def d(v: Any): Double = v match {
      case n: Number => n.doubleValue()
      case bd: scala.math.BigDecimal => bd.toDouble // parseValue's decimal form
      case ts: java.sql.Timestamp => ts.getTime.toDouble / 1000.0 // epoch seconds
      case dt0: java.sql.Date => dt0.toLocalDate.toEpochDay.toDouble
      // string-form values are legal for typed filters (checkValue parses
      // them) — parse to the column's type first, then embed
      case s: String => d(Fetch.parseValue(s, dt))
      case b: java.lang.Boolean => if (b) 1.0 else 0.0
      case other => throw new IllegalArgumentException(
        s"filter value $other not comparable to $dt stats")
    }
    // The stored bounds and the embedded value each round through double
    // once (a long beyond 2^53, a timestamp's fractional seconds) — up to
    // ~2 ulps of combined error. Widen the interval by 2 ulps before
    // testing so a rounding tie can only KEEP a file, never skip one
    // whose rows match.
    val loS = Math.nextDown(Math.nextDown(lo))
    val hiS = Math.nextUp(Math.nextUp(hi))
    // A value whose double embedding is exact (so the == equality below
    // is trustworthy): integrals within the 2^53 mantissa, native floats.
    def exact(v: Any): Boolean = v match {
      case _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte => true
      case l: java.lang.Long => math.abs(l) <= (1L << 53)
      case _: java.lang.Double | _: java.lang.Float => true
      case s: String => exact(Fetch.parseValue(s, dt))
      case _ => false // timestamps/dates/bools: never skip on !=
    }
    f.values.exists { v =>
      val x = d(v)
      f.comparison match {
        case "==" => loS <= x && x <= hiS
        // only a provably-constant file of exactly the filtered value can
        // fail a != — and only when the embedding is exact
        case "!=" => !(lo == hi && lo == x && exact(v))
        case ">"  => hiS > x
        case ">=" => hiS >= x
        case "<"  => loS < x
        case "<=" => loS <= x
      }
    }
  }
}
