package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Hidden partitioning: partition a dataset by a TRANSFORM of a data
  * column (the Iceberg partition-transform design — `days(ts)`,
  * `bucket(n, key)`, `truncate(w, col)`) instead of the raw column
  * itself, and let reads filter the RAW column while the engine derives
  * the matching partition predicate automatically.
  *
  * Why this matters at 100 TB: raw-column partitioning on a timestamp
  * creates one directory per distinct value (useless), so users
  * pre-compute a `day` column and must remember to filter BOTH `ts` and
  * `day` — forget the derived one and the query scans the whole table.
  * Hidden partitioning keeps the physical layout decision (day
  * granularity, bucket count) out of the logical schema: queries filter
  * `ts` and pruning is automatic, and the bucket transform gives bounded
  * directory counts on high-cardinality keys.
  *
  * Mechanics (all Spark-native):
  *  - `publishTransformed` derives one physical partition column per
  *    transform (named `tp_<kind>[<param>]_<source>`, appended after the
  *    user schema), hive-partitions by it, and records the transform
  *    spec in a `_graft_transforms.json` root sidecar.
  *  - EVERY later write seam re-derives the columns from the raw values
  *    ([[applyTo]] is hooked into `Publish.publishImpl` and the
  *    optimistic append), so mutations that change a source column move
  *    the row to its correct partition instead of leaving a stale one.
  *  - [[Fetch.fetch]]/`fetchIndexed` accept [[ColFilter]]s on the SOURCE
  *    columns: each filter compiles to (a) a conservative partition
  *    predicate on the derived column — built by applying the SAME
  *    transform expression to the literal, so Catalyst constant-folds it
  *    and prunes directories driver-side — and (b) the exact row-level
  *    predicate on the raw column. Pruning is a superset by monotonicity
  *    (or hash-equality for bucket); (b) restores exactness.
  *  - Derived columns are HIDDEN: fetch drops them from the returned
  *    frame, so the dataset reads back with the user's original schema.
  *
  * Conservative-correctness rules per comparison: monotone transforms
  * (years/months/days/hours/truncate) rewrite `==`/`in` to derived
  * equality and ranges to closed derived ranges (the boundary partition
  * may hold rows on both sides of the cut — the row predicate splits
  * it); `bucket` rewrites only `==`/`in` (hashing destroys order);
  * `!=` never prunes (its complement spans every partition).
  */
sealed trait PartitionTransform {
  def source: String
  def kind: String
  /** Integer parameter (bucket count / truncate width), if any. */
  def param: Option[Int]

  /** The derived physical partition column's name. Not `_`-prefixed:
    * hidden-dot/underscore dirs are skipped by parquet readers.
    */
  final def name: String = s"tp_$kind${param.map(_.toString).getOrElse("")}_$source"

  /** The transform expression over an input (column or literal) of the
    * source column's type.
    */
  def expr(c: Column, srcType: DataType): Column

  /** Order-preserving transform? (bucket is not) */
  def monotone: Boolean = true

  /** The derived column for a frame carrying `source`. */
  final def derive(df: DataFrame): Column =
    expr(col(source), df.schema(source).dataType)

  /** Conservative partition-pruning predicate on the derived column for a
    * validated raw-column filter; None = this filter cannot prune (the
    * row-level predicate still applies, so correctness is unaffected).
    */
  final def rewrite(f: ColFilter, srcType: DataType): Option[Column] = {
    val tp = col(name)
    def t(v: Any): Column = expr(lit(v).cast(srcType), srcType)
    f.comparison match {
      case "==" =>
        Some(f.values.map(v => tp === t(v)).reduceOption(_ || _).getOrElse(lit(false)))
      case ">" | ">=" if monotone => Some(tp >= t(f.values.head))
      case "<" | "<=" if monotone => Some(tp <= t(f.values.head))
      case _ => None
    }
  }
}

/** `years(ts)` — derived INT year. */
final case class YearsOf(source: String) extends PartitionTransform {
  val kind = "years"; val param: Option[Int] = None
  def expr(c: Column, srcType: DataType): Column = year(c)
}

/** `months(ts)` — derived DATE truncated to month start. */
final case class MonthsOf(source: String) extends PartitionTransform {
  val kind = "months"; val param: Option[Int] = None
  def expr(c: Column, srcType: DataType): Column = trunc(to_date(c), "month")
}

/** `days(ts)` — derived DATE. */
final case class DaysOf(source: String) extends PartitionTransform {
  val kind = "days"; val param: Option[Int] = None
  def expr(c: Column, srcType: DataType): Column = to_date(c)
}

/** `hours(ts)` — derived STRING `yyyy-MM-dd-HH` (lexicographic ==
  * chronological, so range rewrites stay order-preserving; a timestamp
  * partition value would carry `:` into hive dir names).
  */
final case class HoursOf(source: String) extends PartitionTransform {
  val kind = "hours"; val param: Option[Int] = None
  def expr(c: Column, srcType: DataType): Column =
    date_format(c, "yyyy-MM-dd-HH")
}

/** `bucket(n, key)` — derived INT `pmod(xxhash64(key), n)`. Bounded
  * directory count on a high-cardinality key; point lookups prune to one
  * directory. The literal is cast to the SOURCE type before hashing —
  * xxhash64(int) and xxhash64(long) differ, so write and read must hash
  * the identical representation.
  */
final case class BucketOf(n: Int, source: String) extends PartitionTransform {
  require(n > 0, s"bucket count must be positive, got $n")
  val kind = "bucket"; val param: Option[Int] = Some(n)
  override def monotone: Boolean = false
  def expr(c: Column, srcType: DataType): Column =
    pmod(xxhash64(c), lit(n.toLong)).cast(IntegerType)
}

/** `truncate(w, col)` — strings truncate to a `w`-char prefix; integrals
  * to `v - pmod(v, w)` (floor-to-multiple, monotone for negatives too
  * since pmod is non-negative).
  */
final case class TruncateOf(w: Int, source: String) extends PartitionTransform {
  require(w > 0, s"truncate width must be positive, got $w")
  val kind = "truncate"; val param: Option[Int] = Some(w)
  def expr(c: Column, srcType: DataType): Column = srcType match {
    case StringType => substring(c, 1, w)
    case ByteType | ShortType | IntegerType | LongType =>
      (c - pmod(c, lit(w))).cast(srcType)
    case other => throw new IllegalArgumentException(
      s"truncate($w, $source) unsupported on source type $other")
  }
}

object Transforms {
  val FileName = "_graft_transforms.json"

  def of(kind: String, source: String, param: Option[Int]): PartitionTransform =
    (kind, param) match {
      case ("years", _)        => YearsOf(source)
      case ("months", _)       => MonthsOf(source)
      case ("days", _)         => DaysOf(source)
      case ("hours", _)        => HoursOf(source)
      case ("bucket", Some(n)) => BucketOf(n, source)
      case ("truncate", Some(w)) => TruncateOf(w, source)
      case _ => throw new IllegalArgumentException(
        s"unknown partition transform $kind(param=$param)")
    }

  /** Parse a transform-spec string — `"days(ts), bucket(4, id),
    * truncate(3, word)"` — the `transforms` OPTION of the `graft` data
    * source (Spark's session catalog cannot store non-identity partition
    * transforms for a TableProvider, so the spec rides a provider-owned
    * option instead of `PARTITIONED BY`).
    */
  def parseSpec(spec: String): Seq[PartitionTransform] = {
    val one = """\s*(\w+)\s*\(\s*([^)]*?)\s*\)\s*""".r
    spec.split(",(?![^(]*\\))").toSeq.filter(_.trim.nonEmpty).map {
      case one(kind, args) =>
        val parts = args.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        (kind.toLowerCase, parts) match {
          case (k @ ("years" | "months" | "days" | "hours"), Seq(src)) =>
            of(k, src, None)
          case (k @ ("bucket" | "truncate"), Seq(n, src)) if n.matches("\\d+") =>
            of(k, src, Some(n.toInt))
          case _ => throw new IllegalArgumentException(
            s"cannot parse partition transform '$kind($args)' — expected " +
              "years/months/days/hours(col), bucket(n, col) or truncate(n, col)")
        }
      case other => throw new IllegalArgumentException(
        s"cannot parse partition transform '$other'")
    }
  }

  /** Exact inverse of [[PartitionTransform.name]]: `tp_days_ts` →
    * `days(ts)`, `tp_bucket8_k` → `bucket(8, k)`. Derived partition
    * names are self-describing by construction, so a file's hive dirs
    * alone identify the spec EPOCH it was written under — partition-spec
    * evolution needs no per-file log lookup to re-derive or prune.
    */
  def fromName(name: String): Option[PartitionTransform] =
    if (!name.startsWith("tp_")) None
    else {
      val rest = name.drop(3)
      Seq("years", "months", "days", "hours", "bucket", "truncate")
        .collectFirst { case k if rest.startsWith(k) =>
          val after = rest.drop(k.length)
          val (digits, tail) = after.span(_.isDigit)
          if (!tail.startsWith("_") || tail.length < 2) None
          else {
            val param = if (digits.isEmpty) None else Some(digits.toInt)
            try Some(of(k, tail.drop(1), param))
            catch { case _: IllegalArgumentException => None }
          }
        }.flatten
    }

  /** The transforms a root-relative file's own hive dirs declare (its
    * layout epoch); empty for untransformed layouts.
    */
  def specOfPath(rel: String): Seq[PartitionTransform] =
    rel.split('/').dropRight(1).toSeq
      .map(_.takeWhile(_ != '=')).flatMap(fromName)

  /** Canonical spec string — the inverse of [[parseSpec]]; rides commit
    * entries so every version knows the spec its files were written under
    * (partition-spec evolution).
    */
  def render(ts: Seq[PartitionTransform]): String =
    ts.map(t => t.param match {
      case Some(p) => s"${t.kind}($p, ${t.source})"
      case None => s"${t.kind}(${t.source})"
    }).mkString(", ")

  /** Driver-side file pruning for ONE spec epoch of an evolved dataset:
    * parse each file's hive dir values for `ts`'s derived columns,
    * evaluate the filters' conservative derived-partition rewrites on a
    * tiny LOCAL frame (full Spark cast/compare semantics, zero data
    * read), keep files that can match. Files whose paths lack a derived
    * dir (foreign layouts) are kept conservatively.
    */
  def pruneFilesBySpec(spark: SparkSession, relFiles: Seq[String],
                       ts: Seq[PartitionTransform], userSchema: StructType,
                       filters: Seq[ColFilter]): Seq[String] = {
    if (filters.isEmpty || ts.isEmpty || relFiles.isEmpty) return relFiles
    val prune = filters.flatMap { f =>
      ts.filter(_.source == f.partition)
        .flatMap(t => t.rewrite(f, userSchema(f.partition).dataType))
    }
    if (prune.isEmpty) return relFiles
    // derived column TYPES from applying the transforms to an empty frame
    val derived = applyTo(spark.createDataFrame(
      java.util.Collections.emptyList[Row](), userSchema), ts).schema
    import scala.jdk.CollectionConverters._
    val rows: Seq[Row] = relFiles.map { rel =>
      Row.fromSeq(rel +: ts.map { t =>
        rel.split('/').collectFirst {
          case seg if seg.startsWith(t.name + "=") =>
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.substring(t.name.length + 1))
        }.filterNot(_ == "__HIVE_DEFAULT_PARTITION__").orNull
      })
    }
    val schema0 = StructType(StructField("__file", StringType) +:
      ts.map(t => StructField(t.name, StringType)))
    val fdf = spark.createDataFrame(rows.toList.asJava, schema0)
      .select(col("__file") +: ts.map(t =>
        col(t.name).cast(derived(t.name).dataType).as(t.name)): _*)
    // a file is dropped ONLY when the predicate is definitively FALSE —
    // a null dir value (foreign layout / missing dir / the hive default
    // partition) makes the conjunction NULL, not false, so such files
    // stay and the row-level predicate restores exactness. (`!(p <=>
    // true)` would drop NULLs — the aggressive polarity the epoch audit
    // caught.)
    val dropped = fdf.where(prune.reduce(_ && _) <=> lit(false))
      .select("__file").collect().map(_.getString(0)).toSet
    relFiles.filterNot(dropped)
  }

  private def fsPath(root: String) = new Path(root, FileName)

  def write(spark: SparkSession, root: String, ts: Seq[PartitionTransform]): Unit = {
    val json = JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JInt(1),
      "transforms" -> JArray(ts.map(t => JObject(
        List("kind" -> JString(t.kind), "source" -> JString(t.source)) ++
          t.param.map(p => "n" -> (JInt(p): JValue)).toList: _*)).toList))))
    val p = fsPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** The dataset's recorded transforms; empty for ordinary datasets (the
    * common case — one existence probe, no read).
    */
  def read(spark: SparkSession, root: String): Seq[PartitionTransform] = {
    val p = fsPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      val raw = try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8")
      } finally in.close()
      (JsonMethods.parse(raw) \ "transforms") match {
        case JArray(xs) => xs.map { jv =>
          val kind = (jv \ "kind") match { case JString(s) => s; case _ => "" }
          val src = (jv \ "source") match { case JString(s) => s; case _ => "" }
          val n = (jv \ "n") match { case JInt(i) => Some(i.toInt); case _ => None }
          of(kind, src, n)
        }
        case _ => Nil
      }
    }
  }

  /** Drop any stale derived columns and recompute every transform column
    * from the raw values — idempotent, so every write seam can call it
    * unconditionally. This is what keeps mutations honest: an UPDATE that
    * changes a source column re-derives here and the row lands in its
    * correct partition.
    */
  def applyTo(df: DataFrame, ts: Seq[PartitionTransform]): DataFrame = {
    if (ts.isEmpty) return df
    ts.foreach { t =>
      require(df.columns.contains(t.source) || df.columns.contains(t.name),
        s"transform source column ${t.source} missing from the dataframe")
    }
    val names = ts.map(_.name).toSet
    val base = df.drop(names.toSeq: _*)
    ts.foldLeft(base)((d, t) => d.withColumn(t.name, t.derive(d)))
  }

  /** Validate raw-column filters against a transformed dataset: each must
    * reference a transform SOURCE column (partition-column filters take
    * the ordinary path) and carry type-compatible values.
    */
  def validateRaw(meta: DatasetMeta, ts: Seq[PartitionTransform],
                  filters: Seq[ColFilter]): Unit = {
    val sources = ts.map(_.source).toSet
    filters.foreach { f =>
      require(sources.contains(f.partition),
        s"Filter column ${f.partition} is neither a partition column nor a " +
          s"partition-transform source (sources: ${sources.mkString(", ")})")
      require(meta.schema.fieldNames.contains(f.partition),
        s"Filter column ${f.partition} is not in the dataset schema")
      Filters.validateTyped(f, meta.schema(f.partition).dataType)
    }
  }

  /** The combined predicate for raw-column filters on a transformed
    * dataset: conservative derived-partition pruning AND the exact
    * row-level predicate. Either half may be absent (un-prunable
    * comparison / no filters).
    */
  def compileRaw(meta: DatasetMeta, ts: Seq[PartitionTransform],
                 filters: Seq[ColFilter]): Option[Column] = {
    if (filters.isEmpty) return None
    val prune = filters.flatMap { f =>
      ts.filter(_.source == f.partition)
        .flatMap(t => t.rewrite(f, meta.schema(f.partition).dataType))
    }
    val row = Filters.compileOn(c => meta.schema(c).dataType, filters)
    (prune ++ row).reduceOption(_ && _)
  }
}
