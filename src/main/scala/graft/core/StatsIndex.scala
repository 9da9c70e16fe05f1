package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level min/max data-skipping index — the lakehouse-manifest idea
  * (Delta `stats`, Iceberg manifest metrics) as a graft sidecar.
  *
  * Partition pruning answers predicates on PARTITION columns for free;
  * predicates on data columns normally read every file and rely on
  * row-group stats inside each one. This index lifts per-FILE min/max of
  * chosen data columns into a parquet sidecar (`_graft_stats`,
  * underscore-hidden from every data listing), so whole files drop from
  * the scan's split list before any task launches. It composes
  * multiplicatively with z-order publish: clustering makes the per-file
  * ranges tight, the index makes the driver act on them — together a
  * range predicate on any z-ordered column touches only the files whose
  * hyper-rectangle intersects it.
  *
  * Scale design (the manifest is itself a dataset at 100 TB / millions
  * of files, and is treated as one):
  *  - BUILD is one distributed pass over only the indexed columns,
  *    written distributed (no driver collect, sidecar file count scales
  *    with manifest rows).
  *  - APPEND stats only the newly written files and appends their rows
  *    to the sidecar — maintenance cost is O(batch), not O(dataset).
  *    Accumulated sidecar fragments are folded back into few files once
  *    they pass a threshold.
  *  - PRUNING evaluates the skip decision distributed-side on the stats
  *    frame and collects only the pruned file paths; the (file, column,
  *    min, max) manifest never rides to the driver.
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
  private val TmpDirName = "_graft_stats_tmp"

  /** Completeness marker (`_graft_stats/_complete.json`): present iff the
    * sidecar provably covers EVERY data file of the dataset, making the
    * sidecar an authoritative manifest — [[candidateFiles]] then plans the
    * scan's file set straight from it, with no filesystem listing at all
    * (the lakehouse-log idea: Delta/Iceberg readers never list either).
    *
    * Lifecycle (maintained by the graft write paths, Delta-log style):
    *  - written by a full [[build]] and by [[migrateCompacted]] — both
    *    index the complete file set by construction;
    *  - [[graft.core.Publish.publish]] DELETES it before writing data and
    *    [[appendFiles]] restores it after the new files' stats commit, so
    *    any crash window simply falls back to the conservative listing
    *    path (no wrong answer, just no manifest shortcut);
    *  - never written on a streaming-sink root (`_spark_metadata`): sink
    *    micro-batches add files outside this maintenance protocol.
    *
    * Contract: adding data files by any means that bypasses graft's write
    * paths (and doesn't call [[appendFiles]]) voids the marker's claim —
    * the same contract every table format's transaction log carries.
    */
  private val MarkerName = "_complete.json"

  private def markerPath(root: String) = new Path(s"$root/$DirName/$MarkerName")

  /** Latest committed micro-batch id of a streaming file sink's
    * `_spark_metadata` log, or None when the root has no sink log (or an
    * empty one). One small metadata read — never a data listing.
    */
  private[graft] def sinkLatestBatchId(spark: SparkSession, root: String): Option[Long] = {
    val p = new Path(root, "_spark_metadata")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
    new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, p.toString)
      .getLatestBatchId()
  }

  /** `sinkVersion`: a marker on a streaming-sink root must carry the sink
    * log's latest committed batch id AS OF the coverage it claims — sink
    * micro-batches add files outside the invalidate-before-write protocol,
    * so the claim is only trustworthy while the log hasn't moved
    * ([[manifestColumns]] voids it the moment a newer batch commits).
    * Versionless markers on sink roots are refused outright.
    */
  private[graft] def writeMarker(spark: SparkSession, root: String,
                                 cols: Seq[String],
                                 sinkVersion: Option[Long] = None): Unit = {
    val fs = markerPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (sinkVersion.isEmpty && fs.exists(new Path(root, "_spark_metadata"))) return
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fields = List(
      "version" -> JInt(1),
      "columns" -> JArray(cols.sorted.map(JString(_)).toList)) ++
      sinkVersion.map(v => "sinkVersion" -> JInt(v)).toList
    val json = JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
    // write-then-rename: `create(overwrite)` truncates before the bytes
    // land, so a concurrent reader could observe an EMPTY marker (the
    // EventStreamSpec auto-sync poll caught exactly that). Rename is
    // atomic on HDFS/local; stores without atomic rename still shrink the
    // torn window to the rename itself, and [[manifestColumns]] treats an
    // unparseable read as "no claim" regardless.
    val tmp = new Path(markerPath(root).getParent,
      s".${markerPath(root).getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    fs.delete(markerPath(root), false)
    if (!fs.rename(tmp, markerPath(root))) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"marker rename failed at ${markerPath(root)}")
    }
  }

  /** The marker's recorded column set, or None when the index makes no
    * (valid) completeness claim. On a streaming-sink root the claim is
    * version-checked against the commit log: a marker stamped at batch v
    * is VOID once batch v+1 commits (the sink added files outside the
    * marker protocol), and a versionless marker is void the moment a sink
    * log appears — readers then fall back to the conservative log/listing
    * path until [[syncSinkDataset]] re-establishes coverage.
    */
  def manifestColumns(spark: SparkSession, root: String): Option[Seq[String]] = {
    val p = markerPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw = try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // a torn concurrent write (or a half-landed marker after a crash) is
    // indistinguishable from "no claim yet" — answer conservatively (None
    // keeps readers on the exact listing path) instead of throwing
    val parsed = try JsonMethods.parse(raw)
      catch { case _: Exception => return None }
    val cols = parsed \ "columns" match {
      case JArray(xs) => Some(xs.collect { case JString(s) => s })
      case _ => None
    }
    val markerSinkV = parsed \ "sinkVersion" match {
      case JInt(n) => Some(n.toLong)
      case _ => None
    }
    (markerSinkV, sinkLatestBatchId(spark, root)) match {
      case (None, None) => cols // plain dataset, plain marker
      case (Some(mv), Some(lv)) if mv == lv => cols // sink log hasn't moved
      case _ => None // log moved past the claim, or marker/log mismatch
    }
  }

  /** Bring a streaming-sink-fed dataset's index up to the commit log and
    * stamp a version-checked completeness claim: stats the committed files
    * the sidecar doesn't cover yet (O(new files), like an append), then
    * writes the marker carrying the log version read BEFORE the listing —
    * a batch committing mid-sync leaves a marker the reader's version
    * check voids, never an over-claim. Until the first sync (and after
    * every new commit) readers simply keep the log-aware listing path.
    *
    * [[graft.streaming.EventStream.streamToDataset]] runs this after each
    * micro-batch when given statsCols; it is also a valid standalone
    * maintenance call (e.g. nightly, for a sink whose writer doesn't
    * index).
    */
  def syncSinkDataset(spark: SparkSession, root: String, cols: Seq[String]): Unit = {
    // Idle short-circuit BEFORE the lock and any listing: a valid marker
    // (manifestColumns already version-checks it against the log) covering
    // the requested columns means the log hasn't advanced — a progress
    // event from a zero-data trigger then costs two metadata reads, not a
    // listing + sidecar anti-join + marker rewrite per tick. Compared
    // against the VALIDATED target (the marker stores filtered+sorted
    // columns; raw cols with a partition column in them would never match
    // and the short-circuit would silently stop firing).
    val idleTarget =
      try DatasetMeta.read(spark, root).map(m => validTarget(m, cols).sorted)
      catch { case _: IllegalArgumentException => None } // nothing indexable: full path decides
    if (idleTarget.exists(t => manifestColumns(spark, root).contains(t))) return
    DatasetLock.withLock(spark, root) {
      sinkLatestBatchId(spark, root) match {
        case None => () // no commits yet (or not a sink root): nothing to claim
        case Some(v) =>
          val meta = physRequireMeta(spark, root)
          val target = validTarget(meta, cols)
          val committed = Publish.listDataFiles(spark, root) // log-authoritative
          if (committed.isEmpty) return
          val newFiles = read(spark, root) match {
            case Some(stats) if coveredColumns(stats) == target.toSet =>
              uncoveredFiles(spark, committed, stats).collect()
                .map(_.getString(0)).toSeq
            case _ => committed // no sidecar / different columns: full build
          }
          if (newFiles.size == committed.size) {
            writeSidecar(root, statsFor(spark, root, meta, committed, target),
              committed.size.toLong * target.size, "overwrite")
          } else if (newFiles.nonEmpty) {
            writeSidecar(root, statsFor(spark, root, meta, newFiles, target),
              newFiles.size.toLong * target.size, "append")
            maybeCompactSidecar(spark, root)
          }
          writeMarker(spark, root, target, sinkVersion = Some(v))
      }
    }
  }

  /** Paths in `expected` with no stats row — the one coverage anti-join
    * both the marker-restore check and the sink sync share (distributed;
    * only the uncovered paths — usually none — ride to the driver).
    */
  private def uncoveredFiles(spark: SparkSession, expected: Seq[String],
                             stats: DataFrame): DataFrame = {
    import spark.implicits._
    expected.toDF("path")
      .join(stats.select("file").distinct(), col("path") === col("file"), "left_anti")
  }

  /** Read-and-delete of the completeness claim: called by a writer about
    * to add data files, so a reader racing (or a crash inside) the write
    * sees no claim and falls back to the listing. Returns the claimed
    * columns for post-write auto-maintenance.
    */
  private[core] def invalidateMarker(spark: SparkSession, root: String): Option[Seq[String]] = {
    val cols = manifestColumns(spark, root)
    if (cols.isDefined) {
      val p = markerPath(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    }
    cols
  }

  /** Sidecar sizing: one row per (file, column); ~500k rows (~a few MB
    * compressed) per sidecar file keeps a 2M-file manifest at a handful
    * of parquet files while sf-scale datasets stay at one.
    */
  private val SidecarRowsPerFile = 500000L

  /** Fold appended sidecar fragments back into few files past this count. */
  private val SidecarCompactThreshold = 64

  /** Length cap for stored string stats — a long-string column must not
    * write two document-sized extreme values per (file, column) row (the
    * reason parquet truncates its own string stats). A char PREFIX is a
    * byte prefix, hence ≤ the full value in UTF-8 binary order: `min_s`
    * truncates soundly. A truncated UPPER bound has no cheap sound form,
    * so an over-long max stores NULL (= unknown) and that side simply
    * can't prune — [[pruneExpr]] decides each side independently.
    */
  private[core] val StringStatsMaxLen = 64

  /** Indexable column types: a numeric embedding (numerics/dates/
    * timestamps → `min_v`/`max_v`) or binary-ordered strings (→ `min_s`/
    * `max_s` — the ordering Spark's own min/max aggregates use, so stats
    * and probes agree by construction). Strings matter at scale: equality
    * skipping on category-ish data columns (`source = 'web'`) drops whole
    * files the same way a numeric range does.
    */
  private[core] def indexable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | StringType => true
    case _ => false
  }

  /** Old (pre-string) sidecars lack `min_s`/`max_s`; reading them through
    * this schema yields nulls there, and the string prune branch treats
    * null string stats as UNKNOWN (never prunes) — old indexes stay valid,
    * they just can't skip on string columns until rebuilt. The same
    * null-tolerant evolution admits `n_rows`/`n_nulls` (per-file row and
    * per-column null counts, the Delta-stats `numRecords`/`nullCount`
    * embedding): old sidecars read them as null = unknown, and the
    * metadata-only COUNT answers ([[statsCount]] family) refuse rather
    * than guess.
    */
  private def statsSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("column", StringType, nullable = false),
    StructField("min_v", DoubleType, nullable = true),
    StructField("max_v", DoubleType, nullable = true),
    StructField("min_s", StringType, nullable = true),
    StructField("max_s", StringType, nullable = true),
    StructField("n_rows", LongType, nullable = true),
    StructField("n_nulls", LongType, nullable = true)))

  /** `input_file_name()` yields a URI-ENCODED string; listings (and hence
    * the manifest contract) store real DECODED filesystem paths. Column
    * form of [[decodePath]] so the sidecar build stays whole-stage
    * codegen'd (no Scala UDF): strip the URI scheme+authority, then
    * percent-decode. '+' is pre-protected because `url_decode` is
    * FORM-decoding (it would turn a literal '+' into a space, which URI
    * path decoding never does); raw '#'/'?' are ordinary characters to
    * `url_decode`, so the truncation hazard [[decodePath]] guards against
    * cannot arise on this path. A malformed escape (a foreign file name
    * with a raw '%') falls back to the stripped-but-undecoded form via
    * `try_url_decode` — the same answer [[decodePath]]'s
    * URISyntaxException fallback produces.
    */
  private[graft] def normPath(c: Column): Column = {
    val stripped = regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "")
    coalesce(try_url_decode(regexp_replace(stripped, "\\+", "%2B")), stripped)
  }

  /** URI-decode one path string. A raw '#' or '?' in a (foreign/imported)
    * file name is a literal path character here, not fragment/query
    * syntax — `new URI(s).getPath` would silently TRUNCATE at it (no
    * URISyntaxException fires, so a fallback never engages). Pre-encode
    * exactly those two, then percent-decode the whole; managed layouts
    * (hive-escaped, so never a raw '#'/'?') pass through unchanged.
    */
  private[graft] def decodePath(s: String): String = {
    val pre = s.replace("#", "%23").replace("?", "%3F")
    try new java.net.URI(pre).getPath
    catch { case _: java.net.URISyntaxException => new Path(s).toUri.getPath }
  }

  /** The dataset's metadata in PHYSICAL column terms: identical to the
    * sidecar unless the latest commit carries a name mapping (stats
    * sidecars, like the data files they describe, are keyed by PHYSICAL
    * names — a RENAME COLUMN must not orphan or re-key them).
    */
  private def physRequireMeta(spark: SparkSession, root: String): DatasetMeta = {
    val m = requireMeta(spark, root)
    val cm = Versions.latestVersion(spark, root)
      .map(v => Versions.readEntry(spark, root, v).colMap)
      .getOrElse(Map.empty[String, String])
    if (cm.isEmpty) m
    else DatasetMeta(org.apache.spark.sql.types.StructType(
      m.schema.fields.map(f => f.copy(name = cm.getOrElse(f.name, f.name)))),
      m.partitions)
  }

  private def requireMeta(spark: SparkSession, root: String): DatasetMeta =
    DatasetMeta.read(spark, root).getOrElse(
      throw new MissingGraftMetadata(s"Dataset at $root is missing graft metadata."))

  private def validTarget(meta: DatasetMeta, cols: Seq[String]): Seq[String] = {
    val target = cols.filter(c => meta.dataColumns.contains(c))
    target.foreach { c =>
      require(indexable(meta.schema(c).dataType),
        s"stats column $c must be numeric/date/timestamp/string, got ${meta.schema(c).dataType}")
    }
    require(target.nonEmpty, s"no indexable data columns among ${cols.mkString(",")}")
    target
  }

  /** One distributed pass over `files` (reading ONLY the indexed columns):
    * per-file min/max pivoted to (file, column, min_v, max_v) rows. Stays
    * a DataFrame end-to-end — the caller writes it, nothing collects.
    */
  private def statsFor(spark: SparkSession, root: String, meta: DatasetMeta,
                       files: Seq[String], target: Seq[String]): DataFrame = {
    import spark.implicits._
    // PARTITION-SPEC EVOLUTION: a snapshot mixing layout epochs fails a
    // single discovery pass (CONFLICTING_PARTITION_COLUMN_NAMES) — scan
    // per layout signature instead. Stats target DATA columns only, so
    // the per-signature union is exact; single-signature datasets (the
    // common case) keep the identical one-scan plan.
    val rootQual = {
      val p = new Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toUri.getPath.stripSuffix("/")
    }
    def sig(f: String) = f.stripPrefix(rootQual).stripPrefix("/")
      .split('/').dropRight(1).map(_.takeWhile(_ != '=')).mkString("/")
    val df = files.groupBy(sig).toSeq.sortBy(_._1).map { case (_, g) =>
      // old-epoch groups surface THEIR dirs' inferred partition columns
      // too — project each leg to the declared schema before the union
      spark.read.option("basePath", root).schema(meta.schema).parquet(g: _*)
        .select(meta.schema.fieldNames.toIndexedSeq.map(col): _*)
    }.reduce(_.unionByName(_))
    val aggs = target.flatMap { c =>
      val n = meta.schema(c).dataType match {
        case StringType => col(c)
        case dt => normalized(col(c), dt)
      }
      // count(col) is the non-null count, so n_nulls derives without a
      // second conditional aggregate per column
      Seq(min(n).as(s"min_$c"), max(n).as(s"max_$c"), count(col(c)).as(s"cnt_$c"))
    } :+ count(lit(1)).as("n_rows")
    val scanned = df.groupBy(normPath(input_file_name()).as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // EMPTY files produce no scanned group, but still need a sidecar row
    // (n_rows = 0, min/max unknown) — without one, a zero-row part file
    // (a rewrite task that lost every row, a writer's empty split) makes
    // completeness-marker coverage unprovable FOREVER and every
    // metadata-only answer silently degrades to the scan path. The file
    // list is already O(batch) driver state: outer-join it against the
    // scanned groups — still exactly one pass over the data.
    // `files` is already the sidecar path form (decoded listing paths —
    // marker coverage compares them against sidecar rows verbatim); do
    // NOT normPath it again: hive-escaped dirs (`ts=… 00%3A00`) contain
    // literal %XX that a second decode would corrupt
    val perFile =
      if (files.isEmpty) scanned
      else files.toDF("file").join(scanned, Seq("file"), "left_outer")
    val entries = array(target.map { c =>
      meta.schema(c).dataType match {
        case StringType =>
          struct(lit(c).as("column"),
            lit(null).cast("double").as("min_v"), lit(null).cast("double").as("max_v"),
            substring(col(s"min_$c"), 1, StringStatsMaxLen).as("min_s"),
            when(length(col(s"max_$c")) > StringStatsMaxLen, lit(null).cast("string"))
              .otherwise(col(s"max_$c")).as("max_s"),
            coalesce(col("n_rows"), lit(0L)).as("n_rows"),
            coalesce(col("n_rows") - col(s"cnt_$c"), lit(0L)).as("n_nulls"))
        case _ =>
          struct(lit(c).as("column"),
            col(s"min_$c").cast("double").as("min_v"),
            col(s"max_$c").cast("double").as("max_v"),
            lit(null).cast("string").as("min_s"), lit(null).cast("string").as("max_s"),
            coalesce(col("n_rows"), lit(0L)).as("n_rows"),
            coalesce(col("n_rows") - col(s"cnt_$c"), lit(0L)).as("n_nulls"))
      }
    }: _*)
    perFile.select(col("file"), explode(entries).as("s"))
      .select(col("file"), col("s.column").as("column"),
        col("s.min_v").as("min_v"), col("s.max_v").as("max_v"),
        col("s.min_s").as("min_s"), col("s.max_s").as("max_s"),
        col("s.n_rows").as("n_rows"), col("s.n_nulls").as("n_nulls"))
  }

  private def sidecarPartitions(rows: Long): Int =
    math.max(1L, (rows + SidecarRowsPerFile - 1) / SidecarRowsPerFile).toInt

  private def writeSidecar(root: String, stats: DataFrame, approxRows: Long,
                           mode: String): Unit =
    stats.repartition(sidecarPartitions(approxRows))
      .write.mode(mode).parquet(s"$root/$DirName")

  /** Full (re)build: one distributed pass, sidecar overwritten. Runs
    * under the dataset's writer lock — a build racing a concurrent append
    * could otherwise list before the append's files land yet write its
    * marker after, claiming completeness over files it never indexed
    * (re-entrant: publish paths already holding the lock nest freely).
    */
  def build(spark: SparkSession, root: String, cols: Seq[String]): Unit = {
    // fail-fast BEFORE the lock: acquiring it mkdirs the root, so a typo'd
    // path must error with zero filesystem mutation, as it always did
    requireMeta(spark, root)
    DatasetLock.withLock(spark, root) {
      val meta = physRequireMeta(spark, root) // re-read under the lock
      buildFor(spark, root, meta, Publish.listDataFiles(spark, root), cols)
    }
  }

  private[core] def buildFor(spark: SparkSession, root: String, meta: DatasetMeta,
                             files: Seq[String], cols: Seq[String]): Unit = {
    val target = validTarget(meta, cols)
    if (files.isEmpty) return
    writeSidecar(root, statsFor(spark, root, meta, files, target),
      files.size.toLong * target.size, "overwrite")
    // every caller passes the FULL data listing — the fresh sidecar is a
    // complete manifest by construction
    writeMarker(spark, root, target)
  }

  /** Incremental maintenance: stat ONLY `newFiles` and append their rows
    * to the existing sidecar — an append's index cost is proportional to
    * the batch, never the dataset. Falls back to a full build when the
    * sidecar is absent or covers a different column set (the incremental
    * rows would otherwise leave old files dark on the new columns).
    */
  /** `markComplete`: the caller asserts `newFiles` is EVERY data file added
    * since the index last covered the dataset (publish passes this when the
    * marker it invalidated pre-write claimed completeness), so the marker
    * is restored once their stats commit.
    */
  /** `verifyFiles`: the post-write data listing the caller already holds.
    * Before a `markComplete` restore, the sidecar's file set is checked to
    * cover it — the cheap coverage proof that keeps a LOST writer race
    * (object stores without atomic create-if-absent make the lock
    * best-effort) from restoring a completeness claim over files the other
    * writer added without stats rows. A failed check degrades to listing-
    * mode reads (conservative, correct) instead of silent row loss.
    */
  def appendFiles(spark: SparkSession, root: String, newFiles: Seq[String],
                  cols: Seq[String], markComplete: Boolean = false,
                  verifyFiles: Option[Seq[String]] = None): Unit =
    DatasetLock.withLock(spark, root) {
      def restoreMarker(target: Seq[String]): Unit =
        if (verifyFiles.forall(markerCoverageOk(spark, root, _)))
          writeMarker(spark, root, target)
        else System.err.println(s"[graft] not restoring completeness marker on " +
          s"$root: sidecar does not cover the current data listing " +
          "(concurrent foreign write?) — reads stay on the listing path")
      if (newFiles.isEmpty) {
        if (markComplete) restoreMarker(cols)
      } else {
        val meta = physRequireMeta(spark, root)
        val target = validTarget(meta, cols)
        read(spark, root) match {
          case Some(existing) if coveredColumns(existing) == target.toSet =>
            writeSidecar(root, statsFor(spark, root, meta, newFiles, target),
              newFiles.size.toLong * target.size, "append")
            maybeCompactSidecar(spark, root)
            if (markComplete) restoreMarker(target)
          case _ => build(spark, root, cols) // full rebuild: complete either way
        }
      }
    }

  /** Does the sidecar have a stats row for EVERY path in `expected`?
    * Distributed anti-join over the stats frame — only the verdict rides
    * to the driver, so the check is O(listing) cluster-side and O(1)
    * inbound at any manifest size.
    */
  private def markerCoverageOk(spark: SparkSession, root: String,
                               expected: Seq[String]): Boolean =
    read(spark, root) match {
      case None => expected.isEmpty
      case Some(stats) => uncoveredFiles(spark, expected, stats).isEmpty
    }

  private def coveredColumns(stats: DataFrame): Set[String] =
    stats.select("column").distinct().collect().map(_.getString(0)).toSet

  /** The column set an existing sidecar covers (for rebuilds that must
    * preserve it, e.g. after compaction). Empty when no index exists.
    */
  def indexedColumns(spark: SparkSession, root: String): Seq[String] =
    read(spark, root).map(s => coveredColumns(s).toSeq.sorted).getOrElse(Nil)

  /** Fold accumulated append fragments back into few sidecar files.
    * Rewrites through a temp dir + rename — the sidecar being compacted
    * is also the frame being read, and parquet cannot overwrite its own
    * input in-flight. The delete→rename window is crash-covered: a
    * completed `_graft_stats_tmp` with no main dir is recognized and the
    * swap finished by [[read]] (and a failed rename raises instead of
    * silently leaving the index gone).
    */
  private def maybeCompactSidecar(spark: SparkSession, root: String): Unit = {
    val p = new Path(s"$root/$DirName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    if (parts.length <= SidecarCompactThreshold) return
    val totalBytes = parts.map(_.getLen).sum
    val tmp = new Path(s"$root/$TmpDirName")
    fs.delete(tmp, true)
    spark.read.schema(statsSchema).parquet(p.toString)
      .repartition(math.max(1L, totalBytes / (32L << 20)).toInt)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    require(fs.rename(tmp, p),
      s"sidecar compaction swap failed: $tmp could not replace $p — rebuild the index")
  }

  /** Carry an index across a compaction: byte-copied files keep their
    * stats rows (path rewritten src→dest via a distributed join against
    * the copy mapping); only the re-encoded output files pay a fresh
    * stats pass. The rebuilt sidecar is identical to a from-scratch
    * build without re-reading the untouched bytes.
    */
  private[core] def migrateCompacted(spark: SparkSession, srcStats: DataFrame,
                                     dest: String, meta: DatasetMeta,
                                     copied: Seq[(String, String)],
                                     freshFiles: Seq[String]): Unit = {
    // one distinct-scan of the in-scope frame — not a second sidecar read
    val target = validTarget(meta, coveredColumns(srcStats).toSeq.sorted)
    import spark.implicits._
    val mapDf = copied.toDF("src_file", "dest_file")
    val carried = srcStats.join(mapDf, srcStats("file") === mapDf("src_file"))
      .select(col("dest_file").as("file"), col("column"),
        col("min_v"), col("max_v"), col("min_s"), col("max_s"),
        col("n_rows"), col("n_nulls"))
    val merged =
      if (freshFiles.isEmpty) carried
      else carried.unionByName(statsFor(spark, dest, meta, freshFiles, target))
    writeSidecar(dest, merged,
      (copied.size + freshFiles.size).toLong * target.size, "overwrite")
    // copied + fresh IS the destination's entire file set
    writeMarker(spark, dest, target)
  }

  /** The index contents, or None when the dataset has no stats sidecar.
    * Recovers a compaction that crashed between its delete and rename:
    * a complete `_graft_stats_tmp` with no main dir IS the index — finish
    * the swap and carry on.
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val p = new Path(s"$root/$DirName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val tmp = new Path(s"$root/$TmpDirName")
      if (!fs.exists(tmp) || !fs.rename(tmp, p)) return None
    }
    Some(spark.read.schema(statsSchema).parquet(p.toString))
  }

  /** Data files that MIGHT satisfy every filter.
    *
    * MANIFEST MODE (completeness marker present): the sidecar IS the file
    * listing — survivors are computed in ONE distributed aggregation over
    * the stats frame (per-file prune verdict, [[pruneExpr]]) and only the
    * surviving paths ride to the driver. No filesystem listing happens at
    * all: at 2M files that replaces a recursive walk (millions of object-
    * store round trips) plus a ~200 MB driver path list with a parquet
    * scan of a few-MB sidecar and O(matching files) driver transfer — the
    * Delta/Iceberg read path, expressed as a graft sidecar.
    *
    * LISTING MODE (no marker — crash window, foreign writes, stale or
    * absent index): the full listing minus files the index proves out.
    * The skip decision still runs distributed-side; the driver collects
    * whichever side of the verdict is SMALLER (pruned paths, or survivors
    * via an anti-join of the listing against the pruned set), so inbound
    * transfer is min(pruned, survivors). Files or columns the index
    * doesn't know have no stats row, so they can't be pruned:
    * conservative by construction.
    */
  def candidateFiles(spark: SparkSession, root: String, meta: DatasetMeta,
                     dataFilters: Seq[ColFilter]): Seq[String] = {
    val relevant = dataFilters.filter(f => indexable(meta.schema(f.partition).dataType))
    // Per-file Bloom proofs ([[BloomIndex]]) compose with the range proofs
    // below by UNION of pruned files: both are subtractive, so either index
    // proving a file out suffices and neither can resurrect one.
    val bloomPruned = BloomIndex.prunedFiles(spark, root, meta, dataFilters)
    // A VERSIONED root must plan from the commit log, not the manifest:
    // the stats sidecar keeps rows for logically-overwritten (and
    // mutation-removed) files, so manifest mode would resurrect ghosts.
    // Listing mode below is safe — listDataFiles is version-log-aware
    // (live snapshot only), and stale stats rows only ever name files
    // absent from `all`, which subtraction ignores.
    if (manifestColumns(spark, root).isDefined && !Versions.isVersioned(spark, root)) {
      read(spark, root) match {
        case Some(stats) => return manifestSurvivors(stats, relevant, meta, bloomPruned)
        case None => () // marker without sidecar: fall through to listing
      }
    }
    // versioned roots plan from the snapshot itself (absolutized; clone-
    // inherited external refs pass through) — a physical listing of the
    // root can't see a shallow clone's inherited files, and the snapshot
    // is the authority anyway. Stats rows only ever name files the clone
    // wrote itself, so unknown (inherited) files always survive to scan.
    val all: Seq[String] = Versions.latestVersion(spark, root) match {
      case Some(v) if Versions.isVersioned(spark, root) =>
        Versions.absolutize(spark, root, Versions.snapshotAt(spark, root, v)._1)
      case _ => Publish.listDataFiles(spark, root)
    }
    val rangePruned: Option[DataFrame] =
      if (relevant.isEmpty) None
      else read(spark, root).map { stats =>
        val pruneCond = relevant.map(f => pruneExpr(f, meta)).reduce(_ || _)
        stats.where(pruneCond).select("file").distinct()
      }
    val prunedOpt = (rangePruned, bloomPruned) match {
      case (Some(r), Some(b)) =>
        Some(r.unionByName(b.withColumnRenamed("bloom_pruned", "file")).distinct())
      case (Some(r), None) => Some(r)
      case (None, Some(b)) => Some(b.withColumnRenamed("bloom_pruned", "file"))
      case (None, None) => None
    }
    prunedOpt match {
      case None => all
      case Some(pruned) =>
        // persisted across the count + (collect | anti-join) pair — without
        // it the sidecar scan would run twice per fetch
        val prunedDf = pruned.persist()
        try {
          if (prunedDf.count() * 2 <= all.size) {
            val prunedSet = prunedDf.collect().map(_.getString(0)).toSet
            all.filterNot(prunedSet)
          } else {
            import spark.implicits._
            val survivors = all.toDF("path")
              .join(prunedDf, col("path") === prunedDf("file"), "left_anti")
              .collect().map(_.getString(0)).toSet
            all.filter(survivors) // survivors in stable listing order
          }
        } finally prunedDf.unpersist(blocking = false)
    }
  }

  /** One aggregation over the manifest: a file survives unless SOME stats
    * row proves SOME filter can't match it — then the Bloom proofs subtract
    * frame-side (anti-join), so driver transfer stays O(final survivors)
    * even when an equality probe prunes nearly every file. Sorted for the
    * stable path order the listing mode returns.
    */
  private def manifestSurvivors(stats: DataFrame, relevant: Seq[ColFilter],
                                meta: DatasetMeta,
                                bloomPruned: Option[DataFrame]): Seq[String] = {
    val rangeSurvivors =
      if (relevant.isEmpty) stats.select("file").distinct()
      else {
        val pruneCond = relevant.map(f => pruneExpr(f, meta)).reduce(_ || _)
        stats.groupBy("file")
          .agg(max(when(pruneCond, lit(true)).otherwise(lit(false))).as("pruned"))
          .where(!col("pruned")).select("file")
      }
    val survivors = bloomPruned match {
      case Some(b) => rangeSurvivors.join(b, col("file") === col("bloom_pruned"), "left_anti")
      case None => rangeSurvivors
    }
    survivors.collect().map(_.getString(0)).sorted.toIndexedSeq
  }

  /** The numeric embedding stats are stored in: timestamps as epoch
    * seconds (Spark's timestamp→double cast), dates as epoch days
    * (`unix_date` — ANSI mode rejects a direct date→numeric cast).
    * [[mightMatch]]/[[pruneExpr]] embed filter values with the SAME
    * mapping — keep them in lockstep or skipping silently drops matching
    * files.
    */
  /** Metadata-only MIN/MAX: answer `min(column), max(column)` from the
    * stats sidecar alone — zero data files read, O(files) work for an
    * O(rows) question (the SELECT-min/max-goes-to-metadata optimization
    * a lakehouse table format owes its users). Returns None — caller
    * falls back to a scan — unless the answer is provably exact:
    * the manifest-completeness marker must cover the column (every live
    * file has stats rows), the column must be numeric/date/timestamp
    * (string maxima are truncated in the sidecar), and the extremes must
    * sit inside double's exact-integer range (the sidecar stores
    * normalized doubles). Values return in the column's declared type.
    */
  def statsMinMax(spark: SparkSession, root: String,
                  column: String): Option[(Any, Any)] = {
    val meta = DatasetMeta.read(spark, root).getOrElse(return None)
    if (!meta.schema.fieldNames.contains(column)) return None
    val dt = meta.schema(column).dataType
    val numericish = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | DateType | TimestampType => true
      case _ => false // strings truncate; decimals may round in double form
    }
    if (!numericish) return None
    if (!manifestColumns(spark, root).exists(_.contains(column))) return None
    val stats = liveStats(spark, root).getOrElse(return None)
    val row = stats.where(col("column") === column)
      .agg(min("min_v").as("lo"), max("max_v").as("hi")).head()
    if (row.isNullAt(0) || row.isNullAt(1)) return None // all-null column
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    val exactRange = 9007199254740992.0 // 2^53: beyond it doubles skip ints
    val exact = dt match {
      case LongType => math.abs(lo) < exactRange && math.abs(hi) < exactRange
      case _ => true
    }
    if (!exact) return None
    def restore(v: Double): Any = dt match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType => v.toInt
      case LongType => v.toLong
      case FloatType => v.toFloat
      case DoubleType => v
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.toLong))
      case TimestampType =>
        // stored as fractional epoch seconds; reconstruct to the µs
        val totalMicros = math.round(v * 1e6)
        val ts = new java.sql.Timestamp(java.lang.Math.floorDiv(totalMicros, 1000000L) * 1000L)
        ts.setNanos(java.lang.Math.floorMod(totalMicros, 1000000L).toInt * 1000)
        ts
      case _ => v
    }
    Some((restore(lo), restore(hi)))
  }

  /** The sidecar restricted to files that are actually LIVE. A VERSIONED
    * root's sidecar keeps rows for logically-overwritten / mutation-removed
    * files (planning is log-aware, so they are harmless there) — but any
    * metadata-only AGGREGATE over all rows would resurrect those ghosts.
    * Restrict to the latest snapshot's live file set (tiny semi-join; the
    * live list is already O(files) driver state), mirroring candidateFiles'
    * versioned guard. Marker coverage claims all PHYSICAL files ⊇ live
    * files, so completeness-gated exactness still holds. None = no sidecar.
    */
  private def liveStats(spark: SparkSession, root: String,
                        allowDvCovered: Boolean = false): Option[DataFrame] = {
    val all = read(spark, root).getOrElse(return None)
    Some(Versions.latestVersion(spark, root) match {
      case None => all
      case Some(latest) =>
        val (liveRel, _, dvs) = Versions.snapshotFullAt(spark, root, latest)
        // deletion vectors poison most metadata-only AGGREGATES: a covered
        // file's sidecar row still counts (and may min/max) its DELETED
        // rows. Refuse — callers fall back to the (DV-aware) scan path —
        // EXCEPT where the caller can correct exactly (COUNT(*) subtracts
        // the DV cardinality: statsCount passes allowDvCovered).
        // File-level PRUNING stays sound (DVs only remove rows, so stats
        // ranges remain conservative) and does not come through here.
        if (!allowDvCovered &&
            dvs.flatMap(_.files).toSet.intersect(liveRel.toSet).nonEmpty)
          return None
        // shared path contract (Versions.absolutize): the sidecar's `file`
        // column stores decoded absolute paths, the log stores decoded
        // relative ones — a drifting private re-derivation here would
        // empty the semi-join and silently degrade to the scan fallback
        val live = Versions.absolutize(spark, root, liveRel)
        import spark.implicits._
        all.join(live.toDF("file"), Seq("file"), "left_semi")
    })
  }

  /** One live sidecar row per file with a trustworthy `n_rows`, or None
    * unless EVERY live file carries one (pre-n_rows sidecar fragments read
    * as null = unknown — a partially-evolved index must refuse, not guess).
    * Exactness additionally needs the completeness marker, which the
    * public entry points check first.
    */
  private def perFileRowCounts(spark: SparkSession, root: String,
                               allowDvCovered: Boolean = false): Option[DataFrame] = {
    val stats = liveStats(spark, root, allowDvCovered).getOrElse(return None)
    val perFile = stats.groupBy("file").agg(max("n_rows").as("n_rows"))
    val gauge = perFile.agg(count(lit(1)).as("files"),
      count(col("n_rows")).as("counted")).head()
    if (gauge.getLong(0) != gauge.getLong(1)) return None
    Some(perFile)
  }

  /** Metadata-only COUNT(*): answered from the stats sidecar alone — zero
    * data rows read, the `SELECT count(*)` that a lakehouse format serves
    * from its transaction log. Returns None (caller falls back to a scan)
    * unless provably exact: completeness marker present AND every live
    * file's stats carry `n_rows` (old sidecars refuse until rebuilt).
    */
  def statsCount(spark: SparkSession, root: String): Option[Long] = {
    if (DatasetMeta.read(spark, root).isEmpty) return None
    if (manifestColumns(spark, root).isEmpty) return None
    // DV-covered files DON'T force a scan here: every live DV row names a
    // live row of a live file exactly once (delete/update-DV hits are
    // computed from the DV-APPLIED snapshot, so stacked DVs can never
    // re-delete a row), hence COUNT(*) = sum(per-file n_rows) - live DV
    // cardinality — still zero data rows read, one tiny pass over the
    // O(deleted rows) sidecars.
    val perFile = perFileRowCounts(spark, root, allowDvCovered = true)
      .getOrElse(return None)
    val total = Option(perFile.agg(sum("n_rows")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val deleted = Versions.latestVersion(spark, root) match {
      case None => 0L
      case Some(latest) =>
        val (liveRel, _, dvs) = Versions.snapshotFullAt(spark, root, latest)
        val coveredLive = dvs.flatMap(_.files).toSet.intersect(liveRel.toSet)
        if (coveredLive.isEmpty) 0L
        else dvs.map(d => Versions.readDvRows(spark, root, d))
          .reduce(_.unionByName(_))
          .where(col("file").isInCollection(coveredLive))
          .count()
    }
    Some(total - deleted)
  }

  /** Metadata-only COUNT(column) — the NON-NULL count, SQL semantics —
    * from the per-column `n_nulls` embedding. Same exactness gates as
    * [[statsCount]], plus the marker must cover `column`.
    */
  def statsCountCol(spark: SparkSession, root: String,
                    column: String): Option[Long] = {
    if (DatasetMeta.read(spark, root).isEmpty) return None
    if (!manifestColumns(spark, root).exists(_.contains(column))) return None
    val stats = liveStats(spark, root).getOrElse(return None)
    val row = stats.where(col("column") === column)
      .agg(count(lit(1)).as("files"), count(col("n_rows")).as("counted"),
        count(col("n_nulls")).as("nullsKnown"),
        sum(col("n_rows") - col("n_nulls")).as("nonNull")).head()
    if (row.getLong(0) != row.getLong(1) || row.getLong(0) != row.getLong(2))
      return None // some file predates the n_rows/n_nulls embedding
    Some(if (row.isNullAt(3)) 0L else row.getLong(3))
  }

  /** Metadata-only `GROUP BY <partition columns> COUNT(*)`: per-partition
    * row counts recovered from the sidecar's file paths alone (the hive
    * segments are IN the path), zero data files read — the partition-level
    * profile a 100 TB ingest dashboard polls after every batch. Columns:
    * the dataset's partition columns (declared types) + `n_rows`. Same
    * refusal contract as [[statsCount]]; None too when the dataset is
    * unpartitioned.
    */
  def statsCountByPartition(spark: SparkSession, root: String): Option[DataFrame] = {
    val meta = DatasetMeta.read(spark, root).getOrElse(return None)
    if (meta.partitions.isEmpty) return None
    if (manifestColumns(spark, root).isEmpty) return None
    val perFile = perFileRowCounts(spark, root).getOrElse(return None)
    // EPOCH POLARITY (r16 audit): a spec-evolved dataset's old-epoch
    // files (evolution is metadata-only) lack the CURRENT spec's dirs —
    // path-derived grouping would count their rows under a phantom NULL
    // group. Grouping by path is exact ONLY when every live file carries
    // every current partition segment; otherwise refuse (None) so the
    // caller's real GROUP BY scan answers exactly.
    val segOk = meta.partitions.map(p =>
      col("file").contains(s"/$p=")).reduce(_ && _)
    if (perFile.where(!segOk).limit(1).count() > 0) return None
    // hive segments sit in the (decoded-absolute) file path as
    // `col=<escaped value>`; hive escaping is percent-encoding, so the
    // same protect-'+'-then-url_decode dance as normPath recovers the
    // value (hive never escapes '+', form-decoding would eat it)
    val withParts = meta.partitions.foldLeft(perFile) { (df, p) =>
      val seg = regexp_extract(col("file"),
        "/" + java.util.regex.Pattern.quote(p) + "=([^/]+)/", 1)
      val dec = coalesce(try_url_decode(regexp_replace(seg, "\\+", "%2B")), seg)
      // hive spells a NULL partition value as a sentinel directory name —
      // map it back to NULL before the cast, so the group matches GROUP
      // BY's null group (and a non-string partition type doesn't throw
      // casting the sentinel under ANSI)
      val nulled = when(dec === lit("__HIVE_DEFAULT_PARTITION__"), lit(null))
        .otherwise(dec)
      df.withColumn(p, nulled.cast(meta.schema(p).dataType))
    }
    Some(withParts.groupBy(meta.partitions.map(col): _*)
      .agg(sum("n_rows").as("n_rows")))
  }

  private def normalized(c: Column, dt: DataType): Column =
    dt match {
      case DateType => unix_date(c).cast("double")
      case _ => c.cast("double")
    }

  /** Double embedding of a filter value for comparison against stats. */
  private def embed(v: Any, dt: DataType): Double = v match {
    // Number covers parseValue's scala.math.BigDecimal form too (it
    // extends ScalaNumber <: java.lang.Number)
    case n: Number => n.doubleValue()
    case ts: java.sql.Timestamp => ts.getTime.toDouble / 1000.0 // epoch seconds
    case dt0: java.sql.Date => dt0.toLocalDate.toEpochDay.toDouble
    // string-form values are legal for typed filters (checkValue parses
    // them) — parse to the column's type first, then embed. A StringType
    // column must never reach here (parseValue would return the string
    // unchanged and recurse forever): string stats have no numeric
    // embedding — their twin is [[mightMatchString]].
    case s: String if dt != StringType => embed(Fetch.parseValue(s, dt), dt)
    case b: java.lang.Boolean => if (b) 1.0 else 0.0
    case other => throw new IllegalArgumentException(
      s"filter value $other not comparable to $dt stats")
  }

  /** A value whose double embedding is exact (so an == equality on it is
    * trustworthy): integrals within the 2^53 mantissa, native floats.
    */
  private def exactEmbed(v: Any, dt: DataType): Boolean = v match {
    case _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte => true
    case l: java.lang.Long => math.abs(l) <= (1L << 53)
    case _: java.lang.Double | _: java.lang.Float => true
    case s: String => exactEmbed(Fetch.parseValue(s, dt), dt)
    case _ => false // timestamps/dates/bools: never skip on !=
  }

  // The stored bounds and the embedded value each round through double
  // once (a long beyond 2^53, a timestamp's fractional seconds) — up to
  // ~2 ulps of combined error. Widening by 2 ulps before testing means a
  // rounding tie can only KEEP a file, never skip one whose rows match.
  private def up2(x: Double): Double = Math.nextUp(Math.nextUp(x))
  private def dn2(x: Double): Double = Math.nextDown(Math.nextDown(x))

  /** Can any value in [lo, hi] satisfy the filter? (OR across the value
    * list, mirroring the reference's per-value union semantics.) The
    * widening is applied to the CONSTANT side (via monotonicity of
    * nextUp∘nextUp / nextDown∘nextDown) so the same decision is
    * expressible over stats columns in [[pruneExpr]]; a property test
    * holds the two implementations equal.
    */
  private[graft] def mightMatch(f: ColFilter, lo: Double, hi: Double, meta: DatasetMeta): Boolean = {
    val dt = meta.schema(f.partition).dataType
    f.values.exists { v =>
      val x = embed(v, dt)
      f.comparison match {
        case "==" => lo <= up2(x) && dn2(x) <= hi
        // only a provably-constant file of exactly the filtered value can
        // fail a != — and only when the embedding is exact
        case "!=" => !(lo == hi && lo == x && exactEmbed(v, dt))
        case ">"  => hi > dn2(x)
        case ">=" => hi >= dn2(x)
        case "<"  => lo < up2(x)
        case "<=" => lo <= up2(x)
      }
    }
  }

  /** Scalar string twin of the [[pruneExpr]] string branch (spec
    * lockstep, over non-null bounds). String stats need no embedding and
    * no ulp slack, but the ORDERING must match: Spark's min/max aggregates
    * (which wrote the stats) and pruneExpr compare in UTF8String BINARY
    * order, and Java's `String.compareTo` (UTF-16 units) disagrees with it
    * for supplementary-plane code points — compare the same way or the
    * twins diverge on real Unicode data.
    */
  private[graft] def mightMatchString(f: ColFilter, lo: String, hi: String): Boolean = {
    def cmp(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    f.values.exists { v =>
      val s = v.toString
      f.comparison match {
        case "==" => cmp(lo, s) <= 0 && cmp(s, hi) <= 0
        case "!=" => !(cmp(lo, hi) == 0 && cmp(lo, s) == 0)
        case ">"  => cmp(hi, s) > 0
        case ">=" => cmp(hi, s) >= 0
        case "<"  => cmp(lo, s) < 0
        case "<=" => cmp(lo, s) <= 0
      }
    }
  }

  /** Distributed twin of [[mightMatch]]: TRUE when a stats row PROVES the
    * file cannot match filter `f` — evaluated on the stats frame so only
    * pruned paths are collected. An all-null NUMERIC file (null min or
    * max) has no row satisfying any comparison and prunes unconditionally;
    * null STRING stats instead mean UNKNOWN (an old pre-string sidecar)
    * and never prune — all-null string files lose that one skip, old
    * indexes stay correct.
    */
  private[graft] def pruneExpr(f: ColFilter, meta: DatasetMeta): Column = {
    meta.schema(f.partition).dataType match {
      case StringType =>
        // lo is a PREFIX-truncated lower bound (≤ true min: a char prefix
        // is a byte prefix, smaller in binary order — every lower-side
        // decision stays sound); hi is exact-or-null. Each side prunes
        // independently when known; null (unknown / old sidecar / over-
        // long max) sides never prune. For `!=`, lo === hi with hi
        // non-null implies lo is untruncated too (a truncated lo is
        // strictly below the true min ≤ max = hi), so the constant-file
        // proof survives truncation.
        val lo = col("min_s")
        val hi = col("max_s")
        val cantMatch = f.values.map { v =>
          val s = lit(v.toString)
          f.comparison match {
            case "==" => (lo.isNotNull && s < lo) || (hi.isNotNull && s > hi)
            case "!=" => lo.isNotNull && hi.isNotNull && lo === hi && lo === s
            case ">"  => hi.isNotNull && hi <= s
            case ">=" => hi.isNotNull && hi < s
            case "<"  => lo.isNotNull && lo >= s
            case "<=" => lo.isNotNull && lo > s
          }
        }.reduce(_ && _)
        col("column") === f.partition && cantMatch
      case dt =>
        val lo = col("min_v")
        val hi = col("max_v")
        val might = f.values.map { v =>
          val x = embed(v, dt)
          f.comparison match {
            case "==" => lo <= up2(x) && hi >= dn2(x)
            case "!=" => !(lo === hi && lo === x && lit(exactEmbed(v, dt)))
            case ">"  => hi > dn2(x)
            case ">=" => hi >= dn2(x)
            case "<"  => lo < up2(x)
            case "<=" => lo <= up2(x)
          }
        }.reduce(_ || _)
        col("column") === f.partition && (lo.isNull || hi.isNull || !might)
    }
  }
}
