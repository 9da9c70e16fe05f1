package graft.core

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Planner-facing size/row estimates for a graft scan — the numbers the
  * DataSourceV2 `SupportsReportStatistics` seam hands Catalyst so join
  * planning can AUTO-BROADCAST a small graft table. Without them a V2
  * relation reports `spark.sql.defaultSizeInBytes` ("infinite"), and a
  * 2 MB dimension joined to a 100 TB fact plans a full sort-merge join:
  * BOTH sides shuffle, and AQE only repairs the mistake after the first
  * shuffle has already run. With them the dimension broadcasts at plan
  * time — the single biggest join win a connector can hand the optimizer.
  *
  * The estimate never reads data:
  *   - live files come from the commit-log snapshot (`versionAsOf`
  *     honored) or the physical listing for unversioned roots;
  *   - byte sizes from ONE recursive listing walk (memoized per
  *     (root, latest-version) — planning the same table in a multi-join
  *     query asks repeatedly), matching the on-disk-bytes convention
  *     Spark's own parquet relation reports (`sizeInBytes` = file bytes);
  *   - row counts from the stats sidecar only when provably exact
  *     ([[StatsIndex.statsCount]]'s completeness gates, DV-adjusted).
  *
  * Pushed partition filters shrink the estimate by the same driver-side
  * hive-path evaluation `replaceWhere`'s partition fast path uses — and
  * only on snapshots whose every live file carries the CURRENT spec's
  * dir signature (the epoch-polarity rule: on spec-evolved or stale
  * layouts the estimate stays the conservative full size). Files whose
  * path values evaluate the predicate to NULL are KEPT (only
  * definitively-false prunes), the same polarity as
  * [[Transforms.pruneFilesBySpec]].
  *
  * Every failure mode degrades to "unknown" (Spark then applies its
  * default): an estimate may be conservative — never wrong-small, which
  * could broadcast a huge table onto the driver.
  */
object ScanEstimate {

  /** Byte sizes of a versioned root's physical files, one walk, memoized
    * by (root, latest version) — every commit bumps the version, so the
    * key self-invalidates under writes. Worst case (a root deleted and
    * re-created at the same version count) yields a stale ESTIMATE, never
    * a wrong result — the scan itself re-plans from the live log.
    */
  private val sizeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Map[String, Long]]

  private[graft] def clearMemo(): Unit = sizeMemo.clear()

  private def sizesFor(spark: SparkSession, root: String, latest: Int): Map[String, Long] = {
    val key = (root, latest)
    val hit = sizeMemo.get(key)
    if (hit != null) return hit
    val listed = Publish.listPhysicalDataFilesWithSize(spark, root)
    val m = Versions.relativize(spark, root, listed.map(_._1))
      .zip(listed.map(_._2)).toMap
    if (sizeMemo.size > 64) sizeMemo.clear() // bound driver state
    sizeMemo.put(key, m)
    m
  }

  /** `(sizeInBytes, rowCount)` for a scan of `root` at the given pinned
    * version (live when None) under the pushed driver-prunable filters.
    * Either component may be None = unknown. Change-feed reads are the
    * caller's job to screen out (their file sets aren't a snapshot's).
    */
  def estimate(spark: SparkSession, root: String, versionAsOf: Option[Int],
               filters: Seq[ColFilter]): (Option[Long], Option[Long]) = try {
    Versions.latestVersion(spark, root) match {
      case Some(latest) =>
        val v = versionAsOf.getOrElse(latest)
        val (relFiles, meta) = Versions.snapshotAt(spark, root, v)
        // shallow-clone external refs live outside the root's listing
        // walk; sizing them needs per-base walks — not worth the RPCs
        // for an estimate, degrade to unknown
        if (relFiles.exists(_.startsWith("/"))) return (None, None)
        val sizeByRel = sizesFor(spark, root, latest)
        if (!relFiles.forall(sizeByRel.contains)) return (None, None)
        val kept = pruneByPartitions(spark, meta,
          relFiles.map(r => r -> sizeByRel(r)), filters)
        val rows =
          if (filters.isEmpty && v == latest) StatsIndex.statsCount(spark, root)
          else None
        (Some(kept.map(_._2).sum), rows)
      case None =>
        if (versionAsOf.nonEmpty) return (None, None)
        val meta = DatasetMeta.read(spark, root).getOrElse(return (None, None))
        val listed = Publish.listDataFilesWithSize(spark, root)
        val rel = Versions.relativize(spark, root, listed.map(_._1))
        val kept = pruneByPartitions(spark, meta,
          rel.zip(listed.map(_._2)), filters)
        val rows = if (filters.isEmpty) StatsIndex.statsCount(spark, root) else None
        (Some(kept.map(_._2).sum), rows)
    }
  } catch {
    // an estimator must never fail a query that would otherwise run
    // (e.g. a layout this path doesn't model); unknown = Spark's default
    case NonFatal(_) => (None, None)
  }

  /** Keep only files whose hive-path partition values could satisfy the
    * partition-column filters — evaluated with full Spark cast/comparison
    * semantics on a LOCAL frame, zero data read (the `replaceWhere`
    * fast-path evaluation). Applies only when every file's dir signature
    * equals the current spec (otherwise returns everything, conservative).
    */
  private def pruneByPartitions(spark: SparkSession, meta: DatasetMeta,
                                files: Seq[(String, Long)],
                                filters: Seq[ColFilter]): Seq[(String, Long)] = {
    val pf = filters.filter(f => meta.partitions.contains(f.partition))
    if (pf.isEmpty || meta.partitions.isEmpty || files.isEmpty) return files
    val sig = meta.partitions.mkString("/")
    val allCurrent = files.forall { case (r, _) =>
      r.split('/').dropRight(1).map(_.takeWhile(_ != '=')).mkString("/") == sig }
    if (!allCurrent) return files
    val pred = Filters.compile(meta, pf).getOrElse(return files)
    val raw: Seq[Row] = files.map { case (rel, _) =>
      Row.fromSeq(rel +: meta.partitions.map { p =>
        rel.split('/').collectFirst {
          case seg if seg.startsWith(p + "=") =>
            Fetch.unescapePathName(seg.substring(p.length + 1))
        }.filterNot(_ == "__HIVE_DEFAULT_PARTITION__").orNull
      })
    }
    val schema0 = StructType(StructField("__file", StringType) +:
      meta.partitions.map(p => StructField(p, StringType)))
    val keep = spark.createDataFrame(raw.toList.asJava, schema0)
      .select(col("__file") +: meta.partitions.map(p =>
        col(p).cast(meta.schema(p).dataType).as(p)): _*)
      .where(not(pred <=> lit(false)))
      .select("__file").collect().map(_.getString(0)).toSet
    files.filter(f => keep(f._1))
  }
}
