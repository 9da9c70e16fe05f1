package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{DatasetMeta, Fetch, Publish, StatsIndex, Versions}

/** DataSourceV2 table for `format("graft")` — the modern connector seam:
  * name-based catalog tables (`CREATE TABLE t USING graft` resolved
  * through the session catalog's V2 path, `saveAsTable`/`spark.table`),
  * V2 filter + required-column pushdown, and the V2 write plans
  * (AppendData / OverwriteByExpression). Scans and writes bridge to
  * graft's proven relation logic through the PUBLIC `V1Scan` / `V1Write`
  * connector traits (the JDBC-V2 shape): the planner drives V2 pushdown
  * and capability resolution, the data path is graft's existing
  * parquet-scan plans and publish pipeline — no custom columnar reader
  * to maintain, full Catalyst pruning inside the inner scan.
  *
  * Capabilities deliberately EXCLUDE `MICRO_BATCH_READ`/`STREAMING_WRITE`:
  * Spark then falls back to the V1 `StreamSourceProvider`/`StreamSinkProvider`
  * on [[GraftDataSource]] for `readStream`/`writeStream` — the same seam
  * Delta ships its streaming source on (a pure-V2 micro-batch reader
  * must produce `InternalRow`s executor-side, which would mean
  * reimplementing a parquet→InternalRow reader outside Spark's scan
  * stack; the V1 source instead returns plans over the real parquet
  * scan). SQL INSERTs resolve positionally against the table schema
  * (the V2 analyzer casts + renames, arity-checked); DataFrame-API
  * saves keep graft's own publish validation through the V1 fallback.
  */
class GraftTable(rootOpt: Option[String], givenSchema: Option[StructType],
                 options: Map[String, String],
                 declaredPartitions: Seq[String],
                 declaredTransforms: Seq[graft.core.PartitionTransform] = Nil)
    extends Table with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  // CreateTableAsSelect calls getTable BEFORE the session catalog assigns
  // a managed table's location — the table object must exist without a
  // root; any actual scan/write resolves through loadTable afterwards,
  // which does carry the location. Enforced lazily here.
  private def root: String = rootOpt.getOrElse(
    throw new IllegalArgumentException(
      "graft data source needs a path (load(root) / OPTIONS (path '...') / table location)"))

  // the commit log / sidecar is authoritative for scans; the catalog's
  // stored schema (givenSchema) only answers metadata-only questions when
  // the dataset doesn't exist yet (e.g. a CTAS target before its write)
  private lazy val resolvedMeta: Option[DatasetMeta] =
    rootOpt.flatMap(r => GraftTable.resolveMeta(spark, r, options))

  override def name(): String = s"graft.`${rootOpt.getOrElse("(pending location)")}`"

  // transform-derived partition columns are layout, not data: hidden
  // from the reported schema (the scan frames drop them too)
  private lazy val hiddenSet: Set[String] = rootOpt
    .map(r => GraftSourceFilters.hiddenCols(spark, r)).getOrElse(Set.empty)

  override def schema(): StructType =
    resolvedMeta.map(m => StructType(
        GraftTable.readSchemaFor(m, options).fields.filterNot(f => hiddenSet(f.name))))
      .orElse(givenSchema).getOrElse(new StructType())

  override def partitioning(): Array[Transform] = {
    val parts = resolvedMeta.map(_.partitions).filter(_.nonEmpty)
      .getOrElse(declaredPartitions)
    parts.map(p => Expressions.identity(p)).toArray
  }

  // V1_BATCH_WRITE without BATCH_WRITE is deliberate: the V2 capability
  // check accepts either for INSERT INTO plans (AppendData/Overwrite run
  // through [[GraftWriteBuilder]]'s V1Write bridge), while
  // DataFrameWriter.save only takes its V2 branch on BATCH_WRITE — so
  // path saves keep the V1 createRelation semantics for ALL SaveModes
  // (Append maps to append-or-create, ErrorIfExists/Ignore stay legal;
  // the V2 save branch hard-errors on the latter two). No
  // ACCEPT_ANY_SCHEMA either: SQL INSERTs then resolve POSITIONALLY
  // against the table schema (cast + rename, arity-checked at analysis)
  // — the standard SQL insert contract, same as the V1 path gave.
  // surfaced for catalog consumers (DESCRIBE EXTENDED, property reads);
  // the option map doubles as the table-property store for GraftCatalog
  override def properties(): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    options.asJava
  }

  override def capabilities(): util.Set[TableCapability] = util.EnumSet.of(
    TableCapability.BATCH_READ,
    TableCapability.V1_BATCH_WRITE,
    TableCapability.TRUNCATE)

  /** The versioned root's USER CHECK constraints, reported to the
    * analyzer (DESCRIBE; Spark 4 injects them into V2 write validation).
    * The auto-registered `_gen_*` generated-column constraints are
    * deliberately NOT reported: Spark's injected check runs BEFORE the
    * connector write seam computes omitted/NULL generated values, so
    * reporting them would reject the very inserts the feature exists
    * for — they stay enforced at full strength by the commit-gated
    * engine check, which runs AFTER the computation.
    */
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    rootOpt.filter(r => Versions.isVersioned(spark, r)).map { r =>
      Versions.constraintsOf(spark, r).toSeq.sortBy(_._1)
        .filterNot(_._1.startsWith("_gen_")).map { case (n, sql) =>
          org.apache.spark.sql.connector.catalog.constraints.Constraint
            .check(n).predicateSql(sql).build()
            : org.apache.spark.sql.connector.catalog.constraints.Constraint
        }.toArray
    }.getOrElse(Array.empty)

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = options ++ caseInsensitive.asScala
    new GraftScanBuilder(root, merged,
      resolvedMeta.getOrElse(throw new IllegalArgumentException(
        s"dataset $root is missing graft metadata — publish it first")),
      schema())
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = options ++ info.options().asScala
    val partitions = merged.get("partitions")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(resolvedMeta.map(_.partitions))
      .getOrElse(declaredPartitions)
    // the `transforms` OPTION declares hidden partitioning for the write
    // (the session catalog cannot carry non-identity PARTITIONED BY for a
    // TableProvider); a V2 catalog that can passes declaredTransforms
    val ts = merged.get("transforms")
      .map(graft.core.Transforms.parseSpec).getOrElse(declaredTransforms)
    new GraftWriteBuilder(root, partitions, merged, ts)
  }
}

object GraftTable {
  /** Snapshot metadata honoring `versionAsOf` (commit-entry schema governs
    * on versioned roots, sidecar otherwise); None when the dataset doesn't
    * exist yet (a write target).
    */
  /** The version a read pins: `versionAsOf` wins, `timestampAsOf` (a
    * wall-clock literal, the Delta reader-option pair) resolves through
    * the commit log's in-commit timestamps; both given must agree in
    * intent — refused.
    */
  private[sources] def pinnedVersion(spark: SparkSession, root: String,
                                     options: Map[String, String]): Option[Int] = {
    val byV = options.get("versionAsOf").map(_.trim.toInt)
    val byTs = options.get("timestampAsOf")
    require(byV.isEmpty || byTs.isEmpty,
      "pass versionAsOf OR timestampAsOf, not both")
    byV.orElse(byTs.map(ts =>
      Versions.versionAsOf(spark, root, Versions.parseTsLiteral(spark, ts))))
  }

  private[sources] def resolveMeta(spark: SparkSession, root: String,
                                   options: Map[String, String]): Option[DatasetMeta] =
    pinnedVersion(spark, root, options) match {
      case Some(v) => Some(Versions.snapshotAt(spark, root, v)._2)
      case None =>
        Versions.latestVersion(spark, root)
          .map(v => Versions.snapshotAt(spark, root, v)._2)
          .orElse(DatasetMeta.read(spark, root))
    }

  private def changeFeedOpt(options: Map[String, String]): Boolean =
    options.get("changeFeed").exists(_.trim.equalsIgnoreCase("true"))

  /** The read schema for the given options: the snapshot schema, or the
    * change-feed schema (+ `_change_type`, `_commit_version`) when the
    * `changeFeed` option is set.
    */
  private[sources] def readSchemaFor(meta: DatasetMeta,
                                     options: Map[String, String]): StructType =
    if (!changeFeedOpt(options)) meta.schema
    else StructType(meta.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.IntegerType)))

  /** The options-selected base frame: change-feed window, pinned version,
    * or the live snapshot (same dispatch as the V1 relation paths).
    */
  private[sources] def baseFrame(spark: SparkSession, root: String,
                                 options: Map[String, String],
                                 colFilters: Seq[graft.core.ColFilter]): DataFrame = {
    val hidden = GraftSourceFilters.hiddenCols(spark, root)
    if (changeFeedOpt(options)) {
      val from = options.getOrElse("startingVersion", throw
        new IllegalArgumentException(
          "changeFeed reads need startingVersion (inclusive)")).trim.toInt
      val to = options.get("endingVersion").map(_.trim.toInt)
        .orElse(Versions.latestVersion(spark, root)).getOrElse(
          throw new IllegalArgumentException(s"dataset $root is not versioned"))
      Versions.changeFeed(spark, root, from - 1, to,
        GraftDataSource.rowDiffKeysOf(options)).drop(hidden.toSeq: _*)
    } else GraftTable.pinnedVersion(spark, root, options) match {
      case Some(v) => Versions.fetchVersion(spark, root, v)
        .drop(hidden.toSeq: _*)
      case None =>
        // live reads route partition (and transform-source) predicates
        // through graft's driver-side pruner; fetch plans versioned
        // roots from the commit log and hides derived columns itself
        Fetch.fetch(spark, root, colFilters, acceptNotGraft = false)
    }
  }
}

/** V2 pushdown surface: filters land here as `sources.Filter`s (partition
  * comparisons additionally compile into graft [[graft.core.ColFilter]]s
  * for driver-side directory pruning), required columns prune the output
  * projection. EVERY filter is returned as post-scan — Spark re-applies
  * them above, so an untranslated predicate costs nothing in correctness
  * (the V1 default-`unhandledFilters` contract, kept deliberately);
  * `pushedFilters` reports the translated subset for EXPLAIN.
  */
class GraftScanBuilder(root: String, options: Map[String, String],
                       meta: DatasetMeta, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var aggAnswer: Option[(StructType, Seq[Any])] = None

  private lazy val prunable: Set[String] = GraftSourceFilters.prunableCols(
    SparkSession.active, root, meta)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      GraftSourceFilters.toColumn(f).isDefined ||
        GraftSourceFilters.toColFilter(prunable, f).isDefined)
    filters // all post-scan: Spark re-applies, untranslated shapes stay exact
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve graft's column order within the pruned subset
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep(f.name)))
  }

  // ---- aggregate pushdown: COUNT(*)/COUNT(col)/MIN/MAX answered from the
  // stats manifest alone — ZERO data files read (the SELECT-count-goes-to-
  // metadata optimization, V2-native). COMPLETE pushdown only: either the
  // sidecar answers every aggregate exactly (the StatsIndex exactness
  // gates: completeness marker, n_rows/n_nulls embedding, DV cardinality
  // subtraction, 2^53 long-range guard), or the whole aggregation falls
  // back to the ordinary scan — never a partial answer.

  // Spark consults supportCompletePushDown FIRST (before pushAggregation),
  // so the answer is computed here and stashed; pushAggregation then just
  // confirms. Returning false would demote to PARTIAL pushdown — still
  // correct for count/min/max (sum-of-one-count, min-of-one-min) but it
  // wraps the one-row scan in a pointless shuffle + final aggregate.
  override def supportCompletePushDown(agg: Aggregation): Boolean = {
    aggAnswer = tryAnswer(agg)
    aggAnswer.isDefined
  }

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (aggAnswer.isEmpty) aggAnswer = tryAnswer(agg)
    aggAnswer.isDefined
  }

  private def colNameOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
    case _ => None
  }

  private def tryAnswer(agg: Aggregation): Option[(StructType, Seq[Any])] = {
    // only the plain live snapshot: pinned versions / change feeds carry
    // their own file sets the live manifest doesn't describe, and any
    // pushed filter means the count is of a SUBSET
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    if (options.contains("versionAsOf") || options.contains("timestampAsOf") ||
        options.contains("changeFeed")) return None
    val spark = SparkSession.active
    val answered = agg.aggregateExpressions().toSeq.map { f: AggregateFunc =>
      f match {
        case _: CountStar =>
          StatsIndex.statsCount(spark, root)
            .map(v => (StructField("count_star", LongType, nullable = false), v: Any))
        case c: Count if !c.isDistinct =>
          colNameOf(c.column).flatMap(n => StatsIndex.statsCountCol(spark, root, n))
            .map(v => (StructField("count", LongType, nullable = false), v: Any))
        case m: Min =>
          colNameOf(m.column).flatMap { n =>
            StatsIndex.statsMinMax(spark, root, n).map(r =>
              (StructField(s"min_$n", meta.schema(n).dataType), r._1))
          }
        case m: Max =>
          colNameOf(m.column).flatMap { n =>
            StatsIndex.statsMinMax(spark, root, n).map(r =>
              (StructField(s"max_$n", meta.schema(n).dataType), r._2))
          }
        case _ => None
      }
    }
    if (answered.exists(_.isEmpty)) None
    else {
      val cells = answered.map(_.get)
      Some((StructType(cells.map(_._1)), cells.map(_._2)))
    }
  }

  override def build(): Scan = aggAnswer match {
    case Some((schema, values)) => new GraftAggScan(schema, values)
    case None => new GraftV1Scan(root, options, meta, pushed, required)
  }
}

/** A completely-pushed aggregation's result: one driver-computed row of
  * final values, served through the V1 bridge — the plan carries no
  * parquet scan at all (the values came from the stats manifest).
  */
class GraftAggScan(aggSchema: StructType, values: Seq[Any])
    extends V1Scan with SupportsReportStatistics {
  override def readSchema(): StructType = aggSchema
  // one driver-materialized row: tell the planner so anything joined
  // against a pushed aggregate broadcasts
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(aggSchema.defaultSize.toLong)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(1L)
  }
  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = aggSchema
      override def buildScan(): RDD[Row] =
        context.sparkSession.sparkContext.parallelize(Seq(Row(values: _*)), 1)
    }.asInstanceOf[T]
}

/** The scan itself: bridges to a V1 `TableScan` ([[V1Scan]], public
  * connector API) whose frame is graft's existing fetch/time-travel/
  * change-feed plan — filter application and column pruning identical to
  * [[GraftRelation.buildScan]].
  */
class GraftV1Scan(root: String, options: Map[String, String], meta: DatasetMeta,
                  pushed: Array[Filter], required: StructType)
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Post-prune size + exact row count from the commit log / stats
    * sidecar ([[graft.core.ScanEstimate]]) — the seam that lets Catalyst
    * auto-broadcast a small graft table at PLAN time instead of paying a
    * sort-merge shuffle AQE repairs only afterwards. Change feeds answer
    * "unknown" (their file sets aren't a snapshot's); unknown maps back
    * to Spark's default size.
    */
  override def estimateStatistics(): Statistics = {
    val spark = SparkSession.active
    val (bytes, rows): (Option[Long], Option[Long]) =
      if (options.get("changeFeed").exists(_.trim.equalsIgnoreCase("true"))) (None, None)
      else {
        val prunable = GraftSourceFilters.prunableCols(spark, root, meta)
        val colFilters = pushed.flatMap(f =>
          GraftSourceFilters.toColFilter(prunable, f)).toSeq
        graft.core.ScanEstimate.estimate(spark, root,
          GraftTable.pinnedVersion(spark, root, options), colFilters)
      }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        bytes.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def buildScan(): RDD[Row] = {
        val spark = context.sparkSession
        val prunable = GraftSourceFilters.prunableCols(spark, root, meta)
        val colFilters = pushed.flatMap(f =>
          GraftSourceFilters.toColFilter(prunable, f)).toSeq
        val base = GraftTable.baseFrame(spark, root, options, colFilters)
        val filtered = pushed.flatMap(GraftSourceFilters.toColumn)
          .foldLeft(base)((df, c) => df.where(c))
        filtered.select(required.fieldNames.toIndexedSeq.map(col): _*).rdd
      }
    }.asInstanceOf[T]
}

/** V2 write bridged to graft's publish pipeline through the public
  * [[V1Write]] trait: AppendData → publish append, OverwriteByExpression
  * (truncate) → publish overwrite — versioned when the dataset is (or the
  * `versioned` option asks), with graft's own sizing/validation/evolution
  * rules governing (the table declares `ACCEPT_ANY_SCHEMA`).
  */
class GraftWriteBuilder(root: String, partitions: Seq[String],
                        options: Map[String, String],
                        declaredTransforms: Seq[graft.core.PartitionTransform] = Nil)
    extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data0: DataFrame, overwrite: Boolean): Unit = {
        val spark = data0.sparkSession
        val metaOpt = DatasetMeta.read(spark, root)
        val exists = metaOpt.nonEmpty
        // GENERATED ALWAYS AS columns materialize at the write seam:
        // omitted/NULL values compute, provided values must match
        val data1 = metaOpt.map(m =>
          graft.core.GeneratedCols.applyOn(data0, m.schema)).getOrElse(data0)
        // identity columns assign here too — the watermark advance rides
        // the same commit (propsFull/propsBase)
        val (data, propsFull, propsBase, idPersisted) = metaOpt.map(m =>
          graft.core.IdentityCols.applyOn(spark, root, data1, m.schema))
          .getOrElse((data1, None, None, false))
        val versioned = options.get("versioned").exists(_.trim.toBoolean) ||
          Versions.isVersioned(spark, root)
        val mode =
          if (truncateFirst || overwrite || !exists) "overwrite" else "append"
        // DDL-declared partition transforms (`PARTITIONED BY (days(ts))`)
        // route the CREATE through hidden partitioning; later writes see
        // the recorded spec and take the ordinary re-deriving path
        // try/finally: release the identity cache on failure paths too
        try {
          if (declaredTransforms.nonEmpty &&
              graft.core.Transforms.read(spark, root).isEmpty) {
            require(propsFull.isEmpty,
              "identity columns on a transform-partitioned table are not supported yet")
            Publish.publishTransformed(spark, data, root, declaredTransforms,
              mode = mode, versioned = versioned)
          } else if (versioned)
            Publish.publishVersioned(spark, data, root, partitions, mode = mode,
              propertiesFull = propsFull, baseVersion = propsBase)
          else Publish.publish(spark, data, root, partitions, mode = mode)
        } finally graft.core.IdentityCols.release(idPersisted, data)
      }
    }
  }
}
