package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.core.{ColFilter, DatasetMeta, Fetch, Publish, Versions}

/** `format("graft")` — graft datasets as a first-class Spark data source,
  * so the standard reader/writer/DDL surface works without importing graft
  * APIs (the reference has no equivalent; s3parq is import-only,
  * fetch_parq.py/publish_parq.py):
  *
  *   - `spark.read.format("graft").load(root)` — latest snapshot (commit
  *     log honored on versioned roots); `.option("versionAsOf", n)` time-
  *     travels. Partition filters prune directories/files exactly like
  *     [[Fetch.fetch]] — the relation compiles pushed-down `Filter`s back
  *     into graft's typed filter pipeline.
  *   - `df.write.format("graft").save(root)` — publish through graft's
  *     sizing/validation path; `partitions` (comma list) and
  *     `versioned=true` options; SaveMode maps to publish modes.
  *   - `CREATE TABLE t USING graft OPTIONS (path '...')` + `INSERT INTO t`
  *     — catalog-registered graft tables ([[InsertableRelation]]).
  *   - `spark.readStream.format("graft").load(root)` — the CDC source
  *     ([[GraftCdcSource]]): a live query FOLLOWS a versioned dataset,
  *     one micro-batch per commit range (the Delta `readChangeFeed`
  *     analog and the consumer half of graft's streaming ingestion).
  *
  * Implemented over the stable V1 provider seams (RelationProvider /
  * InsertableRelation / StreamSourceProvider), the same fallback shape the
  * major lakehouse formats ship: reads resolve to graft's existing
  * parquet-scan plans (full Catalyst pushdown/pruning through the actual
  * scan), so no custom columnar reader is on the hot path.
  */
class GraftDataSource extends RelationProvider with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft data source needs a path (load(root) / OPTIONS (path '...'))"))

  // ------------------------------------------------- DataSourceV2 seam
  // TableProvider makes graft a first-class V2 connector: batch reads and
  // writes plan through DataSourceV2Relation/AppendData (V2 pushdown, V1
  // data path via the public V1Scan/V1Write bridges — see [[GraftTable]]),
  // and the session catalog resolves name-based `USING graft` tables
  // through getTable. Streaming falls back to the V1 providers above
  // (GraftTable declares no streaming capabilities), and ErrorIfExists/
  // Ignore saves fall back to createRelation — all V1 behavior preserved.

  /** Catalog tables store their own schema; writes carry the query's. */
  override def supportsExternalMetadata(): Boolean = true

  /** Path-option reads carry `path`; name-registered catalog tables
    * (managed or `LOCATION`-declared) surface the table location under
    * the V2 `location` property instead.
    */
  private def v2RootOf(params: Map[String, String]): Option[String] =
    params.get("path").orElse(params.get("location"))

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    import scala.jdk.CollectionConverters._
    val params = options.asScala.toMap
    val spark = SparkSession.active
    // a not-yet-existing dataset is a legal WRITE target: hand back an
    // empty schema (the write uses the query's); reads fail later with
    // the precise missing-metadata error in newScanBuilder
    v2RootOf(params).flatMap(GraftTable.resolveMeta(spark, _, params))
      .map(m => GraftTable.readSchemaFor(m, params))
      .getOrElse(new StructType())
  }

  override def getTable(schema: StructType,
                        partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
                        properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    import scala.jdk.CollectionConverters._
    val params = properties.asScala.toMap
    val declared = partitioning.toSeq.collect {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
    }
    // non-identity V2 transforms (`PARTITIONED BY (days(ts), bucket(8,
    // k))` in DDL) map onto graft's hidden partitioning — the CREATE
    // routes through publishTransformed
    val declaredTs = partitioning.toSeq.flatMap(GraftDataSource.v2ToGraft)
    require(declaredTs.length == partitioning.count(_.name != "identity"),
      s"unsupported partition transform among ${partitioning.mkString(", ")} " +
        "(supported: years/months/days/hours(col), bucket(n, col), truncate(n, col))")
    new GraftTable(v2RootOf(params),
      Option(schema).filter(_.fields.nonEmpty), params, declared, declaredTs)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    if (changeFeedOpt(parameters)) {
      // batch change-feed read (the Delta readChangeFeed option shape):
      // startingVersion inclusive, endingVersion inclusive (default latest)
      val root = rootOf(parameters)
      val spark = sqlContext.sparkSession
      val from = parameters.getOrElse("startingVersion", throw
        new IllegalArgumentException(
          "changeFeed reads need startingVersion (inclusive)")).trim.toInt
      val to = parameters.get("endingVersion").map(_.trim.toInt)
        .orElse(Versions.latestVersion(spark, root)).getOrElse(
          throw new IllegalArgumentException(s"dataset $root is not versioned"))
      new GraftChangeFeedRelation(sqlContext, root, from - 1, to,
        GraftDataSource.rowDiffKeysOf(parameters))
    } else {
      val root = rootOf(parameters)
      new GraftRelation(sqlContext, root,
        GraftTable.pinnedVersion(sqlContext.sparkSession, root, parameters))
    }

  /** Writer path (`df.write.format("graft")` and CTAS). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data0: DataFrame): BaseRelation = {
    val root = rootOf(parameters)
    val spark = data0.sparkSession
    val recorded = DatasetMeta.read(spark, root)
    val exists = recorded.nonEmpty
    // GENERATED ALWAYS AS columns: the DataFrame-writer path is the one
    // surface that can legitimately OMIT them (no analyzer column-list
    // resolution) — compute omitted/NULL, validate provided; identity
    // columns assign the same way (watermark rides the commit). LAZY and
    // GATED on the batch's shape matching the recorded schema: a
    // SaveMode.Overwrite that legitimately REDEFINES the schema must not
    // run stale generation expressions (they reference columns the new
    // frame doesn't carry), and Ignore-on-existing / ErrorIfExists paths
    // must stay no-op/metadata-only instead of paying validation jobs.
    lazy val (data, idProps, idBase, idPersisted) = {
      val applicable = recorded.exists(m =>
        data0.columns.forall(m.schema.fieldNames.contains))
      if (!applicable) (data0, None, None, false)
      else {
        val m = recorded.get
        val data1 = graft.core.GeneratedCols.applyOn(data0, m.schema)
        graft.core.IdentityCols.applyOn(spark, root, data1, m.schema)
      }
    }
    val versioned = parameters.get("versioned").exists(_.trim.toBoolean) ||
      Versions.isVersioned(spark, root)
    def write(publishMode: String): Unit = {
      // appends with no explicit partitions option inherit the dataset's
      // recorded layout (incl. transform-derived partition columns — the
      // write seams re-derive those from the raw frame)
      val partitions = parameters.get("partitions")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(if (publishMode == "append")
          recorded.map(_.partitions).getOrElse(Nil) else Nil)
      // `transforms` option: hidden partitioning on the DataFrame-writer
      // path (existing transform datasets take the re-deriving path)
      val declaredTs = parameters.get("transforms")
        .map(graft.core.Transforms.parseSpec).getOrElse(Nil)
      // try/finally: a constraint violation, schema-match failure or OCC
      // conflict must still release the identity cache (ADVICE r17)
      try {
        if (declaredTs.nonEmpty &&
            graft.core.Transforms.read(spark, root).isEmpty) {
          require(idProps.isEmpty,
            "identity columns on a transform-partitioned table are not supported yet")
          Publish.publishTransformed(spark, data, root, declaredTs,
            mode = publishMode, versioned = versioned)
        } else if (versioned)
          Publish.publishVersioned(spark, data, root, partitions,
            mode = publishMode, propertiesFull = idProps, baseVersion = idBase)
        else Publish.publish(spark, data, root, partitions, mode = publishMode)
      } finally graft.core.IdentityCols.release(idPersisted, data)
    }
    mode match {
      case SaveMode.Overwrite => write("overwrite")
      case SaveMode.Append => write(if (exists) "append" else "overwrite")
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalArgumentException(
          s"dataset $root already exists (SaveMode.ErrorIfExists)")
        write("overwrite")
      case SaveMode.Ignore => if (!exists) write("overwrite")
    }
    new GraftRelation(sqlContext, root, None)
  }

  // ------------------------------------------------------------- streaming

  private def changeFeedOpt(parameters: Map[String, String]): Boolean =
    parameters.get("changeFeed").exists(_.trim.equalsIgnoreCase("true"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    ("graft-cdc", GraftCdcSource.schemaFor(sqlContext.sparkSession,
      rootOf(parameters), changeFeedOpt(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new GraftCdcSource(sqlContext.sparkSession, rootOf(parameters),
      changeFeedOpt(parameters),
      parameters.get("maxVersionsPerTrigger").map(_.trim.toInt))

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft streaming sink is append-only (a versioned commit per batch), got $outputMode")
    val partitions = parameters.get("partitions")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(partitionColumns)
    // sink identity for the exactly-once txn stamp: stable across restarts
    // of the same query (same checkpoint), distinct across queries
    val appId = parameters.getOrElse("txnAppId",
      "ckpt-" + java.util.UUID.nameUUIDFromBytes(
        parameters.getOrElse("checkpointLocation", rootOf(parameters))
          .getBytes("UTF-8")).toString)
    new GraftSink(sqlContext.sparkSession, rootOf(parameters), partitions, appId)
  }
}

/** Batch relation: the dataset's (or a pinned version's) snapshot, scanned
  * through graft's own fetch plans. Pushed filters on PARTITION columns
  * compile into graft [[ColFilter]]s (driver-side directory pruning, the
  * cheapest path); every translatable filter is ALSO applied to the frame
  * so the parquet scan sees its pushdown — and Spark re-evaluates all
  * filters above the scan regardless (default `unhandledFilters`), so an
  * untranslatable predicate costs nothing in correctness.
  */
class GraftRelation(override val sqlContext: SQLContext, root: String,
                    versionAsOf: Option[Int])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def spark: SparkSession = sqlContext.sparkSession

  private lazy val meta: DatasetMeta = versionAsOf match {
    case Some(v) =>
      val (_, m) = Versions.snapshotAt(spark, root, v); m
    case None => DatasetMeta.read(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"dataset $root is missing graft metadata — publish it first"))
  }

  private lazy val hidden: Set[String] =
    GraftSourceFilters.hiddenCols(spark, root)
  private lazy val prunable: Set[String] =
    GraftSourceFilters.prunableCols(spark, root, meta)

  override lazy val schema: StructType =
    StructType(meta.schema.fields.filterNot(f => hidden(f.name)))

  // on-disk bytes of the (possibly pinned) snapshot, so the V1 logical
  // relation is broadcast-eligible too; BaseRelation stats carry no
  // filters (pre-pushdown) — unknown degrades to Spark's default
  override def sizeInBytes: Long =
    graft.core.ScanEstimate.estimate(spark, root, versionAsOf, Nil)._1
      .getOrElse(super.sizeInBytes)

  private def snapshot: DataFrame = versionAsOf match {
    case Some(v) => Versions.fetchVersion(spark, root, v)
      .drop(hidden.toSeq: _*)
    case None => Fetch.fetch(spark, root, acceptNotGraft = false)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    // live reads route partition (and transform-source) predicates
    // through graft's driver-side pruner — fetch plans versioned roots
    // from the commit log and handles hidden partitioning itself; pinned
    // versions scan the snapshot, with raw predicates re-applied below
    val base = versionAsOf match {
      case None =>
        val colFilters = filters.flatMap(f =>
          GraftSourceFilters.toColFilter(prunable, f)).toSeq
        Fetch.fetch(spark, root, colFilters, acceptNotGraft = false)
      case _ => snapshot
    }
    val filtered = filters.flatMap(GraftSourceFilters.toColumn)
      .foldLeft(base)((df, c) => df.where(c))
    filtered.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }

  /** `INSERT INTO t` (append) / `INSERT OVERWRITE t`. A transform-
    * partitioned dataset takes the USER schema (derived columns are
    * layout — the write seams re-derive them).
    */
  override def insert(data0: DataFrame, overwrite: Boolean): Unit = {
    require(versionAsOf.isEmpty, "cannot insert into a time-travel relation")
    require(data0.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"insert schema ${data0.schema.simpleString} does not match dataset " +
        s"schema ${schema.simpleString}")
    // GENERATED ALWAYS AS columns: omitted/NULL values compute at the
    // write seam, provided values must match (graft.core.GeneratedCols);
    // identity columns assign, their watermark rides the same commit
    val data1 = graft.core.GeneratedCols.applyOn(data0, meta.schema)
    val (data, propsFull, propsBase, idPersisted) =
      graft.core.IdentityCols.applyOn(spark, root, data1, meta.schema)
    val mode = if (overwrite) "overwrite" else "append"
    try {
      if (Versions.isVersioned(spark, root))
        Publish.publishVersioned(spark, data, root, meta.partitions, mode = mode,
          propertiesFull = propsFull, baseVersion = propsBase)
      else Publish.publish(spark, data, root, meta.partitions, mode = mode)
    } finally graft.core.IdentityCols.release(idPersisted, data)
  }
}

/** Streaming sink — `df.writeStream.format("graft")` commits one version
  * per micro-batch into a versioned dataset ([[Publish.publishVersioned]]
  * append), EXACTLY-ONCE: the batch's (appId, batchId) stamp is recorded
  * inside the commit entry itself (one atomic write — the Delta `txn`
  * action), so a batch replayed after a crash anywhere between commit and
  * checkpoint advance is recognized via [[Versions.lastTxnBatch]] and
  * skipped, never double-appended. The restart probe costs one O(history)
  * pass over the tiny entry files; the running sink tracks the watermark
  * in memory.
  */
class GraftSink(spark: SparkSession, root: String, partitions: Seq[String],
                appId: String) extends Sink {

  // -1 = nothing committed yet; lazily probed so an empty first batch on a
  // fresh (not-yet-versioned) dataset doesn't fail the lookup
  private var lastBatch: Long = -1L
  private var probed = false

  override def addBatch(batchId: Long, data: DataFrame): Unit = synchronized {
    if (!probed) {
      lastBatch = Versions.lastTxnBatch(spark, root, appId).getOrElse(-1L)
      probed = true
    }
    if (batchId <= lastBatch) return // replayed batch: committed already
    val batch = shim.batchDataFrame(spark, data.queryExecution.toRdd, data.schema)
    if (!batch.isEmpty)
      Publish.publishVersioned(spark, batch, root, partitions,
        mode = "append", txn = Some((appId, batchId)))
    lastBatch = batchId
  }

  override def toString: String = s"GraftSink[$root]"
}

/** Structured-streaming CDC source following a versioned graft dataset:
  * offsets ARE commit versions, each micro-batch reads exactly the files
  * the commits in `(start, end]` added ([[Versions.addedBetween]] —
  * O(new data), never a dataset rescan), stamped with a `_commit_version`
  * column. Restart resumes from the checkpointed version offset; commits
  * that arrive while a batch runs fold into the next one.
  *
  * Semantics notes (the [[Versions.addedBetween]] contract): an
  * `overwrite` commit's added files are its full snapshot — a consumer
  * crossing an overwrite boundary sees the new snapshot as one batch;
  * row-level deletes don't stream (rewrite commits stream their rewritten
  * files). The schema is pinned at stream start: later evolved columns
  * are ignored until the stream restarts (files missing pinned columns
  * null-fill, the usual graft read rule).
  */
/** Batch change-feed relation: `spark.read.format("graft")
  * .option("changeFeed","true").option("startingVersion", n)
  * [.option("endingVersion", m)].load(root)` — the batch twin of the
  * streaming changeFeed option, row-level changes over an explicit
  * version window ([[Versions.changeFeed]]).
  */
class GraftChangeFeedRelation(override val sqlContext: SQLContext,
                              root: String, fromExclusive: Int, to: Int,
                              rowDiffKeys: Seq[String] = Nil)
    extends BaseRelation with TableScan {
  // one feed serves both schema and scans: building it re-resolves
  // snapshots and re-reads commit entries, so do that once per relation
  private lazy val feed: DataFrame =
    Versions.changeFeed(sqlContext.sparkSession, root, fromExclusive, to,
      rowDiffKeys)
  override lazy val schema: StructType = feed.schema
  override def buildScan(): RDD[Row] = feed.rdd
}

/** `sources.Filter` → graft/Column translation shared by the V1 relation
  * and the V2 scan ([[GraftScanBuilder]]).
  */
private[sources] object GraftSourceFilters {
  /** Columns graft's driver-side pruner can act on: hive partition
    * columns plus hidden-partitioning TRANSFORM SOURCE columns (a raw
    * `days(ts)` filter prunes the derived directories — see
    * [[graft.core.Transforms]]).
    */
  def prunableCols(spark: SparkSession, root: String,
                   meta: DatasetMeta): Set[String] =
    meta.partitions.toSet ++
      graft.core.Transforms.read(spark, root).map(_.source)

  /** Transform-derived partition columns — physical layout, hidden from
    * every read schema the connector reports.
    */
  def hiddenCols(spark: SparkSession, root: String): Set[String] =
    graft.core.Transforms.read(spark, root).map(_.name).toSet

  /** sources.Filter → graft ColFilter, for single-column comparisons on a
    * prunable column (the shapes graft's driver-side pruning speaks).
    */
  def toColFilter(prunable: Set[String], f: Filter): Option[ColFilter] = f match {
    case EqualTo(a, v) if prunable(a) => Some(ColFilter(a, "==", Seq(v)))
    case In(a, vs) if prunable(a) && vs.nonEmpty && !vs.contains(null) =>
      Some(ColFilter(a, "==", vs.toSeq))
    case GreaterThan(a, v) if prunable(a) => Some(ColFilter(a, ">", Seq(v)))
    case GreaterThanOrEqual(a, v) if prunable(a) => Some(ColFilter(a, ">=", Seq(v)))
    case LessThan(a, v) if prunable(a) => Some(ColFilter(a, "<", Seq(v)))
    case LessThanOrEqual(a, v) if prunable(a) => Some(ColFilter(a, "<=", Seq(v)))
    case _ => None
  }

  /** sources.Filter → Column, best-effort (None ⇒ Spark re-applies it). */
  def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}

class GraftCdcSource(spark: SparkSession, root: String,
                     changeFeed: Boolean = false,
                     maxVersionsPerTrigger: Option[Int] = None) extends Source {

  maxVersionsPerTrigger.foreach(n => require(n >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $n"))

  override val schema: StructType = GraftCdcSource.schemaFor(spark, root, changeFeed)

  private val dataSchema =
    StructType(schema.fields.dropRight(if (changeFeed) 2 else 1))

  private def toVersion(o: OffsetV1): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt // LongOffset serializes as the bare number
    case other => other.json.trim.toInt
  }

  // rate limiting (the Delta maxFilesPerTrigger analog): a consumer
  // starting against a long history (or catching up after downtime)
  // otherwise gets the WHOLE backlog as one giant first batch.
  // getOffset advances at most maxVersionsPerTrigger commits past the
  // last batch it handed out; the engine calls getBatch for exactly the
  // offered range, so the cap needs no state beyond the last offer.
  private var lastOffered: Option[Int] = None

  // LOAD-BEARING engine-ordering assumption: on restart, the V1
  // micro-batch engine REPLAYS the last checkpointed batch via getBatch
  // BEFORE asking getOffset for new work, so getBatch seeds lastOffered
  // with the checkpointed watermark and the min(latest, floor + n) cap
  // never lands below an already-committed offset. Defensively, the
  // offset returned here is additionally clamped to never regress below
  // anything this instance has seen — if the ordering ever changed, the
  // worst case is one uncapped batch, never a re-emitted version.
  override def getOffset: Option[OffsetV1] =
    Versions.latestVersion(spark, root).map { latest =>
      val capped = maxVersionsPerTrigger match {
        case Some(n) =>
          val floor = lastOffered.getOrElse(0)
          math.min(latest, floor + n)
        case None => latest
      }
      val out = math.max(capped, lastOffered.getOrElse(0))
      lastOffered = Some(out)
      LongOffset(out.toLong)
    }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(toVersion).getOrElse(0)
    val to = toVersion(end)
    // seed/advance the rate-limit floor from the engine's own range: on
    // restart the first getBatch replays from the CHECKPOINTED offset,
    // which may be far past anything this instance offered
    lastOffered = Some(math.max(to, lastOffered.getOrElse(0)))
    def align(df: DataFrame, tail: Seq[org.apache.spark.sql.Column]): DataFrame =
      df.select(dataSchema.fields.toIndexedSeq.map { f =>
        (if (df.columns.contains(f.name)) col(f.name) else lit(null))
          .cast(f.dataType).as(f.name)
      } ++ tail: _*)
    val batch =
      if (to <= from) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else if (changeFeed)
        // row-level feed: inserts AND deletes, each stamped with its
        // change type and commit version by changeFeed itself
        align(Versions.changeFeed(spark, root, from, to),
          Seq(col("_change_type"), col("_commit_version")))
      else (from + 1 to to).map { v =>
        // per-version read so each row carries ITS commit's version — and
        // every frame casts to the pinned schema (an overwrite inside the
        // range may have evolved columns; pinned-missing ones null-fill)
        val added = Versions.addedBetween(spark, root, v - 1, v)
        align(added, Seq(lit(v).as("_commit_version")))
      }.reduce(_ unionByName _)
    // the engine requires a STREAMING frame; hand it the computed rows
    shim.streamingDataFrame(spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}

object GraftDataSource {
  /** `rowDiffKeys` option (comma list): minimal-feed keys for rewrite
    * commits in change-feed reads ([[Versions.changeFeed]]).
    */
  private[sources] def rowDiffKeysOf(parameters: Map[String, String]): Seq[String] = {
    // rowDiffById=true is the no-user-keys minimal feed (row tracking):
    // sugar for keying the rewrite diff on the stable row id
    val byId = parameters.get("rowDiffById").exists(_.trim.equalsIgnoreCase("true"))
    if (byId) Seq(graft.core.Versions.RowIdCol)
    else parameters.get("rowDiffKeys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  }

  /** V2 DDL partition transform → graft hidden-partitioning transform
    * (`PARTITIONED BY (days(ts), bucket(8, k), truncate(4, s))`).
    * Argument order is tolerant — Spark's bucket puts the count first;
    * users write truncate either way.
    */
  private[sources] def v2ToGraft(
      t: org.apache.spark.sql.connector.expressions.Transform)
      : Option[graft.core.PartitionTransform] = {
    if (t.references.length != 1) return None
    val field = t.references.head.fieldNames.mkString(".")
    def intArg: Option[Int] = t.arguments.collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
        if l.value != null && l.value.toString.matches("-?\\d+") =>
        l.value.toString.toInt
    }
    t.name.toLowerCase(java.util.Locale.ROOT) match {
      case "years"  => Some(graft.core.YearsOf(field))
      case "months" => Some(graft.core.MonthsOf(field))
      case "days"   => Some(graft.core.DaysOf(field))
      case "hours"  => Some(graft.core.HoursOf(field))
      case "bucket" => intArg.map(n => graft.core.BucketOf(n, field))
      case "truncate" => intArg.map(w => graft.core.TruncateOf(w, field))
      case _ => None
    }
  }
}

object GraftCdcSource {
  /** Pinned source schema: the latest snapshot's columns + the commit
    * version stamp (+ the change type in changeFeed mode).
    */
  def schemaFor(spark: SparkSession, root: String,
                changeFeed: Boolean = false): StructType = {
    val latest = Versions.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"graft streaming source needs a VERSIONED dataset; $root has no commit log"))
    val (_, meta) = Versions.snapshotAt(spark, root, latest)
    val tail =
      if (changeFeed) Seq(StructField("_change_type", StringType, nullable = false),
        StructField("_commit_version", IntegerType, nullable = false))
      else Seq(StructField("_commit_version", IntegerType, nullable = false))
    StructType(meta.schema.fields ++ tail)
  }
}
