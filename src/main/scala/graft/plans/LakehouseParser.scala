package graft.plans

import java.util.Locale

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import graft.core.Versions

/** Maintenance statements for the versioned lakehouse — the operational
  * verbs Spark's own grammar has no words for (the Delta-SQL shapes):
  *
  * {{{
  *   DESCRIBE HISTORY graft.`/data/events`
  *   OPTIMIZE graft.`/data/events`                         -- compact
  *   OPTIMIZE graft.`/data/events` ZORDER BY (x, y)        -- re-cluster
  *   OPTIMIZE graft.`/data/events` ORDER BY (day)
  *   RESTORE graft.`/data/events` TO VERSION AS OF 2
  *   VACUUM graft.`/data/events` RETAIN 3 VERSIONS
  * }}}
  *
  * Implementation follows the public Delta pattern: a ParserInterface
  * wrapper ([[GraftSqlParser]], injected via `injectParser`) recognizes
  * exactly these statement shapes and emits eager commands delegating to
  * [[graft.core.Versions]] — everything else falls through verbatim to
  * Spark's parser, so no stock SQL changes meaning. [[GraftSql.exec]]
  * consults the same matcher first, keeping the two entry points
  * byte-identical in behavior. The match is anchored (whole statement),
  * case-insensitive in keywords, and never fires on statements that
  * don't name a ``graft.`path` `` target — a typo'd maintenance verb
  * still gets Spark's own parse error, not a silent fall-through.
  *
  * `VACUUM … RETAIN n VERSIONS` requires the clause: physical deletion
  * with a defaulted horizon is how a SQL user loses time travel by
  * accident.
  */
object LakehouseStatements {

  // one shared lexeme: the target. Paths live in backticks (the Delta
  // convention), which cannot themselves contain a backtick.
  private val Target = "graft\\s*\\.\\s*`([^`]+)`"
  private def re(pattern: String) =
    ("(?is)\\A\\s*" + pattern + "\\s*;?\\s*\\z").r

  private val DescribeHistory = re("DESCRIBE\\s+HISTORY\\s+" + Target)
  private val DescribeDetail = re("DESCRIBE\\s+DETAIL\\s+" + Target)
  private val OptimizeSmall =
    re("OPTIMIZE\\s+" + Target + "\\s+SMALL\\s+FILES(?:\\s+UNDER\\s+(\\d+)\\s*(MB|KB))?")
  private val Optimize =
    re("OPTIMIZE\\s+" + Target + "(?:\\s+(ZORDER|ORDER)\\s+BY\\s*\\(?\\s*([\\w\\s,]+?)\\s*\\)?)?")
  private val Restore = re("RESTORE\\s+" + Target + "\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)")
  private val RestoreTs =
    re("RESTORE\\s+" + Target + "\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'")
  private val Vacuum = re("VACUUM\\s+" + Target + "\\s+RETAIN\\s+(\\d+)\\s+VERSIONS?" +
    "(?:\\s+GRACE\\s+(\\d+)\\s+MINUTES?)?(\\s+DRY\\s+RUN)?")
  private val Checkpoint = re("CHECKPOINT\\s+" + Target + "(?:\\s+AT\\s+VERSION\\s+(\\d+))?")
  private val RenameColumn =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)")
  private val DropColumn =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+DROP\\s+COLUMN\\s+(\\w+)")
  private val AlterColumnType =
    re("ALTER\\s+TABLE\\s+" + Target +
      "\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+TYPE\\s+([A-Za-z0-9_]+(?:\\s*\\(\\s*\\d+\\s*(?:,\\s*\\d+\\s*)?\\))?)")
  private val SyncIdentity =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+SYNC\\s+IDENTITY")
  private val AddColumnVerb =
    re("ALTER\\s+TABLE\\s+" + Target +
      "\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+([A-Za-z0-9_]+(?:\\s*\\(\\s*\\d+\\s*(?:,\\s*\\d+\\s*)?\\))?)")
  private val SetColumnDefault =
    re("ALTER\\s+TABLE\\s+" + Target +
      "\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+SET\\s+DEFAULT\\s+(.+)")
  private val DropColumnDefault =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+DROP\\s+DEFAULT")
  private val Clone =
    re("CREATE\\s+TABLE\\s+" + Target + "\\s+SHALLOW\\s+CLONE\\s+" + Target +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?")
  private val DeepClone =
    re("CREATE\\s+TABLE\\s+" + Target + "\\s+(?:DEEP\\s+)?CLONE\\s+" + Target +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?")
  private val AddConstraint =
    re("ALTER\\s+TABLE\\s+" + Target +
      "\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)")
  private val DropConstraint =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+DROP\\s+CONSTRAINT\\s+(\\w+)")
  private val Generate =
    re("GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+" + Target +
      "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?")
  private val SetProps =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)")
  private val UnsetProps =
    re("ALTER\\s+TABLE\\s+" + Target + "\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.+)\\)")
  private val ShowProps =
    re("SHOW\\s+TBLPROPERTIES\\s+" + Target)

  /** The command plan for a graft maintenance statement, or None when the
    * text is not one (→ caller hands it to Spark's parser).
    */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case DescribeHistory(root) => Some(GraftDescribeHistoryCommand(root))
    case DescribeDetail(root) => Some(GraftDescribeDetailCommand(root))
    case OptimizeSmall(root, n, unit) =>
      val shift = if (Option(unit).exists(_.equalsIgnoreCase("KB"))) 10 else 20
      Some(GraftOptimizeSmallCommand(root,
        Option(n).map(_.toLong << shift).getOrElse(32L << 20)))
    case Optimize(root, kind, cols) =>
      val names = Option(cols).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val zorder = Option(kind).exists(_.toUpperCase(Locale.ROOT) == "ZORDER")
      Some(GraftOptimizeCommand(root,
        sortCols = if (zorder) Nil else names,
        zorderCols = if (zorder) names else Nil))
    case Restore(root, v) => Some(GraftRestoreCommand(root, v.toInt))
    case RestoreTs(root, ts) => Some(GraftRestoreTimestampCommand(root, ts))
    case Vacuum(root, n, grace, dry) => Some(GraftVacuumCommand(root, n.toInt,
      Option(grace).map(_.toLong * 60000).getOrElse(Versions.DefaultVacuumGraceMs),
      dryRun = dry != null))
    case Checkpoint(root, v) =>
      Some(GraftCheckpointCommand(root, Option(v).map(_.toInt)))
    case RenameColumn(root, from, to) => Some(GraftRenameColumnCommand(root, from, to))
    case DropColumn(root, c) => Some(GraftDropColumnCommand(root, c))
    case AlterColumnType(root, c, t) => Some(GraftWidenColumnCommand(root, c, t.trim))
    case SyncIdentity(root, c) => Some(GraftSyncIdentityCommand(root, c))
    case AddColumnVerb(root, c, t) => Some(GraftAddColumnCommand(root, c, t.trim))
    case SetColumnDefault(root, c, d) =>
      Some(GraftColumnDefaultCommand(root, c, Some(d.trim)))
    case DropColumnDefault(root, c) =>
      Some(GraftColumnDefaultCommand(root, c, None))
    case Clone(dst, src, v) =>
      Some(GraftCloneCommand(dst, src, Option(v).map(_.toInt)))
    // DEEP is the Delta default when unspecified — materialize the copy
    case DeepClone(dst, src, v) =>
      Some(GraftDeepCloneCommand(dst, src, Option(v).map(_.toInt)))
    case AddConstraint(root, name, check) =>
      Some(GraftAddConstraintCommand(root, name, check.trim))
    case DropConstraint(root, name) =>
      Some(GraftDropConstraintCommand(root, name))
    case Generate(root, v) =>
      Some(GraftGenerateManifestCommand(root, Option(v).map(_.toInt)))
    case SetProps(root, kvs) =>
      val pair = "'([^']*)'\\s*=\\s*'([^']*)'".r
      val parsed = pair.findAllMatchIn(kvs).map(m => m.group(1) -> m.group(2)).toMap
      require(parsed.nonEmpty, s"cannot parse TBLPROPERTIES list: $kvs " +
        "(expected 'key'='value', ...)")
      Some(GraftSetPropertiesCommand(root, parsed))
    case UnsetProps(root, ks) =>
      val key = "'([^']*)'".r
      val parsed = key.findAllMatchIn(ks).map(_.group(1)).toSeq
      require(parsed.nonEmpty, s"cannot parse TBLPROPERTIES key list: $ks")
      Some(GraftUnsetPropertiesCommand(root, parsed))
    case ShowProps(root) => Some(GraftShowPropertiesCommand(root))
    case _ => None
  }
}

/** `ALTER TABLE graft.`root` SET TBLPROPERTIES ('k'='v', …)` — a
  * metadata-only `alter` commit merging the map; properties persist
  * across every later commit ([[Versions.setTableProperties]]).
  */
case class GraftSetPropertiesCommand(root: String, kvs: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.setTableProperties(spark, root, kvs)))
}

/** `ALTER TABLE graft.`root` UNSET TBLPROPERTIES ('k', …)`. */
case class GraftUnsetPropertiesCommand(root: String, keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.unsetTableProperties(spark, root, keys)))
}

/** `SHOW TBLPROPERTIES graft.`root``. */
case class GraftShowPropertiesCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Versions.tablePropertiesOf(spark, root).toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `GENERATE symlink_format_manifest FOR TABLE graft.`root` [VERSION AS OF
  * n]` — the Delta interop shape ([[Versions.writeSymlinkManifest]]):
  * per-partition text manifests of the snapshot's live file URIs, so
  * external engines read the exact snapshot.
  */
case class GraftGenerateManifestCommand(root: String, version: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifest", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Versions.writeSymlinkManifest(spark, root, version).map(Row(_))
}

/** `ALTER TABLE graft.`root` ADD CONSTRAINT name CHECK (expr)` — the
  * Delta table-constraint shape ([[Versions.addConstraint]]: existing
  * data validated, then a metadata-only commit; every later write is
  * gated on the expression not being FALSE).
  */
case class GraftAddConstraintCommand(root: String, name: String, check: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("constraint", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.addConstraint(spark, root, name, check), name))
}

/** `ALTER TABLE graft.`root` DROP CONSTRAINT name`. */
case class GraftDropConstraintCommand(root: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("constraint", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.dropConstraint(spark, root, name), name))
}

/** `CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src` [VERSION AS OF n]`
  * — the Delta CLONE shape: a metadata-only commit referencing the source
  * snapshot's files in place ([[Versions.clone]]).
  */
case class GraftCloneCommand(dst: String, src: String, version: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("source_version", IntegerType, nullable = false)(),
    AttributeReference("target", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = version.getOrElse(Versions.latestVersion(spark, src).getOrElse(
      throw new IllegalArgumentException(s"clone source $src is not versioned")))
    Versions.clone(spark, src, dst, Some(v))
    Seq(Row(src, v, dst))
  }
}

/** `CREATE TABLE graft.`dst` [DEEP] CLONE graft.`src` [VERSION AS OF n]`
  * — the materializing clone ([[Versions.deepClone]]): every live file
  * byte-copied under the target, DVs carried, fresh history. DEEP is the
  * default when neither keyword is given, matching Delta.
  */
case class GraftDeepCloneCommand(dst: String, src: String, version: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("source_version", IntegerType, nullable = false)(),
    AttributeReference("target", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = version.getOrElse(Versions.latestVersion(spark, src).getOrElse(
      throw new IllegalArgumentException(s"clone source $src is not versioned")))
    Versions.deepClone(spark, src, dst, Some(v))
    Seq(Row(src, v, dst))
  }
}

/** `ALTER TABLE graft.`root` ALTER COLUMN c TYPE t` — explicit TYPE
  * WIDENING, metadata-only ([[Versions.widenColumn]]: lossless
  * promotions only; existing narrow files upcast at the parquet reader).
  */
case class GraftWidenColumnCommand(root: String, colName: String,
                                   typeDdl: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("new_type", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dt = org.apache.spark.sql.types.DataType.fromDDL(typeDdl)
    val v = Versions.widenColumn(spark, root, colName, dt)
    Seq(Row(v, colName, dt.simpleString))
  }
}

/** `ALTER TABLE graft.`root` ALTER COLUMN c SYNC IDENTITY` — re-seat the
  * identity watermark past everything present ([[Versions.syncIdentity]],
  * the Delta repair after out-of-band values).
  */
case class GraftSyncIdentityCommand(root: String, column: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.syncIdentity(spark, root, column), column))
}

/** `ALTER TABLE graft.`root` ADD COLUMN c t` — metadata-only additive
  * evolution ([[Versions.addColumn]]: old files read NULL, zero bytes
  * rewritten).
  */
case class GraftAddColumnCommand(root: String, column: String, typeDdl: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("type", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dt = org.apache.spark.sql.types.DataType.fromDDL(typeDdl)
    Seq(Row(Versions.addColumn(spark, root, column, dt), column, dt.simpleString))
  }
}

/** `ALTER TABLE graft.`root` ALTER COLUMN c SET DEFAULT expr | DROP
  * DEFAULT` — metadata-only ([[Versions.setColumnDefault]]): the default
  * applies to FUTURE SQL inserts that omit the column (Spark's own
  * analyzer fills it from the `CURRENT_DEFAULT` field-metadata key);
  * existing rows are untouched.
  */
case class GraftColumnDefaultCommand(root: String, column: String,
                                     defaultSql: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("default", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = Versions.setColumnDefault(spark, root, column, defaultSql)
    Seq(Row(v, column, defaultSql.orNull))
  }
}

/** `ALTER TABLE graft.`root` RENAME COLUMN a TO b` — metadata-only
  * ([[Versions.renameColumn]]: one `alter` commit carrying the name
  * mapping; zero data bytes move).
  */
case class GraftRenameColumnCommand(root: String, from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("new_version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.renameColumn(spark, root, from, to)))
}

/** `ALTER TABLE graft.`root` DROP COLUMN c` — metadata-only
  * ([[Versions.dropColumn]]).
  */
case class GraftDropColumnCommand(root: String, column: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("new_version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versions.dropColumn(spark, root, column)))
}

/** `CHECKPOINT graft.`root` [AT VERSION n]` — force a persisted commit-log
  * checkpoint (latest version by default); readers then resolve snapshots
  * from it instead of replaying the chain ([[Versions.writeCheckpoint]]).
  */
case class GraftCheckpointCommand(root: String, version: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("checkpointed_version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = version.orElse(Versions.latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"dataset $root is not versioned"))
    Versions.writeCheckpoint(spark, root, v)
    Seq(Row(v))
  }
}

/** `DESCRIBE HISTORY graft.`root``: the commit log, one row per version. */
case class GraftDescribeHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("op_params", StringType, nullable = false)(),
    AttributeReference("n_added_files", LongType, nullable = false)(),
    AttributeReference("n_removed_files", LongType, nullable = false)(),
    AttributeReference("ts_millis", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Versions.history(spark, root).collect().toSeq
}

/** `DESCRIBE DETAIL graft.`root``: one row of operational facts — live
  * file count and bytes, partition columns, version span, readable floor.
  */
case class GraftDescribeDetailCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("num_versions", IntegerType, nullable = false)(),
    AttributeReference("min_readable_version", IntegerType, nullable = false)(),
    AttributeReference("num_live_dv_dirs", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val meta = graft.core.DatasetMeta.read(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"dataset $root is missing graft metadata — publish it first"))
    val latest = Versions.latestVersion(spark, root)
    // sizes from ONE recursive listing walk, not a per-file RPC loop
    val listed = graft.core.Publish.listPhysicalDataFilesWithSize(spark, root)
    val qroot = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(root)).toUri.getPath
      .stripSuffix("/")
    val sizeByRel = listed.map { case (abs, len) =>
      new org.apache.hadoop.fs.Path(abs).toUri.getPath
        .stripPrefix(qroot).stripPrefix("/") -> len
    }.toMap
    val (files, dvs) = latest match {
      case Some(v) =>
        val (fl, _, dv) = Versions.snapshotFullAt(spark, root, v)
        (fl, dv.map(_.dir).distinct.size)
      case None => (sizeByRel.keys.toSeq, 0)
    }
    val bytes = files.map(sizeByRel.getOrElse(_, 0L)).sum
    Seq(Row("graft", files.size.toLong, bytes,
      meta.partitions.mkString(","), latest.getOrElse(0),
      latest.map(_ => Versions.minReadableVersion(spark, root)).getOrElse(0),
      dvs))
  }
}

/** `OPTIMIZE graft.`root` [ZORDER BY (…) | ORDER BY (…)]` — compaction as
  * a new logical-overwrite version ([[Versions.compact]]).
  */
case class GraftOptimizeCommand(root: String, sortCols: Seq[String],
                                zorderCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_files_written", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val files = Versions.compact(spark, root, sortCols = sortCols, zorderCols = zorderCols)
    Seq(Row(Versions.latestVersion(spark, root).get, files.size))
  }
}

/** `OPTIMIZE graft.`root` SMALL FILES [UNDER n MB]` — selective
  * compaction: bin-pack only the live files under the threshold
  * ([[Versions.compactSmall]] — the Delta OPTIMIZE default shape);
  * right-sized files are untouched, so on a fragmented 100 TB table the
  * rewrite is O(small-file tail), not O(snapshot).
  */
case class GraftOptimizeSmallCommand(root: String, smallBytes: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("n_files_written", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val files = Versions.compactSmall(spark, root, smallBytes)
    Seq(Row(Versions.latestVersion(spark, root).get, files.size))
  }
}

/** `RESTORE graft.`root` TO VERSION AS OF n` — metadata-only rollback. */
case class GraftRestoreCommand(root: String, version: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", IntegerType, nullable = false)(),
    AttributeReference("new_version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(version, Versions.restore(spark, root, version)))
}

/** `RESTORE graft.`root` TO TIMESTAMP AS OF 'ts'` — rollback to the
  * version in force at a wall-clock instant ([[Versions.versionAsOf]]).
  */
case class GraftRestoreTimestampCommand(root: String, ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", IntegerType, nullable = false)(),
    AttributeReference("new_version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val millis = Versions.parseTsLiteral(spark, ts)
    val v = Versions.versionAsOf(spark, root, millis)
    Seq(Row(v, Versions.restore(spark, root, v)))
  }
}

/** `VACUUM graft.`root` RETAIN n VERSIONS [GRACE m MINUTES] [DRY RUN]` —
  * physically delete files only referenced by versions older than the
  * newest `n`. GRACE overrides the default staging-grace horizon
  * ([[Versions.vacuum]]): unreferenced files younger than it survive,
  * protecting in-flight lock-free appends; `GRACE 0 MINUTES` reclaims
  * immediately (quiesced maintenance windows only). DRY RUN lists what
  * would go — one path per row — deleting nothing and advancing no
  * watermark.
  */
case class GraftVacuumCommand(root: String, retain: Int,
                              graceMs: Long = Versions.DefaultVacuumGraceMs,
                              dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(AttributeReference("would_delete", StringType, nullable = false)())
    else Seq(
      AttributeReference("keep_from", IntegerType, nullable = false)(),
      AttributeReference("n_deleted_files", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(retain >= 1, s"RETAIN $retain VERSIONS: must keep at least 1")
    val latest = Versions.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"dataset $root is not versioned"))
    val keepFrom = math.max(1, latest - retain + 1)
    if (dryRun) Versions.vacuumDryRun(spark, root, keepFrom, graceMs)
      .sorted.map(Row(_))
    else {
      val dead = Versions.vacuum(spark, root, keepFrom, graceMs)
      Seq(Row(keepFrom, dead.size))
    }
  }
}

/** The injected parser: graft maintenance statements short-circuit, all
  * other text reaches the delegate (Spark's own parser) untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LakehouseStatements.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
