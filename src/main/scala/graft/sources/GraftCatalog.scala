package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableCatalogCapability, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{DatasetMeta, Transforms, Versions}

/** A V2 `TableCatalog` for graft datasets — the catalog-first front door
  * the r14 verdict asked for: with
  *
  * {{{
  *   spark.sql.catalog.gcat           = graft.sources.GraftCatalog
  *   spark.sql.catalog.gcat.warehouse = /data/graft
  * }}}
  *
  * standard multi-part-identifier SQL works end to end, including
  * NON-IDENTITY partition transforms in DDL — the one shape the session
  * catalog cannot store for a `TableProvider` (SURVEY §2 #195's
  * documented workaround was an `OPTIONS (transforms …)` string):
  *
  * {{{
  *   CREATE TABLE gcat.db.events (id BIGINT, ts TIMESTAMP, v DOUBLE)
  *     PARTITIONED BY (days(ts), bucket(4, id))
  *   INSERT INTO gcat.db.events SELECT …        -- re-derives the layout
  *   SELECT * FROM gcat.db.events WHERE ts >= … -- hidden-partition pruning
  * }}}
  *
  * A table IS a graft dataset rooted at `warehouse/ns…/name` (or the DDL
  * `location` property): `CREATE TABLE` records the schema sidecar + the
  * transform spec, every read/write resolves through the same
  * [[GraftTable]] the path-based connector uses — one engine, two
  * addressing schemes. Table properties persist in the sidecar dir and
  * ride into reader/writer options (`versioned = 'true'` turns the table
  * into a commit-logged lakehouse table from its first write).
  *
  * Scale: catalog operations are O(1) sidecar reads/writes per table —
  * nothing here touches data files.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _
  private var catalogOptions: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    catalogOptions = options.asScala.toMap
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** Column DEFAULTs and GENERATED ALWAYS AS columns are first-class DDL:
    * Spark's analyzer validates both at CREATE when these are declared
    * (defaults constant-foldable, generation expressions deterministic +
    * non-generated references only), fills CURRENT_DEFAULTs into
    * column-list INSERTs itself, and graft's write seam materializes
    * generated columns ([[graft.core.GeneratedCols]]).
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** Enforced CHECK constraints map onto the engine's versioned CHECK
    * machinery ([[Versions.addConstraint]] — every write gated, existing
    * data validated at ADD). Informational flavors (UNIQUE / PRIMARY KEY
    * / FOREIGN KEY, which nothing here could enforce) are refused rather
    * than silently recorded as if they meant something.
    */
  private def registerCheck(root: String,
                            c: org.apache.spark.sql.connector.catalog.constraints.Constraint): Unit =
    c match {
      case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
        require(Versions.isVersioned(spark, root),
          "CHECK constraints need a versioned table " +
            "(TBLPROPERTIES ('versioned'='true')) — enforcement is the " +
            "commit-gated write path")
        Versions.addConstraint(spark, root, c.name(), chk.predicateSql())
      case other => throw new UnsupportedOperationException(
        s"only CHECK constraints are supported (enforced on every write); " +
          s"got ${other.toDDL} — UNIQUE/PK/FK would be recorded but never " +
          "enforced, which is worse than absent")
    }

  /** CREATE TABLE with constraints (`CREATE TABLE … (…, CONSTRAINT nn
    * CHECK (…))`) arrives through the TableInfo flavor.
    */
  override def createTable(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    val cs = Option(info.constraints()).map(_.toSeq).getOrElse(Nil)
    // validate the constraint set BEFORE creating anything: a rejected
    // constraint must not leave a half-created table (sidecar, props,
    // managed-slot pointer) behind, where the corrected re-CREATE then
    // hits TableAlreadyExistsException
    cs.foreach {
      case _: org.apache.spark.sql.connector.catalog.constraints.Check =>
        require(info.properties().asScala.get("versioned").exists(_.trim.toBoolean),
          "CHECK constraints need a versioned table " +
            "(TBLPROPERTIES ('versioned'='true')) — enforcement is the " +
            "commit-gated write path")
      case other => throw new UnsupportedOperationException(
        s"only CHECK constraints are supported (enforced on every write); " +
          s"got ${other.toDDL} — UNIQUE/PK/FK would be recorded but never " +
          "enforced, which is worse than absent")
    }
    val t = createTable(ident, info.columns(), info.partitions(), info.properties())
    if (cs.nonEmpty) {
      val root = tableRoot(ident, readProps(tableRoot(ident)))
      try cs.foreach(registerCheck(root, _))
      catch { case e: Throwable => dropTable(ident); throw e }
    }
    t
  }

  private def spark: SparkSession = SparkSession.active

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.toSeq).mkString("/"))

  /** DDL `LOCATION` wins; managed tables live under the warehouse. */
  private def tableRoot(ident: Identifier,
                        properties: Map[String, String] = Map.empty): String =
    properties.getOrElse("location",
      (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/"))

  /** Table-level properties recorded at CREATE (location, versioned, …),
    * replayed into every GraftTable's option map.
    */
  private def propsPath(root: String): Path = new Path(root, "_graft_table.json")

  private def readProps(root: String): Map[String, String] = {
    val p = propsPath(root)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      org.json4s.jackson.JsonMethods.parse(raw) match {
        case org.json4s.JObject(fields) => fields.collect {
          case (k, org.json4s.JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    }
  }

  private def writeProps(root: String, props: Map[String, String]): Unit = {
    import org.json4s.JsonDSL._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        props.toList.sortBy(_._1).foldLeft(org.json4s.JObject()) {
          case (o, (k, v)) => o ~ (k -> v) }))
    val out = fs.create(propsPath(root), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def exists(root: String): Boolean =
    DatasetMeta.read(spark, root).nonEmpty || fs.exists(propsPath(root))

  override def tableExists(ident: Identifier): Boolean =
    exists(tableRoot(ident, readProps(tableRoot(ident))))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = nsPath(namespace)
    if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && exists(st.getPath.toUri.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val managed = tableRoot(ident)
    // an external table's marker lives at its LOCATION; find it through
    // the managed slot's sidecar when present, else the managed slot is
    // the location itself
    val props0 = readProps(managed)
    val root = tableRoot(ident, props0)
    val props = if (root == managed) props0 else readProps(root)
    if (!exists(root)) throw new NoSuchTableException(ident)
    val ts = Transforms.read(spark, root)
    val declaredParts = DatasetMeta.read(spark, root).map(_.partitions)
      .getOrElse(Nil).filterNot(ts.map(_.name).toSet)
    new GraftTable(Some(root), None, props + ("path" -> root),
      declaredParts, ts)
  }

  /** The modern createTable: V2 `Column`s carry defaults and generation
    * expressions as FIRST-CLASS attributes — encode both into the
    * StructField metadata keys the rest of the engine (and Spark's own
    * `ResolveDefaultColumns`/`GeneratedColumn` utils) read, then delegate.
    * (`CatalogV2Util.v2ColumnsToStructType`, the default bridge, keeps
    * defaults but DROPS generation expressions — encoded here instead.)
    */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
    val fields = columns.map { c =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.metadataInJSON()).foreach(j =>
        mb.withMetadata(org.apache.spark.sql.types.Metadata.fromJson(j)))
      Option(c.defaultValue()).foreach { d =>
        mb.putString(ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, d.getSql)
        mb.putString(ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY, d.getSql)
      }
      Option(c.generationExpression()).foreach(g =>
        mb.putString(graft.core.GeneratedCols.MetadataKey, g))
      Option(c.identityColumnSpec()).foreach { ic =>
        // Spark's own identity keys, so IdentityColumn.getIdentityInfo
        // reads the spec back everywhere
        import org.apache.spark.sql.catalyst.util.{IdentityColumn => IC}
        require(properties.asScala.get("versioned").exists(_.trim.toBoolean),
          s"identity column ${c.name()} needs a versioned table " +
            "(TBLPROPERTIES ('versioned'='true')) — the high watermark is " +
            "transactional state only the commit log can move atomically")
        // sparse assignment (next + step·monotonically_increasing_id) puts
        // any multi-partition batch past Int range — Delta requires BIGINT
        // for the same reason; reject at DDL time, not mid-write
        require(c.dataType() == org.apache.spark.sql.types.LongType,
          s"identity column ${c.name()} must be declared BIGINT, got " +
            c.dataType().simpleString)
        mb.putLong(IC.IDENTITY_INFO_START, ic.getStart)
        mb.putLong(IC.IDENTITY_INFO_STEP, ic.getStep)
        mb.putBoolean(IC.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT, ic.isAllowExplicitInsert)
      }
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable(), mb.build())
    }
    createTable(ident, StructType(fields), partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val props = properties.asScala.toMap - "provider" - "owner"
    val root = tableRoot(ident, props)
    val managed = tableRoot(ident)
    if (exists(root) || fs.exists(propsPath(managed)))
      throw new TableAlreadyExistsException(ident)
    val identityParts = partitions.toSeq.collect {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
    }
    val graftTs = partitions.toSeq.flatMap(GraftDataSource.v2ToGraft)
    require(identityParts.size + graftTs.size == partitions.length,
      s"unsupported partition transform among ${partitions.mkString(", ")} " +
        "(supported: identity cols, years/months/days/hours(col), " +
        "bucket(n, col), truncate(n, col))")
    require(identityParts.isEmpty || graftTs.isEmpty,
      "mixing identity partition columns with transform partitions is not " +
        "supported; express identity columns as truncate-style transforms " +
        "or partition purely by transforms")
    graftTs.foreach(t => require(schema.fieldNames.contains(t.source),
      s"transform source ${t.source} is not a table column"))
    // record the layout NOW so the first INSERT (and every read before
    // it) sees the declared schema: meta carries the user schema PLUS
    // the derived partition columns (their types come from applying the
    // transform expressions to an empty frame — no hand-maintained type
    // table to drift)
    val derivedSchema =
      if (graftTs.isEmpty) schema
      else Transforms.applyTo(
        spark.createDataFrame(util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema), graftTs).schema
    val parts = if (graftTs.nonEmpty) graftTs.map(_.name) else identityParts
    fs.mkdirs(new Path(root))
    DatasetMeta.write(spark, root, DatasetMeta(derivedSchema, parts))
    if (graftTs.nonEmpty) Transforms.write(spark, root, graftTs)
    writeProps(root, props)
    // an EXTERNAL table (LOCATION outside the warehouse) also writes a
    // POINTER copy of its props at the managed slot — loadTable/
    // tableExists/dropTable resolve identifiers through that slot, so
    // without it the table would be unreachable by name
    if (root != managed) writeProps(managed, props)
    // versioned tables start life with an empty v1 commit: reads resolve
    // from the log immediately and the first INSERT is an optimistic
    // append like any other
    if (props.get("versioned").exists(_.trim.toBoolean)) {
      Versions.commit(spark, root, "overwrite", Nil,
        DatasetMeta(derivedSchema, parts),
        opInfo = Map("op" -> "CREATE TABLE"))
      // versioned tables pin GENERATED ALWAYS through the existing CHECK
      // machinery too: UPDATE/MERGE/replaceWhere then keep the invariant
      // via the one enforcement path every versioned write already pays
      graft.core.GeneratedCols.of(schema).foreach { case (c, e) =>
        Versions.addConstraint(spark, root, s"_gen_$c", s"$c <=> ($e)")
      }
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = tableRoot(ident, readProps(tableRoot(ident)))
    if (!exists(root)) throw new NoSuchTableException(ident)
    val props = changes.foldLeft(readProps(root)) {
      case (m, set: TableChange.SetProperty) => m + (set.property -> set.value)
      case (m, rm: TableChange.RemoveProperty) => m - rm.property
      case (m, ac: TableChange.AddConstraint) =>
        registerCheck(root, ac.constraint()); m
      case (m, dc: TableChange.DropConstraint) =>
        if (!dc.ifExists ||
            Versions.constraintsOf(spark, root).contains(dc.name))
          Versions.dropConstraint(spark, root, dc.name)
        m
      case (m, a: TableChange.AddColumn) =>
        // additive evolution — metadata-only (old files read NULL); no
        // defaults/positions (see Versions.addColumn's exactness note)
        require(a.fieldNames().length == 1,
          s"nested ADD COLUMN is not supported: ${a.fieldNames().mkString(".")}")
        require(a.isNullable, "added columns must be nullable (old files read NULL)")
        require(a.defaultValue() == null,
          "ADD COLUMN with a DEFAULT is not supported: files written before " +
            "the column read NULL, and a retroactive default would be " +
            "indistinguishable from genuine nulls — add the column, then " +
            "ALTER COLUMN … SET DEFAULT for future inserts")
        require(a.position() == null, "ADD COLUMN … FIRST/AFTER is not supported")
        Versions.addColumn(spark, root, a.fieldNames().head, a.dataType())
        m
      case (m, d: TableChange.UpdateColumnDefaultValue) =>
        // SET DEFAULT / DROP DEFAULT — metadata-only through the engine
        // verb (versioned roots land it as an alter commit)
        require(d.fieldNames().length == 1,
          s"nested-field defaults are not supported: ${d.fieldNames().mkString(".")}")
        val sqlOpt = Option(d.newCurrentDefault()).map(_.getSql).filter(_.nonEmpty)
        Versions.setColumnDefault(spark, root, d.fieldNames().head, sqlOpt)
        m
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog ALTER TABLE supports table properties, ADD COLUMN and " +
          s"column defaults, got $other " +
          "(other schema changes go through the graft API / ALTER TABLE graft.`path` verbs)")
    }
    writeProps(root, props)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val managed = tableRoot(ident)
    val props = readProps(managed)
    val root = tableRoot(ident, props)
    if (!exists(root)) false
    else {
      // external tables unregister without touching data (the DDL
      // contract): the LOCATION's marker and the managed-slot pointer
      // both go; managed tables delete their directory
      if (root != managed) {
        fs.delete(propsPath(root), false)
        fs.delete(new Path(managed), true)
      } else fs.delete(new Path(root), true)
      true
    }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val srcManaged = tableRoot(from)
    val srcProps = readProps(srcManaged)
    val src = tableRoot(from, srcProps)
    if (!exists(src)) throw new NoSuchTableException(from)
    val dst = tableRoot(to)
    if (exists(dst) || fs.exists(propsPath(dst)))
      throw new TableAlreadyExistsException(to)
    fs.mkdirs(nsPath(to.namespace()))
    if (src != srcManaged) {
      // external: rename is metadata-only — the pointer moves, the
      // LOCATION's data does not
      writeProps(dst, srcProps)
      fs.delete(new Path(srcManaged), true)
    } else require(fs.rename(new Path(src), new Path(dst)),
      s"rename $src -> $dst failed")
  }

  // ---- namespaces: directories under the warehouse ----

  override def listNamespaces(): Array[Array[String]] = {
    val base = new Path(warehouse)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory)
      .map(st => Array(st.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val base = nsPath(namespace)
      if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
      fs.listStatus(base).toSeq.filter(_.isDirectory)
        .map(st => namespace :+ st.getPath.getName).toArray
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val base = nsPath(namespace)
    if (!cascade && fs.listStatus(base).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    fs.delete(base, true)
  }
}
