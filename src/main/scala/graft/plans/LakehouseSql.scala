package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{IntegerType, StringType, TimestampType}

import graft.core.{Fetch, MutationResult, Mutations, Versions}

/** SQL-statement surface for graft's versioned lakehouse: `spark.sql` can
  * read and MUTATE graft roots addressed as ``graft.`/path/to/dataset` ``
  * (the Delta `delta.`path`` convention):
  *
  * {{{
  *   SELECT * FROM graft.`/data/events`                       -- latest snapshot
  *   SELECT * FROM graft.`/data/events` VERSION AS OF 2       -- time travel
  *   SELECT * FROM graft.`/data/events` TIMESTAMP AS OF '...' -- as-of read
  *   DELETE FROM graft.`/data/events` WHERE day < '2020-01-01'
  *   UPDATE graft.`/data/events` SET v = v + 1 WHERE id % 7 = 0
  *   MERGE INTO graft.`/data/events` t USING updates s ON t.id = s.id
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark's OWN parser produces all of these plans (`DeleteFromTable`,
  * `UpdateTable`, `MergeIntoTable`, `RelationTimeTravel`) — graft adds no
  * grammar, only an analyzer RESOLUTION rule ([[GraftLakehouseRule]],
  * injected by `graft.functions.GraftSparkExtensions` via
  * `spark.sql.extensions`) that recognizes graft roots and rewrites the
  * node: reads substitute the snapshot's analyzed plan (all downstream
  * resolution/optimization is stock Catalyst), mutations become eager
  * [[LeafRunnableCommand]]s delegating to [[graft.core.Mutations]] — the
  * same locate→rewrite→commit path as the Scala API, so everything the
  * MutationsSpec/oracle suite pins about copy-on-write holds for SQL too.
  * [[GraftSql.exec]] runs the identical conversion on sessions built
  * WITHOUT the extension (one parser + one transform — no second SQL
  * dialect to maintain).
  *
  * Unsupported MERGE shapes (conditional actions, column-level UPDATE
  * SET lists, NOT MATCHED BY SOURCE) are rejected loudly — never
  * silently approximated.
  */
object LakehouseSql {

  /** ``graft.`/path` `` → the root path. */
  private def graftRoot(parts: Seq[String]): Option[String] =
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graft")) Some(parts(1))
    else None

  /** Unwrap optional `AS alias` around the target relation. */
  private def targetRoot(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedRelation => graftRoot(u.multipartIdentifier)
    case SubqueryAlias(_, child) => targetRoot(child)
    case _ => None
  }

  private def snapshotPlan(spark: SparkSession, root: String): LogicalPlan = {
    val df =
      if (Versions.isVersioned(spark, root)) Versions.fetchSnapshot(spark, root)
      else Fetch.fetch(spark, root)
    df.queryExecution.analyzed
  }

  private def tsMillis(spark: SparkSession, e: Expression): Long = {
    require(e.foldable, s"TIMESTAMP AS OF must be a literal expression, got $e")
    val micros = Cast(e, TimestampType,
      Option(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
    require(micros != null, s"TIMESTAMP AS OF evaluated to NULL: $e")
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
  }

  /** Equi-key column names of a MERGE condition: a conjunction of
    * `t.k = s.k` terms (qualifiers optional, same column name both sides).
    */
  private def mergeKeys(cond: Expression): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw new UnsupportedOperationException(
        s"graft MERGE supports only equi-key conditions t.k = s.k, got: ${other.sql}")
    }
  }

  /** The conversion both entry points share. Defined against raw parsed
    * plans, so it runs identically as an injected analyzer rule and under
    * [[GraftSql.exec]].
    */
  def convert(spark: SparkSession): PartialFunction[LogicalPlan, LogicalPlan] = {
    def pf: PartialFunction[LogicalPlan, LogicalPlan] = {
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if graftRoot(u.multipartIdentifier).isDefined =>
        val root = graftRoot(u.multipartIdentifier).get
        (ver, ts) match {
          case (Some(v), _) =>
            Versions.fetchVersion(spark, root, v.toInt).queryExecution.analyzed
          case (None, Some(e)) =>
            Versions.fetchAsOf(spark, root, tsMillis(spark, e)).queryExecution.analyzed
          case _ => throw new IllegalArgumentException(
            "time travel needs VERSION AS OF or TIMESTAMP AS OF")
        }

      case u: UnresolvedRelation if graftRoot(u.multipartIdentifier).isDefined =>
        snapshotPlan(spark, graftRoot(u.multipartIdentifier).get)

      case DeleteFromTable(t, cond) if targetRoot(t).isDefined =>
        GraftDeleteCommand(targetRoot(t).get, PlanArg(cond))

      case UpdateTable(t, assignments, cond) if targetRoot(t).isDefined =>
        val named = assignments.map {
          case Assignment(k: UnresolvedAttribute, v) => k.nameParts.last -> v
          case Assignment(k, _) => throw new UnsupportedOperationException(
            s"graft UPDATE SET needs plain column names, got: ${k.sql}")
        }
        GraftUpdateCommand(targetRoot(t).get,
          PlanArg(cond.getOrElse(Literal.TrueLiteral)),
          named.map { case (k, v) => (k, PlanArg(v)) })

      // INSERT INTO graft.`root` REPLACE WHERE cond SELECT … — Spark's
      // own grammar for the Delta `replaceWhere` idiom (parsed to
      // OverwriteByExpression): atomically swap exactly the matching
      // rows for the query's result, one commit.
      case o: OverwriteByExpression if targetRoot(o.table).isDefined =>
        GraftReplaceWhereCommand(targetRoot(o.table).get,
          PlanArg(o.deleteExpr), PlanArg(o.query.transformDown(pf)))

      // INSERT INTO / INSERT OVERWRITE [PARTITION (p='v', …)] graft.`root`
      // SELECT … — positional column mapping (the INSERT contract); a
      // fully-static PARTITION spec scopes the overwrite to exactly those
      // partitions (replaceWhere), an empty spec overwrites the dataset.
      case i: InsertIntoStatement if targetRoot(i.table).isDefined =>
        require(i.userSpecifiedCols.isEmpty,
          "graft INSERT does not support a column list; project in the SELECT")
        require(!i.ifPartitionNotExists,
          "graft INSERT OVERWRITE does not support IF NOT EXISTS")
        val static = i.partitionSpec.toSeq.map {
          case (p, Some(v)) => p -> v
          case (p, None) => throw new UnsupportedOperationException(
            s"graft INSERT needs static PARTITION values; $p is dynamic " +
              "(use INSERT INTO … REPLACE WHERE for predicate-scoped writes)")
        }
        GraftInsertCommand(targetRoot(i.table).get,
          PlanArg(i.query.transformDown(pf)), i.overwrite, static)

      case m: MergeIntoTable if targetRoot(m.targetTable).isDefined =>
        require(m.notMatchedBySourceActions.isEmpty,
          "graft MERGE does not support WHEN NOT MATCHED BY SOURCE")
        (m.matchedActions, m.notMatchedActions) match {
          case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) => ()
          case _ => throw new UnsupportedOperationException(
            "graft MERGE supports exactly WHEN MATCHED THEN UPDATE SET * " +
              "WHEN NOT MATCHED THEN INSERT * (the upsert form)")
        }
        // nested graft relations inside the source resolve through the
        // same conversion (transformDown stops at the command leaf)
        val source = m.sourceTable.transformDown(pf)
        // WITH SCHEMA EVOLUTION routes to the evolving rewrite merge
        // (Mutations.merge(evolveSchema=true)); the DV mode keeps the
        // exact-schema contract and rejects it at run
        GraftMergeCommand(targetRoot(m.targetTable).get, PlanArg(source),
          mergeKeys(m.mergeCondition), evolveSchema = m.withSchemaEvolution)
    }
    pf
  }
}

/** Opaque holder for an Expression/LogicalPlan constructor argument of a
  * command. TreeNode's product traversal would otherwise treat a bare
  * Expression arg as part of the command's expression tree and fail
  * analysis on its (deliberately unresolved — they resolve by NAME
  * against the snapshot frame at run time) attributes.
  */
final case class PlanArg[T](value: T)

private[plans] trait GraftMutationCommand extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType, nullable = false)(),
    AttributeReference("removed_files", IntegerType, nullable = false)(),
    AttributeReference("added_files", IntegerType, nullable = false)())
  protected def asRow(r: MutationResult): Seq[Row] =
    Seq(Row(r.version, r.removedFiles.size, r.addedFiles.size))
}

/** `DELETE FROM graft.`root` WHERE cond`. Strategy is session-selectable:
  * `spark.graft.delete.mode = rewrite` (default — copy-on-write of the
  * affected files) or `dv` (deletion vector: one `delete_dv` commit of the
  * matched (file, row_index) pairs, zero data files touched — the
  * O(deleted rows) path for sparse deletes over huge tables).
  */
case class GraftDeleteCommand(root: String, cond: PlanArg[Expression])
    extends GraftMutationCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val mode = spark.conf.get("spark.graft.delete.mode", "rewrite")
    val result = mode match {
      case "rewrite" => Mutations.deleteWhere(spark, root, shim.column(cond.value))
      case "dv" => Mutations.deleteWhereDv(spark, root, shim.column(cond.value))
      case other => throw new IllegalArgumentException(
        s"spark.graft.delete.mode must be rewrite|dv, got $other")
    }
    asRow(result)
  }
}

/** `UPDATE graft.`root` SET c = e, ... WHERE cond`. Strategy is
  * session-selectable like DELETE's: `spark.graft.update.mode = rewrite`
  * (default — copy-on-write of the affected files) or `dv` (one
  * `update_dv` commit: a deletion vector removes the matched rows, only
  * their updated copies are written — the O(matched rows) path for sparse
  * updates over huge tables).
  */
case class GraftUpdateCommand(root: String, cond: PlanArg[Expression],
                              assignments: Seq[(String, PlanArg[Expression])])
    extends GraftMutationCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val asg = assignments.map { case (k, v) => k -> shim.column(v.value) }.toMap
    val result = spark.conf.get("spark.graft.update.mode", "rewrite") match {
      case "rewrite" =>
        Mutations.updateWhere(spark, root, shim.column(cond.value), asg)
      case "dv" =>
        Mutations.updateWhereDv(spark, root, shim.column(cond.value), asg)
      case other => throw new IllegalArgumentException(
        s"spark.graft.update.mode must be rewrite|dv, got $other")
    }
    asRow(result)
  }
}

/** `MERGE INTO graft.`root` t USING src s ON t.k = s.k WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED THEN INSERT *`. Strategy is
  * session-selectable: `spark.graft.merge.mode = rewrite` (default) or
  * `dv` (deletion vector removes matched target rows, the source appends —
  * O(source ∪ matched rows) instead of O(affected files)).
  */
case class GraftMergeCommand(root: String, source: PlanArg[LogicalPlan],
                             keyCols: Seq[String],
                             evolveSchema: Boolean = false)
    extends GraftMutationCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = shim.ofRows(spark, source.value)
    // MERGE SET * takes the source's columns; aliases (`USING x s`) ride
    // SubqueryAlias nodes inside the plan and change nothing here
    val result = spark.conf.get("spark.graft.merge.mode", "rewrite") match {
      case "rewrite" => Mutations.merge(spark, root, src, keyCols,
        evolveSchema = evolveSchema)
      case "dv" =>
        require(!evolveSchema, "graft MERGE WITH SCHEMA EVOLUTION needs " +
          "spark.graft.merge.mode=rewrite (the DV merge keeps the exact-schema contract)")
        Mutations.mergeDv(spark, root, src, keyCols)
      case other => throw new IllegalArgumentException(
        s"spark.graft.merge.mode must be rewrite|dv, got $other")
    }
    asRow(result)
  }
}

/** `INSERT INTO graft.`root` REPLACE WHERE cond SELECT …` — the Delta
  * `replaceWhere` SQL surface: one atomic rewrite commit removes every
  * row matching `cond` and inserts the query's rows (each of which must
  * itself satisfy `cond`). A partition-only `cond` resolves its affected
  * files from the commit log's paths — zero data files read; untouched
  * partitions' files do not move ([[Mutations.replaceWhere]]).
  */
case class GraftReplaceWhereCommand(root: String, cond: PlanArg[Expression],
                                    source: PlanArg[LogicalPlan])
    extends GraftMutationCommand {
  override def run(spark: SparkSession): Seq[Row] =
    asRow(Mutations.replaceWhere(spark, root, shim.column(cond.value),
      shim.ofRows(spark, source.value)))
}

/** `INSERT INTO | OVERWRITE graft.`root` [PARTITION (p='v', …)] SELECT …`.
  * Positional column mapping (standard INSERT): the SELECT supplies the
  * dataset's non-partition-spec columns in schema order; static PARTITION
  * values become literal columns. OVERWRITE with a full static spec is
  * partition-scoped [[Mutations.replaceWhere]]; with no spec it is a
  * whole-dataset logical overwrite; INSERT INTO appends.
  */
case class GraftInsertCommand(root: String, source: PlanArg[LogicalPlan],
                              overwrite: Boolean,
                              staticSpec: Seq[(String, String)])
    extends GraftMutationCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val src0 = shim.ofRows(spark, source.value)
    val meta = graft.core.DatasetMeta.read(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"INSERT target $root has no graft metadata (publish it first)"))
    val badSpec = staticSpec.map(_._1).filterNot(meta.partitions.contains)
    require(badSpec.isEmpty,
      s"PARTITION spec names non-partition columns: ${badSpec.mkString(",")}")
    val specCols = staticSpec.map(_._1).toSet
    val dataCols = meta.schema.fieldNames.toIndexedSeq.filterNot(specCols)
    require(src0.columns.length == dataCols.length,
      s"INSERT query produces ${src0.columns.length} columns; the dataset " +
        s"expects ${dataCols.length} (${dataCols.mkString(",")})")
    val positioned = staticSpec.foldLeft(src0.toDF(dataCols: _*)) {
      case (d, (p, v)) => d.withColumn(p, lit(v).cast(meta.schema(p).dataType))
    }.select(meta.schema.fieldNames.toIndexedSeq.map(col): _*)
    if (!overwrite) {
      val added =
        if (Versions.isVersioned(spark, root))
          graft.core.Publish.publishVersioned(spark, positioned, root,
            meta.partitions, mode = "append")
        else graft.core.Publish.publish(spark, positioned, root,
          meta.partitions, mode = "append")
      val v = Versions.latestVersion(spark, root).getOrElse(0)
      Seq(Row(v, 0, added.size))
    } else if (staticSpec.isEmpty) {
      val before = Versions.latestVersion(spark, root)
      val removed =
        if (before.isDefined) Versions.snapshotFullAt(spark, root, before.get)._1.size
        else 0
      val added =
        if (Versions.isVersioned(spark, root))
          graft.core.Publish.publishVersioned(spark, positioned, root,
            meta.partitions, mode = "overwrite")
        else graft.core.Publish.publish(spark, positioned, root,
          meta.partitions, mode = "overwrite")
      Seq(Row(Versions.latestVersion(spark, root).getOrElse(0), removed, added.size))
    } else {
      val pred = staticSpec.map { case (p, v) =>
        col(p) === lit(v).cast(meta.schema(p).dataType)
      }.reduce(_ && _)
      asRow(Mutations.replaceWhere(spark, root, pred, positioned))
    }
  }
}

/** The `spark.sql.extensions` resolution rule (injected by
  * `graft.functions.GraftSparkExtensions`).
  */
class GraftLakehouseRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown(LakehouseSql.convert(spark))
}

/** Entry point for sessions built WITHOUT the extension: same parser,
  * same conversion, same commands — `GraftSql.exec(spark, sql)` behaves
  * exactly like `spark.sql(sql)` does on an extension-enabled session.
  */
object GraftSql {
  def exec(spark: SparkSession, sqlText: String): DataFrame = {
    // maintenance statements first — Spark's parser has no grammar for
    // them, so they must short-circuit exactly like the injected parser
    val parsed = LakehouseStatements.parse(sqlText)
      .getOrElse(spark.sessionState.sqlParser.parsePlan(sqlText))
    shim.ofRows(spark, parsed.transformDown(LakehouseSql.convert(spark)))
  }
}
