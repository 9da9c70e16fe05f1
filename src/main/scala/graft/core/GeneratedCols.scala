package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not}
import org.apache.spark.sql.types.StructType

/** Generated columns (the Delta `GENERATED ALWAYS AS (expr)` shape,
  * Spark-native): the generation expression rides the column's
  * `GENERATION_EXPRESSION` field-metadata key — the same key Spark's own
  * `GeneratedColumn` util validates at CREATE time for a V2 catalog
  * declaring `SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS` (expression
  * deterministic, references only non-generated columns, type-correct).
  *
  * Spark validates but does NOT compute — materializing the value on
  * write is the connector's job (the Delta split too). graft applies the
  * contract at its connector write seams:
  *
  *  - a write that OMITS the column (or carries NULL — the analyzer
  *    null-fills column-list INSERTs that skip it, so omitted and
  *    explicit-null are indistinguishable by design) gets the COMPUTED
  *    value;
  *  - a write that PROVIDES a value must provide the value the
  *    expression yields — anything else rejects loudly
  *    ([[ConstraintViolationException]]), the GENERATED ALWAYS contract;
  *  - on a VERSIONED table, CREATE additionally registers a
  *    `_gen_<col>` CHECK constraint (`c <=> expr`), so every OTHER write
  *    surface — UPDATE, MERGE, replaceWhere, API appends — keeps the
  *    invariant through the existing constraint enforcement, not a
  *    parallel mechanism.
  *
  * Cost: one `coalesce` projection per generated column (codegen, free)
  * plus a limit-1 validation pass over the batch — the same price the
  * CHECK-constraint path already charges every versioned write.
  */
object GeneratedCols {

  /** Spark's own metadata key ("generationExpression" wire name via
    * [[org.apache.spark.sql.catalyst.util.GeneratedColumn]]).
    */
  val MetadataKey: String =
    org.apache.spark.sql.catalyst.util.GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY

  /** (column, generation-expression SQL) pairs declared in `schema`. */
  def of(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(MetadataKey) =>
        f.name -> f.metadata.getString(MetadataKey)
    }

  /** Compute omitted/NULL generated columns of `schema` on `df`, validate
    * provided values equal their expression, and return the frame in
    * `schema`'s column order (generated columns appended where the input
    * lacked them land in their declared slot).
    */
  def applyOn(df: DataFrame, schema: StructType): DataFrame = {
    val gens = of(schema)
    if (gens.isEmpty) return df
    // the re-ordering select below projects to the RECORDED schema: a
    // batch carrying a column the table doesn't declare must fail loudly
    // here, not be silently projected away (the pre-r17 behavior lost
    // such columns while the downstream schema check passed)
    val extra = df.columns.filterNot(schema.fieldNames.contains)
    require(extra.isEmpty,
      s"write carries columns not in the table schema: ${extra.mkString(", ")} " +
        "— a generated-column table rejects unknown columns instead of dropping them")
    val filled = gens.foldLeft(df) { case (d, (c, sql)) =>
      if (!d.columns.contains(c)) d.withColumn(c, expr(sql))
      else d.withColumn(c, coalesce(col(c), expr(sql)))
    }
    // after the fills, any mismatch is a user-provided value contradicting
    // GENERATED ALWAYS AS — reject with the offending row, like a CHECK
    val bad = gens.map { case (c, sql) => not(col(c) <=> expr(sql)) }
      .reduce(_ || _)
    val offending = filled.where(bad <=> lit(true)).limit(1).collect()
    if (offending.nonEmpty)
      throw new ConstraintViolationException(
        s"GENERATED ALWAYS AS violation: row ${offending.head} provides a " +
          s"value that does not equal its generation expression " +
          s"(${gens.map { case (c, e) => s"$c = $e" }.mkString(", ")})")
    val ordered = schema.fieldNames.filter(filled.columns.contains).toIndexedSeq
    filled.select(ordered.map(col): _*)
  }
}
