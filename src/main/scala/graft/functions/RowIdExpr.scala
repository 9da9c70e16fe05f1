package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-built lookup for row tracking: scan-path string → the file's
  * base row id (the per-commit assignment recorded in the version log).
  * The [[DvLookup]] shape re-used for a value lookup — the whole map is
  * O(live files) driver/task-binary resident and each row pays one hash
  * probe inside WholeStageCodegen. Missing files answer -1 (the caller
  * wraps the expression so absent bases surface as NULL ids, which the
  * coalesce with the materialized column then resolves or leaves null).
  */
final class RowIdBaseLookup(entries: Array[(String, Long)]) extends Serializable {
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](entries.length * 2)
    entries.foreach { case (f, b) => m.put(UTF8String.fromString(f), b) }
    m
  }

  def base(file: UTF8String): Long = {
    val b = table.get(file)
    if (b == null) -1L else b.longValue()
  }

  def size: Int = entries.length
}

/** The base row id of the file a row was scanned from, or -1 when the
  * version log assigned none (pre-tracking files). One virtual call per
  * row, codegen'd — the id computation stays inside the scan stage.
  */
case class RowIdBaseExpr(file: Expression, lookup: RowIdBaseLookup)
    extends UnaryExpression {

  override def child: Expression = file
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_row_id_base"

  override def checkInputDataTypes(): TypeCheckResult =
    file.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a file path string, got $t")
    }

  override protected def nullSafeEval(f: Any): Any =
    lookup.base(f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRowIdLookup", lookup,
      classOf[RowIdBaseLookup].getName)
    defineCodeGen(ctx, ev, f => s"$ref.base($f)")
  }

  override protected def withNewChildInternal(newChild: Expression): RowIdBaseExpr =
    copy(file = newChild)
}
