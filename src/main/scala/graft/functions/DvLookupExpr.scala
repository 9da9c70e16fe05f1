package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-built lookup table for SMALL deletion vectors: scan-path string
  * → sorted array of deleted parquet row indexes. Evaluated as a
  * scan-stage filter ([[DvDeletedExpr]]) instead of an anti-join — the
  * Delta DV-as-row-filter shape: no join machinery, no second frame, one
  * hash probe + binary search per row of a COVERED file. Built once per
  * snapshot driver-side (the DV sidecar is O(deleted rows)); large DVs
  * fall back to the broadcast anti-join.
  */
final class DvLookup(entries: Array[(String, Array[Long])]) extends Serializable {
  @transient private lazy val table: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](entries.length * 2)
    entries.foreach { case (f, idxs) => m.put(UTF8String.fromString(f), idxs) }
    m
  }

  def deleted(file: UTF8String, idx: Long): Boolean = {
    val a = table.get(file)
    a != null && java.util.Arrays.binarySearch(a, idx) >= 0
  }

  def size: Int = entries.length
}

/** TRUE iff the deletion-vector lookup marks (file, row index) deleted.
  * Codegen: one virtual call into [[DvLookup]] per row — the whole DV
  * filter stays inside the scan's WholeStageCodegen span.
  */
case class DvDeletedExpr(file: Expression, idx: Expression, lookup: DvLookup)
    extends BinaryExpression {

  override def left: Expression = file
  override def right: Expression = idx
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_deleted"

  override def checkInputDataTypes(): TypeCheckResult =
    (file.dataType, idx.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (file path string, row index long), got ($l, $r)")
    }

  override protected def nullSafeEval(f: Any, i: Any): Any =
    lookup.deleted(f.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDvLookup", lookup,
      classOf[DvLookup].getName)
    nullSafeCodeGen(ctx, ev, (f, i) => s"${ev.value} = $ref.deleted($f, $i);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DvDeletedExpr =
    copy(file = newLeft, idx = newRight)
}
