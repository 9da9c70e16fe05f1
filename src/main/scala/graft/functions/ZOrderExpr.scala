package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Morton (z-order) interleave kernel: bit b of column i lands at output
  * position b·ncols + i, so sorting by the result clusters rows that are
  * close in EVERY dimension — each parquet file then covers a small
  * hyper-rectangle of the key space and carries tight min/max stats on all
  * z-ordered columns at once, where a lexicographic sort only prunes on
  * its leading column. (Same layout idea as Delta's OPTIMIZE ZORDER BY;
  * original construction from Morton 1966.)
  */
object ZOrderOps {
  /** Interleave the low `bits` bits of each element (pre-scaled to
    * [0, 2^bits)); element i contributes bit b to output bit b·n + i.
    */
  def interleave(xs: ArrayData, bits: Int): Long = {
    val n = xs.numElements()
    // Java << wraps shift distances mod 64 — without this guard an
    // over-wide call (e.g. 5 columns x 16 bits from SQL) would silently
    // collide bits from different columns into garbage z-values
    if (n * bits > 63)
      throw new IllegalArgumentException(
        s"$n columns x $bits bits = ${n * bits} output bits exceed a long (63)")
    var z = 0L
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < n) {
        z |= ((xs.getLong(i) >>> b) & 1L) << (b * n + i)
        i += 1
      }
      b += 1
    }
    z
  }
}

/** Z-value of an array<bigint> column of pre-scaled coordinates. */
case class ZValueExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(input: Any): Any =
    ZOrderOps.interleave(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZOrderOps.interleave($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): ZValueExpr =
    copy(child = newChild)
}

object ZOrderFunctions {
  /** Z-value column over pre-scaled array<bigint> coordinates. */
  def zvalue(scaled: Column, bits: Int): Column =
    shim.column(ZValueExpr(shim.expression(scaled), bits))
}
