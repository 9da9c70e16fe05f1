package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling 64-bit polynomial hash of a string — the document fingerprint
  * primitive (`h = h*31 + byte` over UTF-8 bytes). A native Catalyst
  * expression with whole-stage codegen: one tight JVM loop per row, no UDF
  * serialization boundary, so it stays inside the generated stage at
  * 100 TB scan speed.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = 31L * $h + (long) $bytes[$i];
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }
}

/** Unicode NFC normalization of a string — canonical composition (e +
  * U+0301 → é), the text-cleaning primitive Spark's function library
  * lacks. A native Catalyst expression: the generated code calls
  * `java.text.Normalizer` directly (with a fast-path skip for strings
  * already in NFC, which `Normalizer.isNormalized` answers without
  * allocating), so it rides whole-stage codegen like any built-in — no
  * UDF boundary. NFC (not NFKC) by design: canonical equivalence only,
  * no compatibility folding that changes visible text (ﬁ → fi).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** UTF8String → NFC UTF8String; returns the input object unchanged
    * when already normalized (the overwhelmingly common case — one
    * isNormalized scan, zero allocation).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Column wrappers for graft's native expressions. */
object GraftFunctions {
  /** 64-bit rolling-hash fingerprint of a string column. */
  def fingerprint64(c: Column): Column =
    shim.column(Fingerprint64(shim.expression(c)))

  /** Unicode NFC normalization of a string column. */
  def nfcNormalize(c: Column): Column =
    shim.column(NfcNormalize(shim.expression(c)))
}
