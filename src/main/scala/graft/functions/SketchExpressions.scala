package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native sketch primitives for the dedup/similarity operators.
  *
  * These replace equivalent `transform`/`aggregate` SQL-lambda pipelines:
  * higher-order SQL functions are interpreted expression trees (no
  * whole-stage codegen), which made signature computation the bottleneck —
  * a doc with s shingles × k hash families costs s·k interpreted tree
  * walks vs one tight JVM loop in [[SketchOps]] (~50-100× on the sf0.1
  * bench). Each expression participates in whole-stage codegen: the
  * generated loop makes one static call per row into the kernel, the same
  * shape as Spark's own hash expressions.
  */
object Sketch {
  /** splitmix64 finalizer — cheap, well-mixed 64-bit permutation. */
  @inline final def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Plane component for (table, plane, dim), deterministic uniform [-1, 1):
    * every executor derives identical hyperplanes with no broadcast.
    */
  @inline final def planeComponent(t: Int, p: Int, d: Int): Double = {
    val h = mix64(t.toLong * 0x100000001b3L + p.toLong * 0x9e3779b1L + d)
    (h >>> 11) * (2.0 / (1L << 53)) - 1.0
  }
}

/** Distinct word n-gram shingles of a string column ([[SketchOps.shingles]]). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.shingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** MinHash signature of a string-array column ([[SketchOps.minHashSig]]):
  * sig[k] = min over elements of the k-th family hash (one base XXH64 per
  * element + an affine remix per family).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.minHashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.minHashSig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** LSH band hashes of a MinHash signature, fused ([[SketchOps.minHashBands]]):
  * the signature and the per-band fold happen in one kernel call; output is
  * one 64-bit band key per band.
  */
case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "bands must divide numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.minHashBands(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.minHashBands($c, $numHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a string-array column ([[SketchOps.simHash64]]):
  * per-element hashes vote ±1 per bit; sign vector packs into one long.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** [[SimHash64Expr]] with MD5-derived token hashes
  * ([[SketchOps.simHash64Md5]]): the signature definition is reproducible
  * in any engine with an `md5()` (bit j = bit j of the first-16-hex-chars
  * uint64), which is what lets the dedup_simhash driver query carry a real
  * DuckDB oracle. Production code should prefer [[SimHash64Expr]].
  */
case class SimHash64Md5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64_md5"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.simHash64Md5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.simHash64Md5($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5Expr =
    copy(child = newChild)
}

/** Random-hyperplane LSH signatures of a double-array column
  * ([[SketchOps.hyperplaneSigs]]): one `planes`-bit signature per table,
  * hyperplanes derived deterministically from (table, plane, dim).
  */
case class HyperplaneSigsExpr(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {
  require(planes <= 63, "planes must fit a long")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.hyperplaneSigs(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchOps.hyperplaneSigs($c, $planes, $tables);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)
}

/** Σ aᵢ·bᵢ over two double-array columns ([[SketchOps.dot]]) — sequential
  * accumulation in array order (bit-compatible with a sequential SQL
  * `aggregate` / DuckDB `list_cosine_similarity` numerator).
  */
case class ArrayDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchOps.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDotExpr =
    copy(left = l, right = r)
}

/** Column wrappers. */
object SketchFunctions {
  def shinglesOf(text: Column, n: Int): Column =
    shim.column(ShinglesExpr(shim.expression(text), n))
  def minHashSig(c: Column, numHashes: Int): Column =
    shim.column(MinHashSigExpr(shim.expression(c), numHashes))
  def minHashBands(c: Column, numHashes: Int, bands: Int): Column =
    shim.column(MinHashBandsExpr(shim.expression(c), numHashes, bands))
  def simHash64(c: Column): Column =
    shim.column(SimHash64Expr(shim.expression(c)))
  def simHash64Md5(c: Column): Column =
    shim.column(SimHash64Md5Expr(shim.expression(c)))
  def hyperplaneSigs(c: Column, planes: Int, tables: Int): Column =
    shim.column(HyperplaneSigsExpr(shim.expression(c), planes, tables))
  def arrayDot(a: Column, b: Column): Column =
    shim.column(ArrayDotExpr(shim.expression(a), shim.expression(b)))
}
