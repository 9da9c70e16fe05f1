package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native numeric kernels for the ANN operators ([[graft.ops.Similarity]]).
  *
  * These replace the five Scala `udf`s that used to carry the IVF/PQ hot
  * loops: a udf deserializes every `array<double>` into a boxed
  * `Seq[Double]` per row and sits outside whole-stage codegen — the same
  * tax the sketch kernels ([[SketchExpressions]]) removed (~50-100× over
  * interpreted lambdas there). Each expression here participates in
  * whole-stage codegen: the generated loop makes one static call per row
  * into [[AnnOps]], reading the unsafe array data directly.
  *
  * Model state (centroids, PQ codebooks) is small (≤ ~128 KB at default
  * sizes) and rides the expression itself — the plan ships once per stage
  * via Spark's task-binary broadcast, exactly like a literal. The ADC
  * lookup-table matrix scales with the QUERY BATCH, so it stays in an
  * explicit [[Broadcast]] (one copy per executor, not per task) that the
  * generated code dereferences ONCE per codegen instance into a plain
  * `double[][]` local.
  */
object AnnOps {

  /** Index of the centroid nearest (squared-L2) to cv/cn — the IVF cell
    * assignment. Ties keep the lowest index (strict `<`), matching a
    * sequential argmin.
    */
  def nearestCell(cv: ArrayData, cn: Double, centroids: Array[Array[Double]]): Int = {
    val v = cv.toDoubleArray()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      val n = math.min(ctr.length, v.length)
      var d = 0.0
      var i = 0
      while (i < n) { val x = v(i) / cn - ctr(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nprobe` nearest cells of a query vector qv/qn, ascending by
    * squared-L2 distance (ties by cell index — a stable sort over the
    * index-ordered centroid array).
    */
  def probeCells(qv: ArrayData, qn: Double, centroids: Array[Array[Double]],
                 nprobe: Int): ArrayData = {
    val v = qv.toDoubleArray()
    val k = centroids.length
    val ds = new Array[Double](k)
    val idx = new Array[Integer](k)
    var c = 0
    while (c < k) {
      val ctr = centroids(c)
      val n = math.min(ctr.length, v.length)
      var d = 0.0
      var i = 0
      while (i < n) { val x = v(i) / qn - ctr(i); d += x * x; i += 1 }
      ds(c) = d
      idx(c) = c
      c += 1
    }
    // stable: ties by index because the input is index-ordered
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Double.compare(ds(a), ds(b)))
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) { out(j) = idx(j); j += 1 }
    new GenericArrayData(out)
  }

  /** PQ encode: per subspace s (dims splits(s) until splits(s+1) of the
    * unit-normalized vector), the index of the nearest codeword. Ties keep
    * the lowest codeword index.
    */
  def pqEncode(cv: ArrayData, cn: Double, splits: Array[Int],
               books: Array[Array[Array[Double]]]): ArrayData = {
    val v = cv.toDoubleArray()
    val mm = books.length
    val code = new Array[Int](mm)
    var s = 0
    while (s < mm) {
      val book = books(s)
      val lo = splits(s)
      val hi = splits(s + 1)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val ctr = book(j)
        var d = 0.0
        var i = lo
        while (i < hi) { val x = v(i) / cn - ctr(i - lo); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      code(s) = best
      s += 1
    }
    new GenericArrayData(code)
  }

  /** ADC scores of one code row against EVERY query's LUT:
    * out(q) = Σ_s luts(q)(s·width + code(s)).
    */
  def adcScoreAll(code: ArrayData, luts: Array[Array[Double]], width: Int): ArrayData = {
    val cs = code.toIntArray()
    val out = new Array[Double](luts.length)
    var q = 0
    while (q < luts.length) {
      val lut = luts(q)
      var sum = 0.0
      var s = 0
      while (s < cs.length) { sum += lut(s * width + cs(s)); s += 1 }
      out(q) = sum
      q += 1
    }
    new GenericArrayData(out)
  }

  /** ADC scores of one code row against only the queries PROBING its cell:
    * array of (qpos, sim) structs, empty when no query probes the cell
    * (cells beyond the probe table score nothing too — an appended corpus
    * may carry cells the query batch never probed).
    */
  def adcScoreCell(code: ArrayData, cell: Int, luts: Array[Array[Double]],
                   cellProbes: Array[Array[Int]], width: Int): ArrayData = {
    val probing =
      if (cell >= 0 && cell < cellProbes.length) cellProbes(cell) else null
    if (probing == null || probing.length == 0) return new GenericArrayData(Array.empty[Any])
    val cs = code.toIntArray()
    val out = new Array[Any](probing.length)
    var p = 0
    while (p < probing.length) {
      val qi = probing(p)
      val lut = luts(qi)
      var sum = 0.0
      var s = 0
      while (s < cs.length) { sum += lut(s * width + cs(s)); s += 1 }
      out(p) = new GenericInternalRow(Array[Any](qi, sum))
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** IVF cell assignment of a raw (vector, norm) pair ([[AnnOps.nearestCell]]). */
case class NearestCellExpr(left: Expression, right: Expression,
                           centroids: Array[Array[Double]]) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ann_nearest_cell"

  override protected def nullSafeEval(cv: Any, cn: Any): Any =
    AnnOps.nearestCell(cv.asInstanceOf[ArrayData], cn.asInstanceOf[Double], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("annCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (cv, cn) =>
      s"${ev.value} = graft.functions.AnnOps.nearestCell($cv, $cn, $ref);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCellExpr =
    copy(left = l, right = r)
}

/** The nprobe nearest IVF cells of a query (vector, norm) pair
  * ([[AnnOps.probeCells]]).
  */
case class ProbeCellsExpr(left: Expression, right: Expression,
                          centroids: Array[Array[Double]], nprobe: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ann_probe_cells"

  override protected def nullSafeEval(qv: Any, qn: Any): Any =
    AnnOps.probeCells(qv.asInstanceOf[ArrayData], qn.asInstanceOf[Double], centroids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("annCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (qv, qn) =>
      s"${ev.value} = graft.functions.AnnOps.probeCells($qv, $qn, $ref, $nprobe);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ProbeCellsExpr =
    copy(left = l, right = r)
}

/** PQ nearest-codeword encoding of a raw (vector, norm) pair
  * ([[AnnOps.pqEncode]]).
  */
case class PqEncodeExpr(left: Expression, right: Expression,
                        splits: Array[Int], books: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(cv: Any, cn: Any): Any =
    AnnOps.pqEncode(cv.asInstanceOf[ArrayData], cn.asInstanceOf[Double], splits, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("pqSplits", splits, "int[]")
    val bRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (cv, cn) =>
      s"${ev.value} = graft.functions.AnnOps.pqEncode($cv, $cn, $sRef, $bRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeExpr =
    copy(left = l, right = r)
}

/** ADC scores of a code row against every query LUT ([[AnnOps.adcScoreAll]]).
  * The LUT matrix is query-batch-sized, so it rides an executor-shared
  * [[Broadcast]]; generated code unwraps it once per codegen instance.
  */
case class AdcScoreAllExpr(child: Expression,
                           bcLuts: Broadcast[Array[Array[Double]]], width: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_adc_score_all"

  @transient private lazy val luts = bcLuts.value

  override protected def nullSafeEval(code: Any): Any =
    AnnOps.adcScoreAll(code.asInstanceOf[ArrayData], luts, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcLuts", bcLuts,
      "org.apache.spark.broadcast.Broadcast")
    val lutsVar = ctx.addMutableState("double[][]", "annLuts",
      v => s"$v = (double[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, code =>
      s"${ev.value} = graft.functions.AnnOps.adcScoreAll($code, $lutsVar, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcScoreAllExpr =
    copy(child = newChild)
}

/** ADC scores of a (code, cell) row against the queries probing that cell
  * ([[AnnOps.adcScoreCell]]) — array of (qpos, sim) structs.
  */
case class AdcScoreCellExpr(left: Expression, right: Expression,
                            bcLuts: Broadcast[Array[Array[Double]]],
                            bcCellProbes: Broadcast[Array[Array[Int]]], width: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qpos", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_adc_score_cell"

  @transient private lazy val luts = bcLuts.value
  @transient private lazy val cellProbes = bcCellProbes.value

  override protected def nullSafeEval(code: Any, cell: Any): Any =
    AnnOps.adcScoreCell(code.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      luts, cellProbes, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("bcLuts", bcLuts,
      "org.apache.spark.broadcast.Broadcast")
    val probeRef = ctx.addReferenceObj("bcCellProbes", bcCellProbes,
      "org.apache.spark.broadcast.Broadcast")
    val lutsVar = ctx.addMutableState("double[][]", "annLuts",
      v => s"$v = (double[][]) $lutRef.value();")
    val probesVar = ctx.addMutableState("int[][]", "annCellProbes",
      v => s"$v = (int[][]) $probeRef.value();")
    nullSafeCodeGen(ctx, ev, (code, cell) =>
      s"${ev.value} = graft.functions.AnnOps.adcScoreCell($code, $cell, $lutsVar, $probesVar, $width);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScoreCellExpr =
    copy(left = l, right = r)
}

/** Column wrappers. */
object AnnFunctions {
  def nearestCell(cv: Column, cn: Column, centroids: Array[Array[Double]]): Column =
    shim.column(NearestCellExpr(shim.expression(cv), shim.expression(cn), centroids))
  def probeCells(qv: Column, qn: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    shim.column(ProbeCellsExpr(shim.expression(qv), shim.expression(qn), centroids, nprobe))
  def pqEncode(cv: Column, cn: Column, splits: Array[Int],
               books: Array[Array[Array[Double]]]): Column =
    shim.column(PqEncodeExpr(shim.expression(cv), shim.expression(cn), splits, books))
  def adcScoreAll(code: Column, bcLuts: Broadcast[Array[Array[Double]]], width: Int): Column =
    shim.column(AdcScoreAllExpr(shim.expression(code), bcLuts, width))
  def adcScoreCell(code: Column, cell: Column, bcLuts: Broadcast[Array[Array[Double]]],
                   bcCellProbes: Broadcast[Array[Array[Int]]], width: Int): Column =
    shim.column(AdcScoreCellExpr(shim.expression(code), shim.expression(cell),
      bcLuts, bcCellProbes, width))
}
