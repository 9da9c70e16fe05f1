package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Native sketch primitives for the dedup/similarity operators.
  *
  * These replace equivalent `transform`/`aggregate` SQL-lambda pipelines:
  * higher-order SQL functions are interpreted expression trees (no
  * whole-stage codegen), which made signature computation the bottleneck —
  * a doc with s shingles × k hash families costs s·k interpreted tree
  * walks vs one tight JVM loop here (~50-100× on the sf0.1 bench).
  * Per-row, stateless, shuffle-free: the right unit to scale to 100 TB.
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

/** MinHash signature of a string-array column: sig[k] = min over elements
  * of a k-th hash of the element. One base XXH64 per element + an affine
  * remix per family (O(s + s·k) cheap ops, not s·k full hashes).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h0 = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < numHashes) {
        val h = Sketch.mix64(h0 ^ (k.toLong * 0xff51afd7ed558ccdL))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** LSH band hashes of a MinHash signature, fused: computes the `numHashes`
  * signature and folds each run of `numHashes / bands` values into one
  * 64-bit band key. Output: array of `bands` longs.
  */
case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "bands must divide numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h0 = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < numHashes) {
        val h = Sketch.mix64(h0 ^ (k.toLong * 0xff51afd7ed558ccdL))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var j = 0
      while (j < rowsPerBand) {
        acc = Sketch.mix64(acc ^ sig(b * rowsPerBand + j))
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a string column: split on single
  * spaces, join every n-length run back with spaces, dedup preserving
  * first occurrence. Native replacement for a
  * transform+slice+concat_ws+array_distinct lambda chain (interpreted,
  * ~50× slower).
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (words.length <= n) {
      seen.add(words.mkString(" "))
    } else {
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a string-array column: per-element hashes vote ±1 on
  * each bit, sign vector packs into one long.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Random-hyperplane LSH signatures of a double-array column: one
  * `planes`-bit signature per hash table (bit p = sign of ⟨v, plane_tp⟩),
  * hyperplanes derived deterministically from (table, plane, dim) hashes.
  */
case class HyperplaneSigsExpr(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes <= 63, "planes must fit a long")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0
        var d = 0
        while (d < v.length) {
          proj += v(d) * Sketch.planeComponent(t, p, d)
          d += 1
        }
        if (proj > 0) sig |= 1L << p
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigsExpr =
    copy(child = newChild)
}

/** Σ aᵢ·bᵢ over two double-array columns — sequential accumulation in array
  * order (bit-compatible with a sequential SQL `aggregate`/DuckDB
  * `list_cosine_similarity` numerator).
  */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDotExpr =
    copy(left = l, right = r)
}

/** Column wrappers. */
object SketchFunctions {
  def minHashSig(c: Column, numHashes: Int): Column =
    shim.column(MinHashSigExpr(shim.expression(c), numHashes))
  def minHashBands(c: Column, numHashes: Int, bands: Int): Column =
    shim.column(MinHashBandsExpr(shim.expression(c), numHashes, bands))
  def shinglesOf(text: Column, n: Int): Column =
    shim.column(ShinglesExpr(shim.expression(text), n))
  def simHash64(c: Column): Column =
    shim.column(SimHash64Expr(shim.expression(c)))
  def hyperplaneSigs(c: Column, planes: Int, tables: Int): Column =
    shim.column(HyperplaneSigsExpr(shim.expression(c), planes, tables))
  def arrayDot(a: Column, b: Column): Column =
    shim.column(ArrayDotExpr(shim.expression(a), shim.expression(b)))
}
