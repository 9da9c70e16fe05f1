package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the sketch expressions. Kept as a plain object so
  * generated code (whole-stage codegen) can call them via the class's
  * static forwarders — one static call per row inside the generated loop,
  * exactly like Spark's own hash expressions delegate to XXH64.
  */
object SketchOps {

  /** See [[ShinglesExpr]]. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
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
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  private def minHashSignature(arr: ArrayData, numHashes: Int): Array[Long] = {
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
    sig
  }

  /** See [[MinHashSigExpr]]. */
  def minHashSig(arr: ArrayData, numHashes: Int): ArrayData =
    new GenericArrayData(minHashSignature(arr, numHashes))

  /** See [[MinHashBandsExpr]]. */
  def minHashBands(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val sig = minHashSignature(arr, numHashes)
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

  /** See [[SimHash64Expr]]. */
  def simHash64(arr: ArrayData): Long = {
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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** See [[SimHash64Md5Expr]]: [[simHash64]] with the per-token hash drawn
    * from MD5 instead of XXH64 — bit j of a token's vote word is bit j of
    * the big-endian uint64 formed by md5(token)'s first 8 bytes (= its
    * first 16 hex chars), a definition an external SQL engine reproduces
    * exactly from its own `md5()`. Same tight one-pass kernel; MD5 costs
    * ~3× XXH64 per token, so production simhash stays on [[simHash64]].
    */
  def simHash64Md5(arr: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
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

  /** See [[HyperplaneSigsExpr]]. */
  def hyperplaneSigs(input: ArrayData, planes: Int, tables: Int): ArrayData = {
    val v = input.toDoubleArray()
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

  /** See [[ArrayDotExpr]]. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }
}
