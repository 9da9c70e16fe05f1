package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Mergeable sketch aggregates (same partial-combine pattern as
  * [[TopKPairs]]): each map task folds its rows into a small fixed-size
  * sketch, the shuffle carries one sketch per (task, group) — O(sketch
  * bytes · tasks), never O(rows) — and reducers merge sketches. The
  * difference between a wide exact `countDistinct`/`percentile` (which
  * must shuffle every distinct value / every row) and a cheap single pass
  * at 100 TB.
  */

/** HyperLogLog distinct-count estimate over 2^p byte registers
  * (relative error ≈ 1.04/√(2^p); p=12 → ~1.6% in 4 KB).
  *
  * Standard HLL: per value, a 64-bit hash routes to register
  * `hash >>> (64-p)` which keeps the max leading-zero rank of the
  * remaining bits; merge is the element-wise register max (commutative,
  * associative, idempotent — estimates are identical under any
  * partitioning or merge order). Harmonic-mean estimator with
  * linear-counting small-range correction.
  */
case class HllDistinct(child: Expression, p: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 18, s"precision p must be in [4,18], got $p")
  private val m = 1 << p

  // XxHash64Function hashes any non-map type (maps have no canonical
  // element order, same reason Spark's hash() rejects them)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash map inputs, got ${child.dataType}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      // rank = leading zeros of the remaining 64-p bits, +1; all-zero rest
      // saturates at 64-p+1
      val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren(0))
}

/** Centroid buffer of a merging t-digest: parallel primitive arrays
  * (mean, weight), compressed when the appended tail grows past the
  * threshold. Primitive storage + in-place dual-array quicksort keep the
  * per-row hot path allocation-free (a boxed tuple buffer was ~3× slower
  * end-to-end).
  */
final class TDigestBuffer(var means: Array[Double], var weights: Array[Long], var size: Int) {
  def this() = this(new Array[Double](64), new Array[Long](64), 0)

  /** Prefix length already holding compressed centroids (compress resets
    * it to the whole buffer; appends grow the uncompressed tail).
    */
  var compressedSize: Int = 0

  def append(mean: Double, weight: Long): Unit = {
    if (size == means.length) {
      means = java.util.Arrays.copyOf(means, size * 2)
      weights = java.util.Arrays.copyOf(weights, size * 2)
    }
    means(size) = mean
    weights(size) = weight
    size += 1
  }

  /** In-place quicksort of [lo, hi] by mean, weights permuted alongside. */
  def sortByMean(lo0: Int, hi0: Int): Unit = {
    if (hi0 <= lo0) return
    var stack = List((lo0, hi0))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head
      stack = stack.tail
      if (hi - lo < 24) { // insertion sort small runs
        var i = lo + 1
        while (i <= hi) {
          val m = means(i); val w = weights(i)
          var j = i - 1
          while (j >= lo && means(j) > m) {
            means(j + 1) = means(j); weights(j + 1) = weights(j); j -= 1
          }
          means(j + 1) = m; weights(j + 1) = w
          i += 1
        }
      } else {
        // median-of-three pivot
        val mid = lo + (hi - lo) / 2
        if (means(mid) < means(lo)) swap(mid, lo)
        if (means(hi) < means(lo)) swap(hi, lo)
        if (means(hi) < means(mid)) swap(hi, mid)
        val pivot = means(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (means(i) < pivot) i += 1
          while (means(j) > pivot) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j) stack = (lo, j) :: stack
        if (i < hi) stack = (i, hi) :: stack
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val m = means(a); means(a) = means(b); means(b) = m
    val w = weights(a); weights(a) = weights(b); weights(b) = w
  }
}

/** Quantile estimates from a merging t-digest (Dunning's streaming
  * algorithm): values fold into (mean, weight) centroids whose allowed
  * width shrinks toward the distribution tails under the arcsine scale
  * function, so extreme quantiles stay sharp while the middle compresses.
  * Buffer size is O(compression), independent of row count; merge
  * concatenates centroid lists and re-compresses.
  *
  * Output: array<double> of the estimated quantiles for `probs`, in order.
  * Estimates depend (slightly) on merge order — accuracy is contract-
  * tested in the spec, byte-determinism is not promised.
  */
case class TDigestQuantiles(child: Expression, probs: Seq[Double], compression: Int,
                            override val mutableAggBufferOffset: Int = 0,
                            override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestBuffer] {

  require(probs.nonEmpty && probs.forall(q => q >= 0 && q <= 1),
    "quantile probabilities must be in [0,1]")
  require(compression >= 20, s"compression must be >= 20, got $compression")

  // compress cost amortizes over the pending batch: a large batch keeps
  // the per-row cost at O(log) comparisons while the buffer stays a few
  // hundred KB — compressing every ~4·compression rows instead was ~4×
  // slower end-to-end on the bench
  private val maxPending = math.max(8192, 8 * compression)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input (cast upstream), got $t")
  }

  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer()

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.append(v.asInstanceOf[Double], 1L)
      if (buf.size > buf.compressedSize + maxPending) compress(buf)
    }
    buf
  }

  override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
    var i = 0
    while (i < b.size) { a.append(b.means(i), b.weights(i)); i += 1 }
    compress(a)
    a
  }

  /** Arcsine scale function k(q): a centroid spanning [qL, qR] is kept
    * only while k(qR) - k(qL) <= 1 — tight near q=0/1, loose at q=0.5.
    */
  private def k(q: Double): Double = {
    val c = math.min(1.0, math.max(0.0, q))
    compression * (math.asin(2 * c - 1) / math.Pi + 0.5)
  }

  private def compress(buf: TDigestBuffer): Unit = {
    if (buf.size <= 1) { buf.compressedSize = buf.size; return }
    buf.sortByMean(0, buf.size - 1)
    var total = 0.0
    var i = 0
    while (i < buf.size) { total += buf.weights(i); i += 1 }
    var o = 0
    var curMean = buf.means(0)
    var curW = buf.weights(0)
    var qLeft = 0.0
    i = 1
    while (i < buf.size) {
      val mean = buf.means(i)
      val w = buf.weights(i)
      if (k(qLeft + (curW + w) / total) - k(qLeft) <= 1.0) {
        curMean = (curMean * curW + mean * w) / (curW + w)
        curW += w
      } else {
        buf.means(o) = curMean; buf.weights(o) = curW; o += 1
        qLeft += curW / total
        curMean = mean; curW = w
      }
      i += 1
    }
    buf.means(o) = curMean; buf.weights(o) = curW; o += 1
    buf.size = o
    buf.compressedSize = o
  }

  override def eval(buf: TDigestBuffer): Any = {
    compress(buf)
    if (buf.size == 0) return new GenericArrayData(probs.map(_ => null).toArray[Any])
    val n = buf.size
    var total = 0.0
    var i = 0
    while (i < n) { total += buf.weights(i); i += 1 }
    // piecewise-linear CDF through centroid midpoints, clamped at the ends
    val qs = new Array[Double](n)
    var cum = 0L
    i = 0
    while (i < n) {
      qs(i) = (cum + buf.weights(i) / 2.0) / total
      cum += buf.weights(i)
      i += 1
    }
    def quantile(q: Double): Double =
      if (q <= qs(0)) buf.means(0)
      else if (q >= qs(n - 1)) buf.means(n - 1)
      else {
        var j = 1
        while (qs(j) < q) j += 1
        val f = (q - qs(j - 1)) / (qs(j) - qs(j - 1))
        buf.means(j - 1) + f * (buf.means(j) - buf.means(j - 1))
      }
    new GenericArrayData(probs.map(quantile).toArray[Any])
  }

  override def serialize(buf: TDigestBuffer): Array[Byte] = {
    compress(buf)
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.means(i)); bb.putLong(buf.weights(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TDigestBuffer(new Array[Double](math.max(64, n)),
      new Array[Long](math.max(64, n)), 0)
    (0 until n).foreach(_ => buf.append(bb.getDouble, bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_tdigest_quantiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TDigestQuantiles =
    copy(child = newChildren(0))
}

/** Approximate heavy hitters (top frequent items) via a batched
  * Misra-Gries summary: at most `capacity` counters survive any state;
  * when the map overflows, the (capacity+1)-th largest count is
  * subtracted from every counter and non-positive ones drop (the classic
  * frequent-items decrement, batched). Guarantees: any item with true
  * frequency > n/capacity is retained; reported counts are LOWER bounds
  * undercounting by at most the sum of subtracted cuts (≤ n/capacity).
  *
  * The scale rationale mirrors [[HllDistinct]]: an exact top-k over an
  * open vocabulary shuffles one row per distinct term; this ships one
  * ≤ capacity-entry summary per task and merges by counter addition.
  * Output: array<struct<item string, count long>>, top `k` by
  * (count desc, item asc). Counts may vary slightly with partitioning
  * (prune points differ); membership of true heavy hitters does not.
  */
case class HeavyHitters(child: Expression, capacity: Int, k: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string items, got $t")
  }

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  private def prune(m: scala.collection.mutable.HashMap[String, Long]): Unit = {
    if (m.size <= capacity) return
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val cut = counts(m.size - capacity - 1) // (capacity+1)-th largest
    m.filterInPlace((_, c) => c > cut)
    m.mapValuesInPlace((_, c) => c - cut)
  }

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.update(s, buf.getOrElse(s, 0L) + 1L)
      if (buf.size > 2 * capacity) prune(buf)
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[String, Long],
                     other: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf.update(s, buf.getOrElse(s, 0L) + c) }
    prune(buf)
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    prune(buf)
    val top = buf.toArray.sortBy { case (s, c) => (-c, s) }.take(k)
    new GenericArrayData(top.map { case (s, c) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(s), c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    prune(buf)
    val items = buf.toArray
    val bytes = items.map { case (s, _) => s.getBytes("UTF-8") }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.update(new String(b, "UTF-8"), bb.getLong)
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
}

object SketchAggregates {

  /** HLL distinct-count estimate column (default 4 KB sketch, ~1.6% error). */
  def approxDistinct(c: Column, p: Int = 12): Column =
    shim.column(HllDistinct(shim.expression(c), p).toAggregateExpression())

  /** t-digest quantile estimates column: array<double>, one per prob. */
  def approxQuantiles(c: Column, probs: Seq[Double], compression: Int = 100): Column =
    shim.column(TDigestQuantiles(
      shim.expression(c.cast("double")), probs, compression).toAggregateExpression())

  /** Approximate top-k frequent items: array<struct<item,count>>. */
  def heavyHitters(c: Column, k: Int, capacity: Int = 4096): Column =
    shim.column(HeavyHitters(shim.expression(c), capacity, k).toAggregateExpression())
}
