package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Probabilistic membership / frequency filters: a mergeable Bloom filter
  * and a count-min sketch, both as [[org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate]]s
  * (the [[TopKPairs]] partial-combine pattern — each map task folds its
  * rows into one fixed-size buffer, the shuffle carries O(buffer · tasks),
  * reducers merge) plus codegen'd probe expressions whose sketch state
  * rides an executor-shared `Broadcast` instead of being inlined into the
  * plan.
  *
  * The motivating 100-TB use is semi-join reduction ([[graft.ops.BloomPrune]]):
  * build a Bloom filter over the small side's join keys, broadcast it, and
  * drop non-matching rows of the big side BEFORE the join shuffle. With a
  * selective small side that turns a full-table shuffle into a
  * fraction-of-a-table shuffle for the price of one map-side scan — the
  * same trick Spark's own runtime row-group filtering plays, here available
  * deliberately and at any join the optimizer can't prove out itself.
  *
  * Hashing contract: both sides hash with XXH64 seed 42 — the aggregate
  * via `XxHash64Function` and the probe via the public `xxhash64()` column
  * (same kernel, same seed), so a filter built by the aggregate is always
  * readable by the probe. Bit positions come from double hashing
  * (h₁ + i·h₂ with h₂ forced odd), the standard Kirsch-Mitzenmacher
  * construction.
  */
object ProbFilterOps {

  /** i-th probe position in [0, size): double hashing off one 64-bit hash.
    * Long result — an Int truncation here would silently wrap positions
    * mod 2^32 for filters beyond 512 MB, concentrating every bit in the
    * low words and inflating the real fpp far past the configured one.
    */
  @inline final def position(h: Long, i: Int, size: Long): Long = {
    val h2 = Sketch.mix64(h) | 1L // odd stride cycles any size
    ((h + i * h2) & Long.MaxValue) % size
  }

  // ---------------------------------------------------------------- bloom

  /** Optimal bit count for `n` items at false-positive rate `fpp`. */
  def bloomBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1; got n=$n fpp=$fpp")
    math.max(64L, math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Optimal hash count for `n` items in `m` bits, clamped to [1, 32]:
    * the 64-bit word-aligned floor on `m` makes the textbook optimum blow
    * past any sensible probe count for tiny n (n=1 in 64 bits → k=44),
    * and beyond ~32 probes more hashing buys nothing measurable.
    */
  def bloomHashes(n: Long, m: Long): Int =
    math.min(32, math.max(1, math.round(m.toDouble / n * math.log(2)).toInt))

  def setBit(words: Array[Long], h: Long, numHashes: Int, numBits: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val pos = position(h, i, numBits)
      words((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      i += 1
    }
  }

  /** Probe kernel — the whole-stage-codegen'd hot path of the big side. */
  def mightContain(words: Array[Long], h: Long, numHashes: Int, numBits: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val pos = position(h, i, numBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** [[mightContain]] directly against SERIALIZED filter bytes (the
    * [[serializeBloom]] layout, words big-endian at offset 12): the
    * per-partition-filter-as-a-column probe must not copy an m-bit word
    * array per ROW just to test k bits of it.
    */
  def mightContainBytes(bytes: Array[Byte], h: Long, numHashes: Int, numBits: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val pos = position(h, i, numBits)
      val off = 12 + ((pos >>> 6).toInt << 3)
      val word =
        ((bytes(off) & 0xffL) << 56) | ((bytes(off + 1) & 0xffL) << 48) |
        ((bytes(off + 2) & 0xffL) << 40) | ((bytes(off + 3) & 0xffL) << 32) |
        ((bytes(off + 4) & 0xffL) << 24) | ((bytes(off + 5) & 0xffL) << 16) |
        ((bytes(off + 6) & 0xffL) << 8) | (bytes(off + 7) & 0xffL)
      if ((word & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** [[mightContainBytes]] with the geometry read from the serialized
    * header itself (int numHashes at 0, long numBits at 4, big-endian):
    * per-file filters may be sized per build pass, so a probe over a
    * column of filters cannot assume one geometry. Two header reads per
    * probe — noise next to the k word loads.
    */
  def mightContainBytesSelf(bytes: Array[Byte], h: Long): Boolean = {
    val numHashes = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val numBits =
      ((bytes(4) & 0xffL) << 56) | ((bytes(5) & 0xffL) << 48) |
      ((bytes(6) & 0xffL) << 40) | ((bytes(7) & 0xffL) << 32) |
      ((bytes(8) & 0xffL) << 24) | ((bytes(9) & 0xffL) << 16) |
      ((bytes(10) & 0xffL) << 8) | (bytes(11) & 0xffL)
    mightContainBytes(bytes, h, numHashes, numBits)
  }

  /** Serialized layout: int numHashes, long numBits, the words. */
  def serializeBloom(numHashes: Int, numBits: Long, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + words.length * 8)
    bb.putInt(numHashes).putLong(numBits)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserializeBloom(bytes: Array[Byte]): (Int, Long, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt
    val numBits = bb.getLong
    val words = new Array[Long](((numBits + 63) / 64).toInt)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (numHashes, numBits, words)
  }

  // ------------------------------------------------------------ count-min

  def cmAdd(counts: Array[Long], h: Long, depth: Int, width: Int): Unit = {
    var d = 0
    while (d < depth) {
      // re-mix the row index into the hash so rows probe independently
      counts(d * width + position(Sketch.mix64(h + d), d + 1, width).toInt) += 1L
      d += 1
    }
  }

  /** Point-estimate kernel: min over rows — an UPPER bound on the true
    * count (collisions only ever add).
    */
  def cmEstimate(counts: Array[Long], h: Long, depth: Int, width: Int): Long = {
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + position(Sketch.mix64(h + d), d + 1, width).toInt)
      if (c < min) min = c
      d += 1
    }
    min
  }

  // ------------------------------------------- count-min, MD5 hash family

  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MD5-family probe position for row `d`: the low 16 bits of the
    * big-endian uint64 of md5(token ":" row) — bytes 6-7 of the digest,
    * equivalently hex chars 13-16 — mod width. Same rationale as
    * [[graft.functions.SketchOps.simHash64Md5]]: an independent engine
    * can recompute every cell from its own `md5()`, so a sketch ESTIMATE
    * (collisions and all) becomes oracle-checkable at any vocabulary
    * size. Width must divide 65536 (the require in the aggregate) so the
    * 16-bit truncation commutes with the mod.
    */
  def cmPosMd5(tok: String, d: Int, width: Int): Int = {
    val md = md5Tl.get(); md.reset()
    val dig = md.digest((tok + ":" + d).getBytes("UTF-8"))
    (((dig(6) & 0xff) << 8) | (dig(7) & 0xff)) % width
  }

  def cmAddMd5(counts: Array[Long], tok: String, depth: Int, width: Int): Unit = {
    var d = 0
    while (d < depth) { counts(d * width + cmPosMd5(tok, d, width)) += 1L; d += 1 }
  }

  def cmEstimateMd5(counts: Array[Long], tok: String, depth: Int, width: Int): Long = {
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + cmPosMd5(tok, d, width))
      if (c < min) min = c
      d += 1
    }
    min
  }
}

/** Mergeable Bloom filter over the XXH64(seed 42) hashes of `child`.
  * Buffer = the bit words; merge = bitwise OR (commutative, associative,
  * idempotent — identical under any partitioning). Output: BinaryType,
  * [[ProbFilterOps.serializeBloom]] layout.
  */
case class BloomAgg(child: Expression, numBits: Long, numHashes: Int,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 32, s"numHashes must be in [1,32], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash map inputs, got ${child.dataType}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](((numBits + 63) / 64).toInt)

  override def update(words: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      ProbFilterOps.setBit(words, XxHash64Function.hash(v, child.dataType, 42L), numHashes, numBits)
    words
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(words: Array[Long]): Any =
    ProbFilterOps.serializeBloom(numHashes, numBits, words)

  override def serialize(words: Array[Long]): Array[Byte] =
    ProbFilterOps.serializeBloom(numHashes, numBits, words)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    ProbFilterOps.deserializeBloom(bytes)._3

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0))
}

/** `words` membership probe of a precomputed 64-bit hash column (wrap the
  * key in `xxhash64(key)` — the aggregate hashed with the same kernel and
  * seed). The filter rides a `Broadcast`, NOT a plan literal: a 100-TB
  * build side can need a multi-hundred-MB filter, which must ship to each
  * executor once, not serialize into every task binary.
  */
case class BloomMightContain(child: Expression, numHashes: Int, numBits: Long,
                             words: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the xxhash64 of the key (bigint), got $t")
  }

  override protected def nullSafeEval(h: Any): Any =
    ProbFilterOps.mightContain(words.value, h.asInstanceOf[Long], numHashes, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // resolve the broadcast once per generated class, not once per row
    val bc = ctx.addReferenceObj("bloomBc", words, "org.apache.spark.broadcast.Broadcast")
    val w = ctx.addMutableState("long[]", "bloomWords", v => s"$v = (long[]) $bc.value();")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.ProbFilterOps.mightContain($w, $h, $numHashes, ${numBits}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Partition-keyed membership probe: `left` = xxhash64 of the partition
  * value, `right` = xxhash64 of the key; `filters` maps partition-hash →
  * that partition's filter words (uniform geometry). A partition with no
  * entry prunes UNCONDITIONALLY — fpp is exactly 0 for partition values
  * absent from the build side, and keys of one partition never pollute
  * another's filter. The map rides one `Broadcast`; each probe costs a
  * hash lookup + ≤ k word loads, inside whole-stage codegen.
  */
case class BloomMightContainKeyed(left: Expression, right: Expression,
                                  numHashes: Int, numBits: Long,
                                  filters: Broadcast[java.util.HashMap[java.lang.Long, Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain_keyed"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects xxhash64 of (partition, key) (bigint, bigint), got ($l, $r)")
  }

  override protected def nullSafeEval(p: Any, h: Any): Any = {
    val w = filters.value.get(p.asInstanceOf[Long])
    w != null && ProbFilterOps.mightContain(w, h.asInstanceOf[Long], numHashes, numBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomMapBc", filters, "org.apache.spark.broadcast.Broadcast")
    val m = ctx.addMutableState("java.util.HashMap", "bloomMap",
      v => s"$v = (java.util.HashMap) $bc.value();")
    nullSafeCodeGen(ctx, ev, (p, h) => {
      val w = ctx.freshName("bloomWords")
      s"""long[] $w = (long[]) $m.get(java.lang.Long.valueOf($p));
         |${ev.value} = $w != null &&
         |  graft.functions.ProbFilterOps.mightContain($w, $h, $numHashes, ${numBits}L);
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomMightContainKeyed =
    copy(left = newLeft, right = newRight)
}

/** Membership probe where the FILTER ITSELF is a column (`left` =
  * serialized filter bytes riding a join, `right` = xxhash64 of the key).
  * This is how per-partition filters ship WITHOUT any driver collect or
  * broadcast: the (partition, filter) frame joins the probe side on the
  * partition key, each row probes its own partition's bytes in place —
  * the scale path when the filter map outgrows driver memory
  * ([[graft.ops.BloomPrune.pruneJoinPartitioned]]). Codegen'd; the kernel
  * indexes the bytes directly (no per-row word-array copy).
  */
case class BloomMightContainSerialized(left: Expression, right: Expression,
                                       numHashes: Int, numBits: Long)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain_serialized"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (serialized filter, xxhash64 of the key), got ($l, $r)")
  }

  override protected def nullSafeEval(bloom: Any, h: Any): Any =
    ProbFilterOps.mightContainBytes(bloom.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Long], numHashes, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.ProbFilterOps.mightContainBytes($b, $h, $numHashes, ${numBits}L);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomMightContainSerialized =
    copy(left = newLeft, right = newRight)
}

/** [[BloomMightContainSerialized]] with the geometry read from each row's
  * serialized header instead of fixed plan parameters: the per-FILE skipping
  * index ([[graft.core.BloomIndex]]) stores filters whose sizing may differ
  * across build passes (an append can re-size), so one probe expression must
  * handle a mixed-geometry filter column. Codegen'd; two header loads per
  * probe on top of the k word loads.
  */
case class BloomMightContainSelf(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain_self"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (serialized filter, xxhash64 of the key), got ($l, $r)")
  }

  override protected def nullSafeEval(bloom: Any, h: Any): Any =
    ProbFilterOps.mightContainBytesSelf(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.ProbFilterOps.mightContainBytesSelf($b, $h);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomMightContainSelf =
    copy(left = newLeft, right = newRight)
}

/** Mergeable count-min sketch over the XXH64(seed 42) hashes of `child`:
  * depth×width counters, merge = element-wise add. Estimates are upper
  * bounds; error ≤ 2n/width with probability 1 − 2^−depth. Output:
  * BinaryType (int depth, int width, the counters).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash map inputs, got ${child.dataType}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(counts: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      ProbFilterOps.cmAdd(counts, XxHash64Function.hash(v, child.dataType, 42L), depth, width)
    counts
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(counts: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth).putInt(width)
    counts.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(counts: Array[Long]): Array[Byte] = eval(counts).asInstanceOf[Array[Byte]]
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt; bb.getInt
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    counts
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_count_min_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0))
}

/** [[CountMinAgg]] with the MD5 hash family ([[ProbFilterOps.cmPosMd5]]):
  * string keys only, slower per row, but every probe position is
  * recomputable by an independent engine from its own `md5()` — the
  * cross-engine-checkable twin, same split as
  * [[SimHash64Md5Expr]] vs the XXH64 production default.
  */
case class CountMinAggMd5(child: Expression, depth: Int, width: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 16 && 65536 % width == 0,
    s"width must divide 65536 (the md5 16-bit truncation), got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(counts: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      ProbFilterOps.cmAddMd5(counts, v.asInstanceOf[UTF8String].toString, depth, width)
    counts
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(counts: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth).putInt(width)
    counts.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(counts: Array[Long]): Array[Byte] = eval(counts).asInstanceOf[Array[Byte]]
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt; bb.getInt
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    counts
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_count_min_agg_md5"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAggMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAggMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAggMd5 =
    copy(child = newChildren(0))
}

/** MD5-family count-min point estimate of a string key. */
case class CountMinEstimateMd5(child: Expression, depth: Int, width: Int,
                               counts: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_estimate_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the string key, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    ProbFilterOps.cmEstimateMd5(counts.value, v.asInstanceOf[UTF8String].toString, depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("cmBc", counts, "org.apache.spark.broadcast.Broadcast")
    val w = ctx.addMutableState("long[]", "cmCountsMd5", v => s"$v = (long[]) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ProbFilterOps.cmEstimateMd5($w, $v.toString(), $depth, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountMinEstimateMd5 =
    copy(child = newChild)
}

/** Count-min point estimate of a precomputed 64-bit hash column (same
  * broadcast rationale as [[BloomMightContain]]).
  */
case class CountMinEstimate(child: Expression, depth: Int, width: Int,
                            counts: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the xxhash64 of the key (bigint), got $t")
  }

  override protected def nullSafeEval(h: Any): Any =
    ProbFilterOps.cmEstimate(counts.value, h.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("cmBc", counts, "org.apache.spark.broadcast.Broadcast")
    val w = ctx.addMutableState("long[]", "cmCounts", v => s"$v = (long[]) $bc.value();")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.ProbFilterOps.cmEstimate($w, $h, $depth, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountMinEstimate =
    copy(child = newChild)
}

/** Column wrappers. */
object ProbFilters {

  /** Bloom-filter aggregate sized for `expectedItems` at `fpp`. */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    val bits = ProbFilterOps.bloomBits(expectedItems, fpp)
    val m = ((bits + 63) / 64) * 64 // word-align
    shim.column(BloomAgg(shim.expression(key), m,
      ProbFilterOps.bloomHashes(expectedItems, m)).toAggregateExpression())
  }

  /** Bloom-filter aggregate with EXPLICIT geometry — for folding new keys
    * into an existing filter, where the bit layout must match exactly.
    */
  def bloomAggSized(key: Column, numBits: Long, numHashes: Int): Column =
    shim.column(BloomAgg(shim.expression(key), numBits, numHashes).toAggregateExpression())

  /** Membership probe against collected filter bytes (broadcast once). */
  def mightContain(spark: SparkSession, key: Column, bloomBytes: Array[Byte]): Column = {
    val (numHashes, numBits, words) = ProbFilterOps.deserializeBloom(bloomBytes)
    val bc = spark.sparkContext.broadcast(words)
    shim.column(BloomMightContain(shim.expression(xxhash64(key)), numHashes, numBits, bc))
  }

  /** Partition-keyed probe: TRUE iff `part`'s filter exists in `filters`
    * (keyed by xxhash64 of the partition value) AND it might contain
    * `key`. One broadcast of the whole filter map.
    */
  def mightContainKeyed(spark: SparkSession, part: Column, key: Column,
                        numHashes: Int, numBits: Long,
                        filters: java.util.HashMap[java.lang.Long, Array[Long]]): Column = {
    val bc = spark.sparkContext.broadcast(filters)
    shim.column(BloomMightContainKeyed(shim.expression(xxhash64(part)),
      shim.expression(xxhash64(key)), numHashes, numBits, bc))
  }

  /** Probe a filter-bytes COLUMN (no broadcast — the filter rides the row). */
  def mightContainSerialized(bloom: Column, key: Column,
                             numHashes: Int, numBits: Long): Column =
    shim.column(BloomMightContainSerialized(shim.expression(bloom),
      shim.expression(xxhash64(key)), numHashes, numBits))

  /** Probe a filter-bytes column whose geometry rides each row's header. */
  def mightContainSelf(bloom: Column, key: Column): Column =
    shim.column(BloomMightContainSelf(shim.expression(bloom),
      shim.expression(xxhash64(key))))

  /** Count-min aggregate; width ≈ 2/ε counters per row, depth ≈ log(1/δ). */
  def countMinAgg(key: Column, depth: Int = 5, width: Int = 4096): Column =
    shim.column(CountMinAgg(shim.expression(key), depth, width).toAggregateExpression())

  /** Frequency upper-bound estimate against collected sketch bytes. */
  def cmEstimate(spark: SparkSession, key: Column, sketchBytes: Array[Byte]): Column = {
    val bb = ByteBuffer.wrap(sketchBytes)
    val depth = bb.getInt
    val width = bb.getInt
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    val bc = spark.sparkContext.broadcast(counts)
    shim.column(CountMinEstimate(shim.expression(xxhash64(key)), depth, width, bc))
  }

  /** MD5-family count-min aggregate (cross-engine-checkable positions). */
  def countMinAggMd5(key: Column, depth: Int = 5, width: Int = 4096): Column =
    shim.column(CountMinAggMd5(shim.expression(key), depth, width).toAggregateExpression())

  /** MD5-family frequency estimate against collected sketch bytes. */
  def cmEstimateMd5(spark: SparkSession, key: Column, sketchBytes: Array[Byte]): Column = {
    val bb = ByteBuffer.wrap(sketchBytes)
    val depth = bb.getInt
    val width = bb.getInt
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    val bc = spark.sparkContext.broadcast(counts)
    shim.column(CountMinEstimateMd5(shim.expression(key), depth, width, bc))
  }
}
