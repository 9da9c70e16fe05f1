package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ProbFilterOps, ProbFilters}

/** Bloom semi-join reduction: drop big-side rows that cannot possibly have
  * a join partner BEFORE the join's shuffle.
  *
  * The result is EXACTLY the ordinary join's result — a Bloom filter has
  * no false negatives, so pruning only removes rows that provably don't
  * match, and its false positives are removed by the real join that still
  * runs afterwards. What changes is the cost: at 100 TB an inner join
  * against a selective dimension otherwise shuffles the ENTIRE fact table;
  * with the filter, each fact-table map task probes a broadcast bit array
  * (one codegen'd hash + ≤ k word loads per row, inside the scan stage)
  * and only the surviving fraction (true matches + ~fpp) pays the
  * exchange. One extra pass over the SMALL side builds the filter; the
  * big side is still read once.
  *
  * Spark's own `InjectRuntimeFilter` plays this trick when its heuristics
  * line up; this operator makes it deliberate — any key expression, any
  * fpp, and the filter build is a mergeable aggregate
  * ([[graft.functions.BloomAgg]]) whose shuffle cost is O(filter bytes ·
  * tasks), not O(keys).
  */
object BloomPrune {

  /** `large ⋈ small` (inner or left_semi) with the large side pre-filtered
    * by a Bloom filter of `small`'s keys.
    *
    * `expectedItems` sizes the filter; pass the small side's (approximate)
    * distinct key count when known, or leave 0 to spend one `count()` on
    * it. Join-type restriction is semantic: for outer/anti joins, dropping
    * big-side rows changes the result.
    *
    * NOTE: the filter build is EAGER — this call runs one Spark job over
    * the small side (the aggregate + `head()`) before returning the lazy
    * joined frame. Necessary: the bit array must exist to be broadcast
    * into the probe expression. Call it where a job is acceptable, not
    * inside plan-construction-only code paths.
    */
  def pruneJoin(large: DataFrame, small: DataFrame, largeKey: String, smallKey: String,
                joinType: String = "inner", expectedItems: Long = 0L,
                fpp: Double = 0.01): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom pruning preserves only inner/left_semi semantics, got $joinType")
    // XxHash64 hashes Int and Long forms of the same value differently: a
    // key-type mismatch would make every probe a false negative and prune
    // MATCHING rows (where the plain join would coerce and match)
    require(large.schema(largeKey).dataType == small.schema(smallKey).dataType,
      s"join key types must match exactly for bloom probing: " +
        s"$largeKey is ${large.schema(largeKey).dataType}, " +
        s"$smallKey is ${small.schema(smallKey).dataType}")
    val n = if (expectedItems > 0) expectedItems else math.max(1L, small.count())
    val spark = large.sparkSession
    val bloomBytes = small
      .agg(ProbFilters.bloomAgg(col(smallKey), n, fpp).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    val pruned = large.where(ProbFilters.mightContain(spark, col(largeKey), bloomBytes))
    pruned.join(small, pruned(largeKey) === small(smallKey), joinType)
  }

  /** [[pruneJoin]] for a COMPOUND key `(partition, key)` — e.g. a join
    * aligned with the dataset's partitioning — with one Bloom filter PER
    * partition value of the small side instead of one global filter.
    *
    * Why per-partition beats one filter over the composite key at the
    * same total bytes:
    *  - a big-side partition value ABSENT from the small side prunes at
    *    fpp = 0 without spending a bit on it;
    *  - each probe touches only its partition's (smaller, cache-resident)
    *    words. Below `maxFilterMapBytes` the whole map ships in ONE
    *    broadcast (map-side probe, no extra shuffle); above it the
    *    operator switches to PARTITION-SELECTIVE shipping — the filters
    *    stay a distributed (partition, filter) frame joined to the large
    *    side on the partition key ([[pruneJoinDistributed]]), bounding
    *    driver memory at any partition cardinality.
    * Against the NAIVE alternative — a global filter over the key column
    * alone — it also removes every cross-partition collision: a key
    * present only under partition A no longer keeps partition B's rows
    * alive (asserted in the spec).
    *
    * All partition filters share one geometry, sized for the LARGEST
    * partition's key count (`expectedItemsPerPartition` or one light
    * count pass over the small side) — skewed small sides waste some bits
    * on tiny partitions but never exceed the configured fpp.
    */
  def pruneJoinPartitioned(large: DataFrame, small: DataFrame,
                           largePartKey: String, largeKey: String,
                           smallPartKey: String, smallKey: String,
                           joinType: String = "inner",
                           expectedItemsPerPartition: Long = 0L,
                           fpp: Double = 0.01,
                           maxFilterMapBytes: Long = 256L << 20): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom pruning preserves only inner/left_semi semantics, got $joinType")
    Seq((largePartKey, smallPartKey), (largeKey, smallKey)).foreach { case (l, s) =>
      require(large.schema(l).dataType == small.schema(s).dataType,
        s"join key types must match exactly for bloom probing: " +
          s"$l is ${large.schema(l).dataType}, $s is ${small.schema(s).dataType}")
    }
    val spark = large.sparkSession
    // The driver-memory guard below needs the partition cardinality; the
    // default sizing additionally needs the largest partition's key count.
    // A caller who supplied expectedItemsPerPartition (to keep the build
    // side's pre-pass cheap) pays only a partial-agg sketch pass — no
    // groupBy shuffle. The estimate is asked for 2% rsd and padded 15%,
    // so the memory guard on this path is PROBABILISTIC: a cardinality
    // within a few sigma of the ceiling can still slip past (the exact
    // path — expectedItemsPerPartition = 0 — never can).
    val (n, partCount) =
      if (expectedItemsPerPartition > 0) {
        val approx = small.agg(approx_count_distinct(col(smallPartKey), 0.02))
          .head().getLong(0)
        (expectedItemsPerPartition, (approx * 1.15).toLong + 1)
      } else {
        val stats = small.groupBy(col(smallPartKey)).count()
          .agg(max("count").as("mx"), count(lit(1)).as("parts")).head()
        // max over zero groups is NULL (empty small side) — an empty build
        // must degrade to an empty join, like pruneJoin does
        (if (stats.isNullAt(0)) 1L else math.max(1L, stats.getLong(0)), stats.getLong(1))
      }
    val m = ((ProbFilterOps.bloomBits(n, fpp) + 63) / 64) * 64 // word-align
    // The broadcast fast path collect()s the whole filter map to the
    // driver — O(partitions × m/8) driver memory. Past the ceiling the
    // operator switches to DISTRIBUTED shipping instead of OOMing: the
    // (partition, filter) frame never leaves the cluster (see below).
    val mapBytes = partCount * (m / 8)
    val k = ProbFilterOps.bloomHashes(n, m)
    if (mapBytes > maxFilterMapBytes) {
      // The distributed probe join hash-partitions the LARGE side on the
      // partition key alone — with fewer distinct partition values than
      // cores, that serializes the whole probe onto partCount tasks
      // (measured at ×100 scale: a 3-value key collapsed a 60M-row probe
      // to 2 stragglers). Below that cardinality per-partition shipping
      // cannot pay for itself; the plain compound-key join (same output,
      // shuffles on BOTH keys, no skew) is the honest fallback.
      if (partCount < spark.sparkContext.defaultParallelism)
        return large.join(small,
          large(largePartKey) === small(smallPartKey) && large(largeKey) === small(smallKey),
          joinType)
      return pruneJoinDistributed(large, small, largePartKey, largeKey,
        smallPartKey, smallKey, joinType, m, k)
    }
    // one distributed agg pass: (partition, filter) rows, O(m · partitions)
    val rows = small.groupBy(col(smallPartKey))
      .agg(ProbFilters.bloomAggSized(col(smallKey), m, k).as("bloom"))
      .select(xxhash64(col(smallPartKey)).as("ph"), col("bloom"))
      .collect()
    val filters = new java.util.HashMap[java.lang.Long, Array[Long]](rows.length * 2)
    rows.foreach { r =>
      val words = ProbFilterOps.deserializeBloom(r.getAs[Array[Byte]](1))._3
      val prev = filters.get(r.getLong(0))
      // a 64-bit hash collision between two partition VALUES (~n²/2^65) —
      // OR the filters together: probes then admit either partition's
      // keys (a cost, removed by the real join), never a false negative
      // (which would silently drop matching rows)
      if (prev == null) filters.put(r.getLong(0), words)
      else { var i = 0; while (i < prev.length) { prev(i) |= words(i); i += 1 } }
    }
    val pruned = large.where(ProbFilters.mightContainKeyed(spark,
      col(largePartKey), col(largeKey), k, m, filters))
    pruned.join(small,
      pruned(largePartKey) === small(smallPartKey) && pruned(largeKey) === small(smallKey),
      joinType)
  }

  /** Partition-selective shipping — the above-the-ceiling path: the
    * per-partition filters stay a DISTRIBUTED (partition, filter) frame
    * that joins the large side on the partition key; each row then probes
    * ITS OWN partition's filter bytes in place (codegen'd direct byte
    * indexing — no per-row deserialization, no driver collect, no
    * broadcast). Bounded driver memory at ANY partition cardinality.
    *
    * Cost shape, honestly: when Catalyst can still broadcast the filter
    * frame (it's just not driver-collectable as one map) the probe stays
    * map-side and nothing extra shuffles; when it can't, the probe join
    * hash-partitions the large side on the partition key and the real
    * join re-shuffles the SURVIVORS on (partition, key) — about the plain
    * join's shuffle volume when the filter is selective, with the pruning
    * now applied before the (expensive) wide join itself. The point of
    * this path is bounded memory, not beating the broadcast route.
    * Callers guard the degenerate cardinality: below defaultParallelism
    * distinct partition values the partition-key shuffle would serialize
    * the probe onto that many tasks, so [[pruneJoinPartitioned]] answers
    * with the plain compound-key join instead of this path.
    * A large-side partition value absent from the small side still prunes
    * at fpp exactly 0 (the probe join is inner: no filter row, no rows
    * out). Semantics identical to the broadcast path; the spec pins
    * equality on both routes.
    */
  private def pruneJoinDistributed(large: DataFrame, small: DataFrame,
                                   largePartKey: String, largeKey: String,
                                   smallPartKey: String, smallKey: String,
                                   joinType: String, m: Long, k: Int): DataFrame = {
    val bloomCol = "__graft_part_bloom"
    val filters = small.groupBy(col(smallPartKey))
      .agg(ProbFilters.bloomAggSized(col(smallKey), m, k).as(bloomCol))
    val probed = large
      .join(filters, large(largePartKey) === filters(smallPartKey))
      .where(ProbFilters.mightContainSerialized(col(bloomCol), large(largeKey), k, m))
      .select(large.columns.map(large(_)).toIndexedSeq: _*)
    probed.join(small,
      probed(largePartKey) === small(smallPartKey) && probed(largeKey) === small(smallKey),
      joinType)
  }
}
