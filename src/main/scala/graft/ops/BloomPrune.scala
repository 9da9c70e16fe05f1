package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ProbFilters

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
}
