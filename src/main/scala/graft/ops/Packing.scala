package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One packed training sequence: the docs it contains and its fill. */
final case class PackedSeq(seq_id: Long, doc_ids: Seq[Long],
                           n_docs: Int, total_tokens: Long)

/** Sequence packing: greedily bin documents into fixed token budgets — the
  * pretraining batch-prep step that turns a curated corpus into
  * near-uniform training sequences.
  *
  * Distribution shape: packing is PER PARTITION (`mapPartitions` with a
  * greedy first-fit accumulator), so no shuffle and no global coordination;
  * the cost of partition-local packing vs a (non-parallelizable) global
  * optimum is a slightly lower average fill, which is the standard
  * trade-off at corpus scale. Sequence ids are globally unique by
  * (partitionId << 40 | local index). Oversized single documents get their
  * own sequence (callers chunk them upstream if that is not acceptable).
  */
object Packing {

  def packSequences(spark: SparkSession, docs: DataFrame, tokensPerSeq: Long,
                    idCol: String = "doc_id", tokenCountCol: String = "n_tokens"): Dataset[PackedSeq] = {
    import spark.implicits._
    require(tokensPerSeq > 0, "tokensPerSeq must be positive")
    docs.select(col(idCol).cast("long"), col(tokenCountCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var localSeq = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[PackedSeq]
        var curDocs = scala.collection.mutable.ArrayBuffer.empty[Long]
        var curTokens = 0L
        def flush(): Unit = if (curDocs.nonEmpty) {
          out += PackedSeq((pid << 40) | localSeq, curDocs.toSeq, curDocs.length, curTokens)
          localSeq += 1
          curDocs = scala.collection.mutable.ArrayBuffer.empty[Long]
          curTokens = 0L
        }
        rows.foreach { case (id, tokens) =>
          if (curTokens + tokens > tokensPerSeq) flush()
          curDocs += id
          curTokens += tokens
        }
        flush()
        out.iterator
      }
  }

  /** Deterministic sequence packing: docs are grouped by `id mod numGroups`
    * and packed greedily in ascending-id order WITHIN each group, so the
    * output is a pure function of the data — independent of input
    * partitioning, cluster layout, or AQE decisions. That determinism is
    * what makes training batches reproducible run-to-run (the
    * partition-local [[packSequences]] is cheaper — no shuffle — but its
    * bins follow physical partitioning).
    *
    * Distribution shape: one hash shuffle on the group key, then
    * `flatMapSortedGroups` streams each group in sorted order through the
    * same greedy first-fit accumulator — no group is materialized in
    * memory, so group size is bounded only by disk. `numGroups` defaults
    * to ~128 docs per group (computed from a count pass) which keeps the
    * recursion-free greedy walk short while giving the scheduler enough
    * groups to parallelize; at 100 TB the group count grows with the
    * corpus, so per-task work stays constant.
    */
  def packSequencesGrouped(spark: SparkSession, docs: DataFrame, tokensPerSeq: Long,
                           numGroups: Int = 0,
                           idCol: String = "doc_id", tokenCountCol: String = "n_tokens"): Dataset[PackedSeq] = {
    import spark.implicits._
    require(tokensPerSeq > 0, "tokensPerSeq must be positive")
    val slim = docs.select(col(idCol).cast("long").as("id"), col(tokenCountCol).cast("long").as("tok"))
      .as[(Long, Long)]
    val groups: Long =
      if (numGroups > 0) numGroups.toLong
      else math.max(8L, (slim.count() + 127L) / 128L)
    require(groups <= (1L << 23), s"numGroups $groups exceeds the 2^23 seq-id budget")
    slim
      .groupByKey { case (id, _) => java.lang.Math.floorMod(id, groups) }
      .flatMapSortedGroups(col("id")) { (g: Long, rows: Iterator[(Long, Long)]) =>
        var localSeq = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[PackedSeq]
        var curDocs = scala.collection.mutable.ArrayBuffer.empty[Long]
        var curTokens = 0L
        def flush(): Unit = if (curDocs.nonEmpty) {
          out += PackedSeq((g << 40) | localSeq, curDocs.toSeq, curDocs.length, curTokens)
          localSeq += 1
          curDocs = scala.collection.mutable.ArrayBuffer.empty[Long]
          curTokens = 0L
        }
        rows.foreach { case (id, tokens) =>
          if (curTokens + tokens > tokensPerSeq) flush()
          curDocs += id
          curTokens += tokens
        }
        flush()
        out.iterator
      }
  }
}
