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

  /** Context-window chunking: split each document into token windows of
    * `chunkTokens`, starting every `stride` tokens (stride < chunkTokens
    * = overlapping windows, the standard long-document training prep;
    * stride = chunkTokens = disjoint). Emits `(…, chunk_id, text,
    * n_tokens)` — chunk_id is the 0-based window ordinal within its doc,
    * the tail window may be short, and windows shorter than
    * `minChunkTokens` are dropped (a stride's worth of trailing overlap
    * adds nothing to training). A doc shorter than one chunk passes
    * through as its own chunk 0. This is the upstream complement of
    * [[packSequences]] (which bins whole docs and gives oversized ones
    * their own sequence): chunk first, pack the chunks.
    *
    * Pure per-row projection + explode — no shuffle, no UDF; tokens are
    * whitespace words (the repo-wide convention; BPE-exact budgets run
    * the chunker on pre-tokenized ids upstream of detokenization).
    */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, stride: Int,
                     minChunkTokens: Int = 1,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    require(minChunkTokens >= 1 && minChunkTokens <= chunkTokens,
      s"minChunkTokens must be in [1, chunkTokens], got $minChunkTokens")
    val keep = docs.columns.filterNot(_ == textCol).map(col).toIndexedSeq
    // window slicing re-materializes ~chunkTokens/stride copies of every
    // token: spread a narrow input first (identity at real scale, guide
    // §2.5; chunks are a pure per-doc projection — layout-independent).
    // Tokenize ONCE into a materialized column: an inline split inside
    // the transform lambda would re-split the text per window.
    Spread.forCompute(docs, col(idCol)).where(col(textCol).isNotNull)
      .withColumn("__ws", split(col(textCol), " "))
      .select(keep :+ posexplode(filter(
        transform(
          sequence(lit(0), greatest(size(col("__ws")) - 1, lit(0)), lit(stride)),
          s => slice(col("__ws"), s + 1, lit(chunkTokens))),
        c => size(c) >= minChunkTokens))
        .as(Seq("chunk_id", "__chunk")): _*)
      .withColumn(textCol, array_join(col("__chunk"), " "))
      .withColumn("n_tokens", size(col("__chunk")).cast("long"))
      .drop("__chunk")
  }

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
