package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents sharing word n-grams
  * with an evaluation/benchmark set. Shape: both sides shingle (native
  * kernel) and explode to (shingle-hash, id) pairs; the join key is the
  * 64-bit hash, so the shuffle carries two longs per shingle — never the
  * text. The benchmark side is typically tiny ⇒ broadcast join; overlap
  * counts aggregate map-side.
  *
  * Recall note: texts with fewer than `n` words collapse to ONE
  * whole-text shingle (see [[graft.functions.ShinglesExpr]]), so a
  * benchmark item shorter than `n` words only matches a training doc via
  * an identical whole-text shingle, not as a substring. For short eval
  * answers, pair this with exact/near dedup of the items themselves
  * ([[Dedup.exactText]], [[Dedup.minHashLsh]]) or run a second pass at a
  * smaller `n`.
  */
object Decontaminate {

  /** Per-document count of distinct benchmark n-grams it contains
    * (documents with zero overlap are absent — filter or anti-join with
    * the result to drop contaminated docs).
    */
  def overlap(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def hashes(df: DataFrame) =
      df.select(explode(Dedup.shingles(col(textCol), n)).as("sh"))
        .select(xxhash64(col("sh")).as("h"))

    val d = docs
      .select(col(idCol).as("doc_id"), explode(Dedup.shingles(col(textCol), n)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    d.join(broadcast(hashes(benchmark).distinct()), "h")
      .groupBy("doc_id")
      .agg(countDistinct("h").as("n_contaminated_ngrams"))
  }

  /** Drop every document overlapping the benchmark by at least
    * `minOverlap` distinct n-grams.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    minOverlap: Int = 1, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val bad = overlap(docs, benchmark, n, idCol, textCol)
      .where(col("n_contaminated_ngrams") >= minOverlap)
      .select(col("doc_id").as(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
