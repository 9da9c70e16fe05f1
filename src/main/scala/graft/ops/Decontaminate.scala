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

    // shingling is the CPU-heavy kernel here — spread a narrow input
    // across the cluster (identity at real scale, guide §2.5)
    val d = Spread.forCompute(docs.select(col(idCol), col(textCol)), col(idCol),
        Spread.HeavyBytesPerTask)
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

  /** NEAR-duplicate decontamination: training docs whose word-shingle set
    * sits at n-gram Jaccard ≥ `threshold` against ANY benchmark item —
    * the fuzzy complement of [[overlap]]'s exact n-gram hit (a lightly
    * paraphrased eval item shares few exact 8-grams but keeps a high
    * 3-shingle Jaccard).
    *
    * Cross-frame LSH, never a corpus self-join: both sides band their
    * MinHash signatures, the benchmark's banded form (tiny by contract)
    * BROADCASTS against the corpus bands — candidate generation is
    * map-side, only the surviving (doc, bench) candidate pairs shuffle —
    * and exact Jaccard verifies each candidate (benchmark shingles
    * broadcast back for the verify too). With `bands == numHashes`
    * (saturated, rows-per-band = 1) a true pair at Jaccard j is missed
    * with probability (1-j)^numHashes — ≤ 2e-45 at j ≥ 0.8, numHashes 64
    * — which is what lets the oracle replay the output exactly.
    *
    * Returns `(doc_id, bench_id, jaccard)` for every qualifying pair.
    */
  def fuzzyOverlap(docs: DataFrame, benchmark: DataFrame,
                   idCol: String = "doc_id", benchIdCol: String = "bench_id",
                   textCol: String = "text", numHashes: Int = 64,
                   bands: Int = 16, shingleSize: Int = 3,
                   threshold: Double = 0.8): DataFrame = {
    // The 64-hash MinHash banding below is the CPU-heavy kernel of this
    // operator: spread narrow inputs across the cluster before computing
    // shingles (identity at real scale — guide §2.5's unsplittable-input
    // case; the benchmark side's banding otherwise runs single-task
    // inside its broadcast build).
    val dSh = Spread.forCompute(docs.select(col(idCol), col(textCol)), col(idCol),
        Spread.HeavyBytesPerTask)
      .select(col(idCol).as("doc_id"),
        Dedup.shingles(col(textCol), shingleSize).as("sh_d"))
    val bSh = Spread.forCompute(
        benchmark.select(col(benchIdCol), col(textCol)), col(benchIdCol),
        Spread.HeavyBytesPerTask)
      .select(col(benchIdCol).as("bench_id"),
        Dedup.shingles(col(textCol), shingleSize).as("sh_b"))
    def banded(df: DataFrame, id: String, sh: String) = df.select(col(id),
      posexplode(graft.functions.SketchFunctions.minHashBands(
        col(sh), numHashes, bands)).as(Seq("band", "bhash")))
    val cands = banded(dSh, "doc_id", "sh_d")
      .join(broadcast(banded(bSh, "bench_id", "sh_b")), Seq("band", "bhash"))
      .select("doc_id", "bench_id").distinct()
    cands.join(dSh, "doc_id").join(broadcast(bSh), "bench_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_d"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_d"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("bench_id"), col("jaccard"))
  }

  /** Drop every training doc near-duplicating any benchmark item (see
    * [[fuzzyOverlap]]).
    */
  def decontaminateFuzzy(docs: DataFrame, benchmark: DataFrame,
                         idCol: String = "doc_id", benchIdCol: String = "bench_id",
                         textCol: String = "text", numHashes: Int = 64,
                         bands: Int = 16, shingleSize: Int = 3,
                         threshold: Double = 0.8): DataFrame = {
    val bad = fuzzyOverlap(docs, benchmark, idCol, benchIdCol, textCol,
      numHashes, bands, shingleSize, threshold)
      .select(col("doc_id").as(idCol)).distinct()
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
