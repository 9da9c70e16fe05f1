package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline. Every family is
  * bucketed — candidates are only ever generated inside small buckets
  * (band buckets, simhash chunks, hyperplane buckets), never via all-pairs
  * comparison, so each scales as O(n · k / #buckets), not O(n²), and the
  * only shuffles are hash-partitions on bucket keys.
  */
object Dedup {

  /** Exact dedup: keep the first row (lowest `orderCol`) per distinct value
    * of `keyCols`. One shuffle on the md5/key, map-side combine free via
    * window-on-hash; equivalent semantics to
    * `ROW_NUMBER() OVER (PARTITION BY key ORDER BY ord) = 1`.
    */
  def exact(df: DataFrame, keyCols: Seq[Column], orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact text dedup on md5(text), keep lowest id. */
  def exactText(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    exact(docs, Seq(md5(col(textCol))), col(idCol))

  // ------------------------------------------------------------- MinHash-LSH

  /** Word n-gram shingles of a text column (distinct). */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val ws = split(textCol, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(ws) - n, lit(0))),
      i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  /** MinHash signature: for each of `numHashes` hash families, the min over
    * the shingle set of `xxhash64(shingle, seed)`. Computed entirely inside
    * one codegen'd projection — no explode, no shuffle; cost is
    * O(shingles × numHashes) per row.
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleCol, sh => xxhash64(sh, s))))

  /** MinHash-LSH near-duplicate candidate pairs, verified by exact n-gram
    * Jaccard. Pipeline: shingle → signature (projection) → explode one row
    * per band → shuffle on (band, bandHash) → within-bucket self-join →
    * Jaccard verify on the surviving pairs only.
    *
    * `maxBucket` caps degenerate buckets (e.g. empty/boilerplate docs that
    * all collide): a bucket with more than `maxBucket` docs is dropped
    * rather than joined quadratically — the standard skew guard for LSH at
    * scale.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    */
  def minHashLsh(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
                 threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))

    val banded = sig.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)
            .as("bhash")))).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bhash"))

    // Skew guard: drop pathological buckets before the self-join.
    val sized = banded.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bhash"))))
      .where(col("bucket_n") <= maxBucket)

    val a = sized.select(col("band"), col("bhash"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sized.select(col("band"), col("bhash"), col("id").as("id_b"), col("sh").as("sh_b"))
    val pairs = a.join(b, Seq("band", "bhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    jaccardVerify(pairs, threshold)
  }

  /** Exact n-gram Jaccard over candidate pairs carrying their shingle sets:
    * |A∩B| / |A∪B| ≥ threshold.
    */
  def jaccardVerify(pairs: DataFrame, threshold: Double): DataFrame =
    pairs.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Drop near-duplicates: remove every doc that has a verified duplicate
    * with a smaller id (keep-first within each duplicate cluster; transitive
    * chains collapse to their minimum over repeated application — single
    * pass is the standard large-scale approximation).
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // ----------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token array: per-token 64-bit hashes vote ±1 on
    * each bit; the sign vector packs into a long. Pure columnar lambda
    * pipeline (aggregate + zip_with) — no UDF, no shuffle.
    */
  def simHash64(tokens: Column): Column = {
    val votes = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: docs are bucketed by each of the four 16-bit
    * chunks of their simhash (two near-identical docs differ in ≤3 bits ⇒
    * at least one chunk matches); within-bucket pairs are verified by
    * Hamming distance ≤ `maxHamming`. Shuffle key = (chunk index, chunk).
    */
  def simHashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
      simHash64(split(col(textCol), " ")).as("sim"))
    val chunked = hashed.select(col("id"), col("sim"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("j"), call_function("shiftright", col("sim"), j * 16).bitwiseAND(0xFFFFL).as("chunk")))).as("c"))
      .select(col("id"), col("sim"), col("c.j"), col("c.chunk"))
    val sized = chunked.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("j"), col("chunk"))))
      .where(col("bucket_n") <= maxBucket)
    val a = sized.select(col("j"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = sized.select(col("j"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("j", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // ----------------------------------------------- embedding-cosine near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold, bucketed by
    * random-hyperplane LSH signatures (see [[Similarity.hyperplaneSig]]) so
    * candidate generation is within-bucket only.
    */
  def embeddingNearDup(embs: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
                       threshold: Double = 0.95, planes: Int = 12, tables: Int = 4,
                       maxBucket: Int = 2000): DataFrame = {
    val withSig = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", Similarity.l2Norm(col("v")))
      .where(col("norm") > 0)
      .select(col("id"), col("v"), col("norm"),
        explode(Similarity.hyperplaneSigs(col("v"), planes, tables)).as("tb"))
      .select(col("id"), col("v"), col("norm"), col("tb.t"), col("tb.sig"))
    val sized = withSig.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("t"), col("sig"))))
      .where(col("bucket_n") <= maxBucket)
    val a = sized.select(col("t"), col("sig"), col("id").as("id_a"), col("v").as("v_a"), col("norm").as("n_a"))
    val b = sized.select(col("t"), col("sig"), col("id").as("id_b"), col("v").as("v_b"), col("norm").as("n_b"))
    a.join(b, Seq("t", "sig"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
