package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export: the last step of a data pipeline — the curated
  * corpus leaves the lakehouse as `numShards` shard files in a
  * pseudo-random, SEED-REPRODUCIBLE order. Data order affects training
  * dynamics, so a re-run (or a resumed export) must produce the
  * identical shard assignment and the identical within-shard sequence —
  * nothing here may depend on partitioning, task scheduling or input
  * file order.
  *
  * Shape at 100 TB: one deterministic hash per row decides BOTH the
  * shard (`hash % numShards`) and the within-shard position (sort by
  * `(hash, key)` — the key tiebreak makes equal hashes stable) — ONE
  * hash shuffle (`repartition(numShards, shard)`) plus a
  * partition-local sort; no global sort, no skew beyond hash variance.
  * `partitionBy(shard)` then writes each shard's rows as exactly one
  * file in sorted order (a shard's rows land in exactly one task).
  *
  * The default order hash is Spark's native `xxhash64(key, seed)`
  * (codegen, 64-bit). Pass `orderHash` to override — e.g. the
  * multiplicative-mod hash [[replayableHash]] that plain SQL (and the
  * DuckDB oracle) reproduces exactly.
  */
object ShardExport {

  /** A seeded order hash expressible in ANY SQL dialect (DuckDB-replayable
    * for the correctness oracle): `((key mod 100003) * 2654435761 + seed)
    * mod 1000000007`. Knuth's multiplicative constant; the pre-mod keeps
    * every intermediate far from bigint overflow (ANSI mode would throw).
    */
  def replayableHash(key: Column, seed: Long): Column =
    (pmod(key, lit(100003L)) * lit(2654435761L) + lit(seed)) % lit(1000000007L)

  /** The shard/order assignment frame: input columns plus `shard` and
    * `ord` — exposed separately so callers (and the oracle) can inspect
    * the assignment without writing files.
    */
  def assign(df: DataFrame, numShards: Int, seed: Long,
             keyCol: String = "doc_id",
             orderHash: Option[Column] = None): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val h = orderHash.getOrElse(xxhash64(col(keyCol), lit(seed)))
    df.withColumn("ord", h)
      .withColumn("shard", pmod(col("ord"), lit(numShards.toLong)))
  }

  /** Murmur3-preimage token per shard: `tokenFor(s)` is the smallest
    * non-negative long whose Spark HashPartitioning hash lands in
    * partition `s` of `numShards` (partition id = pmod(murmur3(key), n)).
    * Repartitioning on `token(shard)` therefore maps each shard to its
    * OWN task — a bijection. A plain `repartition(n, col("shard"))`
    * hash-partitions the shard id itself: balls-into-bins collisions put
    * ~4–5 shards in the worst task at 1024 shards, making the export tail
    * run 4–5× the mean while that task also buffers several sorted shards
    * (the r16 straggler). Found by direct search — coupon-collector
    * O(n log n) cheap driver-side hash evaluations, done once per export.
    */
  private[graft] def shardTokens(numShards: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val tokens = new Array[Long](numShards)
    val filled = new Array[Boolean](numShards)
    var remaining = numShards
    var x = 0L
    while (remaining > 0) {
      val h = Murmur3Hash(Seq(Literal(x)), 42).eval().asInstanceOf[Int]
      val p = ((h % numShards) + numShards) % numShards
      if (!filled(p)) { filled(p) = true; tokens(p) = x; remaining -= 1 }
      x += 1
    }
    tokens
  }

  /** The exact frame [[exportShards]] writes: shard→task made BIJECTIVE
    * by repartitioning on the shard's murmur3-preimage token, rows sorted
    * within each task. Exposed for the task-layout spec.
    */
  private[graft] def shardLayout(assigned: DataFrame, numShards: Int,
                               keyCol: String): DataFrame = {
    val tokens = shardTokens(numShards)
    assigned
      .repartition(numShards,
        element_at(typedLit(tokens.toSeq), col("shard").cast("int") + 1))
      .sortWithinPartitions(col("shard"), col("ord"), col(keyCol))
  }

  /** Export `df` as `numShards` parquet shards under `outDir`
    * (`shard=N/part-….parquet`, ONE file per shard, rows in seeded
    * pseudo-random order). Returns the assignment frame it wrote.
    */
  def exportShards(df: DataFrame, outDir: String, numShards: Int, seed: Long,
                   keyCol: String = "doc_id",
                   orderHash: Option[Column] = None): DataFrame = {
    val assigned = assign(df, numShards, seed, keyCol, orderHash)
    shardLayout(assigned, numShards, keyCol)
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy("shard")
      .parquet(outDir)
    assigned
  }
}
