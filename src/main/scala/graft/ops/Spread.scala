package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive input spreading for CPU-bound kernels — the compute-side
  * face of the optimization guide's "input skew: one huge unsplittable
  * file" case (§2.5). Spark sizes scan splits and AQE-coalesced shuffle
  * partitions by BYTES, which under-provisions kernels whose cost per byte
  * is extreme (64-hash MinHash banding, shingling, cosine scoring,
  * segment blocking): a corpus that arrives as one small-but-dense parquet
  * file runs those kernels on ONE core while the rest of the cluster
  * idles.
  *
  * [[forCompute]] hash-repartitions the input on a caller-chosen
  * DETERMINISTIC key (never rand() — safe under task retry, SPARK-38388)
  * to the cluster's default parallelism, but ONLY when the planned
  * partition count is below it: a real-scale corpus already has more
  * splits than cores and passes through untouched, so no shuffle is added
  * at 100 TB. The added local shuffle moves exactly the operator's
  * (already-projected) input columns once.
  *
  * Usage contract:
  *  - call on SCAN-ROOTED operator inputs (probing the partition count of
  *    a plan with upstream exchanges forces AQE to finalize those stages);
  *  - downstream math must be partition-layout-insensitive: per-row
  *    projections, exact/count aggregates, min/max-by, deterministic
  *    top-k. Do NOT spread inputs that feed row-sampling fits
  *    (limit-based k-means / PQ training samples) — a different layout
  *    draws a different sample.
  */
private[graft] object Spread {
  def forCompute(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, key)
  }
}
