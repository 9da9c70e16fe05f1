package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * DETERMINISTIC key (never rand() — safe under task retry, SPARK-38388).
  * The decision is made WITHOUT executing anything: the frame's ANALYZED
  * logical plan is walked down through narrow nodes (project / filter /
  * alias / union) to its file scans, and the relations' FileIndex bytes
  * drive both sides of the decision (the r17 probe was
  * `df.rdd.getNumPartitions`, which physically plans the probe input and,
  * on an exchange-rooted frame, forces AQE to finalize and EXECUTE the
  * upstream stages as extra jobs — the r17 ADVICE item):
  *
  *  - width = min(defaultParallelism, ceil(bytes / bytesPerTask)): a
  *    sub-`bytesPerTask` frame is left alone entirely (the r17 version
  *    forced a 32-way shuffle on sub-MB index/lookup frames and measurably
  *    LOST time on them at small scale), a big frame still fans out to
  *    every core;
  *  - the spread is skipped when the scan's own natural parallelism
  *    (Spark's split math: maxSplitBytes from maxPartitionBytes /
  *    openCostInBytes / minPartitionNum) already meets that width — a
  *    real-scale corpus has more splits than cores and passes through
  *    untouched, so no shuffle is added at 100 TB;
  *  - a frame that is NOT scan-rooted (aggregates, joins, windows or
  *    exchanges below it) is returned unchanged: its layout is already the
  *    product of a shuffle, and probing it cheaply is impossible — this
  *    enforces the scan-rooted usage contract structurally instead of by
  *    scaladoc.
  *
  * `bytesPerTask` is a per-call COMPUTE DENSITY quantum, not a cluster
  * constant: kernels whose per-byte cost is extreme (MinHash banding over
  * shingles, all-pairs cosine) pass [[HeavyBytesPerTask]] so even a few
  * hundred KB of compressed text fans out fully; ordinary tokenize/count
  * kernels use [[DefaultBytesPerTask]] (conf-overridable via
  * `spark.graft.spread.bytesPerTask`). Neither value depends on core
  * count or local mode — width scales with input bytes and is capped by
  * the cluster's own parallelism, and at real scale the natural-split skip
  * makes the quantum irrelevant.
  *
  * Downstream-math contract (unchanged from r17): only spread inputs whose
  * consumers are partition-layout-insensitive — per-row projections,
  * exact/count aggregates, min/max-by, deterministic top-k. Do NOT spread
  * inputs that feed row-sampling fits (limit-based k-means / PQ training
  * samples) — a different layout draws a different sample.
  */
private[graft] object Spread {

  /** Default compute quantum: one task per 64 KiB of scan (compressed)
    * bytes. Tokenize/explode/count kernels on columnar text run ~3-5×
    * expansion + regex per byte; below this a task finishes faster than
    * the shuffle bookkeeping that created it.
    */
  val DefaultBytesPerTask: Long = 64L * 1024

  /** Quantum for the densest kernels — 64-hash MinHash banding over
    * shingles, all-pairs cosine scoring — where r17 measured multi-second
    * single-core time on a sub-MB compressed corpus. One task per 16 KiB
    * keeps those fully fanned out at bench scale; at real scale the
    * natural-split skip governs either way.
    */
  val HeavyBytesPerTask: Long = 16L * 1024

  /** Total (bytes, fileCount) under the frame's scans, walking only
    * narrow nodes; None = not scan-rooted (leave the frame alone).
    * LocalRelations count as one "file" of their estimated size — a
    * driver-built frame can be spread for compute like a scan can.
    */
  private[ops] def scanFootprint(plan: LogicalPlan): Option[(Long, Long)] = plan match {
    case p: Project       => scanFootprint(p.child)
    case f: Filter        => scanFootprint(f.child)
    case a: SubqueryAlias => scanFootprint(a.child)
    case u: Union =>
      val parts = u.children.map(scanFootprint)
      if (parts.forall(_.isDefined))
        Some((parts.flatMap(_.map(_._1)).sum, parts.flatMap(_.map(_._2)).sum))
      else None
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        Some((fs.location.sizeInBytes, fs.location.inputFiles.length.toLong))
      case _ => None
    }
    case l: LocalRelation =>
      Some((l.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong, 1L))
    case _ => None
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / math.max(1L, b)

  def forCompute(df: DataFrame, key: Column,
                 bytesPerTask: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    scanFootprint(df.queryExecution.analyzed) match {
      case None => df
      case Some((bytes, nFiles)) =>
        val quantum =
          if (bytesPerTask > 0) bytesPerTask
          else spark.conf.get("spark.graft.spread.bytesPerTask",
            DefaultBytesPerTask.toString).toLong
        val width = math.min(p.toLong, ceilDiv(bytes, quantum)).toInt
        if (width <= 1) df
        else {
          // Spark's own split sizing: how many scan tasks this input gets
          // WITHOUT any repartition. openCost charges each file its open
          // overhead, exactly like FilePartition.maxSplitBytes.
          val conf = spark.sessionState.conf
          val openCost = conf.filesOpenCostInBytes
          val minPartNum = conf.filesMinPartitionNum.getOrElse(p)
          val withOpen = bytes + nFiles * openCost
          val maxSplit = math.min(conf.filesMaxPartitionBytes,
            math.max(openCost, withOpen / math.max(1, minPartNum)))
          val natural = ceilDiv(withOpen, maxSplit)
          if (natural >= width) df else df.repartition(width, key)
        }
    }
  }
}
