package graft.core

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Thrown when a dataset lacks the graft sidecar and the caller disabled
  * reading foreign datasets (the reference's `MissingS3ParqMetadata`,
  * fetch_parq.py:649).
  */
final class MissingGraftMetadata(msg: String) extends RuntimeException(msg)

/** Partition-pruned dataset reader + partition-value introspection — the
  * Spark-native re-expression of the reference's fetch surface
  * (s3parq fetch_parq.py:49-330).
  *
  * Scale design:
  *  - `fetch` compiles filters to a predicate over partition columns only;
  *    Catalyst evaluates it against the partition spec (`PartitionFilters`
  *    in the scan node), so non-matching hive directories are never listed
  *    as splits, let alone read — the reference prunes S3 keys the same
  *    way, driver-side (fetch_parq.py:450).
  *  - the `get_*_partition_values` family walks the directory tree to
  *    partition depth only (no data files opened, no Spark jobs): O(#dirs)
  *    driver work, exactly like the reference's key parsing
  *    (fetch_parq.py:391) but without paging every object.
  *  - `fetchDiff` computes the value diff from listings and then does ONE
  *    pruned scan of the differing partitions — no join, no shuffle.
  */
object Fetch {

  // ---------------------------------------------------------------- fetch

  /** Filtered, partition-pruned read of a graft dataset (fetch_parq.py:152).
    *
    * Partition columns are restored to their logical types from the sidecar
    * and columns are returned in original publish order — the analogue of
    * the reference's partition repopulation (fetch_parq.py:564). Datasets
    * without a sidecar are readable when `acceptNotGraft` (Spark's inferred
    * types apply; filters are ignored, matching the reference, which only
    * prunes via its own metadata — fetch_parq.py:194-198).
    */
  def fetch(spark: SparkSession, root: String, filters: Seq[ColFilter] = Nil,
            acceptNotGraft: Boolean = true): DataFrame = {
    Filters.validateRules(filters)
    DatasetMeta.read(spark, root) match {
      case None =>
        if (!acceptNotGraft)
          throw new MissingGraftMetadata(
            s"Dataset at $root is missing graft metadata; enable acceptNotGraft to read it anyway.")
        if (!hasData(spark, root)) spark.emptyDataFrame
        else spark.read.parquet(root)
      case Some(sidecarMeta) =>
        // A VERSIONED root is read through its commit log: only the latest
        // snapshot's files are planned, so logically-overwritten files
        // (kept on disk for time travel) never resurrect rows — and the
        // COMMIT ENTRY's schema governs, not the sidecar's (a publish that
        // crashed after writing the sidecar but before committing must not
        // leak its half-published schema into reads of the old snapshot).
        val snapshot = Versions.latestVersion(spark, root)
          .map(v => Versions.snapshotFullAt(spark, root, v))
        val meta = snapshot.map(_._2).getOrElse(sidecarMeta)
        // Hidden partitioning ([[Transforms]]): filters on a transform's
        // SOURCE column split off here — they compile to a conservative
        // derived-partition predicate (pruning) plus the exact row-level
        // predicate, and the derived columns are dropped from the result.
        val transforms = Transforms.read(spark, root)
        val hidden: Set[String] = transforms.map(_.name).toSet
        val outSchema =
          if (hidden.isEmpty) meta.schema
          else StructType(meta.schema.fields.filterNot(f => hidden(f.name)))
        val (pFilters, rawFilters) =
          if (transforms.isEmpty) (filters, Seq.empty[ColFilter])
          else filters.partition(f => meta.partitions.contains(f.partition))
        // spec-evolved snapshots: a raw filter may target ANY epoch's
        // source column (e.g. the timestamp the OLD spec partitioned by
        // after evolving to a bucket over a different column) — validate
        // against the schema, not the current spec's source set; epochs
        // whose spec can't rewrite a filter just don't prune on it
        val evolvedSigs = snapshot.map(_._1.map(r =>
          r.split('/').dropRight(1).map(_.takeWhile(_ != '=')).mkString("/"))
          .distinct).getOrElse(Nil)
        val specEvolved = transforms.nonEmpty && evolvedSigs.size > 1
        Filters.validateAgainst(meta, pFilters)
        if (specEvolved) Filters.validateDataFilters(
          DatasetMeta(outSchema, Nil), rawFilters)
        else Transforms.validateRaw(meta, transforms, rawFilters)
        // versioned roots answer from the snapshot (a shallow clone has
        // NO physical data of its own — only inherited refs); the
        // physical-listing emptiness check only gates unversioned reads
        if (snapshot.isEmpty && !hasData(spark, root))
          return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
        // PARTITION-SPEC EVOLUTION: a snapshot mixing layout epochs
        // (files written under different transform specs) takes its own
        // path — per-epoch DRIVER-side file pruning (each file's own
        // dirs name its spec; the raw filters rewrite under THAT spec
        // and evaluate against the path values on a local frame, zero
        // data read), then one epoch-grouped scan via Versions.readFiles
        // with the exact row predicate on top. Untouched partitions of
        // every epoch stay unread, exactly like the single-epoch path.
        snapshot.foreach { case (relFiles, _, dvs) =>
          val bySig = relFiles.groupBy(r => r.split('/').dropRight(1)
            .map(_.takeWhile(_ != '=')).mkString("/"))
          if (transforms.nonEmpty && bySig.size > 1) {
            require(pFilters.isEmpty,
              "on a spec-evolved dataset filter the transform SOURCE " +
                "columns (derived partition names change across epochs)")
            val kept = bySig.toSeq.sortBy(_._1).flatMap { case (_, fls) =>
              val epochTs = Transforms.specOfPath(fls.head)
              Transforms.pruneFilesBySpec(spark, fls, epochTs, outSchema,
                rawFilters)
            }
            if (kept.isEmpty)
              return spark.createDataFrame(
                spark.sparkContext.emptyRDD[Row], outSchema)
            val rowPred = Filters.compileOn(
              c => meta.schema(c).dataType, rawFilters)
            val df0 = Versions.readFiles(spark, root, kept, meta, dvs = dvs)
            val df = rowPred.map(df0.where).getOrElse(df0)
            return df.select(outSchema.fieldNames.toIndexedSeq.map(col): _*)
          }
        }
        // Read with the recorded schema: partition-type inference would
        // otherwise corrupt string partition values that look numeric
        // ("0001" → int 1 → restored as "1") and make filters on them
        // silently match nothing. basePath keeps hive partition columns
        // and Catalyst partition pruning working on an explicit file list.
        val pred = (Filters.compile(meta, pFilters) ++
          Transforms.compileRaw(meta, transforms, rawFilters)).reduceOption(_ && _)
        def withPred(df: DataFrame): DataFrame = pred.map(df.where).getOrElse(df)
        // versioned scans read under PHYSICAL names (rename/drop are
        // metadata-only commits; partition columns are never mapped, so
        // the compiled partition predicate applies unchanged)
        // one read per basePath group (the root itself, plus each external
        // source base for shallow-clone-inherited refs); metadata columns
        // for the DV probe materialize per group — they resolve only
        // against a scan, never across a union
        def scanOf(relFiles: Seq[String], withMeta: Boolean = false): DataFrame =
          Versions.scanGroups(root, relFiles).map { case (base, abs) =>
            val raw = spark.read.option("basePath", base)
              .schema(meta.physSchema).parquet(abs: _*)
            if (!withMeta) raw
            else raw.withColumn(FileTmp, col("_metadata.file_path"))
                    .withColumn(IdxTmp, col("_metadata.row_index"))
          }.reduce(_.unionByName(_))
        // Deletion vectors apply AFTER the partition filter (fewer rows
        // to probe) and BEFORE the restoring select — and ONLY to the
        // files the snapshot's DV refs actually cover: the uncovered leg
        // scans untouched (no metadata column, no join), so a snapshot
        // under sparse mutation reads at full speed everywhere a DV
        // doesn't reach.
        val undeleted = snapshot match {
          case Some((relFiles, _, dvs)) =>
            if (relFiles.isEmpty)
              return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
            val covered = dvs.flatMap(_.files).toSet
            val (cov, uncov) = relFiles.partition(covered)
            val uncovLeg = if (uncov.isEmpty) None else Some(withPred(scanOf(uncov)))
            val covLeg = if (cov.isEmpty) None else Some(
              applyDvs(spark, root, withPred(scanOf(cov, withMeta = true)), dvs))
            (uncovLeg ++ covLeg).reduce(_.unionByName(_))
          case None => withPred(spark.read.schema(meta.schema).parquet(root))
        }
        // Cast-and-reorder AFTER the filter: the predicate stays a pure
        // partition-column expression the scan can prune on. Physical
        // names alias back to logical here. Transform-derived partition
        // columns are layout, not data — they stay hidden.
        val restored = outSchema.fields.toIndexedSeq.map(f =>
          col(meta.physName(f.name)).cast(f.dataType).as(f.name))
        undeleted.select(restored: _*)
    }
  }

  /** [[fetch]] plus DATA-column predicates served by the file-level
    * min/max index ([[StatsIndex]]): the driver intersects every data
    * filter with each file's recorded range and hands the scan ONLY the
    * files that might match — predicates on non-partition columns skip
    * whole files before any task launches, not just row groups inside
    * them. Exactness is unconditional: the same predicate is re-applied
    * row-level (and pushed to parquet), and files the index doesn't know
    * (no sidecar, appended later, un-indexed column) are always scanned.
    * Pair with a z-order publish on the filtered columns for
    * multiplicative effect — clustering is what makes the file ranges
    * narrow enough to skip.
    */
  def fetchIndexed(spark: SparkSession, root: String,
                   filters: Seq[ColFilter] = Nil,
                   dataFilters: Seq[ColFilter] = Nil): DataFrame = {
    Filters.validateRules(filters ++ dataFilters)
    // versioned roots: the commit entry's schema governs (as in fetch) and
    // candidateFiles plans from the version-log-aware listing, so stats
    // rows of overwritten/mutation-removed files never resurrect ghosts
    val full = Versions.latestVersion(spark, root)
      .map(v => Versions.snapshotFullAt(spark, root, v))
    val meta = full.map(_._2).getOrElse(requireMeta(spark, root))
    // Hidden partitioning: source-column filters prune via the derived
    // partition columns and re-apply row-level, exactly as in [[fetch]]
    val transforms = Transforms.read(spark, root)
    val hidden: Set[String] = transforms.map(_.name).toSet
    val outSchema =
      if (hidden.isEmpty) meta.schema
      else StructType(meta.schema.fields.filterNot(f => hidden(f.name)))
    // spec-evolved snapshots (mixed layout epochs): skip stats planning
    // conservatively and route through [[fetch]]'s per-epoch pruning
    // (which validates the filters itself), re-applying the data filters
    // row-level — exactness is unconditional either way, this only
    // forgoes file skipping on data columns
    full.foreach { case (relFiles, _, _) =>
      val sigs = relFiles.map(r => r.split('/').dropRight(1)
        .map(_.takeWhile(_ != '=')).mkString("/")).distinct
      if (transforms.nonEmpty && sigs.size > 1) {
        Filters.validateDataFilters(
          DatasetMeta(StructType(meta.schema.fields.filterNot(f =>
            transforms.map(_.name).toSet(f.name))), Nil), dataFilters)
        val base = fetch(spark, root, filters)
        return Filters.compileOn(c => meta.schema(c).dataType, dataFilters)
          .map(base.where).getOrElse(base)
      }
    }
    val (pFilters, rawFilters) =
      if (transforms.isEmpty) (filters, Seq.empty[ColFilter])
      else filters.partition(f => meta.partitions.contains(f.partition))
    Filters.validateAgainst(meta, pFilters)
    Transforms.validateRaw(meta, transforms, rawFilters)
    Filters.validateDataFilters(meta, dataFilters)
    // see fetch: a shallow clone's data is inherited refs, not a listing
    if (full.isEmpty && !hasData(spark, root))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    // A name-mapped dataset's stats/bloom sidecars and data files are
    // keyed by PHYSICAL column names: probe and scan in physical terms
    // (filters validated against the LOGICAL schema above), restore
    // logical names at the end. Identity when no mapping is in force.
    val physMeta =
      if (meta.colMap.isEmpty) meta
      else meta.copy(schema = meta.physSchema, colMap = Map.empty)
    val physDataFilters =
      dataFilters.map(f => f.copy(partition = meta.physName(f.partition)))
    val files = StatsIndex.candidateFiles(spark, root, physMeta, physDataFilters)
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    val pred = Seq(
      Filters.compile(meta, pFilters),
      Transforms.compileRaw(meta, transforms, rawFilters),
      Filters.compileOn(c => physMeta.schema(c).dataType, physDataFilters)).flatten
      .reduceOption(_ && _)
    def withPred(df: DataFrame): DataFrame = pred.map(df.where).getOrElse(df)
    // candidateFiles returns absolute paths; back to the ref form so
    // scanGroups can split clone-inherited external files onto their own
    // basePath legs (see [[fetch]]'s scanOf)
    val refs = Versions.relativizeOrExternal(spark, root, files)
    def scanOf(rs: Seq[String], withMeta: Boolean = false): DataFrame =
      Versions.scanGroups(root, rs).map { case (base, abs) =>
        val raw = spark.read.option("basePath", base)
          .schema(meta.physSchema).parquet(abs: _*)
        if (!withMeta) raw
        else raw.withColumn(FileTmp, col("_metadata.file_path"))
                .withColumn(IdxTmp, col("_metadata.row_index"))
      }.reduce(_.unionByName(_))
    val dvs = full.map(_._3).getOrElse(Nil)
    // Only files a DV ref covers pay the anti-join probe (see [[fetch]])
    val undeleted =
      if (dvs.isEmpty) withPred(scanOf(refs))
      else {
        val covered = dvs.flatMap(_.files).toSet
        val (cov, uncov) = refs.partition(covered)
        val uncovLeg =
          if (uncov.isEmpty) None else Some(withPred(scanOf(uncov)))
        val covLeg =
          if (cov.isEmpty) None
          else Some(applyDvs(spark, root, withPred(scanOf(cov, withMeta = true)), dvs))
        (uncovLeg ++ covLeg).reduce(_.unionByName(_))
      }
    val restored = outSchema.fields.toIndexedSeq.map(f =>
      col(meta.physName(f.name)).cast(f.dataType).as(f.name))
    undeleted.select(restored: _*)
  }

  private val FileTmp = "__graft_meta_file"
  private val IdxTmp = "__graft_meta_idx"

  /** Anti-join a filtered scan of DV-COVERED files against the live
    * deletion vectors (no-op when there are none). Callers must route
    * only covered files here — uncovered files skip the probe entirely —
    * and must pass the scan with [[FileTmp]]/[[IdxTmp]] metadata columns
    * ALREADY materialized (per scan leg: `_metadata` resolves only
    * against a scan, and a clone snapshot's scan can be a union of
    * basePath legs). The columns are the probe key and never escape (the
    * caller's restoring select keeps only schema columns).
    */
  private def applyDvs(spark: SparkSession, root: String, scanWithMeta: DataFrame,
                       dvs: Seq[DvRef]): DataFrame = {
    if (dvs.isEmpty) return scanWithMeta
    Versions.withDvApplied(spark, root, scanWithMeta,
      dvs, FileTmp, IdxTmp).drop(FileTmp, IdxTmp)
  }

  /** Rows of `inputRoot` whose `partition` value does not occur in
    * `comparisonRoot` (vice versa when `reverse`) — fetch_parq.py:233.
    * Listing-only diff, then one pruned scan.
    */
  def fetchDiff(spark: SparkSession, inputRoot: String, comparisonRoot: String,
                partition: String, reverse: Boolean = false): DataFrame = {
    val comparisonValues = getAllPartitionValues(spark, comparisonRoot, partition)
    val diffValues = getDiffPartitionValues(spark, inputRoot, partition, comparisonValues, reverse)
    val filters = Seq(ColFilter(partition, "==", diffValues))
    if (reverse) fetch(spark, comparisonRoot, filters)
    else fetch(spark, inputRoot, filters)
  }

  /** The incremental-load idiom composed: fetch only the rows of the
    * maximum partition value (the reference's get_max + fetch-== pattern
    * its docs describe for "latest batch" loads). Listing-only max, then
    * one pruned scan.
    */
  def fetchLatest(spark: SparkSession, root: String, partition: String): DataFrame =
    getMaxPartitionValue(spark, root, partition) match {
      case Some(v) => fetch(spark, root, Seq(ColFilter(partition, "==", Seq(v))))
      case None => fetch(spark, root)
    }

  /** Compact a dataset: rewrite into `dest` with the same partitioning but
    * target-size files (the small-file repair every long-lived 100 TB
    * dataset needs — publish's sizing applies on the way out). Writes to a
    * NEW root; swapping roots is the caller's (atomic) move.
    */
  def compact(spark: SparkSession, src: String, dest: String): Seq[String] = {
    val meta = requireMeta(spark, src)
    Publish.publish(spark, fetch(spark, src), dest, meta.partitions)
  }

  /** Selective compaction: rewrite ONLY the fragment files (smaller than
    * `smallBytesThreshold`), copying healthy files into `dest` verbatim.
    *
    * A long-lived incrementally-appended dataset accumulates small files
    * where each append's tail lands; full [[compact]] re-encodes ALL of it
    * — at 100 TB that's reading, shuffling and re-compressing 100 TB to
    * fix maybe 2% of the bytes. This pass re-encodes only the fragments
    * (one distributed read of just those files, re-published through the
    * normal sizing/routing path) and moves every already-good file as a
    * byte copy — pure IO, no decode, and on an object store a server-side
    * copy. Returns (copiedCount, rewrittenCount). A stats index on the
    * source is rebuilt on the destination (copied files keep their stats
    * validity, rewritten ones need fresh rows anyway).
    */
  def compactSmallFiles(spark: SparkSession, src: String, dest: String,
                        smallBytesThreshold: Long = Publish.TargetFileBytes / 2): (Int, Int) =
    // Snapshot semantics on src (appends landing mid-compaction are not
    // carried — re-run to pick them up); the writer lock is taken on the
    // DESTINATION being built, so a concurrent append to dest serializes
    // against the copy + stats-migrate critical section.
    DatasetLock.withLock(spark, dest) {
      compactSmallFilesInner(spark, src, dest, smallBytesThreshold)
    }

  private def compactSmallFilesInner(spark: SparkSession, src: String, dest: String,
                                     smallBytesThreshold: Long): (Int, Int) = {
    val meta = requireMeta(spark, src)
    val sized = Publish.listDataFilesWithSize(spark, src)
    val (healthy, fragments) = sized.partition(_._2 >= smallBytesThreshold)
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = new Path(src).getFileSystem(conf)
    val destFs = new Path(dest).getFileSystem(conf)
    // EPOCH POLARITY (r16 audit): this pass byte-copies healthy files at
    // their ORIGINAL paths and re-reads fragments by dir layout — only
    // sound when every file spells the CURRENT spec. A spec-evolved src
    // (stale/mixed layouts) must go through the versioned OPTIMIZE
    // ([[Versions.compactSmall]]), whose snapshot read re-derives the
    // current spec row-level. Refuse loudly rather than copy a stale
    // layout into a root with no version log to interpret it. A
    // current-epoch transformed src stays supported — its transform
    // sidecar is carried to dest so hidden partitioning survives.
    val srcTs = Transforms.read(spark, src)
    if (srcTs.nonEmpty) {
      val curSig = meta.partitions.mkString("/")
      val srcQual = srcFs.makeQualified(new Path(src)).toUri.getPath
      val stale = sized.map(_._1).exists { f =>
        f.stripPrefix(srcQual).stripPrefix("/").split('/').dropRight(1)
          .map(_.takeWhile(_ != '=')).mkString("/") != curSig
      }
      require(!stale,
        s"compactSmallFiles on $src: file layouts predate the current " +
          "partition spec (spec evolution) — use the versioned OPTIMIZE " +
          "(Versions.compactSmall), which re-derives the current spec")
      Transforms.write(spark, dest, srcTs)
    }

    val rewritten: Seq[String] =
      if (fragments.nonEmpty) {
        // re-encode just the fragments through the normal publish path
        // (sizing, salted routing); basePath keeps their partition values,
        // which the file-list read appends LAST regardless of their sidecar
        // position — reorder by name so dest records the original schema
        val fragDf = spark.read.option("basePath", src).schema(meta.schema)
          .parquet(fragments.map(_._1): _*)
          .select(meta.schema.fieldNames.toIndexedSeq.map(col): _*)
        Publish.publish(spark, fragDf, dest, meta.partitions)
      } else {
        DatasetMeta.write(spark, dest, meta)
        Nil
      }
    // byte-copy the healthy files, preserving their partition paths; the
    // writer's part-<task>-<uuid> names cannot collide with fresh ones.
    // Qualify the root exactly as the listing qualified the files — a
    // relative `src` would otherwise never strip and the copies would
    // land at a bogus nested path under dest
    val srcRoot = srcFs.makeQualified(new Path(src)).toUri.getPath
    val destRoot = destFs.makeQualified(new Path(dest)).toUri.getPath
    val copied = healthy.map { case (f, _) =>
      val rel = f.stripPrefix(srcRoot).stripPrefix("/")
      val to = new Path(dest, rel)
      destFs.mkdirs(to.getParent)
      org.apache.hadoop.fs.FileUtil.copy(srcFs, new Path(f), destFs, to, false, conf)
      f -> s"$destRoot/$rel"
    }
    // Carry the index instead of rebuilding: byte-copied files keep their
    // stats rows (paths rewritten); only the re-encoded output pays a
    // fresh stats pass — the untouched 98% of a 100 TB dataset is never
    // re-read for its index.
    StatsIndex.read(spark, src).foreach { stats =>
      StatsIndex.migrateCompacted(spark, stats, dest, meta, copied, rewritten)
    }
    (healthy.size, fragments.size)
  }

  // ------------------------------------------------- listing introspection

  /** All distinct values of `partition`, correctly typed, in no guaranteed
    * order (fetch_parq.py:49). Directory listing only. An absent/empty
    * dataset yields Nil (fetch_parq.py:63).
    */
  def getAllPartitionValues(spark: SparkSession, root: String, partition: String): Seq[Any] = {
    if (allFiles(spark, root).isEmpty) return Nil
    val meta = requireMeta(spark, root)
    rawPartitionValues(spark, root, meta, partition)
      .map(parseValue(_, meta.partitionType(partition))).toSeq
  }

  /** Values of `partition` present in the dataset but not in
    * `valuesToDiff`; with `reverse`, values of `valuesToDiff` not present
    * in the dataset (fetch_parq.py:73). Typed set difference from listings.
    */
  def getDiffPartitionValues(spark: SparkSession, root: String, partition: String,
                             valuesToDiff: Seq[Any], reverse: Boolean = false): Seq[Any] = {
    // Absent/empty dataset (fetch_parq.py:92-98): nothing to diff against.
    if (allFiles(spark, root).isEmpty)
      return if (reverse) valuesToDiff.distinct else Nil
    val meta = requireMeta(spark, root)
    val dt = meta.partitionType(partition)
    val present: Set[Any] =
      rawPartitionValues(spark, root, meta, partition).map(parseValue(_, dt)).toSet
    val supplied: Set[Any] = valuesToDiff.map(normalize(_, dt)).toSet
    val diff = if (reverse) supplied -- present else present -- supplied
    diff.toSeq
  }

  /** Max value of a numeric/datetime partition; rejected for string/bool
    * partitions like the reference (fetch_parq.py:121,145).
    */
  def getMaxPartitionValue(spark: SparkSession, root: String, partition: String): Option[Any] = {
    if (allFiles(spark, root).isEmpty) return None
    val meta = requireMeta(spark, root)
    val dt = meta.partitionType(partition)
    dt match {
      case StringType | BooleanType =>
        throw new IllegalArgumentException(s"Max cannot be used on partition types of $dt")
      case _ => ()
    }
    val vals = rawPartitionValues(spark, root, meta, partition).map(parseValue(_, dt))
    if (vals.isEmpty) None else Some(vals.max(orderingFor(dt)))
  }

  /** All data-file paths of the dataset (fetch_parq.py:327). */
  def allFiles(spark: SparkSession, root: String): Seq[String] =
    Publish.listDataFiles(spark, root)

  /** Cheap emptiness probe: does the root contain any partition dir or
    * data file? First-level listing only — `fetch` must NOT pay a full
    * recursive file listing (O(#files) driver work at 100 TB) just to
    * special-case the empty dataset. Hidden entries (`_temporary`, `.`)
    * don't count as data in either form.
    */
  private[core] def hasData(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") &&
        (st.isDirectory || n.endsWith(".parquet"))
    }
  }

  // -------------------------------------------------------------- internals

  private def requireMeta(spark: SparkSession, root: String): DatasetMeta =
    DatasetMeta.read(spark, root).getOrElse(
      throw new MissingGraftMetadata(s"Dataset at $root is missing graft metadata."))

  /** Pool width for the parallel listing walk: listStatus against an
    * object store is a blocking HTTP call, so the fan-out wants far more
    * threads than cores — but bounded, and NOT the JVM-global pool
    * (starving unrelated driver work).
    */
  private val ListingParallelism = 32

  /** Distinct raw (unescaped string) values of one partition, by walking
    * the hive directory tree to that partition's depth. Never opens a
    * file. Each level's directories are listed IN PARALLEL (bounded pool):
    * on an object store every `listStatus` is an HTTP round trip, and a
    * dataset with thousands of first-level partitions would otherwise pay
    * them sequentially on the driver.
    */
  private def rawPartitionValues(spark: SparkSession, root: String,
                                 meta: DatasetMeta, partition: String): Set[String] = {
    import scala.collection.parallel.CollectionConverters._
    val depth = meta.partitions.indexOf(partition)
    require(depth >= 0, s"$partition is not a partition of the dataset at $root")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Set.empty
    // A stream-sink root's directory tree can contain partitions whose
    // only files belong to an uncommitted micro-batch, and a VERSIONED
    // root's tree keeps logically-overwritten files for time travel;
    // derive values from the COMMITTED listing (sink-log- and
    // version-log-aware) instead of walking dirs in both cases.
    if (fs.exists(new Path(rootPath, "_spark_metadata")) ||
        fs.exists(new Path(rootPath, Versions.DirName))) {
      val qualified = fs.makeQualified(rootPath).toUri.getPath
      val prefix = partition + "="
      val segs = Publish.listDataFiles(spark, root).map { f =>
        f.stripPrefix(qualified).stripPrefix("/").split('/')
          .find(_.startsWith(prefix))
          .map(seg => unescapePathName(seg.substring(prefix.length)))
      }
      // EPOCH POLARITY (r16 audit): on a spec-evolved dataset the
      // old-epoch files lack the CURRENT spec's dirs (evolution is
      // metadata-only) — a listing-derived value set would silently OMIT
      // their values, and a max would under-read. Listing-only
      // introspection cannot recover a derived value without the data;
      // refuse loudly rather than answer wrong.
      if (segs.exists(_.isEmpty))
        throw new IllegalStateException(
          s"partition values of '$partition' at $root are not derivable " +
            s"from listings: ${segs.count(_.isEmpty)} committed file(s) " +
            "predate the current partition spec (spec evolution is " +
            "metadata-only). Read the data (fetch + groupBy) or re-layout " +
            "via compact/OPTIMIZE first.")
      return segs.flatten.toSet - HiveDefaultPartition
    }
    val pool = new java.util.concurrent.ForkJoinPool(ListingParallelism)
    try {
      var dirs: Seq[Path] = Seq(rootPath)
      var values = Set.empty[String]
      meta.partitions.take(depth + 1).foreach { p =>
        val par = dirs.par
        par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
        val level = par.flatMap { d =>
          fs.listStatus(d).toIndexedSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith(p + "="))
            .map(st => unescapePathName(st.getPath.getName.substring(p.length + 1)) -> st.getPath)
        }.seq
        if (p == partition) values = level.map(_._1).toSet
        dirs = level.map(_._2)
      }
      values - HiveDefaultPartition
    } finally pool.shutdown()
  }

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Reverse of hive's path-name escaping — delegates to the exact routine
    * Spark's partitioned writer uses, so unescaping can never diverge from
    * how Publish's `partitionBy` escaped the value.
    */
  private[graft] def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** Parse a hive directory value string into the partition's logical type
    * (the analogue of the reference's `convert_type`, fetch_parq.py:283).
    */
  private[graft] def parseValue(raw: String, dt: DataType): Any = dt match {
    case StringType => raw
    case IntegerType => raw.toInt
    case LongType => raw.toLong
    case ShortType => raw.toShort
    case ByteType => raw.toByte
    case FloatType => raw.toFloat
    case DoubleType => raw.toDouble
    case BooleanType => raw.toBoolean
    case _: DecimalType => BigDecimal(raw)
    case DateType => java.sql.Date.valueOf(raw)
    case TimestampType | TimestampNTZType => Timestamp.valueOf(raw)
    case other => throw new IllegalArgumentException(s"Unsupported partition type $other")
  }

  /** Bring a user-supplied diff value onto the same typed footing as parsed
    * directory values (strings are parsed; natural values pass through).
    */
  private def normalize(v: Any, dt: DataType): Any = v match {
    case s: String if dt != StringType => parseValue(s, dt)
    case i: Int if dt == LongType => i.toLong
    case other => other
  }

  private def orderingFor(dt: DataType): Ordering[Any] = {
    val ord: Ordering[_] = dt match {
      case IntegerType => Ordering.Int
      case LongType => Ordering.Long
      case ShortType => Ordering.Short
      case ByteType => Ordering.Byte
      case FloatType => Ordering.Float.TotalOrdering
      case DoubleType => Ordering.Double.TotalOrdering
      case _: DecimalType => Ordering.by((b: BigDecimal) => b)
      case DateType => Ordering.by((d: java.sql.Date) => d.getTime)
      case TimestampType | TimestampNTZType => Ordering.by((t: Timestamp) => t.getTime)
      case other => throw new IllegalArgumentException(s"No ordering for partition type $other")
    }
    ord.asInstanceOf[Ordering[Any]]
  }
}
