package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Fetch, Publish}

/** Persisted MinHash-LSH corpus index for INCREMENTAL near-duplicate
  * detection — the rolling-ingest shape of [[Dedup.minHashLsh]]: a 100 TB
  * corpus is shingled/banded ONCE into a saved index, and each day's new
  * batch dedups against it by joining the batch's bands into the stored
  * buckets — O(batch + collisions) work per increment, the corpus text is
  * never re-read (cf. the reference's append-only publish model,
  * s3parq/publish_parq.py, which has no dedup at all).
  *
  * Layout under `root` (both stores are ordinary graft datasets, so every
  * fetch/listing/compaction tool works on them):
  *  - `bands/`   — (id, bhash, band) partitioned BY BAND: a batch's
  *    band-bucket probe join prunes to matching band partitions, and the
  *    shuffle key (band, bhash) is exactly the layout key;
  *  - `shingles/` — (id, sh): each doc's distinct word n-grams, kept so
  *    candidate verification is exact n-gram Jaccard WITHOUT touching the
  *    corpus (grams are stored as strings for oracle-exactness; a
  *    space-tuned deployment could store 8-byte gram hashes and accept
  *    2⁻⁶⁴ collision noise);
  *  - `_dedup_index.json` — the (numHashes, bands, shingleSize) the index
  *    was built with; probes MUST band identically, so [[append]] and
  *    [[dedupBatch]] read them from here rather than trusting call-site
  *    arguments to stay in sync.
  *
  * Scale notes: the probe join ships only (id, band, bhash) scalars;
  * shingle arrays join back for surviving candidates only (the
  * [[Dedup.minHashLsh]] discipline); over-populated buckets (boilerplate
  * collisions) are dropped by the same `maxBucket` guard, counted over
  * store ∪ batch so a bucket that crosses the cap across increments still
  * caps.
  */
object DedupIndex {

  final case class Params(numHashes: Int, bands: Int, shingleSize: Int)

  private val ParamsName = "_dedup_index.json"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeParams(spark: SparkSession, root: String, p: Params): Unit = {
    val out = fs(spark, root).create(new Path(root, ParamsName), true)
    try out.write(
      s"""{"numHashes":${p.numHashes},"bands":${p.bands},"shingleSize":${p.shingleSize}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def params(spark: SparkSession, root: String): Params = {
    val f = fs(spark, root)
    val p = new Path(root, ParamsName)
    require(f.exists(p), s"$root is not a dedup index (no $ParamsName)")
    val in = f.open(p)
    val raw = try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); new String(bytes, "UTF-8")
    } finally in.close()
    def field(n: String): Int =
      s""""$n":(\\d+)""".r.findFirstMatchIn(raw).map(_.group(1).toInt)
        .getOrElse(sys.error(s"malformed $ParamsName: $raw"))
    Params(field("numHashes"), field("bands"), field("shingleSize"))
  }

  /** (id, sh) + (id, bhash, band) for a document frame under `p`. */
  private def shingleAndBand(docs: DataFrame, idCol: String, textCol: String,
                             p: Params): (DataFrame, DataFrame) = {
    // the shingle kernel declares containsNull=false, but parquet reads
    // arrays back element-nullable — publish the nullable form so the
    // store's recorded schema matches what fetch re-reads
    val shingled = docs.select(col(idCol).as("id"),
      Dedup.shingles(col(textCol), p.shingleSize)
        .cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true)).as("sh"))
    val banded = shingled.select(col("id"),
      posexplode(graft.functions.SketchFunctions.minHashBands(
        col("sh"), p.numHashes, p.bands)).as(Seq("band", "bhash")))
    (shingled, banded)
  }

  /** Build the index over the current corpus (overwrites any prior). */
  def build(spark: SparkSession, docs: DataFrame, root: String,
            idCol: String = "doc_id", textCol: String = "text",
            numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): Unit = {
    val p = Params(numHashes, bands, shingleSize)
    val (shingled, banded) = shingleAndBand(docs, idCol, textCol, p)
    Publish.publish(spark, banded, s"$root/bands", Seq("band"))
    Publish.publish(spark, shingled, s"$root/shingles", Nil)
    writeParams(spark, root, p)
  }

  /** Fold a (deduped) batch into the index — O(batch) work. */
  def append(spark: SparkSession, docs: DataFrame, root: String,
             idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val p = params(spark, root)
    val (shingled, banded) = shingleAndBand(docs, idCol, textCol, p)
    Publish.publish(spark, banded, s"$root/bands", Seq("band"), mode = "append")
    Publish.publish(spark, shingled, s"$root/shingles", Nil, mode = "append")
  }

  /** Near-duplicate pairs touching the new batch: batch-vs-corpus AND
    * batch-vs-batch, exact-Jaccard-verified, (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard ≥ threshold. Corpus-internal pairs are
    * never recomputed (they were the previous increments' output). The
    * batch's ids must be disjoint from the corpus's.
    */
  def dedupBatch(spark: SparkSession, root: String, batch: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val p = params(spark, root)
    val (newShingled, newBanded) = shingleAndBand(batch, idCol, textCol, p)
    val stored = Fetch.fetch(spark, s"$root/bands")
      .select(col("id"), col("band"), col("bhash"))
    // one bucket join: batch side × (store ∪ batch) side — corpus-corpus
    // pairs are structurally impossible, not filtered after the fact
    val probeSide = stored.unionByName(newBanded.select("id", "band", "bhash"))
    val keys = Seq("band", "bhash")
    // skew guard over the COMBINED bucket population
    val over = probeSide.groupBy(keys.map(col): _*).count()
      .where(col("count") > maxBucket).select(keys.map(col): _*)
    val a = newBanded.join(broadcast(over), keys, "left_anti")
      .select(col("band"), col("bhash"), col("id").as("raw_a"))
    val b = probeSide.join(broadcast(over), keys, "left_anti")
      .select(col("band"), col("bhash"), col("id").as("raw_b"))
    val pairs = a.join(b, keys)
      .where(col("raw_a") =!= col("raw_b"))
      .select(least(col("raw_a"), col("raw_b")).as("id_a"),
        greatest(col("raw_a"), col("raw_b")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verification shingles: corpus side from the store, batch side fresh
    val lookup = Fetch.fetch(spark, s"$root/shingles").select(col("id"), col("sh"))
      .unionByName(newShingled)
    Dedup.jaccardVerify(
      pairs
        .join(lookup.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(lookup.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b"),
      threshold)
  }
}
