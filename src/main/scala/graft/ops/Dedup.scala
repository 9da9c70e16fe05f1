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

  /** Exact dedup: keep the first row (lowest `orderCol`, which must be
    * unique within a key) per distinct value of `keyCols`. Implemented as
    * `min_by(whole-row, orderCol)` — a hash aggregate with MAP-SIDE partial
    * combine, so duplicate-heavy data collapses before the shuffle;
    * a `ROW_NUMBER` window has identical semantics but shuffles and sorts
    * every row. Same one-shuffle bound, far fewer bytes moved at 100 TB.
    */
  def exact(df: DataFrame, keyCols: Seq[Column], orderCol: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(keyCols: _*)
      .agg(min_by(struct(cols.map(col).toIndexedSeq: _*), orderCol).as("__row"))
      .select(cols.map(c => col(s"__row.$c")).toIndexedSeq: _*)
  }

  /** Exact text dedup on md5(text), keep lowest id. */
  def exactText(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    exact(docs, Seq(md5(col(textCol))), col(idCol))

  // ------------------------------------------------------------- MinHash-LSH

  /** Word n-gram shingles of a text column (distinct) — native expression
    * ([[graft.functions.ShinglesExpr]]).
    */
  def shingles(textCol: Column, n: Int = 3): Column =
    graft.functions.SketchFunctions.shinglesOf(textCol, n)

  /** MinHash signature: for each of `numHashes` hash families, the min over
    * the shingle set of a family hash. Native expression
    * ([[graft.functions.MinHashSigExpr]]) — one tight loop per row, no
    * explode, no shuffle; cost O(shingles × numHashes) cheap ops.
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.functions.SketchFunctions.minHashSig(shingleCol, numHashes)

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
    // no emptiness filter: the native shingle kernel always emits >= 1
    // element (short docs collapse to one whole-text shingle)
    // Shingle + 64-hash signature is the CPU-heavy kernel: spread a
    // narrow input across the cluster first (identity at real scale —
    // guide §2.5's unsplittable-input case).
    val shingled = Spread.forCompute(docs.select(col(idCol), col(textCol)), col(idCol),
        Spread.HeavyBytesPerTask)
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))

    // Candidate generation shuffles ONLY (id, band, bhash) scalars — the
    // shingle arrays never ride the LSH shuffle (carrying them would copy
    // each doc's shingles `bands` times through the wire; at 100 TB that
    // dwarfs the data itself). Verification joins them back for just the
    // surviving pairs.
    val banded = shingled.select(col("id"),
      posexplode(graft.functions.SketchFunctions.minHashBands(col("sh"), numHashes, bands))
        .as(Seq("band", "bhash")))

    val pairs = selfJoinBuckets(banded, Seq("band", "bhash"), maxBucket)

    val left = shingled.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val right = shingled.select(col("id").as("id_b"), col("sh").as("sh_b"))
    jaccardVerify(pairs.join(left, "id_a").join(right, "id_b"), threshold)
  }

  /** Within-bucket candidate pairs (id_a < id_b, distinct) from a slim
    * (id, bucketKey...) frame, with a skew guard: buckets above `maxBucket`
    * members are dropped (broadcast anti-join against the tiny over-cap
    * bucket list) instead of joined quadratically.
    *
    * `carry` columns ride through as `<c>_a`/`<c>_b` — ONLY for scalar
    * payloads (a simhash long, a norm): carrying them here costs bytes on
    * the bucket shuffle but saves the verify stage a join per side. Big
    * payloads (shingle sets, vectors) must stay out and join back on the
    * surviving pairs instead. Carried values must be functionally
    * determined by the id (the pair-dedup keeps an arbitrary bucket's
    * copy).
    */
  private def selfJoinBuckets(slim: DataFrame, keys: Seq[String], maxBucket: Int,
                              carry: Seq[String] = Nil): DataFrame = {
    val over = slim.groupBy(keys.map(col): _*).count().where(col("count") > maxBucket)
      .select(keys.map(col): _*)
    val ok = slim.join(broadcast(over), keys, "left_anti")
    val a = ok.select((keys.map(col) :+ col("id").as("id_a")) ++
      carry.map(c => col(c).as(s"${c}_a")): _*)
    val b = ok.select((keys.map(col) :+ col("id").as("id_b")) ++
      carry.map(c => col(c).as(s"${c}_b")): _*)
    a.join(b, keys)
      .where(col("id_a") < col("id_b"))
      .select(("id_a" +: "id_b" +: carry.flatMap(c => Seq(s"${c}_a", s"${c}_b"))).map(col): _*)
      .dropDuplicates("id_a", "id_b")
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

  /** Connected components of the verified duplicate-pair graph via
    * distributed min-label propagation: every member's label converges to
    * the MINIMUM id of its component, so transitive chains A~B~C collapse
    * to one cluster even when the (A,C) pair was never emitted by the LSH
    * stage. Iterations touch ONLY the pair graph (tiny relative to the
    * corpus — verified duplicates only), each one a join + min-aggregate on
    * id scalars, checkpointed to keep lineage flat; converges in
    * O(component diameter) rounds (near-dup chains are short; `maxIters`
    * bounds pathological graphs, where leftover under-collapse is the safe
    * direction). Returns (id, cluster) with cluster = component min.
    */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20,
                        driverEdgeLimit: Int = 1000000): DataFrame = {
    // Verified duplicate pairs are normally TINY relative to the corpus:
    // take(limit+1) pulls them once (no second upstream pass) and a
    // driver union-find with path compression resolves components in
    // O(E α(E)) — no iterative Spark jobs at all. The id TYPE is
    // preserved (long, int, or string ids all cluster correctly and the
    // output schema matches the distributed path); other id types, or a
    // pathologically large pair graph (> driverEdgeLimit edges), take the
    // distributed min-label propagation below.
    val idType = pairs.schema("id_a").dataType
    val idOrdering: Option[Ordering[Any]] = idType match {
      case org.apache.spark.sql.types.LongType =>
        Some(Ordering.Long.asInstanceOf[Ordering[Any]])
      case org.apache.spark.sql.types.IntegerType =>
        Some(Ordering.Int.asInstanceOf[Ordering[Any]])
      case org.apache.spark.sql.types.StringType =>
        Some(Ordering.String.asInstanceOf[Ordering[Any]])
      case _ => None
    }
    val firstEdges =
      if (idOrdering.isDefined) pairs.select("id_a", "id_b").take(driverEdgeLimit + 1)
      else Array.empty[org.apache.spark.sql.Row]
    if (idOrdering.isDefined && firstEdges.length <= driverEdgeLimit) {
      val lt = idOrdering.get.lt _
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      firstEdges.foreach { row =>
        val (ra, rb) = (find(row.get(0)), find(row.get(1)))
        if (ra != rb) { // min id becomes the root, so cluster = component min
          if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      val memberIds: Set[Any] = firstEdges.iterator
        .flatMap(r => Iterator(r.get(0), r.get(1))).toSet
      val members: Seq[(Any, Any)] = memberIds.toSeq.map((id: Any) => (id, find(id)))
      val spark = pairs.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster", idType)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(members.map { case (i, c) =>
          org.apache.spark.sql.Row(i, c)
        }, 1), schema)
    }

    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = edges.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("cluster"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val prop = edges.join(labels.select(col("id").as("src"), col("cluster")), "src")
        .select(col("dst").as("id"), col("cluster"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("cluster", "prev"), "id")
        .where(col("cluster") =!= col("prev")).isEmpty
      // The superseded checkpoint's blocks are NOT freeable via
      // Dataset.unpersist (that only touches CacheManager entries);
      // dropping the reference lets the ContextCleaner GC them.
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Drop near-duplicates: keep only the minimum-id member of every
    * duplicate cluster ([[duplicateClusters]] — connected components, so
    * transitive chains A~B~C collapse to {A} in ONE call; docs with no
    * verified duplicate pass through untouched).
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val losers = duplicateClusters(pairs)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dropNearDuplicates]] electing the BEST-scored member of each
    * duplicate cluster instead of the lowest id — the curation form:
    * when near-dups differ (one copy truncated, one boilerplate-wrapped),
    * keep the highest-quality one. Ties break on lowest id, so the
    * election is total and rerun-stable.
    *
    * Scale shape: clusters resolve as before (pair graph only); the
    * election joins the tiny (id, cluster) membership to the docs'
    * scores and takes one `max_by(struct(score, -id))` hash aggregate
    * per cluster — the corpus never shuffles, only cluster members do.
    */
  def dropNearDuplicatesKeepBest(docs: DataFrame, pairs: DataFrame,
                                 scoreCol: String,
                                 idCol: String = "doc_id"): DataFrame = {
    val members = duplicateClusters(pairs) // (id, cluster)
    val scored = members.join(
      docs.select(col(idCol).as("id"), col(scoreCol).cast("double").as("__s")), "id")
    val winners = scored.groupBy("cluster")
      .agg(max_by(col("id"), struct(col("__s"), -col("id"))).as("__win"))
      .select(col("__win"))
    // losers = members minus winners; everything outside any cluster stays
    val losers = members.join(winners, members("id") === winners("__win"),
        "left_anti")
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** PARAGRAPH-level exact dedup (the CCNet/RefinedWeb shape): drop every
    * repeated paragraph across the WHOLE corpus, keeping only its first
    * occurrence (lowest `(id, position)`), then reassemble each document
    * from its surviving paragraphs in original order. Boilerplate
    * (headers, footers, cookie banners) survives in one document corpus-
    * wide; documents left with zero paragraphs drop out entirely.
    *
    * Scale shape (guide §8 — decide with small rows, move big rows once):
    * paragraph TEXT never rides ANY shuffle. Paragraphs explode to
    * `(id, pos, md5)` scalars; the keeper election is a hash aggregate
    * over `(md5, min(id, pos))`; the surviving POSITIONS aggregate per
    * document as an int array; and each document's text is rebuilt from
    * its OWN original `text` column by a pure projection (re-split +
    * position filter) after one scalar-payload join. The pre-r17 shape
    * shuffled every paragraph's text twice (keeper join back + per-doc
    * reassembly) — at ×100 that was 72 s of mostly text bytes through
    * exchanges; this shape ships three scalar columns instead.
    */
  def dropDuplicateParagraphs(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text",
                              sep: String = "\n\n"): DataFrame = {
    val cols = docs.columns
    // paragraph split + per-paragraph md5 is the heavy kernel: spread a
    // narrow input first (identity at real scale, guide §2.5)
    val paras = Spread.forCompute(docs.select(col(idCol), col(textCol)), col(idCol),
        Spread.HeavyBytesPerTask)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
      .select(col("__id"), col("__pos"), md5(col("__para")).as("__h"))
    val keep = paras.groupBy(col("__h").as("__kh"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
      .select(col("__kh"), col("__first.__id").as("__kid"),
        col("__first.__pos").as("__kpos"))
    val surviving = paras.join(keep,
      paras("__h") === keep("__kh") && paras("__id") === keep("__kid")
        && paras("__pos") === keep("__kpos"))
    // per-doc surviving positions, ascending — an int array, not text
    val keepPos = surviving.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__keep"))
    // docs with zero surviving paragraphs drop out via the inner join
    // (unchanged semantics); the text rebuild is a projection over the
    // document's own column — re-split ONCE into a materialized column
    // (an expression inside the transform lambda would re-split per
    // element), pick kept positions, re-join
    docs.join(keepPos, docs(idCol) === keepPos("__id"))
      .withColumn("__parts", split(col(textCol), java.util.regex.Pattern.quote(sep)))
      .select(cols.map(c =>
        if (c == textCol)
          array_join(transform(col("__keep"),
            p => element_at(col("__parts"), p + 1)), sep).as(textCol)
        else docs(c)).toIndexedSeq: _*)
  }

  /** Strip BOILERPLATE paragraphs: any paragraph appearing in at least
    * `minDocs` DISTINCT documents is removed from every document (the
    * CCNet / RefinedWeb repeated-lines cleanup — headers, footers, cookie
    * banners). Unlike [[dropDuplicateParagraphs]] (which keeps the first
    * occurrence), a common paragraph survives nowhere: boilerplate is
    * noise in all its copies. Documents whose every paragraph was
    * boilerplate are kept with empty text (dropping rows is the caller's
    * explicit follow-up filter, not a side effect).
    *
    * Shape: one hash-frequency aggregate (count-distinct docs per md5 —
    * hashes only on the wire), an anti-join of the exploded paragraphs
    * against the (small, head-of-distribution) common set, one per-doc
    * reassembly aggregate. No corpus-wide sort, no self-join.
    */
  def stripCommonParagraphs(docs: DataFrame, minDocs: Int = 2,
                            idCol: String = "doc_id", textCol: String = "text",
                            sep: String = "\n\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    val cols = docs.columns
    // same heavy split+md5 kernel as dropDuplicateParagraphs: spread
    val paras = Spread.forCompute(docs.select(col(idCol), col(textCol)), col(idCol),
        Spread.HeavyBytesPerTask)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
      .withColumn("__h", md5(col("__para")))
    val common = paras.groupBy(col("__h"))
      .agg(count_distinct(col("__id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__h").as("__ch"))
    val surviving = paras.join(common, paras("__h") === common("__ch"), "left_anti")
    val rebuilt = surviving.groupBy(col("__id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__para")))),
          s => s("__para")), sep).as("__text"))
    docs.join(rebuilt, docs(idCol) === rebuilt("__id"), "left")
      .select(cols.map(c =>
        if (c == textCol) coalesce(col("__text"), lit("")).as(textCol)
        else docs(c)).toIndexedSeq: _*)
  }

  /** Exact-substring dedup (the Lee et al. "Deduplicating Training Data"
    * span-removal shape, token-granular): every token covered by a word
    * `l`-gram window whose gram occurs ≥ `minCount` times CORPUS-WIDE is
    * removed from its document; surviving tokens rejoin with single
    * spaces. Complements [[dropDuplicateParagraphs]] (whole-paragraph,
    * keep-first) and [[graft.ops.TextAnalysis.repeatedNgramStats]] (the
    * accounting without the removal): this strips duplicated SPANS even
    * when the enclosing documents are otherwise unique — boilerplate
    * headers, license blocks, templated sentences. Documents shorter than
    * `l` tokens emit one whole-text window (the #115 gram convention), so
    * exact short-text duplicates empty out too; emptied documents are
    * kept with empty text, mirroring [[stripCommonParagraphs]].
    *
    * Scale shape: grams ride the count shuffle as 64-bit hashes only
    * (never text); the join-back build side is the ≥minCount duplicated
    * HEAD (orders of magnitude smaller than the open gram vocabulary on
    * a heavy-tailed corpus — the same broadcast-able head as #115); the
    * per-doc removal mask is an in-array projection (collect_set of the
    * doc's duplicated window starts, O(dup windows) driver-free). Output
    * adds `n_removed_tokens`.
    */
  def stripDuplicatedSpans(docs: DataFrame, l: Int = 3, minCount: Long = 2,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(l >= 1, s"window length must be >= 1, got $l")
    require(minCount >= 2, s"minCount must be at least 2, got $minCount")
    val cols = docs.columns
    // tokenize ONCE into a materialized column: an inline split inside
    // the transform lambda re-splits the text per window — O(tokens²)
    // regex work per document at scale
    val grams = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__ws"))
      .select(col("__id"),
        explode(transform(sequence(lit(0), greatest(size(col("__ws")) - l, lit(0))),
          i => struct(i.as("i"),
            xxhash64(array_join(slice(col("__ws"), i + 1, lit(l)), " ")).as("g"))))
          .as("__w"))
      .select(col("__id"), col("__w.i").as("__i"), col("__w.g").as("__g"))
    val dupHead = grams.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minCount).select(col("__g").as("__dg"))
    val starts = grams.join(dupHead, grams("__g") === dupHead("__dg"))
      .groupBy(col("__id")).agg(collect_set(col("__i")).as("__starts"))
    val toks = split(docs(textCol), " ")
    val kept = filter(toks, (_, j) =>
      !exists(col("__starts"), s => j >= s && j <= s + (l - 1)))
    docs.join(starts, docs(idCol) === starts("__id"), "left")
      .select(cols.map(c =>
        if (c == textCol)
          when(docs(textCol).isNull, docs(textCol))
            .when(col("__starts").isNull, docs(textCol))
            .otherwise(array_join(kept, " ")).as(textCol)
        else docs(c)).toIndexedSeq :+
        when(docs(textCol).isNull || col("__starts").isNull, lit(0L))
          .otherwise((size(toks) - size(kept)).cast("long"))
          .as("n_removed_tokens"): _*)
  }

  // ----------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token array: per-token 64-bit hashes vote ±1 on
    * each bit; the sign vector packs into a long. Native expression
    * ([[graft.functions.SimHash64Expr]]) — per-row, no shuffle.
    */
  def simHash64(tokens: Column): Column =
    graft.functions.SketchFunctions.simHash64(tokens)

  /** SimHash near-dup pairs: docs are bucketed by each of the four 16-bit
    * chunks of their simhash (two near-identical docs differ in ≤3 bits ⇒
    * at least one chunk matches); within-bucket pairs are verified by
    * Hamming distance ≤ `maxHamming`. Shuffle key = (chunk index, chunk).
    *
    * Note the chunk cover is EXHAUSTIVE, not probabilistic: 3 flipped bits
    * cannot touch all 4 chunks (pigeonhole), so (absent a tripped
    * `maxBucket` cap) the output is exactly every pair at Hamming ≤ 3 —
    * which is what makes the operator oracle-checkable given a shared
    * signature definition.
    *
    * `sig`: override the signature column (default: the fast XXH64-family
    * [[simHash64]] over whitespace tokens). The driver query passes the
    * MD5-family twin ([[graft.functions.SketchFunctions.simHash64Md5]]) so
    * DuckDB can recompute identical signatures and brute-force the pairs.
    */
  def simHashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3, maxBucket: Int = 1000,
                   sig: Option[Column] = None): DataFrame = {
    // the 64-bit simhash over every token is the CPU-heavy kernel —
    // spread a narrow input first (identity at real scale, guide §2.5)
    val hashed = Spread.forCompute(docs, col(idCol)).select(col(idCol).as("id"),
      sig.getOrElse(simHash64(split(col(textCol), " "))).as("sim"))
    val chunked = hashed.select(col("id"), col("sim"),
      explode(transform(sequence(lit(0), lit(3)),
        j => struct(j.as("j"), call_function("shiftright", col("sim"), j * 16).bitwiseAND(0xFFFFL).as("chunk")))).as("c"))
      .select(col("id"), col("sim"), col("c.j"), col("c.chunk"))
    // the simhash is ONE long — carrying it through the bucket shuffle
    // (8 bytes × 4 chunks) is far cheaper than two attach joins (which
    // also recomputed the simhash expression per join)
    selfJoinBuckets(chunked, Seq("j", "chunk"), maxBucket, carry = Seq("sim"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ----------------------------------------------- embedding-cosine near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold, bucketed by
    * random-hyperplane LSH signatures (see [[Similarity.hyperplaneSig]]) so
    * candidate generation is within-bucket only.
    */
  def embeddingNearDup(embs: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
                       threshold: Double = 0.95, planes: Int = 12, tables: Int = 4,
                       maxBucket: Int = 2000): DataFrame = {
    // hyperplane signatures + candidate cosines are the CPU-heavy kernels:
    // spread a narrow input first (identity at real scale, guide §2.5)
    val base = Spread.forCompute(embs.select(col(idCol), col(vecCol)), col(idCol),
        Spread.HeavyBytesPerTask)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", Similarity.l2Norm(col("v")))
      .where(col("norm") > 0)
    // Slim (id, table, sig) rows through the LSH shuffle; vectors join back
    // only for the surviving candidate pairs.
    val sigd = base.select(col("id"),
      posexplode(Similarity.hyperplaneSigs(col("v"), planes, tables)).as(Seq("t", "sig")))
    val pairs = selfJoinBuckets(sigd, Seq("t", "sig"), maxBucket)
    pairs
      .join(base.select(col("id").as("id_a"), col("v").as("v_a"), col("norm").as("n_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("v_b"), col("norm").as("n_b")), "id_b")
      .withColumn("cosine", Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv 2303.09540 — public literature): k-means-cluster the embedding
    * corpus, then within each cluster drop every vector that has a
    * HIGHER-PRIORITY semantic twin (cosine ≥ `threshold`, smaller id —
    * graft's deterministic keep-first convention). Output: one row per
    * input vector, `(id, cluster, keep)`.
    *
    * Scale shape: the cluster assignment is [[Clustering.kmeansAssign]]
    * (sample-bounded driver fit + one distributed argmax pass); candidate
    * generation is within-cluster only, via the same slim-keys self-join
    * as [[embeddingNearDup]] — (id, cluster) scalars ride the bucket
    * shuffle, vectors join back only for surviving candidate pairs. Size
    * `nclusters` so corpus/nclusters stays near `maxCluster`: clusters
    * past the cap are SKIPPED (all their members keep — the conservative
    * direction for a dedup) rather than joined quadratically; pair
    * `nclusters` growth with corpus growth to keep within-cluster work
    * linear overall.
    */
  def semanticDedup(embs: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding", threshold: Double = 0.95,
                    nclusters: Int = 0, maxCluster: Int = 2000,
                    seed: Long = 42L): DataFrame = {
    val prepped = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", Similarity.l2Norm(col("v")))
      .where(col("norm") > 0)
    // EXACT corpus count, one cheap two-column pass: sizes auto-k AND the
    // broadcast-vs-shuffle attach decision below. (The free Catalyst size
    // estimate was tried first for auto-k and over a union+transform
    // input it overestimated rows ~10×, pushing k to the clamp and making
    // the O(n·k) assignment pass the bottleneck — unstable 46→373 s at a
    // 200k-vector ×100 corpus. An exact count is noise next to the
    // pairwise work this operator exists to do.)
    val n = prepped.count()
    // nclusters <= 0 selects AUTO: clusters of ~maxCluster/4 members so
    // within-cluster work stays linear overall. The assignment itself is
    // O(n·k) — for corpora where that product explodes (n ≳ 10M), pass
    // nclusters explicitly and assign hierarchically (an IVF coarse
    // pass) instead of relying on auto.
    val k = if (nclusters > 0) nclusters
      else math.min(4096L, math.max(8L, n / math.max(1, maxCluster / 4))).toInt
    val assigned = Clustering.kmeansAssign(embs, k, idCol, vecCol, seed)
      .select(col("vec_id").as("id"), col("cluster"))
    val base = prepped.join(assigned, "id")
    // Election plan shape, chosen by MEASUREMENT at a 200k-vector ×100
    // corpus (50M within-cluster candidate pairs):
    //  - a typed per-cluster flatMapGroups triangle (the "GPU matmul"
    //    analog): 128 s — Catalyst→JVM array decoding of member vectors
    //    dominates;
    //  - shuffle-joining vectors onto the pair stream: 310 s — each
    //    candidate re-ships two 0.5 KB vectors through an exchange,
    //    ~25 GB of shuffled doubles;
    //  - this form: pairs enumerate in-stage from the cluster equi-join
    //    (each id lives in exactly ONE cluster, so every unordered pair
    //    appears exactly once — no dedup pass) and the vectors attach
    //    via BROADCAST hash joins when the corpus is small enough
    //    (`spark.graft.semdedup.broadcastMaxRows`, default 500k ≈ 250 MB
    //    at 64 dims): zero vector bytes through any exchange, the dot
    //    runs inside the enumeration stage. Past the cap it falls back
    //    to the shuffle attach (correct at any size, the honest
    //    trade — or pass a larger cap on a bigger-memory cluster).
    val spark = embs.sparkSession
    val members = base.select(col("cluster"), col("id"))
    val over = members.groupBy("cluster").count()
      .where(col("count") > maxCluster).select("cluster")
    val ok = members.join(broadcast(over), Seq("cluster"), "left_anti")
    val pairs = ok.select(col("cluster"), col("id").as("id_a"))
      .join(ok.select(col("cluster"), col("id").as("id_b")), "cluster")
      .where(col("id_a") < col("id_b"))
    val bcastMax = spark.conf
      .get("spark.graft.semdedup.broadcastMaxRows", "500000").toLong
    def attach(df: DataFrame): DataFrame =
      if (n <= bcastMax) broadcast(df) else df
    val drops = pairs
      .join(attach(base.select(col("id").as("id_a"), col("v").as("v_a"),
        col("norm").as("n_a"))), "id_a")
      .join(attach(base.select(col("id").as("id_b"), col("v").as("v_b"),
        col("norm").as("n_b"))), "id_b")
      .where(Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))
        >= threshold)
      .select(col("id_b").as("id"))   // a smaller-id twin exists → drop
      .distinct()
      .withColumn("__dup", lit(true))
    base.select(col("id"), col("cluster"))
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("__dup").isNull.as("keep"))
  }
}
