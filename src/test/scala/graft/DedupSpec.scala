package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Dedup families against planted duplicates. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 40 distinct word-salad docs + planted dups:
    *  - 100/101: exact copies of doc 0's text
    *  - 102: doc 1's text with one word changed (near-dup)
    *  - 103: doc 2's text with two words changed (weaker near-dup)
    */
  private lazy val docs = {
    // vocab wide enough that distinct docs differ in token frequencies
    // (simhash on a tiny vocab makes every doc's profile near-identical)
    val vocab = Array.tabulate(400)(i => s"w$i")
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 60).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val near1 = base(1)._2.split(" ").updated(10, "CHANGED").mkString(" ")
    val near2 = base(2)._2.split(" ").updated(5, "X").updated(40, "Y").mkString(" ")
    (base ++ Seq((100L, base(0)._2), (101L, base(0)._2), (102L, near1), (103L, near2)))
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps the lowest id per distinct text") {
    val out = Dedup.exactText(docs)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(100L) && !ids.contains(101L))
    assert(ids.contains(0L) && ids.contains(102L) && ids.contains(103L))
    assert(out.count() == 42)
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minHashLsh(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)) || pairs.contains((0L, 101L)))
    assert(pairs.contains((1L, 102L)))
    assert(pairs.contains((2L, 103L)))
    // no pair between two distinct base docs
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 })
  }

  test("jaccard threshold filters weak candidates") {
    val strict = Dedup.minHashLsh(docs, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(strict.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 100L, 101L)) },
      s"only exact copies survive tau=0.99, got $strict")
  }

  test("simhash finds planted near-dups within hamming budget") {
    val pairs = Dedup.simHashPairs(docs, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)))
    assert(pairs.contains((1L, 102L)))
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 })
  }

  test("dropNearDuplicates keeps cluster minimum") {
    val pairs = Dedup.minHashLsh(docs, threshold = 0.5)
    val kept = Dedup.dropNearDuplicates(docs, pairs).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(100L) && !kept.contains(101L)
      && !kept.contains(102L) && !kept.contains(103L))
    assert((0L until 40L).forall(kept.contains))
  }

  test("dropNearDuplicatesKeepBest elects the highest score, ties to lowest id") {
    val scored = Seq(
      (1L, "dup", 5.0), (2L, "dup", 9.0), (3L, "dup", 9.0),
      (10L, "solo", 1.0)).toDF("doc_id", "text", "score")
    // transitive chain 1~2~3 from adjacent pairs only
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicatesKeepBest(scored, pairs, "score")
      .select("doc_id").as[Long].collect().toSet
    // best score 9.0 tied between 2 and 3 → lowest id 2; non-members stay
    assert(kept == Set(2L, 10L))
    // contrast: keep-first would have kept id 1, the WORST copy
    assert(Dedup.dropNearDuplicates(scored, pairs)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 10L))
  }

  test("duplicateClusters collapses transitive chains to the component min") {
    // chain 1~2~3~4~5 with only adjacent pairs present (the LSH stage never
    // emitted (1,5)) + an unrelated pair — one call must collapse both
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
    val docs = (1L to 12L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, pairs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L, 7L, 8L, 9L, 10L, 12L))
    // distributed label-propagation path (forced past the driver fast
    // path) must agree exactly
    val distributed = Dedup.duplicateClusters(pairs, driverEdgeLimit = 0)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(distributed == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("duplicateClusters preserves string id types (both paths)") {
    val pairs = Seq(("a1", "a2"), ("a2", "a3"), ("z1", "z2")).toDF("id_a", "id_b")
    val expected = Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a1", "z1" -> "z1", "z2" -> "z1")
    val fast = Dedup.duplicateClusters(pairs)
      .select("id", "cluster").as[(String, String)].collect().toMap
    assert(fast == expected)
    val distributed = Dedup.duplicateClusters(pairs, driverEdgeLimit = 0)
      .select("id", "cluster").as[(String, String)].collect().toMap
    assert(distributed == expected)
    // numeric-looking string ids must NOT collide ("007" vs "7")
    val tricky = Seq(("007", "7")).toDF("id_a", "id_b")
    val t = Dedup.duplicateClusters(tricky)
      .select("id", "cluster").as[(String, String)].collect().toMap
    assert(t == Map("007" -> "007", "7" -> "007"))
  }

  test("embedding near-dup finds planted vector copies") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    val base = (0 until 30).map(i => (i.toLong, vec()))
    val v0 = base(0)._2
    val nearCopy = v0.map(x => x + 0.001f)
    val embs = (base :+ (200L, nearCopy)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(embs, threshold = 0.99, planes = 6, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 200L)), s"planted pair missing from $pairs")
    assert(pairs.size == 1)
  }

  test("paragraph dedup keeps first occurrence corpus-wide, reassembles in order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\n\nalpha beta\n\nCOOKIE BANNER", "web"), // banner repeats in-doc
      (2L, "COOKIE BANNER\n\ngamma delta", "web"),
      (3L, "alpha beta\n\nepsilon", "books"),
      (4L, "COOKIE BANNER", "web") // every paragraph is a dup: doc drops out
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.Dedup.dropDuplicateParagraphs(docs).orderBy("doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, "COOKIE BANNER\n\nalpha beta", "web"), // keeper stays, in-doc repeat drops
      (2L, "gamma delta", "web"),
      (3L, "epsilon", "books")),
      s"got $out")
  }

  test("stripCommonParagraphs removes boilerplate everywhere, keeps emptied docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "FOOTER\n\nalpha beta\n\nHEADER"),
      (2L, "HEADER\n\ngamma\n\nFOOTER"),
      (3L, "FOOTER\n\nHEADER"),          // becomes empty
      (4L, "delta\n\ndelta\n\nepsilon") // internal repeat != cross-doc common
    ).toDF("doc_id", "text")
    val got = Dedup.stripCommonParagraphs(docs, minDocs = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "alpha beta"),
      (2L, "gamma"),
      (3L, ""),
      (4L, "delta\n\ndelta\n\nepsilon")))
  }

  test("stripCommonParagraphs counts DISTINCT docs, not occurrences") {
    import spark.implicits._
    // "x" appears 3 times but in only 2 docs -> minDocs=3 keeps it
    val docs = Seq(
      (1L, "x\n\nx\n\na"),
      (2L, "x\n\nb")
    ).toDF("doc_id", "text")
    val got = Dedup.stripCommonParagraphs(docs, minDocs = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x\n\nx\n\na"), (2L, "x\n\nb")))
  }

  test("stripDuplicatedSpans removes duplicated token spans, keeps unique text verbatim") {
    import spark.implicits._
    val docs = Seq(
      // the 4-token span "all rights reserved inc" is shared by docs 1+2
      (1L, "alpha beta all rights reserved inc gamma"),
      (2L, "all rights reserved inc delta epsilon zeta"),
      // unique doc: kept VERBATIM (no token-rejoin normalization)
      (3L, "eta theta iota kappa"),
      // exact short-text twins (< l tokens): whole-text window -> emptied
      (4L, "mu nu"),
      (5L, "mu nu"),
      // in-doc repeat of a 3-gram counts toward minCount too
      (6L, "rho sigma tau X rho sigma tau")
    ).toDF("doc_id", "text")
    val got = Dedup.stripDuplicatedSpans(docs, l = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      // windows: every 3-gram inside the shared span duplicates, so the
      // whole span goes; neighbors covered by no duplicated window stay
      (1L, "alpha beta gamma", 4L),
      (2L, "delta epsilon zeta", 4L),
      (3L, "eta theta iota kappa", 0L),
      (4L, "", 2L),
      (5L, "", 2L),
      (6L, "X", 6L)), s"got $got")
  }

  test("stripDuplicatedSpans: minCount above the occurrence count keeps everything") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e")
    ).toDF("doc_id", "text")
    val got = Dedup.stripDuplicatedSpans(docs, l = 3, minCount = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a b c d", 0L), (2L, "a b c e", 0L)))
  }

  /** 10 mutually-orthogonal basis vectors (cosine 0 across ids) plus
    * scaled twins of three of them (cosine exactly 1 to their base): the
    * keep-first election must drop exactly the larger-id twins, wherever
    * k-means puts the cluster boundaries (identical vectors always share
    * a cluster).
    */
  private def semBase = {
    import spark.implicits._
    val basis = (0 until 10).map { i =>
      (i.toLong, Array.tabulate(16)(j => if (j == i) 1.0f else 0.0f))
    }
    val twins = Seq(0, 3, 7).map { i =>
      (100L + i, Array.tabulate(16)(j => if (j == i) 2.0f else 0.0f))
    }
    (basis ++ twins).toDF("vec_id", "embedding")
  }

  test("semanticDedup drops exactly the larger-id semantic twins") {
    import spark.implicits._
    val out = Dedup.semanticDedup(semBase, threshold = 0.99, nclusters = 4,
        maxCluster = 100)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out.size === 13)
    assert(out.filterNot(_._2).keySet === Set(100L, 103L, 107L))
    // twins and their bases share a cluster (identical direction)
    val clusters = Dedup.semanticDedup(semBase, threshold = 0.99, nclusters = 4,
        maxCluster = 100)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    Seq(0, 3, 7).foreach(i =>
      assert(clusters(100L + i) === clusters(i.toLong), s"twin $i cluster"))
  }

  test("semanticDedup: clusters over maxCluster are skipped conservatively") {
    import spark.implicits._
    // nclusters=1 puts all 13 vectors in one cluster; cap of 5 skips it
    val out = Dedup.semanticDedup(semBase, threshold = 0.99, nclusters = 1,
        maxCluster = 5)
      .select("id", "keep").as[(Long, Boolean)].collect()
    assert(out.length === 13 && out.forall(_._2), "all keep when cluster skipped")
  }

  test("semanticDedup with one uncapped cluster equals the all-pairs election") {
    import spark.implicits._
    val out = Dedup.semanticDedup(semBase, threshold = 0.99, nclusters = 1,
        maxCluster = 1 << 20)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out.filterNot(_._2).keySet === Set(100L, 103L, 107L))
  }
}
