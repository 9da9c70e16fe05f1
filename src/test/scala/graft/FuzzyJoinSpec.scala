package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

/** PassJoin segment blocking vs brute-force edit distance: the blocking
  * must be LOSSLESS (every true pair generated as a candidate) — verified
  * by comparing the full operator output against an all-pairs levenshtein
  * reference on deterministic random corpora, plus handcrafted edge cases
  * (empty strings, short strings, each edit kind at each position).
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: all unordered pairs within distance k. */
  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val cur = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(a.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = ed(sa, sb) if dist <= k
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editDistanceSelfJoin(rows.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("handcrafted edits: substitution, insertion, deletion at varied positions") {
    val rows = Seq(
      1L -> "abcdef",   // base
      2L -> "Xbcdef",   // sub at 0
      3L -> "abcdeX",   // sub at end
      4L -> "abXcdef",  // insert mid
      5L -> "bcdef",    // delete at 0
      6L -> "abcde",    // delete at end
      7L -> "abcdef",   // exact duplicate (dist 0)
      8L -> "zzzzzz"    // far from everything
    )
    assert(run(rows, 1) === brute(rows, 1))
    assert(run(rows, 2) === brute(rows, 2))
  }

  test("empty and single-char strings participate correctly") {
    val rows = Seq(1L -> "", 2L -> "a", 3L -> "b", 4L -> "ab", 5L -> "")
    assert(run(rows, 1) === brute(rows, 1))
    assert(run(rows, 2) === brute(rows, 2))
  }

  test("null strings are dropped, never matched") {
    val rows = Seq((1L, "abc"), (2L, null), (3L, "abd")).toDF("id", "s")
    val out = FuzzyJoin.editDistanceSelfJoin(rows, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 3L)))
  }

  test("random corpus, k = 1 and k = 2: blocking is lossless vs brute force") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    def word(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // base words + mutated neighbors so true pairs are plentiful
    val base = (0 until 60).map(i => i.toLong -> word(3 + rnd.nextInt(10)))
    val mutated = base.take(30).map { case (i, s) =>
      val pos = rnd.nextInt(s.length)
      val m = rnd.nextInt(3) match {
        case 0 => s.updated(pos, alphabet(rnd.nextInt(alphabet.length)))     // sub
        case 1 => s.substring(0, pos) + alphabet(rnd.nextInt(5)) + s.substring(pos) // ins
        case _ => s.substring(0, pos) + s.substring(pos + 1)                 // del
      }
      (i + 1000L, m)
    }
    val rows = base ++ mutated
    assert(run(rows, 1) === brute(rows, 1))
    assert(run(rows, 2) === brute(rows, 2))
  }

  test("lookup join: query batch against corpus, directed ids") {
    val corpus = Seq(10L -> "spark", 11L -> "spork", 12L -> "shark",
      13L -> "scala", 14L -> "quill").toDF("cid", "s")
    val queries = Seq(1L -> "spark", 2L -> "scale").toDF("qid", "s")
    val out = FuzzyJoin.editDistanceLookup(queries, corpus, "qid", "cid", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 10L, 0L), (1L, 11L, 1L), (1L, 12L, 1L), (2L, 13L, 1L)))
  }

  test("plan shape: blocking shuffle carries only scalar key columns") {
    val df = Seq(1L -> "abc", 2L -> "abd").toDF("id", "s")
    val plan = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", 1)
      .queryExecution.optimizedPlan.toString()
    // full strings must not ride the candidate-generation exchange: the
    // segment/probe projections keep only (id, len/m, i, hash)
    assert(!plan.contains("udf"), "no UDFs in the fuzzy join plan")
  }
}
