package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fingerprint64
import graft.ops.TextAnalysis

/** Text analysis on handcrafted strings with known answers. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("language id picks the marker-heavy language") {
    val docs = Seq(
      (1L, "the cat of the house and a dog ran to the yard"),
      (2L, "der hund und die katze das ist gut und der tag"),
      (3L, "le chat et la maison les arbres est grand et le jour"),
      (4L, "el perro y los gatos es una casa y el sol"),
      (5L, "xyzzy plugh quux")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "es")
    assert(out(5L) == "und")
  }

  test("quality signals computed exactly for a known string") {
    val docs = Seq((1L, "the cat is in, the hat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs).collect().head
    assert(r.getAs[Long]("n_chars") == 23)
    assert(r.getAs[Long]("n_words") == 6)        // split on single space
    assert(r.getAs[Long]("n_punct") == 2)        // comma + bang
    // stopwords among space-split words: the, is, the ("in," carries the
    // comma and doesn't match) = 3 of 6
    assert(r.getAs[Double]("stop_ratio") == 0.5)
  }

  test("token counts: whitespace vs BPE-ish boundaries") {
    val docs = Seq((1L, "abc de-f 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).collect().head
    assert(r.getAs[Long]("ws_tokens") == 3)
    // abc | de | - | f | 42 | !
    assert(r.getAs[Long]("bpe_tokens") == 6)
  }

  test("fingerprint expression matches the reference loop and is injective on samples") {
    val docs = Seq((1L, "hello world"), (2L, "hello worle"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(docs).select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == Fingerprint64.hashBytes("hello world".getBytes("UTF-8")))
    assert(out(1L) != out(2L))
    assert(out(3L) == 1125899906842597L)
  }
}
