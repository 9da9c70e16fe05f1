package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fingerprint64
import graft.ops.TextAnalysis

/** Text analysis on handcrafted strings with known answers. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpeLearn recovers planted merges in order and feeds bpeTokenCounts") {
    // "abab"×3 + "ab"×2: pair (a,b) scores 2·3+1·2 = 8 vs (b,a) 3 → first
    // merge (a,b); then (ab,ab) is the only pair in "abab" → second merge
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val merges = graft.ops.TextAnalysis.bpeLearn(docs, 3)
    assert(merges == Seq(("a", "b"), ("ab", "ab")),
      s"loop must stop when nothing is left to merge: $merges")
    // the learned table is directly consumable by the tokenizer: with
    // both merges, "abab"→1 token and "ab"→1 token ⇒ 5 tokens total
    val counts = graft.ops.TextAnalysis.bpeTokenCounts(docs, merges = merges)
      .as[(Long, Long)].collect().toMap
    assert(counts(1L) == 5L)
  }

  test("bpeLearnChecked re-verifies every merge as the distributed argmax") {
    val docs = Seq((1L, "abab abab abab ab ab cd cd cd")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeLearnChecked(docs, 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // every learned merge must survive the recount, supports recomputed
    // independently: (a,b)=8 [2/abab x3 + 1/ab x2]; then (ab,ab)=3 ties
    // (c,d)=3 and wins the lexicographic tie-break
    assert(got == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L), (3, "c", "d", 3L)),
      s"checked merges diverged: $got")
  }

  test("bpeLearn tie-break and position-weighted pair counting are deterministic") {
    // "aaa": positions (a,a),(a,a) → count 2; "bc" once → (b,c) 1
    val docs = Seq((1L, "aaa bc")).toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.bpeLearn(docs, 1) == Seq(("a", "a")))
    // equal counts: ("ab","cd") ties at 1 each on pairs (a,b) (c,d) —
    // lexicographically smallest wins
    val tie = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.bpeLearn(tie, 1) == Seq(("a", "b")))
  }

  test("bpeLearn default vocab bound: driver state capped, head-equal results") {
    // the DEFAULT cap bounds driver memory at scale (r17 verdict #3: an
    // unbounded default collected the whole open-web vocab); any corpus
    // whose vocab fits under it trains identically to uncapped
    val docs = Seq("a b a b c", "a b d").toDF("text")
    assert(graft.ops.TextAnalysis.DefaultVocabCap == 100000)
    assert(graft.ops.TextAnalysis.bpeLearn(docs, 2) ==
      graft.ops.TextAnalysis.bpeLearn(docs, 2, vocabCap = Int.MaxValue))
  }

  test("bpeLearn vocabCap trains on the head of the distribution only") {
    // cap 1 keeps only the most frequent word "xy" (freq 3) — the pair
    // (q,r) from the dropped word must not surface
    val docs = Seq((1L, "xy xy xy qr")).toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.bpeLearn(docs, 1, vocabCap = 1) == Seq(("x", "y")))
  }

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

  test("classifier score is the mean hashed-bucket weight, keep = positive sum") {
    // hand-computed reference: bucket(tok) = uint32(md5(tok)[:8 hex]) % dim,
    // recomputed here independently via MessageDigest
    def bucket(tok: String, dim: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (u32 % dim).toInt
    }
    val weights: Seq[Double] = (0 until 16).map(b => (b - 8).toDouble)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs, weights)
      .as[(Long, Double, Boolean)].collect().map { case (k, v, b) => k -> ((v, b)) }.toMap
    def expected(toks: Seq[String]): (Double, Boolean) = {
      val s = toks.map(t => weights(bucket(t, 16))).sum
      (BigDecimal(s / toks.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s > 0)
    }
    assert(out(1L) == expected(Seq("alpha", "beta", "gamma")))
    assert(out(2L) == expected(Seq("alpha")))
    assert(out(3L) == expected(Seq(""))) // split("") = [""] — one empty token
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

  test("redaction scrubs emails, urls, phones and counts them") {
    val docs = Seq(
      (1L, "reach me at jo.doe@corp.io or https://ex.org/a_b see 555-123-4567"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_emails") == 1 && r1.getAs[Long]("n_urls") == 1
      && r1.getAs[Long]("n_phones") == 1)
    assert(r1.getAs[String]("redacted") ==
      "reach me at <EMAIL> or <URL> see <PHONE>")
    assert(out(2L).getAs[String]("redacted") == "nothing sensitive here")
  }

  test("overlapping patterns are not double-counted (phone inside URL)") {
    val docs = Seq((1L, "see http://x.com/555-123-4567 ok")).toDF("doc_id", "text")
    val r = TextAnalysis.redact(docs).collect().head
    assert(r.getAs[Long]("n_urls") == 1)
    assert(r.getAs[Long]("n_phones") == 0) // swallowed by <URL>
    assert(r.getAs[String]("redacted") == "see <URL> ok")
  }

  test("repetition ratio flags repeated text") {
    val docs = Seq(
      (1L, Seq.fill(20)("spam spam spam").mkString(" ")), // heavy repetition
      (2L, (1 to 60).map(i => s"w$i").mkString(" "))      // all distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionRatio(docs, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(out(1L) > 0.9, s"repetitive doc scored ${out(1L)}")
    assert(out(2L) == 0.0)
  }

  test("decontamination drops docs overlapping the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog today")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog today and more"),
      (2L, (1 to 30).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "text")
    val overlap = graft.ops.Decontaminate.overlap(docs, bench, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(overlap.contains(1L) && !overlap.contains(2L))
    val clean = graft.ops.Decontaminate.decontaminate(docs, bench, n = 8)
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))
  }

  test("fuzzy decontamination catches paraphrased near-dups exact overlap misses") {
    val benchText = (1 to 40).map(i => s"bench$i").mkString(" ")
    // paraphrase: one word in 40 changed — kills every exact 8-gram
    // through that position but keeps 3-shingle Jaccard ≈ 36/42 ≈ 0.857
    val paraphrased = benchText.replace("bench20", "EDITED")
    val bench = Seq((100L, benchText)).toDF("bench_id", "text")
    val docs = Seq(
      (1L, paraphrased),
      (2L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val fuzzy = graft.ops.Decontaminate.fuzzyOverlap(docs, bench,
      numHashes = 64, bands = 64, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(fuzzy.map(t => (t._1, t._2)).toSeq == Seq((1L, 100L)))
    assert(fuzzy.head._3 > 0.8 && fuzzy.head._3 < 1.0)
    val clean = graft.ops.Decontaminate.decontaminateFuzzy(docs, bench,
      numHashes = 64, bands = 64, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))
    // the unrelated doc is not even a candidate at a loose threshold
    assert(graft.ops.Decontaminate.fuzzyOverlap(docs, bench,
      threshold = 0.3).where("doc_id = 2").isEmpty)
  }

  test("fingerprint expression matches the reference loop and is injective on samples") {
    val docs = Seq((1L, "hello world"), (2L, "hello worle"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(docs).select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == Fingerprint64.hashBytes("hello world".getBytes("UTF-8")))
    assert(out(1L) != out(2L))
    assert(out(3L) == 1125899906842597L)
  }

  test("corpus LM: repetitive text scores lower bigram surprisal than varied text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b a b a b a b"),          // one dominant transition
      (2L, "c d e f g h i j k l m n"),          // every transition unique
      (3L, "a b a b c d a b a b a b")).toDF("doc_id", "text")
    val scored = TextAnalysis.bigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1) < scored(3) && scored(3) < scored(2),
      s"expected repetitive < mixed < novel, got $scored")
    val uni = TextAnalysis.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 uses only the two globally-commonest tokens -> highest logprob
    assert(uni(1) > uni(2), s"common-token doc must score higher, got $uni")
  }

  test("LM scorers stay exact on the shuffle path (open-vocabulary scale)") {
    // At 100 TB an open vocabulary outgrows any broadcast: the model
    // joins carry NO broadcast hint, so AQE shuffles them once the count
    // frames look big. Force that plan (threshold -1) and assert both
    // the plan shape and bit-identical results. The one-row total/vocab
    // frames keep their explicit broadcast hints — they are O(1) at any
    // corpus size.
    import spark.implicits._
    // long-tail vocab: 400 distinct tokens across 60 docs
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 20).map(j => s"tok${(i * 7 + j * 13) % 400}").mkString(" "),
        s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    val wantUni = TextAnalysis.unigramLogProb(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val wantBi = TextAnalysis.bigramSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val wantKl = TextAnalysis.sourceKlDivergence(docs)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val uni = TextAnalysis.unigramLogProb(docs)
      // final AQE plan only (the plan string also embeds the initial one)
      val plan = uni.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("BroadcastHashJoin"),
        "model join must not broadcast when the vocabulary is deemed large")
      assert(uni.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet == wantUni)
      assert(TextAnalysis.bigramSurprisal(docs)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet == wantBi)
      assert(TextAnalysis.sourceKlDivergence(docs)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet == wantKl)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("source KL: a drifted source scores higher than representative ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d a b c d", "balanced"),
      (2L, "a b c d a b c d", "balanced2"),
      (3L, "z z z z z z z z", "drifted")).toDF("doc_id", "text", "source")
    val kl = TextAnalysis.sourceKlDivergence(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kl("drifted") > kl("balanced") && kl("drifted") > 1.0,
      s"single-token source must diverge strongly, got $kl")
    assert(kl("balanced") == kl("balanced2"), s"identical sources must tie, got $kl")
  }

  test("repeated n-gram stats count occurrences CORPUS-wide, not per doc") {
    val docs = Seq(
      (1L, "a b c d"), // grams: "a b c", "b c d"
      (2L, "a b c e"), // grams: "a b c", "b c e" — "a b c" repeats across docs
      (3L, "x y")      // short doc: one truncated gram "x y", unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedNgramStats(docs, n = 3, minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 0.5), // "a b c" is corpus-repeated, "b c d" is not
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0)),
      s"got $out")
  }

  test("BPE merges: cascades, rank order, merge-all-per-round") {
    import graft.functions.BpeVocab
    val v = new BpeVocab(BpeVocab.Default)
    // full cascades collapse to one token
    assert(v.encodeWord("the") == Seq("the"))
    assert(v.encodeWord("table") == Seq("table"))     // le, ta, tab, table
    assert(v.encodeWord("window") == Seq("window"))   // in, ow, ind, indow, window
    assert(v.encodeWord("query") == Seq("query"))
    // partial merges stop where the table runs out
    assert(v.encodeWord("sort") == Seq("s", "or", "t"))   // (o,r) outranks (s,o)/(r,t)
    assert(v.encodeWord("value") == Seq("v", "a", "l", "ue"))
    // rank inversion across rounds: (c,h) ranked BELOW (bat,ch) still fires
    // first because (bat,ch) needs 'ch' to exist
    assert(v.encodeWord("batch") == Seq("batch"))
    assert(v.encodeWord("batc") == Seq("batc"))           // the dead-end path
    // merge-all-per-round: both (t,h) occurrences merge in one round
    assert(v.encodeWord("ththe") == Seq("th", "the"))
    // unknown chars fall through as singletons
    assert(v.encodeWord("zzz") == Seq("z", "z", "z"))
  }

  test("BPE cache is per-vocab: two merge tables in one thread don't cross-contaminate") {
    import graft.functions.BpeVocab
    val full = new BpeVocab(BpeVocab.Default)
    val empty = new BpeVocab(Seq.empty)
    // same word, same thread, interleaved: counts must reflect each table
    assert(full.encodeCount("the") == 1)
    assert(empty.encodeCount("the") == 3)
    assert(full.encodeCount("the") == 1)
    assert(empty.encodeCount("the") == 3)
  }

  test("BPE token count expression: codegen'd, lowercases, pre-tokenizes") {
    val docs = Seq(
      (1L, "The table"),        // the=1, table=1
      (2L, "windows query!"),   // window+s = 2, query = 1, ! = 1
      (3L, "")                  // empty text -> 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenCounts(docs).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 4L), (3L, 0L)), s"got $out")
    // the expression lives inside whole-stage codegen: no UDF boundary
    val plan = TextAnalysis.bpeTokenCounts(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("tfIdfTopTerms ranks rare repeated terms above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple common"),
      (2L, "banana common"),
      (3L, "common cherry cherry cherry")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, m = 2)
      .orderBy("doc_id", "rnk")
      .select("doc_id", "term", "rnk").as[(Long, String, Long)].collect().toSeq
    // "common" has df=3 -> idf = ln(1) = 0; unique terms rank first
    assert(got == Seq(
      (1L, "apple", 1L), (1L, "common", 2L),
      (2L, "banana", 1L), (2L, "common", 2L),
      (3L, "cherry", 1L), (3L, "common", 2L)))
  }

  test("extractHtmlText strips markup, scripts, comments; decodes entities") {
    val cases = Seq(
      // script/style content is invisible text and must vanish entirely,
      // including the '<' inside the script body
      (1L, "<html><script type=\"a\">var x = 1 < 2;</script>" +
        "<style>p{}</style><p>Hello</p></html>", "Hello"),
      (2L, "a<!-- no --><b>b</b>\n\n  c", "a b c"),
      (3L, "&lt;tag&gt; &amp;amp; Tom&#39;s &quot;x&quot;&nbsp;y",
        "<tag> &amp; Tom's \"x\" y"), // one decode level only
      (4L, "plain text, no markup", "plain text, no markup"),
      (5L, "<p>unclosed <b>nested<i>deep</p>", "unclosed nested deep"),
      (6L, "<SCRIPT>upper</SCRIPT><P>Case</P>", "Case"))
    val out = TextAnalysis.extractHtml(
        cases.toDF("doc_id", "html", "want"), "doc_id", "html")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) => assert(out(id) === want, s"doc $id") }
  }

  test("cleanText: NFC composition, unicode spaces, zero-widths, controls") {
    val rows = Seq(
      (1L, "Cafe\u0301"),              // e + combining acute composes
      (2L, "a\u00A0b\u2003c"),          // NBSP + em-space (\\s misses both)
      (3L, "x\u200B\uFEFFy\u0007z"),    // ZWSP, BOM, BEL stripped
      (4L, "a\n\tb  c"),                // line controls -> space, collapse
      (5L, "already clean")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanText(rows)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Caf\u00E9")
    assert(out(2L) == "a b c")
    assert(out(3L) == "xyz")
    assert(out(4L) == "a b c")
    assert(out(5L) == "already clean")
  }

  test("gopherSignals: each rule fires on its planted violation") {
    val good = (1L, ("the data and results " * 13).trim + " be of that have with")
    val short = (2L, "too short to keep the and of")              // < 50 words
    val symbols = (3L, (("the of ### " * 30).trim))               // symbol ratio
    val bullets = (4L, Seq.fill(60)("- the item of list").mkString("\n"))
    val nonAlpha = (5L, ("the of " + "123 456 789 " * 30).trim)   // alpha frac
    val noStops = (6L, ("alpha beta gamma delta " * 15).trim)     // < 2 stops
    val df = Seq(good, short, symbols, bullets, nonAlpha, noStops)
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherSignals(df, minWords = 50)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "clean doc must survive")
    assert(!got(2L) && !got(3L) && !got(4L) && !got(5L) && !got(6L),
      s"every planted violation must fail its rule: $got")
  }

  test("c4Clean keeps punctuated >=3-word lines, drops js/brace/lorem docs") {
    val df = Seq(
      (1L, "this line stays here.\nshort.\nno terminal punct\n" +
        "var x = javascript thing.\nbad brace { line.\nanother good line!"),
      (2L, "only one good sentence here.\nlorem ipsum dolor."),
      (3L, "first good sentence here.\nsecond good sentence too!\n" +
        "third keeps the doc alive?")).toDF("doc_id", "text")
    val got = TextAnalysis.c4Clean(df).collect().map(r =>
      r.getLong(0) -> (r.getLong(2), r.getString(4), r.getBoolean(5))).toMap
    // doc 1: 'short.' (<3 words), bare line, javascript and { lines die
    assert(got(1L)._2 == "this line stays here.\nanother good line!")
    assert(got(1L)._1 == 2)
    // doc 2 mentions lorem ipsum -> dropped regardless of sentences
    assert(!got(2L)._3)
    // doc 3 has 3 retained sentences -> kept
    assert(got(3L)._3 && got(3L)._1 == 3)
  }

  test("duplicateLineStats counts within-doc exact line twins and their chars") {
    val df = Seq(
      (1L, "nav bar\nunique one\nnav bar\nunique two"),
      (2L, "all\ndistinct\nlines")).toDF("doc_id", "text")
    val got = TextAnalysis.duplicateLineStats(df).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L)._1 == 4 && got(1L)._2 == 2)           // both twin copies count
    assert(got(1L)._3 == 0.5)
    // 14 duplicate chars ('nav bar' x2) over 37 total chars (incl. 3 \n)
    assert(math.abs(got(1L)._4 - math.rint(14.0 / 37 * 10000) / 10000) < 1e-9)
    assert(got(2L)._2 == 0 && got(2L)._3 == 0.0 && got(2L)._4 == 0.0)
  }

  test("graft_nfc_normalize is SQL-registered and codegen-evaluable") {
    graft.functions.GraftSqlFunctions.register(spark)
    val got = spark.sql("SELECT graft_nfc_normalize('Cafe\u0301') AS s")
      .collect().head.getString(0)
    assert(got == "Caf\u00E9")
    assert(spark.sql("SELECT graft_nfc_normalize(CAST(NULL AS STRING)) AS s")
      .collect().head.isNullAt(0))
  }
}
