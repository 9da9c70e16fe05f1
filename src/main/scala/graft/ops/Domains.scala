package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus domain operators — the URL hygiene layer of a crawl-derived
  * training pipeline: normalize URLs to their registered (pay-level)
  * domain, and cap the number of documents any one source/domain may
  * contribute (the CCNet/RefinedWeb-style anti-spam measure: without a
  * cap, a handful of template-heavy domains dominate the corpus).
  *
  * Everything here is built from codegen'd built-in expressions
  * (regexp/split/when) — no UDFs — and the cap selection is a
  * partial-aggregated bounded top-k, so at 100 TB only ≤cap keeper ids
  * per (task, source) ride the shuffle, never the documents.
  */
object Domains {

  /** Country-code second-level registrations the two-label heuristic must
    * not split (`bbc.co.uk` → `bbc.co.uk`, not `co.uk`). A full public
    * suffix list is a data file, not logic — callers with one pass it via
    * `extraTwoLevel`.
    */
  private[ops] val TwoLevelSuffixes: Set[String] = Set(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.in", "co.kr", "co.za", "co.nz", "co.id", "co.th")

  /** Hostname of a URL: scheme, userinfo, port, path/query/fragment
    * stripped, lowercased, leading `www.` dropped. Pure regexp/string
    * expressions — whole-stage codegen, engine-portable.
    */
  def hostOf(url: Column): Column =
    regexp_replace(rawHostOf(url), "^www\\.", "")

  /** Query parameters that never change the document a URL denotes —
    * campaign attribution and click IDs, the standard strip set of
    * web-crawl canonicalization.
    */
  private[ops] val TrackingParamPattern =
    "^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src)="

  /** CANONICAL form of a URL — the dedup key a web-scale ingestion
    * pipeline groups on (the same page arrives via http/https, with/
    * without `www.`, with tracking junk, shuffled query order, trailing
    * slashes and fragments; all of those must collapse):
    *
    *   - scheme and fragment dropped; userinfo dropped
    *   - host lowercased, leading `www.` and default ports (:80/:443)
    *     stripped
    *   - trailing `/`s of the path stripped
    *   - tracking params removed ([[TrackingParamPattern]]), remaining
    *     query params SORTED and rejoined; an emptied query drops its `?`
    *
    * Pure built-in string/array expressions (regexp, split, filter,
    * array_sort, array_join) — whole-stage codegen, no UDF, and every
    * step has an exact DuckDB equivalent so the oracle replays it.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noUser = regexp_replace(noScheme, "^[^/@?]*@", "")
    val hostPort = lower(regexp_extract(noUser, "^([^/?]*)", 1))
    val host = regexp_replace(
      regexp_replace(hostPort, ":(80|443)$", ""), "^www\\.", "")
    val rest = regexp_extract(noUser, "^[^/?]*(.*)$", 1) // path [+ ?query]
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(array_sort(filter(split(query, "&"),
      p => !p.rlike(TrackingParamPattern) && p =!= lit(""))), "&")
    concat(host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** URL-keyed exact dedup: one survivor (lowest `idCol`) per
    * [[canonicalizeUrl]] key — the first dedup stage of a web-crawl
    * pipeline, upstream of content-level near-dup. One map-side-combined
    * hash aggregate ([[Dedup.exact]]); rows with a NULL/empty URL are
    * kept verbatim (no key to collapse on).
    */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.where(col(urlCol).isNotNull && col(urlCol) =!= "")
    val keyless = docs.where(col(urlCol).isNull || col(urlCol) === "")
    Dedup.exact(keyed, Seq(canonicalizeUrl(col(urlCol))), col(idCol))
      .unionByName(keyless)
  }

  /** [[hostOf]] WITHOUT the `www.` strip — PSL matching needs the raw
    * host (the real list has rules like `!www.ck`; and suffix+1 picks
    * `example.com` out of `www.example.com` without any stripping).
    */
  private[ops] def rawHostOf(url: Column): Column = {
    val noScheme = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noUser = regexp_replace(noScheme, "^[^/@]*@", "")
    lower(regexp_extract(noUser, "^([^/:?#]+)", 1))
  }

  /** Registered (pay-level) domain of a URL: the last two host labels, or
    * three when the trailing two are a known two-level public suffix.
    * Hosts with ≤2 labels (and bare words / IPs) pass through whole.
    */
  def registeredDomain(url: Column,
                       extraTwoLevel: Set[String] = Set.empty): Column = {
    val suffixes = TwoLevelSuffixes ++ extraTwoLevel
    val h = hostOf(url)
    val parts = split(h, "\\.")
    val n = size(parts)
    val lastTwo = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val lastThree = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    // an IPv4 host has no registrable labels — pass it through whole
    when(h.rlike("^\\d+(\\.\\d+){3}$"), h)
      .when(n <= 2, h)
      .otherwise(when(lastTwo.isInCollection(suffixes), lastThree)
        .otherwise(lastTwo))
  }

  /** Parsed public-suffix-list rules ([[https://publicsuffix.org/list/]]
    * format): `exact` plain suffix entries, `wildcardParents` the `x` of
    * `*.x` entries (any single label under `x` is a suffix), `exceptions`
    * the `!y` entries (`y` is registrable despite a covering wildcard).
    * The list is DATA, not logic — feed the real ~9k-entry PSL here; the
    * rule sets become plan literals (`InSet` hash lookups, whole-stage
    * codegen, ~200 KB broadcast in the plan — nothing per-row).
    */
  final case class PublicSuffixRules(exact: Set[String],
                                     wildcardParents: Set[String],
                                     exceptions: Set[String]) {
    /** Deepest label count any rule can make a public suffix. */
    private[ops] def maxSuffixLabels: Int =
      ((exact.map(_.count(_ == '.') + 1) ++
        wildcardParents.map(_.count(_ == '.') + 2) ++
        exceptions.map(_.count(_ == '.'))) + 1).max
  }

  /** Parse PSL-format text: one rule per line, `//` comments and blanks
    * skipped, `*.` and `!` prefixes mapped to their rule kinds. Both the
    * ICANN and private sections are kept (split the input beforehand to
    * drop one). Rules are lowercased; the implicit root wildcard (`*` —
    * every bare TLD is a suffix) is the matcher's default and needs no
    * entry.
    */
  def parsePsl(lines: IterableOnce[String]): PublicSuffixRules = {
    val rules = lines.iterator.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.takeWhile(!_.isWhitespace)).toSeq
    PublicSuffixRules(
      exact = rules.filter(r => !r.startsWith("*.") && !r.startsWith("!")).toSet,
      wildcardParents = rules.collect { case r if r.startsWith("*.") => r.drop(2) }.toSet,
      exceptions = rules.collect { case r if r.startsWith("!") => r.drop(1) }.toSet)
  }

  /** Load PSL rules from a text file/dataset path (the list is ~240 KB —
    * bounded driver state by construction).
    */
  def pslRulesFrom(spark: org.apache.spark.sql.SparkSession,
                   path: String): PublicSuffixRules =
    parsePsl(spark.read.textFile(path).collect())

  /** Registered (pay-level) domain under FULL public-suffix-list
    * semantics: the longest matching rule wins, exceptions beat wildcards,
    * and the registered domain is the public suffix plus one label (a
    * host that IS a public suffix passes through whole, as do IPv4
    * literals). Pure split/when/set-membership expressions — one codegen
    * projection, no UDF, rule sets are plan literals.
    */
  def registeredDomainPsl(url: Column, rules: PublicSuffixRules): Column = {
    val h = rawHostOf(url)
    val parts = split(h, "\\.")
    val n = size(parts)
    // last k labels re-joined; for hosts with fewer labels concat_ws skips
    // the null slots, yielding the whole host (which then only matches a
    // rule when the host IS that suffix — pass-through, the right answer)
    def lastK(k: Int): Column =
      // try_element_at: hosts with < k labels yield nulls, which concat_ws
      // skips (ANSI element_at would throw on the out-of-bounds index)
      concat_ws(".", (k to 1 by -1).map(i => try_element_at(parts, lit(-i))): _*)
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s)
    def byDepth(s: Set[String], d: Int): Set[String] =
      s.filter(_.count(_ == '.') == d - 1)
    val maxK = math.max(2, rules.maxSuffixLabels)
    // deepest rules first (longest match wins); within a depth, exception
    // beats wildcard beats exact. `registered(k)` = suffix has k labels.
    def registered(k: Int): Column = when(n > k, lastK(k + 1)).otherwise(h)
    val chain = (maxK to 1 by -1).foldLeft(Option.empty[Column]) { (acc, k) =>
      val step = when(inSet(lastK(k), byDepth(rules.exceptions, k)), lastK(k))
        .when(inSet(lastK(k - 1), byDepth(rules.wildcardParents, k - 1)) && (n >= k),
          registered(k))
        .when(inSet(lastK(k), byDepth(rules.exact, k)), registered(k))
      // acc holds the DEEPER depths' chain — longest match wins, so it
      // stays in front of this (shallower) step
      Some(acc.fold(step)(deeper => coalesce(deeper, step)))
    }.get
    when(h.rlike("^\\d+(\\.\\d+){3}$"), h)
      .otherwise(coalesce(chain, registered(1))) // implicit root wildcard: TLD+1
  }

  /** Keep at most `cap` documents per source/domain, deterministically.
    *
    * Keeper election is "the `cap` SMALLEST `orderKey` values per source,
    * ties by id" through the bounded [[graft.functions.TopKPairs]]
    * aggregate (score = −orderKey): each map task ships at most `cap`
    * (key, id) pairs per source it saw, so the shuffle is O(cap ·
    * sources · tasks) scalars — a window `row_number` here would shuffle
    * AND sort every document row. Keeper ids then semi-join the corpus
    * back (ids only on the build side).
    *
    * The default order key is `xxhash64(id)` — an unbiased deterministic
    * shuffle, so the cap keeps a pseudo-random sample of each oversized
    * domain rather than its earliest ids. Pass `orderKey` explicitly for
    * reproducible cross-engine selections (e.g. the id itself); it is
    * compared in 64-bit integer space (cast to BIGINT — the long-score
    * [[graft.functions.TopKPairsLong]] heap, so full-range hash keys
    * never collapse the way a double embedding collapses longs past 2⁵³).
    *
    * A NULL source is its own group (capped like any other); a NULL id
    * row is dropped (it cannot be elected deterministically).
    */
  def capPerSource(docs: DataFrame, cap: Int,
                   sourceCol: String = "source", idCol: String = "doc_id",
                   orderKey: Option[Column] = None): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val key = orderKey.getOrElse(xxhash64(col(idCol)))
    // smallest-key election through a LARGEST-kept heap: bitwise NOT is
    // the overflow-free order-reversing bijection on longs (−x overflows
    // at Long.MinValue)
    val keepers = docs
      .where(col(idCol).isNotNull)
      .select(col(sourceCol).as("__src"), col(idCol).cast("long").as("__id"),
        bitwise_not(key.cast("long")).as("__k"))
      .groupBy("__src")
      .agg(graft.functions.TopKPairsLong.topK(col("__k"), col("__id"), cap).as("top"))
      .select(col("__src"), explode(col("top.id")).as("__keep"))
    // keeper identity is (source, id), not id alone: the same id under
    // two sources must win its cap in EACH source independently
    docs.join(keepers,
      col(sourceCol) <=> col("__src") && col(idCol).cast("long") === col("__keep"),
      "left_semi")
  }
}
