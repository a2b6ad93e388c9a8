package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kit: canonical tokenizer, shingles, portable hashing, quality and
  * language heuristics. Everything here is built-in-expression only (no UDFs)
  * so whole-stage codegen applies and the 100 TB path stays vectorized.
  *
  * Canonical tokenizer spec (FIXTURES.md): mirrors the reference's DL4J
  * DefaultTokenizerFactory + CommonPreprocessor
  * (reference: 13486_Code/src/main/scala/chapter2/Word2VecTransformingIterator.java:55-56,95).
  */
object TextFunctions {

  /** lower → normalize ALL whitespace to spaces → strip non-[a-z0-9 ] →
    * split on runs of spaces → drop empties. Lowercasing happens BEFORE the
    * strip (as DL4J's CommonPreprocessor does) so "Hello" tokenizes to
    * "hello"; the whitespace normalization keeps newlines/tabs as
    * separators ("end.\nStart" → [end, start], never "endstart").
    *
    * Implemented by the native single-pass plans.Tokenize expression —
    * semantically identical to [[tokenizeComposed]] (asserted in
    * FunctionsSpec) but one fused char scan instead of two regex passes
    * plus a split. Constructed registry-independently (plans.NativeColumns)
    * so it works under any SparkSession, extensions installed or not.
    */
  def tokenize(text: Column): Column = graft.plans.NativeColumns.tokenize(text)

  /** The built-in-expression formulation of the same tokenizer spec; the
    * parity reference for [[tokenize]].
    */
  def tokenizeComposed(text: Column): Column =
    filter(split(regexp_replace(regexp_replace(lower(text), "\\s", " "), "[^a-z0-9 ]", ""),
      " +"), t => t =!= "")

  /** Portable 32-bit hash: first 8 hex chars of md5, as an unsigned long.
    * Identical in any engine with md5 (DuckDB: CAST('0x'||substr(md5(x),1,8) AS BIGINT)),
    * so oracle checks of hash-based operators (MinHash/SimHash) are exact.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Portable 60-bit hash: first 15 hex chars of md5 as a (positive) long.
    * DuckDB twin: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT). Use when
    * a digest stands in for string identity at corpus scale — at 10^12
    * distinct keys the expected collision count is ~10^24/2^61 ≈ a few
    * hundred thousand (fraction 4e-7), vs ~10^8 colliding PAIRS for
    * [[hash32]] — while still shuffling 8 bytes instead of a 32-char md5
    * string.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** n-token shingles ("w1 w2 w3" strings). Empty array when the doc is
    * shorter than n (guard: sequence(1, k) with k<1 would count down).
    */
  def shingles(tokens: Column, n: Int): Column = {
    val k = size(tokens) - (n - 1)
    when(k >= 1,
      transform(sequence(lit(1), k),
        i => concat_ws(" ", (0 until n).map(j => element_at(tokens, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Document fingerprint: md5 over the canonically-tokenized text, so
    * whitespace/punctuation variants collapse to one fingerprint. NULL
    * text fingerprints as null (review r9: concat_ws skips nulls, so
    * unguarded md5 would collapse every null-text row into the
    * empty-document bucket — the kit's other functions null-propagate).
    */
  def fingerprint(text: Column): Column =
    when(text.isNotNull, md5(concat_ws(" ", tokenize(text))))

  /** Rolling polynomial fingerprint over the token sequence:
    * h = fold((acc * 31 + hash32(token)) mod 1e9+7). Order-sensitive (unlike
    * a bag-of-words md5), cheap to maintain incrementally, and portable —
    * the md5-derived per-token hash makes it engine-reproducible.
    */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => (acc * 31L + hash32(t)) % 1000000007L)

  /** Fraction of characters outside [a-z0-9 ] after lowercasing. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n > 0, length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("double") / n)
      .otherwise(lit(0.0))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

  /** Fraction of tokens that are common-English stopwords. */
  def stopwordRatio(tokens: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val stops = array(stopwords.map(lit): _*)
    when(size(tokens) > 0,
      size(filter(tokens, t => array_contains(stops, t))).cast("double") / size(tokens))
      .otherwise(lit(0.0))
  }

  /** Heuristic quality score in [0,1]: linear blend of stopword density,
    * length saturation and cleanliness. Deliberately transcendental-free so
    * the DuckDB oracle matches bit-for-bit after round(…, 6).
    */
  def qualityScore(text: Column, tokens: Column): Column = {
    val lenSat = least(size(tokens).cast("double") / 100.0, lit(1.0))
    // EXPLICIT null propagation: least() skips null operands, so a null
    // document would otherwise score 0.6 under ANSI mode and ~0.297 under
    // legacy sizeOfNull -- a quality gate must not admit null junk, and
    // must not flip with spark.sql.ansi.enabled (review r10)
    when(text.isNull || tokens.isNull, lit(null).cast("double"))
      .otherwise(lit(0.4) * stopwordRatio(tokens) + lit(0.3) * lenSat +
        lit(0.3) * (lit(1.0) - punctRatio(text)))
  }

  /** BPE-ish subword count: alpha runs, digit runs, or single non-space
    * symbols — a cheap proxy for tokenizer-cost estimation at corpus scale.
    */
  def bpeTokenCount(text: Column): Column =
    // explicit null branch: legacy sizeOfNull would return -1 (a nonsense
    // negative count silently deflating aggregates) while ANSI returns
    // NULL -- pin the NULL semantics independent of session config (r10)
    when(text.isNull, lit(null).cast("int"))
      .otherwise(size(regexp_extract_all(lower(text),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))

  /** Gopher-style repetition signal: the fraction of n-gram occurrences
    * that repeat an earlier occurrence within the document —
    * (total - distinct) / total n-grams, 0 for docs too short to have one.
    * High values mark boilerplate/looping text that LLM-corpus quality
    * filters cut. Per-row expression: no shuffle, no UDF.
    */
  def repetitionRatio(tokens: Column, n: Int): Column = {
    val grams = shingles(tokens, n)
    when(size(grams) > 0,
      (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
      .otherwise(lit(0.0))
  }

  /** Character-trigram profile language id: counts hits of each language's
    * characteristic trigrams in the lowercased text, argmax wins (ties in
    * fixed order, 'und' when nothing matches). Complements the token-level
    * [[langId]] — n-grams survive texts where stopwords are absent
    * (headlines, fragments).
    */
  /** Authoritative trigram profiles behind [[langIdNgram]] (public for
    * the oracle, same single-sourcing rule as [[LangIdStopwordProfiles]]).
    */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ing", "ion", " the ", " and "),
    "de" -> Seq("sch", "ein", "ich", "der ", " und ", "che"),
    "fr" -> Seq(" le ", " les ", "eau", "oux", " est ", "que "),
    "es" -> Seq(" el ", " los ", "ción", " es ", " una ", "ado"))

  def langIdNgram(text: Column): Column = {
    val profiles = TrigramProfiles
    val t = lower(text)
    val hits = profiles.map { case (lang, grams) =>
      // the split-based count is already 0 when the gram is absent (one
      // part, minus one) — a contains() pre-check would scan the text a
      // second time per gram for identical output (review r9); null text
      // null-propagates to every count and lands on 'und' either way
      lang -> grams.map(g =>
        size(split(t, java.util.regex.Pattern.quote(g), -1)) - 1)
        .reduce(_ + _)
    }
    argmaxLabel(hits)
  }

  /** First label whose hit count equals the (positive) maximum — the
    * shared tiebreak of BOTH language-id paths; one definition so a
    * threshold or tie-order tweak cannot desync them or their DuckDB
    * oracle twins (review r10).
    */
  private def argmaxLabel(hits: Seq[(String, Column)]): Column = {
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((lang, h), acc) =>
      when(h === best && h > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Tracking-noise query params canonicalUrl strips, single-sourced with
    * the DuckDB oracle twin (DedupQueries) so the two engines cannot
    * silently diverge. `ref` is deliberately NOT here (review r10): unlike
    * `utm_`-prefixed params or fbclid it is widely SEMANTIC (a branch, a
    * section anchor), and stripping it wrongly merged genuinely different
    * pages -- violating canonicalization's only-under-merge contract.
    */
  val TrackingParamPattern: String = "^(utm_[^=]*|fbclid|gclid|mc_cid|mc_eid)(=|$)"

  /** Canonicalize a URL for URL-level dedup — the FIRST dedup pass of a
    * web-scrape curation pipeline: re-crawls of the same page meet on
    * their canonical URL before any text ever compares. Rules (each one a
    * real crawl-noise source):
    *
    *  1. trim surrounding whitespace;
    *  2. lowercase scheme and host (case-insensitive per RFC 3986
    *     §6.2.2.1); path and query stay case-SENSITIVE;
    *  3. drop the fragment (`#...` is client-side only — never reaches
    *     the server, so it cannot distinguish pages);
    *  4. drop the scheme's default port (`:80` for http, `:443` for
    *     https — only when it matches the scheme);
    *  5. drop tracking params (`utm_*`, `fbclid`, `gclid`,
    *     `mc_cid`, `mc_eid`) and SORT the remaining query params
    *     (crawl-order noise; param order is semantically irrelevant to
    *     the overwhelming majority of servers);
    *  6. collapse trailing slashes in the path (`/a/` == `/a`); an empty
    *     path becomes `/`.
    *
    * A string with no `scheme://` prefix passes through trimmed — dedup
    * treats malformed keys as opaque rather than guessing. Userinfo
    * (`user:pass@`) keeps its case — it is case-SENSITIVE per RFC 3986,
    * so only the host after the last `@` is folded. Deliberately OUT of
    * scope: percent-encoding normalization (`%2f` vs `%2F` —
    * case-folding safely requires reserved-character awareness; two
    * encodings of one page stay two keys, which only under-merges, never
    * wrongly merges) and IDN/punycode folding. Pure built-in
    * expressions (regexp/array ops, no UDF), so the pass stays inside
    * whole-stage codegen on a 100 TB URL column.
    */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // userinfo (through the LAST '@') keeps its case; only the real host
    // lowercases
    val hostportRaw = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val hostport = concat(regexp_extract(hostportRaw, "^(.*@)", 1),
      lower(regexp_replace(hostportRaw, "^.*@", "")))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val trimmedPath = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val path = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    // query = between the first '?' BEFORE any '#' and the fragment: an
    // unanchored \? would resurrect a '?' inside the fragment as a query
    val query = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike(TrackingParamPattern))
    val qn = array_join(array_sort(kept), "&")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, path,
        when(qn === "", lit("")).otherwise(concat(lit("?"), qn))))
  }

  /** Stopword-list hit counts per language → argmax language id. N-gram-free
    * heuristic; ties resolve in fixed list order (en, de, fr, es).
    */
  /** The authoritative stopword profiles behind [[langId]] — public so
    * the DuckDB oracle derives from the SAME data (review r9: the oracle
    * carried a hand-maintained copy that could silently desync).
    */
  val LangIdStopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "una"))

  def langId(tokens: Column): Column = {
    val hits = LangIdStopwordProfiles.map { case (lang, ws) =>
      lang -> size(filter(tokens, t => array_contains(array(ws.map(lit): _*), t)))
    }
    argmaxLabel(hits)
  }
}
