package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, fingerprinting, n-gram shingling, quality scoring,
  * heuristic language ID. All pure Catalyst expressions (no UDFs), so
  * they stay inside codegen / vectorized evaluation and scale linearly
  * with no serialization boundary.
  */
object TextFunctions {

  /** Whitespace-delimited tokens. `\S+` (rather than `split` on `\s+`)
    * avoids empty leading/trailing tokens and matches the RE2/Java regex
    * intersection, so an external oracle computes the same thing.
    */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("""\S+"""), lit(0))

  /** Codegen'd byte-loop count (TokenCountExpr), not `size(tokens(c))`
    * — same `\S+` semantics without materializing the token array or
    * running the regex. Use [[tokens]] only when the tokens themselves
    * are consumed.
    */
  def tokenCount(c: Column): Column = graft.plans.HashExpressions.tokenCount(c)

  /** BPE-ish pre-tokenizer pattern (GPT-2 style, simplified to the
    * Java-regex/RE2 intersection — no lookahead): contractions, letter
    * runs, digit runs, punctuation runs, whitespace runs. Counting these
    * approximates LLM token counts far better than whitespace words on
    * punctuated/numeric text.
    */
  val BpePattern: String = """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(BpePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Canonical whitespace/case normalization used for fingerprinting —
    * one codegen'd byte pass (NormalizeWsExpr), byte-identical to
    * `trim(regexp_replace(lower(c), '\s+', ' '))` (pinned in spec).
    */
  def normalizeWhitespace(c: Column): Column =
    graft.plans.HashExpressions.normalizeWs(c)

  /** Deterministic document fingerprint over normalized text: identical
    * up to case/whitespace => identical fingerprint. 128-bit hex, safe as
    * an exact-dedup key at any scale.
    */
  def fingerprint(c: Column): Column = md5(normalizeWhitespace(c))

  /** CCNet-style AGGRESSIVE normalization for dedup keys — the
    * canonicalization their dedup hashes on (lowercase, unified
    * punctuation, every digit bucketed to 0) so trivially-variant
    * copies (smart quotes, serial numbers, timestamps) collapse:
    *   1. lowercase;
    *   2. curly quotes -> ASCII, en/em dash -> '-', NBSP -> space,
    *      zero-width chars DELETED (one `translate`, whose
    *      shorter-"to" deletion semantics are Postgres/DuckDB-portable);
    *   3. control bytes stripped;
    *   4. digits -> 0;
    *   5. whitespace runs collapsed, trimmed.
    * Composed from engine-portable primitives on purpose — the oracle
    * replays it verbatim (q_text_normalize), unlike a JVM-only NFKC
    * pass.
    */
  def normalizeAggressive(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          translate(lower(c),
            // \u2019 \u2018 \u201C \u201D \u2013 \u2014 NBSP, then
            // ZWSP ZWNJ ZWJ BOM (deleted: no "to" counterpart)
            "\u2019\u2018\u201C\u201D\u2013\u2014\u00A0\u200B\u200C\u200D\uFEFF",
            "''\"\"-- "),
          // \x09-\x0d are WHITESPACE controls: they must survive to
          // the \s+ collapse (a newline separates words), so the strip
          // covers only the non-whitespace control bytes.
          "[\\x00-\\x08\\x0e-\\x1f\\x7f]", ""),
        "[0-9]", "0"),
      "\\s+", " "))

  /** Exact-dedup key over [[normalizeAggressive]] — collapses the
    * trivially-variant copies [[fingerprint]] keeps distinct.
    */
  def fingerprintAggressive(c: Column): Column = md5(normalizeAggressive(c))

  /** Word n-grams (space-joined token windows); empty array when the
    * document has fewer than n tokens.
    */
  def wordNGrams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
  }

  /** Character n-grams over normalized text. */
  def charNGrams(c: Column, n: Int): Column = {
    val s = normalizeWhitespace(c)
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(s) - lit(n - 1)),
        i => s.substr(i, lit(n))))
  }

  /** URL host: the authority's host part, lowercased — scheme required
    * (a URL corpus column, not free text), credentials/port/path/query
    * stripped by the character class. Plain `regexp_extract` rather
    * than Spark's `parse_url` so the DuckDB oracle replays the exact
    * same extraction (parse_url's java.net.URI semantics have no
    * cross-engine twin). Non-URLs yield the empty string.
    */
  def urlHost(c: Column): Column =
    lower(regexp_extract(c, """^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)""", 1))

  /** URL canonicalization for web-corpus dedup keys (the CCNet/
    * Common-Crawl normalization): drop the fragment, lowercase
    * scheme://authority (path and query keep their case — they are
    * case-significant), strip default ports (:443 on https, :80 on
    * http), excise tracking parameters (utm_*, fbclid, gclid, ref)
    * with three-step query-string surgery that preserves the survivors'
    * separators, and trim trailing slashes. Pure regexp chain — no
    * lookaheads, so the RE2-based oracle replays it verbatim (DuckDB
    * side uses \1 replacement refs and the 'g' flag where Spark is
    * global by default). Two URLs that canonicalize equal are the
    * same fetch target for dedup purposes. Inputs that don't match the
    * scheme://authority shape (schemeless 'example.com/p', mailto:,
    * relative paths) fall back to the fragment-stripped input rather
    * than collapsing to '' — an empty key would silently merge every
    * malformed URL into one dedup group.
    */
  def canonicalUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val head = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)", 1)
    val lowered = when(length(head) === 0, noFrag).otherwise(concat(head, rest))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443(/|\\?|$)", "$1$2"),
      "^(http://[^/:?#]+):80(/|\\?|$)", "$1$2")
    val t1 = regexp_replace(noPort,
      "&(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*", "")
    val t2 = regexp_replace(t1,
      "\\?(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*&", "?")
    val t3 = regexp_replace(t2,
      "\\?(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*$", "")
    rtrim(t3, "/")
  }

  /** Registered (pay-level) domain from a host: the last two labels,
    * or three when the second-to-last is a common second-level suffix
    * under a 2-letter ccTLD (`bbc.co.uk`, not `co.uk`). The standard
    * offline heuristic (covers the co/com/net/org/gov/ac/edu
    * second-levels that dominate real crawls) — kept as the
    * oracle-replayable fallback; [[registeredDomainPsl]] is the
    * rule-table upgrade that handles multi-label suffixes
    * (`k12.ma.us`), wildcards and exceptions. Hosts with <= 2 labels
    * pass through unchanged.
    */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val np = size(parts)
    val secondLevel = element_at(parts, -2)
    val tld = element_at(parts, -1)
    when(np <= 2, host)
      .otherwise(when(
        secondLevel.isin("co", "com", "net", "org", "gov", "ac", "edu") &&
          length(tld) === 2,
        concat_ws(".", slice(parts, -3, 3)))
        .otherwise(concat_ws(".", slice(parts, -2, 2))))
  }

  /** Registered domain under the shipped public-suffix snapshot
    * ([[PublicSuffix]]) — full PSL semantics (longest-match rules,
    * wildcards, exceptions) as one codegen'd row-local probe. Use this
    * for per-domain capping on real crawl data; [[registeredDomain]]
    * stays as the rule-free heuristic.
    */
  def registeredDomainPsl(host: Column): Column =
    PublicSuffix.registeredDomain(host)

  /** Punctuation character count (explicit class — identical semantics in
    * Java regex and RE2, unlike `\p{Punct}`).
    */
  val PunctClass = """[.,;:!?'"()\[\]{}-]"""

  /** The class characters without regex escaping, for the byte-table kernel. */
  private val PunctChars = """.,;:!?'"()[]{}-"""

  def punctCount(c: Column): Column =
    graft.plans.HashExpressions.asciiSetCount(c, PunctChars)

  /** Tiny multilingual stopword lists for the heuristic language scorer. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"))

  /** Codegen'd kernel (TokenSetCountExpr), not
    * `size(filter(tokens(lower(c)), isin(set)))`: identical semantics
    * (same `\S+` tokenization, exact member match), but one primitive
    * byte loop instead of a regex pass plus an interpreted HOF
    * predicate per token. quality+language annotation runs five of
    * these per document, so this is the corpus scan's hot loop.
    */
  def stopwordCount(c: Column, lang: String = "en"): Column =
    graft.plans.HashExpressions.tokenSetCount(lower(c), Stopwords(lang))

  /** Token hits against an arbitrary LEXICON (case-insensitive exact
    * member match) — the C4-style blocklist gate: C4 dropped any page
    * containing a "bad words" list member; RefinedWeb and Dolma keep
    * the same shape with tuned lists and thresholds. Same codegen'd
    * byte-loop kernel as [[stopwordCount]] (one tokenize + set-probe
    * pass, zero shuffle), so adding a blocklist to the annotate scan is
    * free. The list itself is caller-supplied policy, not engine code.
    */
  def lexiconHitCount(c: Column, lexicon: Seq[String]): Column = {
    require(lexicon.nonEmpty, "lexicon must not be empty")
    graft.plans.HashExpressions.tokenSetCount(lower(c), lexicon.map(_.toLowerCase).distinct)
  }

  /** Engine-independent 60-bit hash per token: the first 15 hex digits of
    * md5, parsed as an integer. ~10x slower than the FNV-1a kernel
    * (TokenHashesExpr) — production sketches use that; this feeds the
    * sketch KERNELS (SimHash majority vote, winnowing selection) in the
    * oracle-checked contract queries, where any engine with md5 can
    * recompute the identical hash stream.
    */
  def md5TokenHashes(c: Column): Column =
    transform(tokens(c), tk => conv(substring(md5(tk), 1, 15), 16, 10).cast("long"))

  /** [[md5TokenHashes]] over word n-grams (space-joined windows). */
  def md5GramHashes(c: Column, n: Int): Column =
    transform(wordNGrams(c, n), g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))

  /** Single-pass token statistics (n_tokens, total_len, n_stopwords) as
    * a struct — a codegen'd byte-loop kernel (TokenStatsExpr). The
    * previous aggregate-fold formulation was semantically identical but
    * interpreted per token, and relied on a multi-referenced-struct
    * CollapseProject subtlety to avoid re-tokenization; the kernel is
    * one pass regardless of how consumers project the fields.
    */
  def tokenStats(c: Column, lang: String = "en"): Column =
    graft.plans.HashExpressions.tokenStats(c, Stopwords(lang))

  /** Unicode-script character ranges for script-first language routing.
    * Kana implies Japanese even when Han characters dominate, so it is
    * checked before the CJK range.
    */
  private val ScriptRanges: Seq[(String, String)] = Seq(
    "ja" -> """[ぁ-ゟ゠-ヿ]""", // hiragana + katakana
    "ko" -> """[가-힣]""", // hangul syllables
    "zh" -> """[一-鿿]""", // han
    "ru" -> """[А-яЁё]""", // cyrillic
    "ar" -> """[؀-ۿ]""", // arabic
    "hi" -> """[ऀ-ॿ]""") // devanagari

  /** Heuristic language ID, two stages:
    *  1. script routing — a non-Latin script (kana, hangul, han,
    *     cyrillic, arabic, devanagari) decides immediately; kana beats
    *     han so Japanese text with kanji is not labeled zh. `rlike`
    *     (exists) instead of match counting: the scan stops at the
    *     first script hit instead of extracting every match;
    *  2. Latin-script texts score against per-language stopword lists
    *     (ties resolve in en,es,de,fr order), else "und" — ONE
    *     tokenize pass through the multi-set argmax kernel
    *     (TokenSetBestExpr, r20). The previous CaseWhen running-max
    *     over four separate [[stopwordCount]] kernels re-evaluated
    *     each count per conditional reference (codegen subexpression
    *     elimination does not hoist branch-local subtrees), and the
    *     whole `latin` tree is itself referenced from two conditional
    *     contexts below — up to ~10 tokenize passes per row where one
    *     suffices. The kernel's first-strict-max + zero-hit-fallback
    *     semantics are exactly the fold's (property-pinned against
    *     the CaseWhen form in TextFunctionsSpec). An earlier
    *     HOF-aggregate attempt (4-counter struct accumulator) measured
    *     2.3x SLOWER — interpreted lambdas — which is why this is a
    *     kernel, not a fold.
    * A real pipeline would swap in a trained n-gram profile model; the
    * operator shape (pure column expression, no shuffle) is the part
    * that matters at scale.
    */
  def languageId(c: Column): Column = {
    val langs = Seq("en", "es", "de", "fr")
    // coalesce: the old fold's null-input path collapsed to "und"
    // (null > 0 is null, so every when() fell through); the kernel
    // null-propagates, so pin the same contract explicitly.
    val latin = coalesce(
      graft.plans.HashExpressions.tokenSetBest(
        lower(c), langs.map(Stopwords), langs :+ "und"),
      lit("und"))
    val scriptRouted = ScriptRanges.foldRight(latin) {
      case ((lang, pattern), fallback) =>
        when(c.rlike(pattern), lang).otherwise(fallback)
    }
    // Every script range is above U+0080, so a pure-ASCII document can
    // skip all six regex scans after ONE early-exit byte check — the
    // dominant case in a mostly-Latin corpus.
    when(graft.plans.HashExpressions.hasNonAscii(c), scriptRouted).otherwise(latin)
  }

  /** Intra-document repetition: fraction of duplicate word n-grams —
    * the boilerplate/loop-generation quality signal pre-training filters
    * gate on alongside [[qualityScore]]. Row-local (hashed shingles, no
    * shuffle); 0.0 for docs with fewer than n tokens.
    */
  def repetitionRatio(c: Column, n: Int = 3): Column = {
    val grams = graft.plans.HashExpressions.wordNGramHashes(c, n)
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
      .otherwise(0.0)
  }

  /** Gopher-style top-gram fraction: the share of the document's word
    * n-grams occupied by its single most frequent gram. Catches the
    * long-loop boilerplate (`foo bar foo bar ...`) that
    * [[repetitionRatio]]'s distinct-ratio only sees diluted. Row-local
    * and shuffle-free — ONE codegen'd byte pass (TopGramFracExpr): the
    * r7 lesson that HOF lambdas evaluate interpreted applies here with
    * a vengeance — the sort + fold costs 780s on the 500k-doc stress
    * vs 2.2s for the kernel (the lambda re-evaluates its struct state
    * per element, and array_sort pays per-comparison interpreted
    * dispatch); [[topGramFractionHof]] keeps the declarative twin it
    * is property-tested against.
    */
  def topGramFraction(c: Column, n: Int = 2): Column =
    graft.plans.HashExpressions.topGramFrac(c, n)

  /** The declarative formulation (array_sort + longest-equal-run fold):
    * max multiplicity of a gram == longest run in the sorted gram array,
    * so this and the kernel agree exactly — pinned in
    * TextFunctionsSpec/KernelPropertySpec. Interpreted lambda: use the
    * kernel on hot paths.
    */
  def topGramFractionHof(c: Column, n: Int = 2): Column = {
    val grams = array_sort(wordNGrams(c, n))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    val best = aggregate(
      grams,
      zero,
      (a, x) => {
        val run = when(x === a.getField("prev"), a.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(a.getField("best"), run).as("best"))
      },
      a => a.getField("best"))
    when(size(grams) > 0, best.cast("double") / size(grams)).otherwise(0.0)
  }

  /** PII patterns in the Java-regex/RE2 intersection (no lookaround, no
    * backreferences), so an external RE2-based engine finds the exact
    * same spans. Listed in REDACTION ORDER: every replacement token is
    * digit-free, so an earlier redaction can never create a match for a
    * later pattern (e.g. SSNs are consumed before the phone pattern can
    * see their digits).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "IP" -> """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""",
    "SSN" -> """\b\d{3}-\d{2}-\d{4}\b""",
    "PHONE" -> """(?:\+?\d{1,2}[ -])?\(?\d{3}\)?[ -]?\d{3}[ -]?\d{4}\b""")

  /** Occurrences of one PII kind. Count on the ORIGINAL column — after
    * [[redactPii]] the spans are gone by construction.
    */
  def piiCount(c: Column, kind: String): Column =
    size(regexp_extract_all(c, lit(PiiPatterns.toMap.apply(kind)), lit(0)))

  /** Redact every PII kind to a bracketed token ([EMAIL], [IP], [SSN],
    * [PHONE]) in [[PiiPatterns]] order. A training-data pipeline runs
    * this as a row-local projection: no shuffle, linear at 100 TB.
    * Idempotent — redaction tokens contain no pattern-matchable
    * characters.
    *
    * One codegen'd byte-scan kernel (RedactPiiExpr), byte-exact to the
    * four-regexp_replace cascade over [[PiiPatterns]]
    * ([[redactPiiRegex]], the reference formulation it is
    * property-tested against): no Matcher allocation, no generic NFA
    * loop, no intermediate string between passes, and the per-kind
    * prescan (digits gate IP/SSN/PHONE, '@' gates EMAIL) folded into
    * the same scan — a clean document costs one classification pass
    * and zero copies.
    */
  def redactPii(c: Column): Column = graft.plans.HashExpressions.redactPii(c)

  /** The regex formulation of [[redactPii]] — the semantic reference
    * the kernel is property-tested against, and the form an engine
    * without the kernel (or the DuckDB oracle) runs directly.
    */
  def redactPiiRegex(c: Column): Column = {
    val cascade = PiiPatterns.foldLeft(c) { case (acc, (kind, p)) =>
      regexp_replace(acc, p, s"[$kind]")
    }
    when(graft.plans.HashExpressions.asciiSetCount(c, "0123456789@") > 0, cascade)
      .otherwise(c)
  }

  /** Unicode NFC normalization (compose decomposed sequences): run it
    * BEFORE fingerprinting or lexicon matching on multilingual text —
    * "café" in NFC and NFD are different byte strings and would split a
    * dedup group or dodge a blocklist. Codegen'd with an ASCII fast
    * path (one scan, zero work on the dominant case). The oracle replay
    * is DuckDB's nfc_normalize.
    */
  def normalizeNfc(c: Column): Column = graft.plans.HashExpressions.nfcNormalize(c)

  /** Strip HTML/XML markup — the WET-style text-extraction stage every
    * web corpus runs before any quality signal: script/style elements
    * die WITH their content, remaining tags become a single space (so
    * `</p><p>` never glues words), and the common named/numeric
    * entities unescape (`&amp;` LAST — unescaping it earlier would
    * double-decode `&amp;lt;`). A regex cascade in the Java-regex/RE2
    * intersection, so the DuckDB oracle replays it verbatim; row-local
    * and shuffle-free like the rest of the annotate scan. Compose with
    * [[normalizeWhitespace]] afterwards — tag removal deliberately
    * leaves the spacing for the caller's normalizer.
    */
  def stripMarkup(c: Column): Column = {
    val noScript = regexp_replace(c,
      """(?is)<(script|style)[^>]*>.*?</(script|style)>""", " ")
    val noTags = regexp_replace(noScript, """<[^>]+>""", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&") // amp last: see scaladoc
    // entity strings contain no regex metacharacters, and staying
    // plain keeps the pattern in the RE2 intersection (\Q\E is not)
    entities.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
  }

  /** Shannon entropy (bits) of the document's BYTE distribution — the
    * compression-style quality signal: padded/repeated-character noise
    * collapses toward 0 bits, natural prose sits ~4-4.5, and
    * uniform-random bytes approach 8, so both degenerate tails of a
    * corpus gate on one number. One codegen'd 256-counter pass
    * (ByteEntropyExpr), zero shuffle. Byte entropy equals CHARACTER
    * entropy on ASCII text; multi-byte scripts score their UTF-8 byte
    * stream (still a perfectly usable signal, just not char entropy).
    */
  def byteEntropy(c: Column): Column = graft.plans.HashExpressions.byteEntropy(c)

  /** DEFLATE-compressed byte count of the text (zlib level 6) — the
    * numerator of the compression-ratio quality signal (Rae et al.
    * 2021, Gopher: highly repetitive documents compress far below
    * prose; already-compressed/binary junk sits near or above 1.0).
    * Codegen'd kernel; one 8 KiB scratch per row regardless of size.
    */
  def deflateSize(c: Column): Column =
    graft.plans.HashExpressions.deflateSize(c)

  /** Compression ratio deflate_bytes/raw_bytes, 6dp, null for empty
    * text. ~0.1 = pathologically repetitive, ~0.4-0.7 = normal prose,
    * ≥ ~1.0 = high-entropy (the filter reads BOTH tails).
    */
  def compressionRatio(c: Column): Column =
    when(octet_length(c) > 0,
      round(deflateSize(c).cast("double") / octet_length(c), 6))

  /** Quality features: a typical pre-training filter set (length, token
    * stats, punctuation/stopword ratios) plus a composite [0,1] score.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val nChar = length(c)
    val avgTokLen = when(nTok > 0, nChar.cast("double") / nTok).otherwise(0.0)
    val stopRatio = when(nTok > 0, stopwordCount(c).cast("double") / nTok).otherwise(0.0)
    val lengthOk = when(nTok >= 5 && nTok <= 100000, 1.0).otherwise(0.0)
    val tokLenOk = when(avgTokLen >= 2 && avgTokLen <= 12, 1.0).otherwise(0.0)
    val punctOk = when(nChar > 0 && punctCount(c).cast("double") / nChar <= 0.2, 1.0).otherwise(0.0)
    round((lengthOk + tokLenOk + punctOk + least(stopRatio * lit(5.0), lit(1.0))) / 4.0, 4)
  }

  /** Readability counters (the deterministic regex variants — the
    * classic formulas' inputs without a dictionary): whitespace words,
    * sentence-terminator runs ([.!?]+, floored at 1 so headline-style
    * fragments count as one sentence), and heuristic syllables =
    * vowel-group runs ([aeiouy]+ on the lowercased text) plus one for
    * each vowel-less word (Flesch counts every word ≥ 1 syllable;
    * groups cannot span words because whitespace separates them, so
    * whole-text match counts equal per-word sums — no explode).
    */
  def sentenceCount(c: Column): Column =
    greatest(size(regexp_extract_all(c, lit("""[.!?]+"""), lit(0))), lit(1))

  def syllableCount(c: Column): Column = {
    val lc = lower(c)
    val vowelGroups = size(regexp_extract_all(lc, lit("[aeiouy]+"), lit(0)))
    val wordsWithVowel =
      size(regexp_extract_all(lc, lit("""\S*[aeiouy]\S*"""), lit(0)))
    vowelGroups + (tokenCount(c) - wordsWithVowel)
  }

  /** Unicode-script character counts over EXPLICIT code-point ranges —
    * deliberately not \p{Script=...} classes, whose names differ
    * between Java regex and RE2 (\p{IsCyrillic} vs \p{Cyrillic}) and
    * whose memberships shift with Unicode versions; a literal
    * [\x{0400}-\x{04FF}] means the same thing in every engine forever.
    * The multilingual-routing signal language-ID needs BEFORE n-gram
    * models apply (a CJK doc through a Latin trigram model scores
    * garbage confidently).
    */
  def scriptCount(c: Column, script: String): Column = {
    val range = script match {
      case "latin"    => "[A-Za-z]"
      case "cyrillic" => "[\\x{0400}-\\x{04FF}]"
      case "cjk"      => "[\\x{4E00}-\\x{9FFF}]"
      case "digit"    => "[0-9]"
      case other => throw new IllegalArgumentException(
        s"unknown script '$other' (latin|cyrillic|cjk|digit)")
    }
    size(regexp_extract_all(c, lit(range), lit(0)))
  }

  /** Dominant script with a fixed tie precedence (latin ≻ cyrillic ≻
    * cjk ≻ none) — integer compares only.
    */
  def mainScript(c: Column): Column = {
    val la = scriptCount(c, "latin")
    val cy = scriptCount(c, "cyrillic")
    val cj = scriptCount(c, "cjk")
    when(la >= cy && la >= cj && la > 0, lit("latin"))
      .when(cy >= cj && cy > 0, lit("cyrillic"))
      .when(cj > 0, lit("cjk"))
      .otherwise(lit("none"))
  }

  /** Flesch reading ease (Flesch 1948) from the heuristic counters:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    * rounded 4dp. Two integer-ratio divisions plus a fixed scalar
    * chain — bit-portable per the house single-op rule. Null when the
    * text has no words.
    */
  def fleschReadingEase(c: Column): Column = {
    val w = tokenCount(c)
    val wps = w.cast("double") / sentenceCount(c)
    val spw = syllableCount(c).cast("double") / w
    when(w > 0,
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4))
  }

  /** Flesch-Kincaid grade level (Kincaid et al. 1975):
    * 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59, same
    * portability shape as [[fleschReadingEase]].
    */
  def fleschKincaidGrade(c: Column): Column = {
    val w = tokenCount(c)
    val wps = w.cast("double") / sentenceCount(c)
    val spw = syllableCount(c).cast("double") / w
    when(w > 0,
      round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4))
  }
}
