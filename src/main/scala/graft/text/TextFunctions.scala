package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data pipelines, built entirely
  * from codegen'd `org.apache.spark.sql.functions` expressions — no
  * UDFs, so they stay inside whole-stage codegen and push down cleanly
  * at 100 TB. (Extension beyond the reference surface — SURVEY §7.2
  * step 8.)
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap, deterministic proxy for subword
    * tokenizer counts. Splits at symbol boundaries AND at letter↔digit
    * transitions ("room101" → "room", "101"). */
  def tokenCountBpe(text: Column): Column =
    size(filter(
      split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])" +
        "|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      t => length(trim(t)) > 0))

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}']+"), t => length(t) > 0)

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "von", "zu", "den", "dem", "auf", "für", "im", "sich", "des"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "que", "pour",
      "une", "un", "du", "des", "avec", "sur", "pas", "au", "ce", "il"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "en", "que", "por",
      "para", "una", "un", "del", "con", "no", "se", "su", "al"))

  private def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(stopwords(lang).map(x => x: Any): _*)))

  /** Heuristic language ID over {en,de,fr,es,zh}: Han script → zh, else
    * the language with the most stopword hits wins (ties broken by the
    * fixed priority en > de > fr > es), `und` when nothing matches.
    * Pure expression → codegen'd, no shuffle. */
  def langId(text: Column): Column = {
    val prio = Map("en" -> 4, "de" -> 3, "fr" -> 2, "es" -> 1)
    val scores = Seq("en", "de", "fr", "es").map(l =>
      struct(stopwordHits(text, l).as("hits"), lit(prio(l)).as("prio"), lit(l).as("lang")))
    val best = array_max(F.array(scores: _*))
    when(F.regexp_like(text, lit("\\p{IsHan}")), lit("zh"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Per-language stopword ratio (hits / tokens). */
  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordHits(text, lang).cast("double") /
      greatest(size(tokens(text)).cast("double"), lit(1.0))

  /** Heuristic quality score in [0,1] from length, punctuation
    * terminators, alpha ratio, mean word length, and repetition —
    * the usual cheap pre-filters before expensive model scoring. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = tokens(text)
    val nTokens = size(toks).cast("double")
    val alphaChars = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double")
    val alphaRatio = alphaChars / greatest(nChars, lit(1.0))
    val meanWordLen = alphaChars / greatest(nTokens, lit(1.0))
    val uniqRatio = size(array_distinct(toks)).cast("double") / greatest(nTokens, lit(1.0))
    val terminator = when(F.regexp_like(text, lit("[.!?][\"')\\]]?\\s*$")), 1.0).otherwise(0.0)
    val lengthOk = when(nTokens >= 5 && nTokens <= 100000, 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen >= 2 && meanWordLen <= 12, 1.0).otherwise(0.0)
    round((alphaRatio + uniqRatio + terminator + lengthOk + wordLenOk) / 5.0, 4)
  }

  /** Rolling polynomial fingerprint of the normalized text (lowercase,
    * collapsed whitespace): h = Σ h*31 + byte, in Long arithmetic —
    * a deterministic document fingerprint for exact-dup detection that
    * is cheap to compare/join on. Expression-only (fold over split). */
  def fingerprint(text: Column): Column = {
    // modulus < 2^53 keeps acc*31+v below 2^63 — safe under ANSI
    // overflow checking (Spark 4 default)
    val m = 9007199254740881L
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    // fold over characters via aggregate on the codepoint array
    aggregate(
      transform(split(norm, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, v) => pmod(acc * 31L + v, lit(m)))
  }

  /** xxhash-based 64-bit content hash (normalized) — the scale-path
    * fingerprint: one codegen'd hash, no array materialization. */
  def contentHash(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Deflate compressibility quality signal (the Gopher/RefinedWeb
    * filter): compressed/raw UTF-8 bytes at level 6, raw stream.
    * Boilerplate, templates and keyword spam compress far below
    * prose — filter LOW ratios. Null and empty text score the neutral
    * 1.0. Row-local kernel ([[graft.functions.Kernels.deflateRatio]]),
    * map-only; JVM-side by nature, so no SQL oracle — the contract is
    * spec-pinned against java.util.zip directly. */
  def compressionRatio(text: Column): Column =
    coalesce(graft.functions.Kernels.deflateRatio(text), lit(1.0))

  /** Lowercase, whitespace-collapsed text — materialize this as its own
    * column before shingling (see `shinglesFromNormalized`). */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** HTML → plain text: the crawl-ingest boilerplate step. Removes
    * `<script>`/`<style>` element bodies and comments, turns every
    * remaining tag into a space (so `<p>a</p><p>b</p>` keeps its word
    * boundary), decodes the five named entities plus `&#39;`
    * (`&amp;` LAST, so a double-escaped `&amp;lt;` yields the literal
    * `&lt;` rather than decoding twice), then collapses whitespace.
    * Not a spec-grade HTML5 parser — malformed markup degrades to
    * extra spaces, never to dropped text outside script/style/comment.
    *
    * Every pattern is RE2-compatible (inline flags + lazy repeats, no
    * lookaround/backreferences), so an external engine reproduces the
    * transform byte-for-byte — the driver oracle does. Pure codegen'd
    * expression chain: map-only, no shuffle, at any corpus size. */
  def stripHtml(html: Column): Column =
    trim(stripHtmlSteps.foldLeft(html) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    })

  /** The ordered (pattern, replacement) chain behind [[stripHtml]] —
    * ONE definition shared by the Column verb above and the SQL
    * registration in graft.GraftExtensions (which folds the same list
    * into raw catalyst RegExpReplace nodes), so the two surfaces can
    * never drift. Order is load-bearing: element bodies and comments
    * go before tag-strip (entities inside them must not leak), and
    * `&amp;` decodes LAST (a double-escaped `&amp;lt;` must yield the
    * literal `&lt;`, not decode twice). Entity patterns and
    * replacements are metacharacter-free in both Java regex and RE2,
    * so the DuckDB oracle is the same chain verbatim. */
  private[graft] val stripHtmlSteps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ",
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&",
    "\\s+" -> " ")

  /** Crawl-pipeline URL canonicalization — the key under which URL
    * dedup/frequency analysis should run. For any `scheme://` URL:
    * scheme and host lowercase (path/query case PRESERVED — paths are
    * case-sensitive per RFC 3986), default ports dropped (`:80` for
    * http, `:443` for https), fragment dropped, tracking parameters
    * removed (`utm_*`, `fbclid`, `gclid`, `msclkid`, `igshid`,
    * `mc_cid`/`mc_eid`), empty path normalized to `/`. Scheme-less
    * strings pass through trimmed (they are not URLs to normalize).
    * Deliberately NOT done: query-param reordering and trailing-slash
    * stripping — both change semantics on real servers.
    *
    * Engine-portable by construction: regexp_extract with group
    * indexes + GLOBAL backreference-free regexp_replace only, so the
    * DuckDB oracle runs the identical chain (Spark's `$1`-style vs
    * RE2's `\1`-style replacement syntax never comes up). The query
    * string is canonicalized by prefixing `&`, globally deleting
    * `&param=value` tracking units, then stripping the anchored
    * leading `&` — every step is a global replace that both engines
    * execute identically, with no first-occurrence-only semantics.
    * Map-only codegen'd expressions; no shuffle at any corpus size. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val hostport = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val path0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // fragment OFF FIRST, then extract the query: `\?([^#]*)` against
    // the raw URL would match a '?' INSIDE the fragment (`/p#a?c`) and
    // resurrect fragment text as a phantom query string
    val noFrag = regexp_replace(u, "(?s)#.*$", "")
    val query = regexp_extract(noFrag, "(?s)\\?(.*)$", 1)
    val q1 = regexp_replace(concat(lit("&"), query),
      "&(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid)=[^&]*", "")
    val qc = regexp_replace(q1, "^&", "")
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), host, path,
      when(qc === "", lit("")).otherwise(concat(lit("?"), qc))))
  }

  /** THE pipeline tokenizer: [[normalizeText]] then a single-space
    * split, empties dropped. Every token-level operator (BM25, tf-idf,
    * decontamination, LM scoring, chunking) uses this one definition,
    * and every DuckDB oracle mirrors it as
    * `list_filter(string_split(regexp_replace(lower(trim(x)), '\s+',
    * ' ', 'g'), ' '), t -> t <> '')` — change them TOGETHER or the
    * oracles desynchronize. */
  def wsTokens(text: Column): Column =
    filter(split(normalizeText(text), " "), t => t =!= "")

  /** Character n-gram (shingle) set over an ALREADY-NORMALIZED column.
    *
    * Implementation note: higher-order functions are interpreted, and
    * expressions inside a lambda re-evaluate per element. `norm` must
    * therefore be a plain attribute (a materialized column) — then the
    * per-element cost is one row-slot read + substr. Passing a computed
    * expression (e.g. a regexp_replace) makes shingling quadratic. */
  def shinglesFromNormalized(norm: Column, n: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(norm) - n, lit(0))),
      i => norm.substr(i + 1, lit(n))))

  /** One-shot convenience for small inputs/tests; pipelines should
    * materialize `normalizeText` first and use `shinglesFromNormalized`. */
  def shingles(text: Column, n: Int = 5): Column =
    shinglesFromNormalized(normalizeText(text), n)

  /** Raw counters behind Gopher-style duplicate-text quality signals,
    * over an ALREADY-NORMALIZED column: struct<total_words,
    * distinct_words, total_bigrams, distinct_bigrams, top_word>.
    * Ratios (dup-word, dup-bigram, top-word fractions) are plain SQL
    * over these ints — one hash-map pass per row in a custom kernel
    * (graft.functions.Kernels.repetitionStats). */
  def repetitionStats(norm: Column): Column =
    graft.functions.Kernels.repetitionStats(norm)

  /** Split documents into overlapping token-window chunks — the
    * context-length prep for pretraining and retrieval indexing.
    * Chunk k covers tokens [k·stride, k·stride + maxTokens) with
    * stride = maxTokens − overlap; every document yields ≥ 1 chunk
    * (empty/short docs produce one, possibly empty, chunk — the whole
    * corpus stays represented). Expression-only and map-only: no
    * shuffle, no UDF; the explode multiplies rows by ~n/stride.
    * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    * HOF discipline per [[shinglesFromNormalized]]: the token array is
    * materialized before the windowing lambda references it. */
  def chunkByTokens(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, maxTokens: Int,
                    overlap: Int = 0): org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens) (got $overlap)")
    val stride = maxTokens - overlap
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        wsTokens(coalesce(col(textCol), lit(""))).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        greatest(lit(1L),
          floor((size(col("__toks")).cast("long") - lit(overlap.toLong) +
            lit(stride.toLong) - lit(1L)).cast("double") / lit(stride.toDouble))
            .cast("long")).as("__nc"))
      .select(col("doc_id"),
        posexplode_outer(transform(
          sequence(lit(0L), col("__nc") - lit(1L)),
          k => slice(col("__toks"), (k * stride).cast("int") + lit(1), lit(maxTokens))))
          .as(Seq("__pos", "__chunk")))
      .select(col("doc_id"), col("__pos").cast("long").as("chunk_id"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Corpus vocabulary: global word counts over normalized text,
    * top-k by count with ties broken by word (a total order, so the
    * result SET is deterministic). The tokenizer-prep primitive.
    * Scale shape: explode is map-side; the single shuffle is the
    * hash aggregation on the word key with map-side partial counts
    * (vocabulary ≪ corpus), and the top-k is a TakeOrdered — k rows
    * per partition to the driver-side merge, never the vocabulary. */
  def topWords(docs: org.apache.spark.sql.DataFrame, textCol: Column,
               k: Int): org.apache.spark.sql.DataFrame =
    docs.select(split(normalizeText(textCol), " ").as("__w"))
      .select(explode_outer(col("__w")).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)
}
