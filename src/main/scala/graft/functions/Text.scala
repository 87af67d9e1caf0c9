package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for training-data pipelines
  * (BASELINE.json north star; no reference analogue — SURVEY.md §2.12).
  *
  * Everything here is composed from built-in codegen'd expressions
  * (split/filter/transform/aggregate higher-order functions), so the
  * whole text pipeline stays in whole-stage codegen and distributes
  * trivially: these are per-row scalars with no shuffle at all.
  */
object Text {

  /** Common-word list used for stopword ratios and the language
    * heuristic. Deliberately tiny and embedded: at 100 TB a real list
    * would be a broadcast lookup, but the operator shape is the same. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Whitespace word tokens, empties dropped.
    *
    * `array_remove(split(..), "")` rather than `filter(split(..),
    * w -> length(w) > 0)`: the two are value-identical (split never
    * yields nulls, and removing every "" is exactly the length-0
    * filter), but ArrayFilter is a higher-order function whose lambda
    * is interpreted per row — it blocks whole-stage codegen for every
    * expression tree it appears in, which the r12 bench flagged on
    * the two hottest text queries (q481 2.85 s, q204 2.27 s with
    * `interpreted_hof: true`). ArrayRemove is a plain codegen
    * expression, so the whole tokenize stays compiled (r13). */
  def words(text: Column): Column =
    array_remove(split(text, " "), "")

  /** Lowercased alphanumeric tokens (BPE-ish pre-tokenization: runs
    * of [a-z0-9] after lowercasing, everything else is a boundary).
    * Same codegen-friendly empties-drop as [[words]]. */
  def alnumTokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  // ----- token-array-level forms: `w` is a BOUND tokens value (a
  // lambda variable from Lambdas.bindOnce), so referencing it many
  // times costs nothing — the tokenizer runs once per row -----

  private def tokenCountT(w: Column): Column = size(w).cast("long")

  private def stopwordCountT(w: Column, stop: Seq[String]): Column =
    size(filter(w, t => t.isInCollection(stop))).cast("long")

  private def sumTokenLenT(w: Column): Column =
    aggregate(w, lit(0L), (acc, t) => acc + length(t))

  private def stopwordRatioT(w: Column, stop: Seq[String]): Column =
    stopwordCountT(w, stop) / nullif(tokenCountT(w), lit(0L))

  private def avgTokenLenT(w: Column): Column =
    sumTokenLenT(w) / nullif(tokenCountT(w), lit(0L))

  private def qualityScoreT(w: Column, stop: Seq[String]): Column =
    lit(0.4) * least(lit(1.0), tokenCountT(w) / 100.0) +
      lit(0.3) * (lit(1.0) - coalesce(stopwordRatioT(w, stop), lit(1.0))) +
      lit(0.3) * least(lit(1.0), coalesce(avgTokenLenT(w), lit(0.0)) / 8.0)

  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  def stopwordCount(text: Column, stop: Seq[String] = EnglishStopwords): Column =
    size(filter(words(text), w => w.isInCollection(stop))).cast("long")

  /** stopwords / tokens as double; null-safe for empty docs. */
  def stopwordRatio(text: Column): Column =
    Lambdas.bindOnce(words(text))(stopwordRatioT(_, EnglishStopwords))

  /** Mean token length = total token chars / token count. */
  def avgTokenLen(text: Column): Column =
    Lambdas.bindOnce(words(text))(avgTokenLenT)

  /** Heuristic quality score in [0,1]: rewards length (saturating at
    * 100 tokens), non-stopword density, and longer words (saturating
    * at mean length 8). All inputs are exact integers, so the score is
    * a deterministic double on any engine. Tokenizes once per row
    * (let-bound tokens), not once per sub-term. */
  def qualityScore(text: Column): Column =
    Lambdas.bindOnce(words(text))(qualityScoreT(_, EnglishStopwords))

  /** Every per-document statistic q27 reports, computed from ONE
    * whitespace tokenization and ONE alnum tokenization per row,
    * returned as a struct. Callers should explode it through a
    * Generate barrier — `select(inline(array(docStats(text))))` — so
    * downstream field references attach to a real attribute instead
    * of re-inlining this whole tree per field. */
  def docStats(text: Column): Column =
    Lambdas.bindOnce2(words(text), alnumTokens(text)) { (w, a) =>
      struct(
        tokenCountT(w).as("n_tokens"),
        size(array_distinct(w)).cast("long").as("n_distinct_tokens"),
        stopwordCountT(w, EnglishStopwords).as("n_stopwords"),
        stopwordRatioT(w, EnglishStopwords).as("stopword_ratio"),
        avgTokenLenT(w).as("avg_token_len"),
        qualityScoreT(w, EnglishStopwords).as("quality"),
        langIdT(a).as("lang_guess"))
    }

  /** Word n-gram shingles from a tokens array.
    *
    * Built by zipping the array with its k-shifted selves rather than
    * indexing with element_at inside a lambda: lambda bodies are NOT
    * subexpression-eliminated (and CollapseProject re-inlines
    * "materialized" helper columns), so an element_at formulation
    * re-evaluates the tokens expression once per element — O(len²)
    * per document, a measured ~10× slowdown on the dedup suite. Here
    * every input is referenced O(n) times total, so the cost is
    * O(n·len) regardless of what the optimizer inlines. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    // fold: after step k, elem i = toks[i..i+k] joined; tail elements
    // are partial (concat_ws skips the nulls zip_with pads with) and
    // are cut by the final slice
    val zipped = (1 until n).foldLeft(toks)((acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), size(toks)),
        (a, b) => concat_ws(" ", a, b)))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(slice(zipped, lit(1), size(toks) - (n - 1)))
  }

  /** Word n-gram shingles ("w1 w2 w3"), empty array when the doc has
    * fewer than n words. Backed by the fused codegen expression
    * ([[org.apache.spark.sql.graftx.WordNgrams]]) — one compiled
    * per-row pass instead of the interpreted HOF chain; bit-identical
    * to [[shinglesComposed]] (locked by TextFunctionsSpec). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftx.WordNgrams.col(text, n)

  /** The composed-from-built-ins formulation of [[shingles]], kept as
    * the executable reference the native expression is verified
    * against. */
  def shinglesComposed(text: Column, n: Int): Column =
    Lambdas.bindOnce(words(text))(shinglesFromTokens(_, n))

  /** Within-document repetition signal (the Gopher-style
    * duplicate-n-gram quality filter): a struct of total n-gram
    * occurrences, distinct n-grams, and the duplicate fraction
    * 1 - distinct/total (null when the doc has no n-grams). All
    * inputs are exact integers, so the fraction is one IEEE division
    * — engine-stable. Pure per-row scalar: filters at this stage cost
    * zero shuffles at any corpus size. */
  def repetitionStats(text: Column, n: Int): Column =
    Lambdas.bindOnce(shingles(text, n)) { g =>
      val ng = size(g).cast("long")
      val nd = size(array_distinct(g)).cast("long")
      struct(ng.as("n_grams"), nd.as("n_distinct_grams"),
        when(ng > 0, lit(1.0) - nd / ng).as("dup_frac"))
    }

  /** 64-bit SimHash as an array of 64 bits (index i = bit i of the
    * hash). Bit i is 1 when the sum over tokens of ±1 votes (bit i of
    * the token's xxhash64) is non-negative. Kept as a bit array rather
    * than a packed long so LSH banding can slice it directly.
    *
    * Single-pass fold: ONE aggregate over the token hashes with a
    * 64-long vote accumulator, then a sign pass. The earlier
    * per-bit formulation (transform over 64 bits, aggregate inside)
    * re-evaluated the tokenize+hash input 64× per row — and
    * "materialize it to a column first" does not survive
    * CollapseProject, which re-inlines single-use aliases. Here the
    * input expression is the aggregate's single input, evaluated
    * once no matter what the optimizer inlines.
    *
    * Written as a SQL expression because the Scala `shiftright`
    * helper only accepts a literal shift. `tokensExpr` is any SQL
    * expression yielding array<string>.
    */
  def simhashBits(tokensExpr: String): Column = expr(
    s"""transform(
       |  aggregate(transform($tokensExpr, t -> xxhash64(t)),
       |    array_repeat(0L, 64),
       |    (acc, h) -> zip_with(acc, sequence(0L, 63L),
       |      (a, i) -> a + ((shiftright(h, CAST(i AS INT)) & 1L) * 2 - 1))),
       |  v -> IF(v >= 0, 1, 0))""".stripMargin)

  /** [[simhashBits]] with the engine-portable md5-derived hash and a
    * configurable width (≤ 60 usable bits), so a DuckDB oracle can
    * reproduce the fingerprint bit-for-bit. Same single-pass vote
    * fold; empty token lists yield all-ones (votes start at 0 and
    * 0 >= 0), which the oracle must coalesce to match. */
  def simhashBitsPortable(tokensExpr: String, bits: Int): Column = expr(
    s"""transform(
       |  aggregate(transform($tokensExpr,
       |      t -> ${PortableHash.hash60SparkSql("t")}),
       |    array_repeat(0L, $bits),
       |    (acc, h) -> zip_with(acc, sequence(0L, ${bits - 1}L),
       |      (a, i) -> a + ((shiftright(h, CAST(i AS INT)) & 1L) * 2 - 1))),
       |  v -> IF(v >= 0, 1, 0))""".stripMargin)

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 0).otherwise(1)),
      lit(0), (acc, x) => acc + x).cast("long")

  /** Document fingerprint: min-hash of word 3-gram shingles — a
    * winnowing-style content signature that is stable under small
    * edits at the ends of the document. */
  def fingerprint(text: Column): Column =
    Lambdas.bindOnce(words(text))(w =>
      array_min(transform(shinglesFromTokens(w, 3), s => xxhash64(s))))

  /** [[fingerprint]] with the engine-portable hash (oracle-checkable;
    * see [[PortableHash]]). Null for docs with fewer than 3 words. */
  def fingerprintPortable(text: Column): Column =
    Lambdas.bindOnce(words(text))(w =>
      array_min(transform(shinglesFromTokens(w, 3), s => PortableHash.hash60(s))))

  /** Language-ID heuristic: stopword-hit ratio against per-language
    * common-word lists; returns the argmax language or "unk" when
    * nothing matches. N-gram-frequency models would slot in the same
    * way (per-row scalar, broadcast tables). */
  def langIdHeuristic(text: Column): Column =
    Lambdas.bindOnce(alnumTokens(text))(langIdT)

  private def langIdT(toks: Column): Column = {
    val langs: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
      "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"))
    val scores = langs.map { case (l, stop) =>
      struct(size(filter(toks, w => w.isInCollection(stop))).as("hits"),
        lit(l).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("unk"))
  }
}
