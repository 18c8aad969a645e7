package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data-pipeline surface
  * (language ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is built from `org.apache.spark.sql.functions` —
  * including the higher-order array functions (`filter`, `transform`,
  * `aggregate`) — so the whole pipeline stays inside Catalyst/codegen
  * with no UDF serialization boundary. At 100 TB these run as per-row
  * expressions inside whole-stage codegen: no shuffle, no state.
  */
object TextFunctions {

  /** Whitespace tokenizer (the reference has no text ops; this is the
    * LLM-pipeline extension surface). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def nTokens(text: Column): Column = size(tokens(text))

  def nUniqueTokens(text: Column): Column = size(array_distinct(tokens(text)))

  /** English-ish stopword list shared with the DuckDB oracle — keep in
    * sync with OracleSql. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "is", "in", "that", "it", "on")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => array_contains(array(words.map(lit): _*), x)))

  def stopwordHits(text: Column): Column = hitCount(tokens(text), stopwords)

  /** Type-token ratio: vocabulary richness in [0,1]. */
  def typeTokenRatio(text: Column): Column =
    round(nUniqueTokens(text) / nTokens(text).cast("double"), 4)

  /** Heuristic quality score in [0,1]: length saturation × vocabulary
    * richness. Deliberately simple arithmetic so the DuckDB oracle can
    * state the identical formula. */
  def qualityScore(text: Column): Column =
    round(
      least(nTokens(text) / lit(50.0), lit(1.0)) *
        (lit(0.5) + lit(0.5) * (nUniqueTokens(text) / nTokens(text).cast("double"))),
      4)

  /** GPT-2-style pre-tokenization regex (simplified, RE2-compatible so
    * the DuckDB oracle can run the identical pattern): runs of letters,
    * runs of digits, runs of other non-space symbols — each optionally
    * preceded by one space. */
  val bpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** BPE-ish token count: each pre-token contributes
    * max(1, ceil(len/6)) subword units (≈ the empirical 4–5 chars per
    * merged BPE token, biased high for long words). Pure per-row
    * arithmetic — codegen'd, identical formula in the oracle. */
  def nBpeTokens(text: Column): Column =
    aggregate(bpePieces(text), lit(0L),
      (acc, p) => acc +
        greatest(lit(1L), ceil(length(trim(p)) / lit(6.0)).cast("long")))

  /** Marker-word lists per language for the n-gram-free language-ID
    * heuristic. Kept tiny and SQL-expressible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Predicted language: argmax of marker hits with a fixed priority
    * order (en > es > de > fr) and 'und' when nothing matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, ws) => lang -> hitCount(toks, ws) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), elseCol) =>
      when(score === best && score > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Character trigrams over `_`-normalized lowercase text (leading and
    * trailing `_` mark word boundaries, the classic n-gram-profile
    * setup). Guarded for short inputs: Spark's `sequence(1, n)` counts
    * DOWN when n < 1 (DuckDB's generate_series is empty), so the guard
    * is load-bearing for cross-engine parity. */
  def charTrigrams(text: Column): Column = {
    val norm = concat(lit("_"),
      regexp_replace(lower(trim(text)), "\\s+", "_"), lit("_"))
    // Split to a char array ONCE and index with O(1) element_at:
    // `substr(norm, i, 3)` re-seeks the UTF8String from byte 0 every
    // call, turning a 2 KB doc into O(len²) work (measured 16 s for the
    // corpus vs sub-second this way). The single-element `transform`
    // let-binds the array so CollapseProject can't inline the split
    // into all three element_at references.
    element_at(
      transform(array(split(norm, "")), cs =>
        when(size(cs) < 3, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(cs) - 2),
            i => concat(element_at(cs, i), element_at(cs, i + 1),
              element_at(cs, i + 2))))),
      1)
  }

  /** Per-language character-trigram profiles (ASCII-only so the same
    * literals paste into the oracle SQL). */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he_", "_th", "ing", "and", "_of"),
    "es" -> Seq("_de", "que", "_la", "os_", "ent", "cio"),
    "de" -> Seq("der", "ein", "ich", "sch", "und", "_di"),
    "fr" -> Seq("les", "_le", "ent", "une", "our", "ait"))

  /** n-gram-profile language ID: argmax of profile-trigram hits with
    * the same fixed priority order and 'und' fallback as [[langId]]. */
  def trigramLangId(text: Column): Column = {
    val tg = array_distinct(charTrigrams(text))
    val scores = trigramProfiles.map { case (lang, ps) =>
      lang -> size(array_intersect(tg, array(ps.map(lit): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), elseCol) =>
      when(score === best && score > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Stable across engines (md5 is bit-exact everywhere), so exact and
    * near-exact duplicate grouping can be oracle-checked. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-gram shingles (default 3) for MinHash/Jaccard; short docs
    * fall back to the whole text as a single shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }
}
