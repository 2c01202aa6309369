package graft.ops.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline tier (SURVEY.md
  * §7.1 `ops/llm/`): tokenization, shingling, regex feature counts,
  * stopword-based language scoring. Everything is a native Catalyst column
  * expression — no UDFs — so the hot path stays inside whole-stage codegen
  * and per-row cost is O(tokens).
  */
object TextOps {

  /** trim + lowercase (the same normalization the pipeline core uses). */
  def normalized(c: Column): Column = lower(trim(c))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalized(c), "\\s+")

  /** n-word shingles over a token array; a doc shorter than n words yields
    * its single (shorter) shingle — `slice` is overrun-safe, unlike
    * `element_at` under ANSI mode.
    */
  def shingles(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** Distinct n-word shingle set of a text column (the dedup unit).
    * Single-pass codegen expression — see functions.WordShingles for why
    * the composed HOF form (kept in `shingles` for reference) is ~4×
    * slower.
    */
  def shingleSet(c: Column, n: Int): Column =
    graft.functions.WordShingles(c, n)

  /** Non-distinct shingle occurrence stream of a text column in position
    * order — the counting unit for n-gram LM / PMI statistics, where
    * multiplicity matters. Same single-pass codegen expression as
    * [[shingleSet]]; a doc shorter than n words yields its single
    * (shorter, hence space-free for n=2) shingle, which stream consumers
    * drop with a `contains(" ")` filter.
    */
  def shingleStream(c: Column, n: Int): Column =
    graft.functions.WordShingles.stream(c, n)

  /** Non-overlapping w-token chunks of the normalized text (full chunks
    * only — a trailing remainder shorter than w tokens is dropped, as is a
    * doc with fewer than w tokens). The segmentation unit for
    * paragraph-level (CCNet-style) dedup when the corpus has no natural
    * paragraph breaks. NOTE: `sequence(1, n)` with n = 0 generates the
    * DESCENDING [1, 0] in Spark, hence the explicit empty-array guard.
    */
  def tokenChunks(c: Column, w: Int): Column = {
    val toks = tokens(c)
    val n = floor(size(toks) / w).cast("int")
    val idx = when(n >= 1, sequence(lit(1), n))
      .otherwise(array().cast("array<int>"))
    transform(idx, i => concat_ws(" ", slice(toks, (i - 1) * w + 1, lit(w))))
  }

  /** Content-defined chunks (the FastCDC/rsync idea at token granularity):
    * a chunk boundary falls AFTER token j whenever the sha256 of the
    * ≤3-token window ending at j starts with hex '0' (P = 1/16 → mean
    * chunk ≈ 16 tokens, min 1). Boundaries depend only on LOCAL content,
    * never on position — insert a token at the doc head and every
    * downstream boundary re-aligns to the same content, so chunk digests
    * survive offset shifts that break fixed-width chunking
    * ([[tokenChunks]]) entirely (CdcSpec pins exactly this contrast).
    *
    * REFERENCE FORM ONLY (the WordShingles precedent): this composed-HOF
    * version documents the semantics and mirrors the DuckDB oracle
    * shape, but interpreted lambda nesting re-evaluates the whole cut
    * pipeline per chunk element — O(chunks × tokens) sha256 per row.
    * Production path is [[graft.functions.CdcChunks]], the one-pass
    * codegen expression (CdcSpec pins the equivalence); NOTE the same
    * `sequence(1, 0)` descending-range guard as [[tokenChunks]].
    */
  def cdcChunks(c: Column): Column = {
    val toks = tokens(c)
    val n = size(toks)
    val cutIdx = when(n >= 2,
      filter(sequence(lit(1), n - 1), j =>
        substring(sha2(concat_ws(" ",
          slice(toks, greatest(j - 2, lit(1)), least(j, lit(3)))),
          256), 1, 1) === "0"))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(1)), transform(cutIdx, j => j + 1))
    transform(sequence(lit(1), size(starts)), k =>
      concat_ws(" ", slice(toks, element_at(starts, k),
        when(k < size(starts),
          element_at(starts, k + 1) - element_at(starts, k))
          .otherwise(n - element_at(starts, k) + 1))))
  }

  /** Count of regex matches in `c` (full-match group). Patterns must stay in
    * the RE2-compatible subset so the DuckDB oracle agrees with Java regex.
    */
  def regexCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  // PII-ish patterns for redaction (RE2-compatible subset: no lookarounds).
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlPattern = "https?://[^\\s]+"
  val longNumberPattern = "[0-9]{7,}"

  /** Redact emails, URLs, and long digit runs with typed placeholders —
    * the standard pre-training scrub. Per-row, no shuffle, codegen'd
    * regexp_replace chain.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        urlPattern, "<URL>"),
      longNumberPattern, "<NUM>")

  /** Stopword-hit count: whole-word matches of any of `words` in normalized
    * text. Used for quality scoring and language ID.
    */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    regexCount(normalized(c), "\\b(" + words.mkString("|") + ")\\b")

  // Small per-language stopword lists for the n-gram/stopword language-ID
  // heuristic. Deterministic, tiny, and SQL-expressible on both engines.
  val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
  val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val stopEs = Seq("el", "la", "los", "de", "que", "y", "en", "un", "es", "por")
  val stopFr = Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "pour")

  /** Language-ID scores (stopword hits per language). Argmax with the fixed
    * tie-break order en > de > es > fr gives the predicted language.
    */
  def langScores(c: Column): Seq[(String, Column)] = Seq(
    "en" -> stopwordCount(c, stopEn), "de" -> stopwordCount(c, stopDe),
    "es" -> stopwordCount(c, stopEs), "fr" -> stopwordCount(c, stopFr))

  /** Predicted language from precomputed score columns (tie-break = listed
    * order). `scores` must be non-empty.
    */
  def langArgmax(scores: Seq[(String, Column)]): Column = {
    val rest = scores.tails.toSeq.init // each lang with its successors
    rest.init.foldRight(lit(scores.last._1)) { (tail, els) =>
      val (lang, sc) = tail.head
      when(tail.tail.map(t => sc >= t._2).reduce(_ && _), lang).otherwise(els)
    }
  }
}
