package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document
  * fingerprinting. All row-local Column expressions (no shuffle, no UDF,
  * whole-stage-codegen'd) — at 100 TB these run at scan speed and
  * column-prune down to the text column.
  */
object TextAnalysis {

  /** Whitespace token count; blank text → 0. (`split` on a blank string
    * yields [""] in both Spark and DuckDB — the guard keeps semantics
    * sane and oracle-aligned.)
    */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** BPE-ish subword count: runs of ≤4 letters, digits, or single
    * non-alphanumeric glyphs — a cheap, deterministic proxy for tokenizer
    * cost (real BPE needs a vocab file; the regex keeps it engine-native).
    */
  def subwordCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  /** Count of regex matches of `word` as a whole word. */
  def wordCount(c: Column, word: String): Column =
    regexp_count(c, lit("\\b" + word + "\\b")).cast("long")

  private def charClassCount(c: Column, cls: String): Column =
    (length(c) - length(regexp_replace(c, cls, ""))).cast("long")

  def alphaCount(c: Column): Column = charClassCount(c, "[A-Za-z]")
  def digitCount(c: Column): Column = charClassCount(c, "[0-9]")
  def spaceCount(c: Column): Column = charClassCount(c, "[ ]")
  def punctCount(c: Column): Column = charClassCount(c, "[^A-Za-z0-9\\s]")

  /** Stopword profiles for the language-ID heuristic (function words that
    * rarely overlap across these languages).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "a"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "las")
  )

  def langScore(c: Column, words: Seq[String]): Column =
    words.map(w => wordCount(c, w)).reduce(_ + _)

  /** n-gram-heuristic language ID: stopword vote with a fixed priority
    * chain (first profile wins ties); no votes at all → "und".
    */
  def langId(c: Column): Column = {
    val scores = langProfiles.map { case (lang, words) => lang -> langScore(c, words) }
    val anyVote = scores.map(_._2).reduce(_ + _) > 0
    // `when` chain checks profiles in declaration order, so the first
    // profile with a maximal score wins ties — mirror the same CASE order
    // in any SQL oracle.
    val chain = scores.zipWithIndex.foldLeft[Option[Column]](None) {
      case (acc, ((lang, s), i)) =>
        val others = scores.zipWithIndex.filter(_._2 != i).map(_._1._2)
        val cond = others.map(s >= _).foldLeft(lit(true))(_ && _)
        acc match {
          case None => Some(when(cond, lang))
          case Some(w) => Some(w.when(cond, lang))
        }
    }.get
    when(!anyVote, "und").otherwise(chain.otherwise("und"))
  }

  /** Heuristic quality score ∈ [0,1]: alphabetic density, stopword
    * presence, and length saturation, equally weighted. Deterministic
    * arithmetic (same expression shape as the SQL oracle).
    */
  def qualityScore(c: Column): Column = {
    val len = greatest(length(c), lit(1)).cast("double")
    val toks = greatest(tokenCount(c), lit(1L)).cast("double")
    val alphaRatio = alphaCount(c) / len
    val stopRatio = least(langScore(c, langProfiles.head._2) * lit(5.0) / toks, lit(1.0))
    val lenSat = least(toks / lit(100.0), lit(1.0))
    round(alphaRatio * 0.4 + stopRatio * 0.3 + lenSat * 0.3, 6)
  }

  /** Normalization fingerprint: md5 of the sorted distinct token set —
    * catches reordered / repeated-content duplicates. (A rolling-hash
    * shingle fingerprint lives in Dedup.shingles + minhash.)
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(trim(c), "\\s+")))))

  /** Share of the document's tokens taken by its single most frequent
    * token (Gopher-style repetition signal). ROW-LOCAL: sorts the token
    * array and folds a run-length maximum — never an explode + groupBy,
    * which at 100 TB would shuffle every token in the corpus just to
    * compute a per-document statistic. The fold is an interpreted HOF
    * (same constant-factor class as `rollingFingerprint`); it stays
    * linear in tokens and fuses into the scan stage.
    */
  def topTokenShare(c: Column): Column = {
    val tk = split(trim(c), "\\s+")
    val best = aggregate(
      array_sort(tk),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(round(best.cast("double") / size(tk), 6))
  }

  /** Fraction of word n-grams that are repeats of an earlier occurrence:
    * `1 - distinct/total` (Gopher's duplicate-n-gram filter signal).
    * Tail-clamped like `Dedup.shingles` (texts shorter than n yield one
    * short gram). Row-local, codegen'd transforms.
    */
  def dupNgramFrac(c: Column, n: Int): Column = {
    require(n >= 2, "dupNgramFrac needs n >= 2")
    val tk = split(trim(c), "\\s+")
    val grams = transform(
      sequence(lit(1), greatest(size(tk) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(tk, i, lit(n))))
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 6))
  }

  /** Distinct-token fraction (low = repetitive boilerplate). */
  def uniqueTokenRatio(c: Column): Column = {
    val tk = split(trim(c), "\\s+")
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(round(size(array_distinct(tk)).cast("double") / size(tk), 6))
  }

  /** PII patterns for training-data scrubbing. Kept to syntax shared by
    * Java regex and RE2 (no backreferences, no lookaround) so a DuckDB
    * oracle can replay the exact same matches.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, phone numbers and IPv4 addresses with typed
    * placeholders. Row-local `regexp_replace` chain — scan-speed
    * scrubbing, no shuffle. Email first: its character class overlaps
    * the dotted-quad shape, so order is part of the contract.
    */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, emailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, phoneRe, "<PHONE>")
    regexp_replace(noPhone, ipv4Re, "<IP>")
  }

  def piiEmailCount(c: Column): Column = regexp_count(c, lit(emailRe)).cast("long")
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(phoneRe)).cast("long")
  def piiIpv4Count(c: Column): Column = regexp_count(c, lit(ipv4Re)).cast("long")

  /** Rabin-style rolling-hash document fingerprint: the MINIMUM over all
    * char windows of width `w` of the window's polynomial hash
    * `fold(h,ch) = (h*31 + ascii(ch)) mod 1e9+7` — winnowing's
    * content-defined anchor, robust to edits outside the minimizing
    * window. Pure integer arithmetic, so a DuckDB oracle reproduces it
    * exactly. Texts shorter than `w` hash their full length.
    */
  def rollingFingerprint(c: Column, w: Int = 16): Column = {
    // split("", limit=-1) keeps a trailing empty element — slice to the
    // true char count so the oracle's string_split semantics match
    val chars = slice(split(c, ""), lit(1), length(c))
    val n = size(chars)
    array_min(
      transform(
        sequence(lit(1), greatest(n - (w - 1), lit(1))),
        i => aggregate(slice(chars, i, lit(w)), lit(0L),
          (a, ch) => (a * 31 + ascii(ch)) % 1000000007L)))
  }
}
