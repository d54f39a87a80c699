package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Text-analysis combinators for the training-data-pipeline operators
  * (SURVEY.md §2.6). Pure Column expressions — codegen'd, scan-speed.
  */
object Text {

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alnum symbols each count as one token.
    */
  def tokenCountBpe(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Normalized text: lowercased, whitespace collapsed. */
  def normalize(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Stopword occurrences (word-boundary matches). */
  def stopwordCount(c: Column): Column =
    regexp_count(lower(c), lit("\\b(" + stopwords.mkString("|") + ")\\b"))

  /** Punctuation character count. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[.,;:!?]"))

  /** Heuristic quality score in [0,1]: rewards mid-length docs, a
    * natural stopword ratio, and penalizes punctuation soup. The exact
    * formula is arbitrary (as in any quality classifier) but
    * deterministic and oracle-replicable.
    */
  def qualityScore(c: Column): Column = {
    val wc = tokenCountWs(c).cast("double")
    val lengthTerm = least(wc / lit(50.0), lit(1.0))
    val stopRatio = stopwordCount(c).cast("double") / greatest(wc, lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(wc, lit(1.0))
    round(lit(0.4) * lengthTerm + lit(0.4) * least(stopRatio * 4, lit(1.0))
      + lit(0.2) * (lit(1.0) - least(punctRatio, lit(1.0))), 4)
  }

  /** Marker stopwords per language (public stopword lists; r11
    * verdict item 6). Two deliberate properties: (a) NONE of the
    * words appears in the synthetic corpus's shared 31-token tech
    * vocabulary (the old list's "the"/"fast" made every label predict
    * 'en' — the degenerate matrix the verdict flagged; with disjoint
    * lists the signal-free corpus honestly abstains to 'und'), and
    * (b) zh rides romanized (pinyin) function words — the regex
    * engines' \b boundaries aren't portable across CJK, and the
    * testdata is ASCII. Shared single-source by t03, t37 AND the
    * oracle SQL builder (SparkEntry derives both engines' regexes
    * from THIS table).
    */
  private[graft] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("and", "of", "to", "is", "that", "for"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "mit"),
    "es" -> Seq("el", "la", "que", "los", "una", "por"),
    "fr" -> Seq("le", "les", "des", "une", "est", "avec"),
    "zh" -> Seq("wo", "ni", "ta", "shi", "zai"))

  private def markerCount(c: Column, ws: Seq[String]): Column =
    regexp_count(lower(c), lit("\\b(" + ws.mkString("|") + ")\\b"))

  /** Marker-word language-ID heuristic: argmax of per-language marker
    * counts with a deterministic preference order (first declared
    * language wins ties); 'und' when no marker hits.
    *
    * Shape matters (r12): each marker regex appears EXACTLY ONCE in
    * the expression tree — the old greatest-plus-per-branch-compare
    * formulation duplicated every regexp_count ~7×, which Project
    * codegen CSE hid for t03 but AGGREGATE GROUPING KEYS (t37)
    * re-evaluated per duplicate: t37 ran 8× t03 on the identical
    * scan. The argmax is a left fold over a 5-element struct array
    * (strict `>` keeps the first declared language on ties — the
    * same answer as the old "first whose count equals the max").
    */
  def langId(c: Column): Column = {
    val scored = array(markers.map { case (lang, ws) =>
      struct(markerCount(c, ws).as("n"), lit(lang).as("lang")) }: _*)
    val best = aggregate(scored,
      struct(lit(0).as("n"), lit("und").as("lang")),
      (acc, x) => when(x.getField("n") > acc.getField("n"), x)
        .otherwise(acc))
    when(best.getField("n") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit-ish deterministic token hash: first 8 hex chars of md5 as
    * an unsigned int. Identical in DuckDB:
    * CAST('0x'||substr(md5(t),1,8) AS BIGINT).
    */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit deterministic token hash: first 15 hex chars of md5 —
    * wide enough for the multi-block fingerprint (d13) while staying
    * inside a signed BIGINT on both engines. Identical in DuckDB:
    * CAST('0x'||substr(md5(t),1,15) AS BIGINT).
    */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The SECOND 60-bit word of the same md5 (hex chars 16–30) — the
    * d13 widening's extra bit budget: one md5 supplies 120
    * independent fingerprint bits across two BIGINT words. Identical
    * in DuckDB: CAST('0x'||substr(md5(t),16,15) AS BIGINT).
    */
  def tokenHash60b(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long")

  /** Positional rolling-hash document fingerprint:
    * sum((pos+1) * hash(token)) mod 1e9+7 over whitespace tokens.
    * Order-sensitive (a permuted doc fingerprints differently), cheap,
    * and exactly replicable in the oracle.
    */
  def fingerprint(c: Column): Column = {
    val toks = tokens(c)
    val hashed = zip_with(
      toks,
      sequence(lit(1), greatest(size(toks), lit(1))),
      (t, i) => tokenHash(t) % lit(1000000007L) * i)
    aggregate(hashed, lit(0L), (acc, x) => (acc + x) % lit(1000000007L))
  }

  /** Edit distance when ≤ k, else -1 — the native banded-DP kernel
    * (LevenshteinAtMost): O(min(len)·k) with row-level early exit,
    * vs the built-in levenshtein's full O(n·m) matrix. Use for
    * threshold filters (entity blocking) where k is small.
    */
  def levAtMost(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(LevenshteinAtMost(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}
