package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer training + application (SURVEY.md §2.6 t24/t25) —
  * the byte-pair-encoding merge learning of Sennrich et al. 2016
  * ("Neural Machine Translation of Rare Words with Subword Units")
  * re-expressed as a distributed pipeline. No reference counterpart
  * (the reference tokenizes with whitespace only) — this is the
  * tokenizer-training step an LLM corpus build runs before anything
  * else touches the tokens.
  *
  * Scale design: the ONLY corpus-sized pass is the word-frequency
  * aggregate — map-side-combinable and Zipf-bounded (the distinct-word
  * vocabulary saturates as the corpus grows; ScaleSpec measures it).
  * Every merge round then operates on the VOCAB table: pair counting
  * is an explode + map-combinable sum over ≤ vocab rows, the argmax is
  * a bounded struct-min, and the merge pass is a row-local fold. This
  * mirrors production BPE trainers (HuggingFace tokenizers, SentencePiece):
  * one corpus count, then driver-sized rounds — here each round stays
  * a distributed plan so a 100 M-word vocab would still fit. More
  * rounds iterate the same step under d07's localCheckpoint loop.
  */
object Bpe {

  /** Character-split symbol array of a word: "ab" → [a, b]. The
    * regexp spaces every char; both engines replay it
    * (`regexp_replace(word, '(.)', '\1 ', 'g')` in DuckDB).
    */
  private[graft] def charSyms(word: Column): Column =
    split(trim(regexp_replace(word, "(.)", "$1 ")), " ")

  /** One greedy left-to-right non-overlapping merge pass of pair
    * (pa, pb) over a symbol array — the fold formulation: a candidate
    * merges iff the previous position did not. Equivalent to the
    * oracle's parity-rule replay (within a run of consecutive
    * candidate positions, every other one starting at the run head is
    * active): the fold's `last(acc) = pa` test can only diverge from
    * the original-symbol test if a just-merged symbol equals pa, i.e.
    * pa·pb = pa — impossible for non-empty pb.
    */
  private[graft] def mergePass(syms: Column, pa: Column, pb: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === pa && x === pb,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(pa, pb))))
          .otherwise(concat(acc, array(x))))

  /** The corpus word-frequency table with char-split symbols — the
    * one corpus-sized aggregate (map-combinable, vocab-bounded).
    */
  private def wordTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("n"))
      .select(col("word"), col("n"), charSyms(col("word")).as("syms"))

  /** Weighted adjacent-pair counts of a vocab — the BPE "model side".
    * Its row count is ALPHABET-bounded (≤ |symbols|², independent of
    * corpus size; ScaleSpec measures the saturation), which is what
    * keeps every merge round a bounded aggregate at 100 TB.
    */
  private[graft] def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1)," +
          " (w, i) -> struct(w AS a, syms[i + 1] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).cast("long").as("cnt"))

  /** The round-1 pair-count frame straight off the corpus (the scale
    * harness measures its cardinality). */
  private[graft] def roundOnePairs(s: SparkSession, dir: String): DataFrame =
    pairCounts(wordTable(s, dir))

  /** The weighted top adjacent symbol pair of the current vocab —
    * ties break (count DESC, a ASC, b ASC) via a bounded struct-min,
    * never a sort. 1-row frame (NULLs when no pair exists).
    */
  private def topPair(vocab: DataFrame): DataFrame =
    pairCounts(vocab)
      .agg(min(struct((-col("cnt")).as("nc"), col("a").as("a"),
        col("b").as("b"))).as("t"))
      .select(col("t.a").as("pa"), col("t.b").as("pb"),
        (-col("t.nc")).cast("long").as("pcnt"))

  /** Run `rounds` merge rounds over the vocab. Returns the final
    * vocab (word, n, syms) and the learned 1-row merge frames. Every
    * intermediate is cached: each round's vocab feeds BOTH the pair
    * count and the merge pass, and each top-pair row feeds BOTH the
    * merge output and the pass (the one-plan re-execution rule).
    */
  private[graft] def learn(s: SparkSession, dir: String,
      rounds: Int): (DataFrame, Seq[DataFrame]) = {
    var cur = wordTable(s, dir)
    val merges = Seq.newBuilder[DataFrame]
    for (_ <- 1 to rounds) {
      val c = cur.cache()
      val t = topPair(c).cache()
      merges += t
      cur = c.crossJoin(broadcast(t))
        .select(col("word"), col("n"),
          mergePass(col("syms"), col("pa"), col("pb")).as("syms"))
    }
    (cur, merges.result())
  }

  /** t24 — BPE tokenizer TRAINING (2 merge rounds): emits the learned
    * merges (kind='merge', ord=round, sym=merged pair, cnt=weighted
    * pair count at selection time) and the resulting symbol vocabulary
    * with weighted counts (kind='vocab', ord=0) — bounded by
    * |alphabet| + rounds rows, the tokenizer artifact itself.
    */
  def bpeTrain(s: SparkSession, dir: String, rounds: Int = 2): DataFrame = {
    val (fin, merges) = learn(s, dir, rounds)
    val vocab = fin.select(col("n"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("n")).cast("long").as("cnt"))
      .select(lit("vocab").as("kind"), lit(0).as("ord"), col("sym"),
        col("cnt"))
    val mergeRows = merges.zipWithIndex.map { case (t, i) =>
      t.filter(col("pa").isNotNull)
        .select(lit("merge").as("kind"), lit(i + 1).as("ord"),
          concat(col("pa"), col("pb")).as("sym"), col("pcnt").as("cnt"))
    }.reduce(_ union _)
    mergeRows.union(vocab).orderBy(col("kind"), col("ord"), col("sym"))
  }

  /** The word → symbol-count lookup the APPLY step joins through:
    * (word, n_char_syms = chars before merging, n_bpe_syms = symbols
    * after the learned merges). Vocab-bounded — production tokenizers
    * memoize per word exactly like this instead of re-running the
    * merge loop per occurrence.
    */
  private[graft] def wordSymCounts(s: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    val (fin, _) = learn(s, dir, rounds)
    fin.select(col("word"), length(col("word")).cast("long").as("n_char_syms"),
      size(col("syms")).cast("long").as("n_bpe_syms"))
  }

  /** Frozen-tokenizer application over (doc_id, word, k) counts: the
    * memoized word table answers known words through a key-equality
    * LEFT join; words the lake vocab never saw (the streaming OOV
    * seam) fall back to row-local application of the frozen merge
    * RULES — charSyms + one mergePass per learned round — exactly how
    * a production tokenizer's word cache backstops onto the merge
    * loop. `merges` are 1-row frames with (pa$i, pb$i) columns;
    * broadcasting them is trivially safe (the t09 1-row pattern).
    * Emits per-doc counts + the OOV token count (a rising OOV share
    * is the re-train signal a corpus build monitors).
    */
  private[graft] def applyFrozen(docs: DataFrame, memo: DataFrame,
      merges: Seq[DataFrame]): DataFrame = {
    val dd = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).cast("long").as("k"))
    val joined = merges.foldLeft(dd.join(memo, Seq("word"), "left")) {
      (acc, m) => acc.crossJoin(broadcast(m))
    }
    val fallback = merges.indices.foldLeft(charSyms(col("word"))) {
      (acc, i) => mergePass(acc, col(s"pa${i + 1}"), col(s"pb${i + 1}"))
    }
    val st = joined
      .withColumn("n_bpe",
        coalesce(col("memo_syms"), size(fallback).cast("long")))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_tokens"),
        sum(col("k") * length(col("word"))).cast("long").as("n_char_syms"),
        sum(col("k") * col("n_bpe")).cast("long").as("n_bpe_syms"),
        sum(when(col("memo_syms").isNull, col("k")).otherwise(lit(0L)))
          .cast("long").as("n_oov_tokens"))
    docs.select(col("doc_id")).join(st, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_char_syms"), lit(0L)).as("n_char_syms"),
        coalesce(col("n_bpe_syms"), lit(0L)).as("n_bpe_syms"),
        coalesce(col("n_oov_tokens"), lit(0L)).as("n_oov_tokens"))
      .withColumn("compression_bp", expr(
        "CAST(n_bpe_syms * 10000 DIV greatest(n_char_syms, 1) AS BIGINT)"))
  }

  /** t25 — BPE tokenizer APPLY: per-doc symbol counts before/after
    * the learned merges and the compression they buy (the tokenizer
    * "fertility" statistic corpus builds track — a tokenizer whose
    * compression decays on a new source is mis-fit to it). Per-doc
    * (doc, word) counts are ONE doc-keyed map-combinable aggregate;
    * the lookup join is key-equality on the vocab-bounded word table
    * (AQE broadcasts it while small — no forced hint, the s04 rule).
    */
  def bpeApply(s: SparkSession, dir: String, rounds: Int = 2): DataFrame =
    bpeApplyFrame(s, dir, rounds).orderBy(col("doc_id"))

  /** t25's unsorted per-doc body (the factored-body rule) — t34
    * re-aggregates it per (lang, source) without inheriting the
    * contract ORDER BY's range exchange.
    */
  private[graft] def bpeApplyFrame(s: SparkSession, dir: String,
      rounds: Int = 2): DataFrame = {
    val docs = Tables.documents(s, dir)
    val dd = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).cast("long").as("k"))
    val j = dd.join(wordSymCounts(s, dir, rounds), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_tokens"),
        sum(col("k") * col("n_char_syms")).cast("long").as("n_char_syms"),
        sum(col("k") * col("n_bpe_syms")).cast("long").as("n_bpe_syms"))
    docs.select(col("doc_id")).join(j, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_char_syms"), lit(0L)).as("n_char_syms"),
        coalesce(col("n_bpe_syms"), lit(0L)).as("n_bpe_syms"))
      .withColumn("compression_bp", expr(
        "CAST(n_bpe_syms * 10000 DIV greatest(n_char_syms, 1) AS BIGINT)"))
  }

  /** t34 — TOKENIZER FERTILITY audit per (lang, source): BPE symbols
    * per whitespace word (fertility) and per character (compression)
    * for every corpus slice — the per-domain tokenizer fit report
    * mixed-corpus builds track (a tokenizer trained on one mix has
    * measurably higher fertility on out-of-mix domains — code, other
    * scripts — which inflates their effective token cost and skews
    * any token-budgeted mix plan; corpus reports quote fertility per
    * domain for exactly this reason, cf. the per-domain tokenizer
    * tables in Gopher/BLOOM-style dataset cards).
    *
    * Scale shape: rides t25's per-doc frame (one token scan + the
    * vocab-bounded word-table join), then ONE map-combinable
    * aggregate over (lang, source) — the dims join is key-equality on
    * doc_id and the output is |langs|·|sources| rows however large
    * the corpus. Ratios in integer bp (floor division both engines
    * replay).
    */
  def tokenizerFertility(s: SparkSession, dir: String,
      rounds: Int = 2): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source"))
      .join(bpeApplyFrame(s, dir, rounds), Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(col("n_char_syms")).cast("long").as("n_char_syms"),
        sum(col("n_bpe_syms")).cast("long").as("n_bpe_syms"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("n_char_syms"), col("n_bpe_syms"),
        expr("CAST(n_bpe_syms * 10000 DIV greatest(n_tokens, 1) AS BIGINT)")
          .as("fertility_bp"),
        expr("CAST(n_bpe_syms * 10000 DIV greatest(n_char_syms, 1) AS BIGINT)")
          .as("compression_bp"))
      .orderBy(col("lang"), col("source"))
}
