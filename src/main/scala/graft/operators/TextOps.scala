package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis queries over the documents table (SURVEY.md §2.6).
  * All single-pass projections — no shuffle at all except final sort;
  * at 100 TB these run at parquet-scan speed with `text` the only
  * wide column read.
  */
object TextOps {

  /** t01 — whitespace + BPE-ish token counting. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.tokenCountWs(col("text")).as("n_tokens_ws"),
        Text.tokenCountBpe(col("text")).as("n_tokens_bpe"))
      .orderBy(col("doc_id"))

  /** t02 — heuristic quality scoring. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.tokenCountWs(col("text")).as("n_words"),
        Text.stopwordCount(col("text")).as("n_stopwords"),
        Text.punctCount(col("text")).as("n_punct"),
        Text.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** t03 — marker-word language ID vs the labeled lang column. */
  /** Offset separating t03/t37's planted gate docs from real ids. */
  val LangPlantOffset = 30000000L

  /** The language-ID gate's PLANTED docs (the d15 thin-gate recipe;
    * r11 verdict item 6). The synthetic corpus carries NO lexical
    * language signal — all five labels draw from ONE shared 31-token
    * tech vocabulary (measured: per-label token shares are uniform
    * noise), so an honest content classifier can only abstain on it
    * and the confusion matrix was degenerate (every label's modal
    * prediction 'en' through the old tech-colliding markers). The
    * audit's regimes therefore live in plants, replayed by the oracle
    * as literal VALUES: per language l, 8 CORRECT plants (labeled l,
    * text = l's markers cycled to 12·(j+1) tokens so marker counts
    * vary) and 1 MISLABELED plant (labeled l, text = the next
    * language's markers — the mislabel regime t37 exists to catch).
    * Real docs populate the 'und' abstention column. With the plants,
    * every labeled language's modal prediction AMONG DETECTIONS
    * (predicted ≠ 'und') sits on the diagonal at every SF.
    */
  def langPlantRows: Seq[(Long, String, String)] = {
    val langs = Text.markers
    langs.zipWithIndex.flatMap { case ((l, ws), i) =>
      val correct = (0 until 8).map { j =>
        val toks = Iterator.continually(ws).flatten.take(12 * (j + 1)).toSeq
        (LangPlantOffset + 10L * i + j, l, toks.mkString(" "))
      }
      val nxt = langs((i + 1) % langs.size)._2
      correct :+ ((LangPlantOffset + 10L * i + 8, l,
        (nxt ++ nxt).mkString(" ")))
    }
  }

  /** The gate's augmented (doc_id, lang, text) corpus: base ∪ the 45
    * planted docs — shared by t03 and t37 so prediction and audit run
    * over one population.
    */
  def langGateFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text"))
      .union(langPlantRows.toDF("doc_id", "lang", "text"))
  }

  def langId(s: SparkSession, dir: String): DataFrame =
    langGateFrame(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        Text.langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  /** t04 — positional rolling-hash fingerprint. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** t05 — per-language character-trigram profile (top-5 by corpus
    * frequency): the statistical building block of real language ID.
    * One explode + one shuffle on (lang, gram).
    */
  def ngramProfile(s: SparkSession, dir: String): DataFrame = {
    val norm = Text.normalize(col("text"))
    // explode(sequence) + substr stays inside whole-stage codegen; a
    // transform(...) lambda here is CodegenFallback — interpreted per
    // character of every document. The TWO-LEVEL explode is the perf
    // point (r11): UTF8String.substr by CHARACTER index walks bytes
    // from the string start, so per-position substr over the whole
    // doc is O(position) — quadratic per doc (measured 2.3 s at
    // sf0.1 for only 1.5M grams). Chunking to 24 chars (+2 overlap
    // so chunk-boundary trigrams survive) bounds every walk at 26
    // chars: identical gram multiset, an order of magnitude less
    // byte walking (measured 2.3 → 1.0 s). The r20
    // chunked-sessionize move applied to strings.
    val C = 24
    val grams = Tables.documents(s, dir)
      .select(col("lang"), norm.as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("lang"), col("t"),
        explode(sequence(lit(0),
          ((length(col("t")) - 3) / C).cast("int"))).as("k"))
      .select(col("lang"),
        col("t").substr(col("k") * C + 1, lit(C + 2)).as("c"))
      .select(col("lang"), col("c"),
        explode(sequence(lit(1), length(col("c")) - 2)).as("i"))
      .select(col("lang"), col("c").substr(col("i"), lit(3)).as("gram"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("gram"))
    grams.groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn"), col("gram"), col("cnt"))
      .orderBy(col("lang"), col("rn"))
  }

  /** t07 — corpus vocabulary: top-50 tokens by total frequency with
    * document frequency — the tokenizer-training / stopword-discovery
    * primitive. One explode, one shuffle on token.
    */
  def vocabulary(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(lower(col("text")))).as("token"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(50)
  }

  /** t09 — per-document top-3 salient terms by TF-IDF. The idf factor
    * is the rational surrogate (N+1)/(df+1) instead of its log —
    * order-equivalent per fixed df, and integer-exact across engines
    * (a natural log's last-ulp may differ between libm builds, which
    * would flip floor() hashes; swapping `ln` back in is a one-line
    * change when cross-engine bit-equality is not required). Ranking
    * runs through the bounded TopKPerKey operator: only 3 rows per
    * doc per partition reach the shuffle — at 100 TB the tf table is
    * corpus-sized and the full row_number sort is the cost to avoid.
    */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.install(s)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(lower(col("text")))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df derives from tf (exactly one row per (doc, token)) — no
    // second corpus scan, no distinct shuffle
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token").crossJoin(broadcast(nDocs))
      // exact in double: numerator < 2^53, quotient ulp ≪ 1/(df+1)
      .withColumn("score_bp",
        floor(col("tf") * (col("n_docs") + 1) * 10000 / (col("df") + 1))
          .cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_bp").desc, col("token"))
    graft.plans.TopK.perKey(scored, Seq(col("doc_id")),
        Seq(col("score_bp").desc, col("token").asc), 3)
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("df"),
        col("score_bp"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** t10 — context-window sequence packing: documents stream into
    * fixed `capacity`-token windows (concat-then-split packing, the
    * standard pretraining batcher). Docs are laid out in doc_id order
    * by a running token cumsum within their shard; a doc's window is
    * floor(prev_cum / capacity) and its offset is prev_cum % capacity
    * (docs may straddle windows, exactly like a packed token stream).
    *
    * The shard key is (lang, doc_id % nShards), NOT just lang: a
    * per-language window would cap parallelism at the language count
    * and put the biggest language's entire sort on one executor.
    * Sub-sharding by a deterministic doc_id bucket scales the sort
    * width with the cluster (set nShards ∝ executors); packing order
    * within a shard is still total and reproducible, and a window is
    * globally identified by (lang, shard_id, bin_id).
    */
  def sequencePack(s: SparkSession, dir: String, capacity: Int = 512,
      nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard_id"))
      .orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard_id"),
        Text.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .withColumn("prev_cum",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard_id"), col("n_tokens"),
        floor(col("prev_cum") / capacity).cast("long").as("bin_id"),
        (col("prev_cum") % capacity).as("bin_offset"))
      .orderBy(col("lang"), col("shard_id"), col("doc_id"))
  }

  /** t26 — overlapping CHUNK SPLIT (the RAG-ingestion primitive and
    * t10's inverse): each doc splits into 128-token windows on a
    * 96-token stride (32-token overlap, the retrieval convention so
    * no phrase is cut at every boundary), each chunk carrying its
    * position and an md5 content hash — the unit d09's chunk-dedup
    * and any vector-store ingest consume. Entirely ROW-LOCAL: one
    * explode over the per-doc start sequence, no shuffle at all
    * before the output sort — scan-speed at 100 TB.
    */
  def chunkSplit(s: SparkSession, dir: String, size0: Int = 128,
      stride: Int = 96): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), greatest(size(col("t")), lit(1)),
          lit(stride))).as("start"))
      .select(col("doc_id"),
        ((col("start") - 1) / stride).cast("int").as("chunk_id"),
        col("start").cast("long").as("start_pos"),
        least(lit(size0), size(col("t")) - col("start") + 1).cast("long")
          .as("n_tokens"),
        md5(array_join(slice(col("t"), col("start"), lit(size0)), " "))
          .as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** t27 — EXACT-k per-stratum sample: exactly min(k, n) docs per
    * language by deterministic md5 rank — the eval-slice/debug-slice
    * builder (t11's hash-Bernoulli gives a RATE, not a count; an eval
    * set wants exactly k rows per stratum, reproducibly). The salted
    * hash is the random order, TopKPerKey bounds the shuffle to ≤ k
    * rows per language per partition — a distributed reservoir sample
    * without a global sort (never window-over-corpus).
    */
  def exactSample(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    graft.plans.GraftExtensions.install(s)
    val r = md5(concat(lit("t27|"), col("doc_id").cast("string")))
    val ranked = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), r.as("r"))
    val w = Window.partitionBy(col("lang")).orderBy(col("r"), col("doc_id"))
    graft.plans.TopK.perKey(ranked, Seq(col("lang")),
        Seq(col("r").asc, col("doc_id").asc), k)
      .withColumn("rn", row_number().over(w).cast("int"))
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  /** t11 — deterministic stratified sampling: per-language keep rates
    * applied via an md5 hash bucket of the doc id (bucket = first 8
    * md5 hex digits mod 100). Hash-based Bernoulli sampling is THE
    * scalable sampling primitive: no global count, no shuffle, same
    * sample on every engine and every re-run, and rates are tunable
    * per stratum — the data-mixing step of a training pipeline.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    sampleTransform(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"), col("bucket"), col("keep_pct"))
      .orderBy(col("doc_id"))

  /** The stateless sampling transform itself — works unchanged on a
    * streaming DataFrame (no window, no state), which is how a
    * training pipeline samples an arriving corpus. Keeps every input
    * column and appends (bucket, keep_pct), so callers embed it
    * mid-pipeline (c01, the streaming curation twin) or project the
    * t11 shape — ONE sampling definition, no drift.
    */
  def sampleTransform(docs: DataFrame): DataFrame = {
    val bucket = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long"), lit(100L))
    val rate = when(col("lang") === "en", 50)
      .when(col("lang") === "de", 25)
      .when(col("lang") === "es", 25)
      .otherwise(10)
    docs
      .withColumn("bucket", bucket)
      .withColumn("keep_pct", rate)
      .filter(col("bucket") < col("keep_pct"))
  }

  /** t12 — benchmark DECONTAMINATION: training docs sharing any
    * 8-token shingle with the held-out benchmark slice (docs with
    * doc_id % 50 == 0 stand in for an eval set) are flagged — the
    * n-gram-overlap contamination check every serious training-data
    * pipeline runs before a model sees the corpus. Scale: in
    * production the benchmark suite is a FIXED external artifact, but
    * this query's stand-in slice is corpus-proportional, so the
    * broadcast HINT is deliberately absent (the s04 lesson, r8): AQE
    * sizes the distinct shingle set at runtime and broadcasts while
    * it is small; past the threshold the equi-join degrades to a
    * shuffle join instead of a forced corpus-sized broadcast. The
    * training side stays one scan + one equi-join on the shingle —
    * never a pairwise comparison.
    */
  def decontaminate(s: SparkSession, dir: String, n: Int = 8): DataFrame =
    decontFrame(s, dir, n).orderBy(col("doc_id"))

  /** t12's unsorted flag frame — consumers that re-aggregate it (c07)
    * must not inherit the contract sort as a mid-plan range exchange
    * over a corpus-sized frame (the r30/sessionFrame lesson).
    */
  private[graft] def decontFrame(s: SparkSession, dir: String,
      n: Int = 8): DataFrame = {
    // referenced twice (benchmark side + training side) — cache so
    // the corpus-wide shingle generation runs once
    val sh = Dedup.shingles(s, dir, n).cache()
    val bench = sh.filter(col("doc_id") % 50 === 0)
      .select(col("shingle")).distinct()
    val hits = sh.filter(col("doc_id") % 50 =!= 0)
      .join(bench, "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
    Tables.documents(s, dir).filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** t13 — repetition-based quality stats (the Gopher repetition
    * rules): per doc, the fraction of 2-gram occurrences taken by the
    * single most frequent 2-gram and the fraction of 3-gram
    * occurrences whose gram repeats within the doc; docs above either
    * threshold flag as repetitive boilerplate. Integer basis points
    * via floor so the flag can't straddle a float ulp cross-engine.
    * Scale: both stats are (doc_id, gram) aggregations — two
    * map-side-combinable shuffles keyed by doc, no global state.
    */
  def repetitionStats(s: SparkSession, dir: String, top2Bp: Int = 2000,
      dup3Bp: Int = 1800): DataFrame = {
    def gramCounts(n: Int) = {
      val toks = Text.tokens(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= n)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"))
        .select(col("doc_id"),
          array_join(slice(col("t"), col("i"), lit(n)), " ").as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
    }
    val g2 = gramCounts(2).groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("total2"))
      .select(col("doc_id"),
        floor(col("top_cnt") * 10000 / col("total2")).cast("long")
          .as("top_bigram_bp"))
    val g3 = gramCounts(3).groupBy(col("doc_id"))
      .agg(sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup_occ"),
        sum(col("cnt")).as("total3"))
      .select(col("doc_id"),
        floor(col("dup_occ") * 10000 / col("total3")).cast("long")
          .as("dup_trigram_bp"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(g2, Seq("doc_id"), "left")
      .join(g3, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top_bigram_bp"), lit(0L)).as("top_bigram_bp"),
        coalesce(col("dup_trigram_bp"), lit(0L)).as("dup_trigram_bp"))
      .withColumn("flagged",
        col("top_bigram_bp") >= top2Bp || col("dup_trigram_bp") >= dup3Bp)
      .orderBy(col("doc_id"))
  }

  /** t14 — domain/language mixture weights: per language, the
    * resampling weight that moves the corpus from its ACTUAL language
    * share to the TARGET training mix (en 40 %, others 15 % each) —
    * the data-mixing knob of a pretraining pipeline. weight_bp =
    * floor(target_bp · total / n_docs): > 10000 means upsample,
    * < 10000 downsample. One aggregate + a broadcast of the 1-row
    * corpus total — no per-doc work at all (per-doc application is
    * t11's hash-bucket sampling with these rates).
    */
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total_docs"))
    val targetBp = when(col("lang") === "en", 4000L).otherwise(1500L)
    counts.join(broadcast(total), lit(true))
      .select(col("lang"), col("n_docs"), targetBp.as("target_bp"),
        floor(targetBp * col("total_docs") / col("n_docs")).cast("long")
          .as("weight_bp"))
      .orderBy(col("lang"))
  }

  /** t15 — temperature-scaled language rebalancing (α = 0.5), the
    * materializing counterpart of t14's weight computation: the
    * corpus is downsampled so post-sample language counts are
    * ∝ sqrt(pre-sample counts) — the standard temperature flattening
    * of a pretraining mix. keep_bp(lang) = floor(10⁴·sqrt(n_min/n)),
    * so the rarest language keeps 100 % and over-represented ones
    * shrink toward it; the per-doc decision is a salted md5 bucket
    * vs that integer threshold (t11's hash-Bernoulli primitive — no
    * global shuffle, no RNG, replayable). keep_bp derives from two
    * integers through one sqrt+floor, so both engines compute the
    * identical threshold — no float-sum ordering anywhere. Scale:
    * one tiny aggregate broadcast back over one scan.
    */
  def mixResample(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val nMin = counts.agg(min(col("n_docs")).as("n_min"))
    val rates = counts.join(broadcast(nMin), lit(true))
      .select(col("lang"),
        floor(lit(10000) * sqrt(col("n_min").cast("double") / col("n_docs")))
          .cast("long").as("keep_bp"))
    val bucket = pmod(conv(substring(
      md5(concat(lit("mix"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long"), lit(10000L))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .join(broadcast(rates), "lang")
      .withColumn("bucket", bucket)
      .filter(col("bucket") < col("keep_bp"))
      .select(col("doc_id"), col("lang"), col("keep_bp"))
      .orderBy(col("doc_id"))
  }

  /** t16 — deterministic global corpus shuffle: every training run
    * needs the corpus in a reproducible pseudo-random order, and at
    * 100 TB a true global sort is the wrong tool. Shuffle key =
    * salted md5 of the doc id; shard = key's hash mod nShards (hash
    * uniformity balances shards with no planning pass); position =
    * rank within the shard. One hash-partition shuffle + a
    * WITHIN-shard sort — no total-order exchange, and readers stream
    * shards independently in (shard_id, pos) order. Same salt ⇒ same
    * permutation on every engine and every re-run; a new epoch is a
    * new salt, never a new scan pattern.
    */
  def globalShuffle(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit("shuf"), col("doc_id").cast("string"))).as("shuffle_key"))
      .withColumn("shard_id",
        pmod(conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard_id"), col("pos"))
      .orderBy(col("shard_id"), col("pos"))
  }

  /** t17 — contamination SPAN EXCISION (the exact-substring
    * deduplication shape of Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better", applied to benchmark
    * decontamination): where t12 FLAGS whole docs sharing an n-gram
    * with the benchmark set, this operator REMOVES the contaminated
    * token spans and keeps the rest of the doc — the
    * span-level pass production pipelines run when dropping whole
    * docs would cost too much data. Every benchmark-overlapping
    * n-gram marks tokens [i, i+n−1]; overlapping-or-adjacent marks
    * merge into maximal spans (the classic running-max interval merge
    * — same window machinery as sessionize, keyed per doc); the doc
    * is re-emitted from its surviving tokens with span stats.
    *
    * n = 4 on this corpus: the declared gram width is the operator's
    * selectivity knob exactly as in t12 (whose n = 8 stand-in finds
    * doc-level hits; 4-gram spans at sf0.01 excise 19 of 490 docs,
    * and sf0.1 exercises multi-span docs and full excision).
    *
    * Scale: shingle join is the t12/d04 key-equality shape (one scan
    * + one equi-join, never pairwise); interval merge is two windows
    * over (doc_id, i) — partitioned by doc, no global state; the
    * rebuild is an equi anti-join on (doc_id, pos) (covered positions
    * exploded from spans — bounded by doc length) plus a per-doc
    * aggregation. Everything shuffles on doc_id.
    *
    * Guarantee boundary (the known caveat of span excision): every
    * ORIGINAL contaminated occurrence is removed, but stitching a
    * removed span's neighbors together can form NEW n-grams across
    * the seam that happen to match the benchmark; production runs
    * the pass to a fixpoint (rarely more than two iterations).
    * PropertySpec asserts the original-occurrence guarantee plus
    * token conservation and subsequence order.
    */
  def contaminationExcise(s: SparkSession, dir: String, n: Int = 4): DataFrame = {
    // token-array frame is referenced by the shingle generator AND
    // the position-level rebuild — cache so the scan+split runs once
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .cache()
    val bench = tk.filter(col("doc_id") % 50 === 0)
      .filter(size(col("t")) >= n)
      .select(explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"),
        col("t"))
      .select(array_join(slice(col("t"), col("i"), lit(n)), " ").as("shingle"))
      .distinct()
    exciseAgainst(tk.filter(col("doc_id") % 50 =!= 0), bench, n)
      .orderBy(col("doc_id"))
  }

  /** The t17 core against an EXPLICIT benchmark shingle set: excise
    * every benchmark-overlapping n-gram span from the (doc_id, t)
    * token frame. Shared by the contract query (bench = the corpus's
    * doc_id%50 slice) and streaming.ExciseStream (bench = the static
    * set, arriving docs excised per micro-batch — each doc lands in
    * exactly one batch and the span logic is per-doc, so per-batch
    * semantics equal the batch operator exactly).
    */
  private[graft] def exciseAgainst(tk: DataFrame, bench: DataFrame,
      n: Int): DataFrame = {
    val g = tk.filter(size(col("t")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("t"), col("i"), lit(n)), " ").as("shingle"))
    // one row per contaminated gram start (g has one row per (doc, i))
    val hit = g.join(bench, "shingle")
      .select(col("doc_id"), col("i"))
    exciseHits(tk, hit, n)
  }

  /** Span-merge + excision core shared by t17 (benchmark hits) and
    * t19 (corpus-internal duplicate hits): given a (doc_id, i) frame
    * of contaminated n-gram START positions, merge overlapping
    * windows into maximal spans, drop every covered token position,
    * and re-emit per-doc (n_spans, n_removed, clean_text) for EVERY
    * doc in `tk`. All heavy stages shuffle on doc_id only.
    */
  private[graft] def exciseHits(tk: DataFrame, hit: DataFrame,
      n: Int): DataFrame = {
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = hit
      .withColumn("prev_end", max(col("i") + (n - 1)).over(wPrev))
      .withColumn("brk",
        when(col("prev_end").isNull || col("i") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("i")).as("s"), max(col("i") + (n - 1)).as("e"))
    val cov = spans
      .select(col("doc_id"), explode(sequence(col("s"), col("e"))).as("pos"))
      .distinct()
    val kept = tk
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
      .join(cov, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("clean_text"))
    val stats = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_removed"))
    tk.select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        // a fully-excised doc keeps zero tokens — emit '' not null
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** t19 — corpus-internal exact-substring self-dedup (the
    * within-corpus half of Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better"): any n-token window whose
    * text occurs at MORE THAN ONE position in the corpus keeps only
    * its first occurrence (minimal (doc_id, pos)); every other
    * occurrence's span is excised, overlapping windows merged into
    * maximal spans exactly like t17. The reference pipeline has no
    * counterpart (pipeline_runner.py dedups whole rows only); this is
    * the span-level generalization a training corpus needs.
    *
    * Scale shape: the single-node suffix-array of the paper does not
    * distribute; the distributed analog used here is the
    * fingerprint-window equi-join — one row per token position
    * carrying a 16-byte md5 of its n-window, ONE map-side-combinable
    * groupBy on that fingerprint (min + count partials), and one
    * key-equality join back. Both shuffles are linear in corpus
    * tokens and narrow (fingerprint + two longs per row); no
    * similarity self-join anywhere. The canonical occurrence is the
    * lexicographic min of (doc_id, pos) via struct-min — safe for
    * arbitrarily long documents (see [[posKey]]); the oracle replays
    * the identical order with a row_number window.
    */
  def selfDedup(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    // token frame feeds the window generator AND the rebuild — cache
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .cache()
    exciseHits(tk, selfDedupHitFrame(tk, n), n).orderBy(col("doc_id"))
  }

  /** t19's excised-occurrence frame (doc_id, i) — factored out so the
    * scale harness can measure hit volume directly (expected ~×factor
    * under content-disjoint inflation: within-copy duplicate structure
    * replicates, cross-copy windows don't collide).
    */
  private[graft] def selfDedupHitFrame(tk: DataFrame, n: Int): DataFrame = {
    val g = windowFingerprints(tk, n)
    val dup = g.groupBy(col("sh"))
      .agg(min(posKey).as("canon"), count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("sh"), col("canon"))
    g.join(dup, "sh")
      .filter(posKey =!= col("canon"))
      .select(col("doc_id"), col("i"))
  }

  /** t19's global occurrence order: lexicographic (doc_id, i) — min =
    * canonical occurrence. A struct, not stride arithmetic: the r1–r9
    * key `doc_id*1e6 + i` silently aliased any document with ≥ 1 M
    * tokens into the next doc_id's key range (concatenated dumps at
    * 100 TB do hit that), mis-picking the canon. Struct min/least
    * order structs field-by-field (the r21 struct-max precedent); the
    * oracle replays the same order with `row_number() OVER (ORDER BY
    * doc_id, i)`.
    */
  private[graft] def posKey: Column = struct(col("doc_id"), col("i"))

  /** One row per n-token window: (doc_id, i, sh) with sh the md5 of
    * the window text — the narrow shuffle key t19 and its streaming
    * twin (streaming.SelfDedupStream) group and probe on.
    */
  private[graft] def windowFingerprints(tk: DataFrame, n: Int): DataFrame =
    tk.filter(size(col("t")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (n - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        md5(array_join(slice(col("t"), col("i"), lit(n)), " ")).as("sh"))

  /** t20 — benchmark-overlap report: t12 flags TRAINING docs that
    * leak benchmark n-grams; this is the reverse direction every eval
    * card needs — per BENCHMARK doc, what fraction of its distinct
    * n-token windows appears anywhere in the training split
    * (n_leaked/n_windows in integer basis points). A benchmark item
    * with high leak_bp is compromised and must be excluded from
    * reported numbers; papers table exactly this statistic.
    *
    * Scale shape: both sides reduce to DISTINCT window fingerprints
    * (md5 — narrow keys), the train side to fingerprints ONLY; one
    * left-semi-shaped key-equality join and a doc_id-keyed count.
    * Linear in corpus tokens, no similarity join.
    */
  def benchmarkOverlap(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    // win feeds BOTH the bench and train sides of one plan — without
    // the cache the tokenize+explode+md5 subtree executes twice (the
    // t17/t19 convention; ADVICE r9)
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val win = windowFingerprints(tk, n).cache()
    val benchWin = win.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("sh")).distinct()
    val trainWin = win.filter(col("doc_id") % 50 =!= 0)
      .select(col("sh")).distinct().withColumn("leaked", lit(1))
    val stats = benchWin.join(trainWin, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_windows"),
        count(col("leaked")).cast("long").as("n_leaked"))
    Tables.documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") % 50 === 0)
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .withColumn("leak_bp",
        expr("CAST((n_leaked * 10000) DIV greatest(n_windows, 1) AS BIGINT)"))
      .orderBy(col("doc_id"))
  }

  /** t30 — per-doc n-gram NOVELTY score: the share of a document's
    * distinct n-token windows that appear in NO other document —
    * the information-density signal that separates original content
    * from boilerplate/mirrored text (a doc whose windows all recur
    * elsewhere adds nothing to a training mix; SlimPajama-style
    * builds cut exactly this tail). The inverse view of t19: t19
    * removes repeated spans, t30 SCORES each doc by how much of it
    * is unshared. Within-doc repetition is deliberately not counted
    * (distinct windows per doc) — that is t13's repetition signal.
    *
    * Scale shape: reuses t19's window fingerprints (md5 — narrow
    * shuffle keys); the distinct (doc, sh) frame is cached (it feeds
    * the sharing-count aggregate AND the per-doc probe of one plan —
    * the re-execution rule); sharing counts are one sh-keyed
    * map-combinable agg, the probe one key-equality join. Linear in
    * corpus tokens, no similarity join anywhere. The final all-docs
    * left join emits len<n docs with zero windows (the t20 edge
    * convention).
    */
  def ngramNovelty(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val wins = windowFingerprints(tk, n)
      .select(col("doc_id"), col("sh")).distinct()
      .cache() // feeds the sharing count AND the per-doc probe
    val nd = wins.groupBy(col("sh"))
      .agg(count(lit(1)).cast("long").as("nd"))
    val st = wins.join(nd, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_windows"),
        sum(when(col("nd") === 1L, 1L).otherwise(0L)).cast("long")
          .as("n_novel"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp",
        expr("CAST((n_novel * 10000) DIV greatest(n_windows, 1) AS BIGINT)"))
      .orderBy(col("doc_id"))
  }

  /** t32 — per-source TEMPLATE SHARE: for each document, the share of
    * its distinct n-token windows that recur in ≥ k OTHER-OR-SAME
    * docs of the SAME source — the nav-bar/footer/licence-block
    * detector (jusText/CCNet boilerplate removal lifted from lines to
    * token windows). A crawler source whose docs are mostly shared
    * template is chrome, not content; per-doc template_bp is the cull
    * signal, and it is deliberately scoped per source: a phrase
    * repeated across sources is common LANGUAGE (t30's novelty axis),
    * repeated within one source is page FURNITURE.
    *
    * Scale shape: t19's window fingerprints again (md5-narrow keys);
    * the distinct (doc, sh, source) frame is cached — it feeds the
    * (source, sh) template aggregate AND the per-doc probe of one
    * plan; both joins are key-equality. Linear in corpus tokens. The
    * all-docs left join emits len<n docs as zero rows (the t20/t30
    * edge convention).
    */
  def templateShare(s: SparkSession, dir: String, n: Int = 8,
      k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tk = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val ws = windowFingerprints(tk, n)
      .select(col("doc_id"), col("sh")).distinct()
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .cache() // feeds the template aggregate AND the per-doc probe
    val tpl = ws.groupBy(col("source"), col("sh"))
      .agg(count(lit(1)).cast("long").as("nd"))
      .filter(col("nd") >= k)
      .select(col("source"), col("sh"), lit(true).as("is_tpl"))
    val st = ws.join(tpl, Seq("source", "sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_windows"),
        sum(when(col("is_tpl"), 1L).otherwise(0L)).cast("long")
          .as("n_template"))
    docs.select(col("doc_id"), col("source"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_template"), lit(0L)).as("n_template"))
      .withColumn("template_bp",
        expr("CAST((n_template * 10000) DIV greatest(n_windows, 1) AS BIGINT)"))
      .orderBy(col("doc_id"))
  }

  /** t31 — ZIPF PROFILE of the vocabulary: terms banded by
    * floor-log2 of their frequency RANK, one row per band with term
    * count, occurrence mass and the band's frequency range — the
    * rank-frequency curve in integer log-log form. This is the
    * corpus-health fingerprint dataset cards print: clean natural
    * text tracks Zipf (mass decays smoothly per band); a broken
    * tokenizer, encoding corruption or synthetic/template spam bends
    * the curve (mass piling into deep bands, or a truncated head) —
    * visible here before any model ever trains.
    *
    * The naive rank is a window over the FULL vocabulary — a total
    * order over |V| rows. The scale answer is the t29 move one level
    * up: rank is derived from the FREQUENCY histogram — rank_min(f) =
    * 1 + Σ n_terms(f') for f' > f (standard min-rank; equal-frequency
    * terms share a rank, hence a band, by construction). The
    * histogram is bounded by the number of DISTINCT frequency values,
    * which is O(√N) for any corpus (k distinct frequencies need
    * ≥ k(k+1)/2 total occurrences) — so its single-partition window
    * is scale-free and the band probe is a broadcast join. Band =
    * ⌊log2 rank⌋ via length(bin(n))−1, the t21 integer idiom both
    * engines replay exactly. Output ≤ ~64 rows at any corpus size.
    */
  def zipfProfile(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(explode(Text.tokens(lower(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("freq"))
    val v = vocab.cache() // feeds the freq histogram AND the band probe
    val hist = v.groupBy(col("freq")).agg(count(lit(1)).cast("long").as("nt"))
    val wGt = Window.orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bands = hist
      .select(col("freq"),
        (coalesce(sum(col("nt")).over(wGt), lit(0L)) + 1L).as("rank_min"))
      .withColumn("bucket", expr("CAST(length(bin(rank_min)) - 1 AS INT)"))
      .select(col("freq"), col("bucket"))
    v.join(broadcast(bands), "freq")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("freq")).cast("long").as("n_occ"),
        min(col("freq")).cast("long").as("min_freq"),
        max(col("freq")).cast("long").as("max_freq"))
      .orderBy(col("bucket"))
  }

  /** t21 — bigram-LM surprisal scoring (the CCNet/KenLM perplexity
    * filter re-expressed oracle-exact): train an MLE bigram model on
    * the corpus itself and score every doc by its mean next-token
    * surprisal — garbled/OCR-noise docs score high and get culled.
    * Cross-engine float log is not replayable, so the model works in
    * integer floor-log2 units: surprisal(w1,w2) = ⌊log2 C(w1·)⌋ −
    * ⌊log2 C(w1,w2)⌋, both via length(bin(n))−1 — DuckDB replays the
    * identical binary-string-length rule.
    *
    * Scale shape: bigram extraction is row-local (transform over the
    * token array); per-doc bigram counts are ONE doc-keyed hash agg
    * whose exchange is REUSED by the model side (c12 aggregates dbg,
    * c1 aggregates c12 — identical subplans dedupe via
    * ReuseExchange); the score joins are plain key-equality shuffles
    * AQE may broadcast when the model is small (no forced broadcast
    * of a corpus-derived frame — the s04 lesson). Linear in corpus
    * tokens; model size is O(distinct bigrams), Zipf-concentrated.
    */
  def lmSurprisal(s: SparkSession, dir: String): DataFrame =
    surprisalScores(s, dir).orderBy(col("doc_id"))

  /** t21's unsorted scoring body — factored so t29's bucketing reuses
    * the identical score definition (drift between the scorer and the
    * bucketer would silently re-rank the terciles).
    */
  private[graft] def surprisalScores(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val dbg = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), (w, i) -> struct(w AS w1, t[i + 1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
    val c12 = dbg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("k")).cast("long").as("c12"))
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).cast("long").as("c1"))
    val st = dbg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), col("k"),
        ((length(bin(col("c1"))) - 1) - (length(bin(col("c12"))) - 1)).as("u"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_bigrams"),
        sum(col("k") * col("u")).cast("long").as("surprisal_units"))
    docs.select(col("doc_id"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_units"), lit(0L)).as("surprisal_units"))
      .withColumn("mean_centibits",
        expr("CAST((surprisal_units * 100) DIV greatest(n_bigrams, 1) AS BIGINT)"))
  }

  /** t29 — perplexity-tercile bucketing (the CCNet head/middle/tail
    * split): docs partitioned into three equal-population buckets by
    * t21's surprisal score — CCNet keeps "head" (lowest perplexity,
    * cleanest) wholesale, samples "middle", culls "tail"; the mix
    * decision every LM corpus build makes after the scorer runs.
    *
    * The naive formulation is ntile() over a GLOBAL rank window — a
    * total-order exchange of the corpus, the one shuffle shape this
    * engine bans. Instead the tercile is derived from the VALUE
    * HISTOGRAM: bucket(v) = ⌊3·c_lt(v) / n⌋ with c_lt the count of
    * docs scoring strictly below v — integer arithmetic both engines
    * replay, docs with equal scores land in the same bucket by
    * construction (ntile would split ties arbitrarily), and the
    * histogram frame is CAPACITY-BOUNDED at the distinct
    * mean_centibits values (≤ ~100·64 by construction of the score),
    * so its single-partition window and the broadcast probe join are
    * scale-free. The per-doc score frame is cached — it feeds the
    * histogram AND the probe side of one plan (the re-execution
    * rule); at 100 TB it is the 16-byte/doc artifact a production
    * pipeline would materialize anyway.
    */
  def perplexityBuckets(s: SparkSession, dir: String): DataFrame =
    perplexityTerciles(s, dir).orderBy(col("doc_id"))

  /** t29's unsorted body — factored so c06's mix plan consumes the
    * identical tercile definition. */
  private[graft] def perplexityTerciles(s: SparkSession, dir: String): DataFrame = {
    val sc = surprisalScores(s, dir)
      .select(col("doc_id"), col("mean_centibits"))
      .cache()
    val hist = sc.groupBy(col("mean_centibits"))
      .agg(count(lit(1)).as("cnt"))
    val wLt = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_centibits"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_centibits"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val terciles = hist.select(col("mean_centibits"),
        coalesce(sum(col("cnt")).over(wLt), lit(0L)).as("c_lt"),
        sum(col("cnt")).over(wAll).as("n_docs"))
      .withColumn("tercile", expr("CAST(3 * c_lt DIV n_docs AS INT)"))
      .select(col("mean_centibits"), col("tercile"))
    sc.join(broadcast(terciles), Seq("mean_centibits"))
      .select(col("doc_id"), col("mean_centibits"), col("tercile"),
        when(col("tercile") === 0, lit("head"))
          .when(col("tercile") === 1, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** t22 — DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc
    * by log p_target(x) − log p_raw(x) under hashed-bigram unigram
    * models of a target domain (source = 'src0' — the curated slice)
    * vs the rest of the corpus. High-weight docs look like the target
    * and get upsampled; the reference pipeline has no counterpart —
    * this is the domain-targeting selector modern corpus builds run.
    *
    * Cross-engine floats don't replay, so the log-ratio works in
    * integer floor-log2 units (the t21 trick): per bucket b,
    * u(b) = (⌊log2(Ct+1)⌋ − ⌊log2(Tt+1)⌋) − (⌊log2(Cr+1)⌋ −
    * ⌊log2(Tr+1)⌋), add-one smoothed, with C the bucket counts and T
    * the split totals; doc weight = Σ k·u over its buckets.
    *
    * Scale shape: bigram→bucket hashing is row-local; per-doc bucket
    * counts are ONE doc-keyed hash agg; the model side re-aggregates
    * that frame by bucket — and is CAPACITY-BOUNDED at `buckets` rows
    * by construction (the point of hashed features: model size is
    * fixed at 10 k rows regardless of corpus size), so broadcasting
    * it is safe at ANY scale — this is the documented exception to
    * the s04 no-forced-broadcast-of-corpus-derived-frames rule.
    * Linear in corpus tokens, one wide shuffle total.
    */
  def dsirWeights(s: SparkSession, dir: String, buckets: Int = 10000): DataFrame = {
    val docs = Tables.documents(s, dir)
    val db = dsirDocBuckets(docs, buckets)
    val bs = dsirModel(db)
      .cache() // feeds the totals agg AND the per-doc join in one plan
    val tot = bs.agg(sum(col("ct")).cast("long").as("tt"),
      sum(col("cr")).cast("long").as("tr"))
    dsirScore(docs, db, bs, tot).orderBy(col("doc_id"))
  }

  /** t22's scoring stage, shared with the streaming twin
    * (streaming.DsirStream scores arriving batches against a FROZEN
    * lake model through this exact code path — parity by
    * construction, spec-asserted empirically).
    */
  private[graft] def dsirScore(docs: DataFrame, db: DataFrame,
      bs: DataFrame, tot: DataFrame): DataFrame = {
    def flog2(c: Column) = length(bin(c)) - 1
    // LEFT join: a bucket the model has never seen scores with the
    // add-one smoothing floor (ct=cr=0). In the batch operator every
    // db bucket is in bs by construction (left ≡ inner); the seam
    // matters for the streaming twin, where the model is frozen and
    // arriving docs can hash into untouched buckets.
    val st = db.join(broadcast(bs), Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("doc_id"), col("k"),
        ((flog2(coalesce(col("ct"), lit(0L)) + 1) - flog2(col("tt") + 1))
          - (flog2(coalesce(col("cr"), lit(0L)) + 1) - flog2(col("tr") + 1))).as("u"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_bigrams"),
        sum(col("k") * col("u")).cast("long").as("weight_units"))
    docs.select(col("doc_id"))
      .join(st, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("weight_units"), lit(0L)).as("weight_units"))
      .withColumn("keep", col("weight_units") > 0L)
  }

  /** t22's per-(doc, bucket) bigram counts — row-local hashing then
    * ONE doc-keyed hash agg. */
  private[graft] def dsirDocBuckets(docs: DataFrame, buckets: Int): DataFrame =
    docs
      .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), (w, i) -> concat(w, ' ', t[i + 1]))"))
        .as("bg"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("k"))

  /** t22's hashed bigram model: target/raw counts per bucket —
    * CAPACITY-BOUNDED at `buckets` rows regardless of corpus size
    * (the hashed-features contract; ScaleSpec measures it), which is
    * what makes broadcasting it safe at any scale.
    */
  private[graft] def dsirModel(db: DataFrame): DataFrame =
    db.groupBy(col("b"))
      .agg(sum(when(col("source") === "src0", col("k")).otherwise(lit(0L)))
        .cast("long").as("ct"),
        sum(when(col("source") =!= "src0", col("k")).otherwise(lit(0L)))
          .cast("long").as("cr"))

  /** t28 — per-SOURCE distribution drift (the ingest-drift monitor a
    * corpus build runs per source per ingest: a source whose token
    * distribution drifts from the corpus — scraper broke, content
    * farm took over a domain, encoding went bad — fires here before
    * it poisons the mix). KL-divergence shape in t21/t22's integer
    * floor-log2 units: hashed-unigram model per source vs the whole
    * corpus, u(b) = (⌊log2(k+1)⌋ − ⌊log2(ts+1)⌋) − (⌊log2(kall+1)⌋
    * − ⌊log2(ta+1)⌋), drift_units = Σ k·u, mean_centibits =
    * 100·drift DIV ts — exact cross-engine, no float log.
    *
    * Scale shape: ONE corpus token scan + one (source, bucket)
    * map-combinable agg; everything downstream operates on frames
    * CAPACITY-BOUNDED at |sources|·10k rows (the hashed-features
    * contract, t22's documented broadcast-safety argument): the
    * corpus model re-aggregates that frame by bucket (reusing its
    * exchange), totals are |sources|-row / 1-row broadcasts, the
    * drift join is key-equality on bucket.
    */
  def sourceDrift(s: SparkSession, dir: String, buckets: Int = 10000): DataFrame = {
    val sc = driftCounts(Tables.documents(s, dir), buckets)
      .cache() // capacity-bounded; feeds corpus model, totals, drift
    val all = sc.groupBy(col("b")).agg(sum(col("k")).cast("long").as("kall"))
    val ta = sc.agg(sum(col("k")).cast("long").as("ta"))
    driftScore(sc, all, ta).orderBy(col("source"))
  }

  /** t28's per-(source, bucket) hashed-unigram counts — row-local
    * hashing then ONE map-combinable agg; capacity-bounded at
    * |sources|·buckets rows. Shared with streaming.DriftStream, which
    * counts each arriving micro-batch through this exact path.
    */
  private[graft] def driftCounts(docs: DataFrame, buckets: Int): DataFrame =
    docs
      .select(col("source"), explode(Text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("source"),
        (Text.tokenHash(col("w")) % buckets).as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).cast("long").as("k"))

  /** t28's scoring stage against an explicit corpus model (per-bucket
    * `kall` + 1-row total `ta`) — shared with the streaming twin,
    * which freezes the model from the lake. The model probe is a LEFT
    * join: in the batch operator every counted bucket exists in the
    * model by construction (left ≡ inner); at ingest an arriving
    * batch can hash into buckets the lake never saw — those score
    * with kall = 0, i.e. maximal per-token divergence, which is
    * exactly the alarm behavior an off-distribution delivery should
    * trigger (the dsirScore OOV seam, drift-flavored).
    */
  private[graft] def driftScore(sc: DataFrame, all: DataFrame,
      ta: DataFrame): DataFrame = {
    def flog2(c: Column) = length(bin(c)) - 1
    val ts = sc.groupBy(col("source")).agg(sum(col("k")).cast("long").as("ts"))
    sc.join(all, Seq("b"), "left")
      .join(ts, Seq("source"))
      .crossJoin(broadcast(ta))
      .select(col("source"), col("k"), col("ts"),
        ((flog2(col("k") + 1) - flog2(col("ts") + 1))
          - (flog2(coalesce(col("kall"), lit(0L)) + 1) - flog2(col("ta") + 1)))
          .as("u"))
      .groupBy(col("source"))
      .agg(max(col("ts")).as("n_tokens"),
        sum(col("k") * col("u")).cast("long").as("drift_units"))
      .withColumn("mean_centibits", expr(
        "CAST(drift_units * 100 DIV greatest(n_tokens, 1) AS BIGINT)"))
  }

  /** t23 — hashed linear quality classifier (the fastText-style
    * filter shape of CCNet/GPT-3-era pipelines): score = Σ over
    * tokens of a fixed integer weight keyed by the token's hash
    * bucket, label = score > 0. The weights here are a deterministic
    * stand-in (bucket % 17 − 8) for trained ones — the Spark shape is
    * the real artifact: per-doc scoring with NO shuffle at all, a
    * pure projection over the scan (aggregate-HOF over the token
    * array), embarrassingly parallel at 100 TB. The md5 per token
    * dominates per-row cost exactly as the hash does in fastText.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    qualityFrame(s, dir).orderBy(col("doc_id"))

  /** t23's unsorted scores — the pure projection c06/c07 join on
    * without inheriting the contract sort.
    */
  private[graft] def qualityFrame(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        expr("aggregate(t, 0L, (acc, w) -> acc" +
          " + CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)" +
          " % 10000 % 17 - 8)").as("score"))
      .withColumn("label", col("score") > 0L)

  /** t08 — PII redaction: scrub emails and phone-like numbers from
    * text (constructed deterministically here since the corpus is
    * synthetic) — the redaction pass every training pipeline runs
    * before the tokenizer. Codegen'd regexp_replace chain.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val email = concat(lit("user"), col("c_custkey"), lit("@example.com"))
    val phone = concat(lit("+1-555-"), lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    val text = concat(col("c_name"), lit(" can be reached at "), email,
      lit(" or "), phone, lit(" for account matters"))
    val redacted = regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "\\+?\\d[\\d-]{7,}\\d", "[PHONE]")
    Tables.customer(s, dir)
      .select(col("c_custkey"), redacted.as("redacted_text"))
      .orderBy(col("c_custkey"))
  }

  /** t06 — validation/quarantine gate: rows flagged with parse
    * failures and a reason string instead of being dropped — the
    * side-output pattern every production ETL needs (the reference
    * silently nulls bad fields; at 100 TB you quarantine and audit).
    * Corrupt inputs are synthesized deterministically by key.
    */
  def validationGate(s: SparkSession, dir: String): DataFrame = {
    val moneyStr = when(col("o_orderkey") % 7 === 0, lit("N/A"))
      .otherwise(concat(lit("$"), col("o_totalprice").cast("string")))
    val dateStr = when(col("o_orderkey") % 5 === 0, lit("??"))
      .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
    val money = graft.functions.Parse.parseFloat(moneyStr)
    val date = graft.functions.Parse.parseDateMulti(dateStr)
    val reasons = concat_ws(";",
      when(money.isNull, lit("bad_amount")),
      when(date.isNull, lit("bad_date")))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), money.as("amount"), date.as("order_date"),
        (money.isNotNull && date.isNotNull).as("is_valid"),
        when(reasons =!= "", reasons).as("reasons"))
      .orderBy(col("o_orderkey"))
  }

  /** t35 — feature-HASHING document embedder (the hashing trick,
    * Weinberger et al. 2009; the fastText-style bag-of-words
    * baseline): every token hashes to one of `dims` signed
    * coordinates (dim = h mod dims, sign = the next hash bit), and a
    * doc's embedding is the signed occurrence sum per coordinate —
    * the deterministic, model-free projection that closes the
    * documents→embeddings seam: this is the "embed" step whose output
    * shape the whole similarity ladder (s01–s19) consumes, computable
    * on any engine with nothing but a hash function. Output is the
    * SPARSE long form (doc_id, dim, weight) — only touched
    * coordinates emit a row (canceled-to-zero sums stay: the
    * coordinate was touched, and both engines agree row-for-row).
    *
    * Scale shape: ONE token scan → a row-local md5 projection → ONE
    * map-combinable (doc_id, dim) aggregate — no join at all, output
    * ≤ min(tokens, 64·docs) rows; at 100 TB this runs at parquet-scan
    * speed exactly like t01, and the aggregate's partial combine
    * collapses each doc's tokens executor-locally (doc_id is the
    * natural partition key, so most docs never cross the shuffle at
    * full width). All-integer arithmetic — md5-derived hash and
    * signed counts, nothing to diverge cross-engine.
    */
  def hashedEmbedding(s: SparkSession, dir: String, dims: Int = 64): DataFrame =
    hashedEmbeddingOf(Tables.documents(s, dir), dims)
      .orderBy(col("doc_id"), col("dim"))

  /** t35's unsorted body over an EXPLICIT docs frame (the
    * factored-body rule) — streaming.EmbedStream embeds arriving
    * micro-batches through the identical projection.
    */
  private[graft] def hashedEmbeddingOf(docs: DataFrame,
      dims: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .withColumn("h",
        conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long"))
      .select(col("doc_id"),
        (col("h") % dims).cast("int").as("dim"),
        when(expr(s"(h DIV $dims) % 2") === 0, lit(1L)).otherwise(lit(-1L))
          .as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).cast("long").as("weight"))

  /** t36 — READABILITY profile per (lang, source): integer-milli
    * Flesch reading-ease over whitespace words, sentence runs
    * ([.!?]+ matches, floored at 1) and a vowel-group syllable proxy
    * ([aeiouy]+ runs — the standard dictionary-free estimator; vowel
    * runs never span whitespace, so counting them over the whole doc
    * equals the per-word sum). Education-level/readability bands are
    * a first-class pretraining curation signal (quality-classifier
    * features and kids/textbook-style subset mining both key off
    * them); this is the per-slice report a mix plan reads next to
    * t02/t14. Per doc:
    *   fre_milli = clamp(206835 − ⌊1015·w/s⌋ − ⌊84600·syll/w⌋,
    *               0, 206835)
    * (the classic 206.835 − 1.015·(w/s) − 84.6·(syll/w) in exact
    * milli units; the clamp is the conventional 0–100 range AND keeps
    * every aggregate operand nonnegative so trunc-vs-floor division
    * can never diverge cross-engine). Slice rows: doc count, mean
    * fre (integer DIV), share of docs in the classic "easy" band
    * (fre ≥ 60) in bp.
    *
    * Scale: row-local projection → ONE map-combinable (lang, source)
    * aggregate — parquet-scan speed, |langs|·|sources| output rows at
    * any corpus size; integer DIV only on aggregate operands (a
    * float mean would diverge in addition order).
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    readabilityFrame(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("fre_milli")).as("sf"),
        sum(when(col("fre_milli") >= 60000L, 1L).otherwise(0L)).as("ne"))
      .select(col("lang"), col("source"), col("n_docs"),
        expr("sf DIV n_docs").as("mean_fre_milli"),
        expr("(ne * 10000) DIV n_docs").as("easy_share_bp"))
      .orderBy(col("lang"), col("source"))

  /** t38 — VOCABULARY GROWTH curve (Heaps' law monitor): distinct
    * 3-token shingles discovered per nested random 10%-prefix of the
    * corpus — the data-diversity saturation signal corpus builds
    * track (Heaps: V(n) ≈ K·n^β; when the marginal new-vocabulary
    * column flattens, more of the SAME source stops adding diversity
    * and the mix plan should reweight — the c06/c09 upstream signal).
    * Prefixes are nested by a salted-hash decile (the t11/t16 bucket
    * rule — a random nested sample is the statistically right way to
    * draw a growth curve; ingest order would confound it with source
    * ordering): bucket k's row reports docs and FIRST-SEEN shingles
    * in bucket k, cumulative docs/vocabulary through k, and the
    * vocabulary-per-doc density in milli.
    *
    * Scale shape: one shingle scan (d04's codegen'd slice explode) →
    * ONE (shingle) min-aggregate — the t19/d04 shuffle class, ~linear
    * in corpus tokens — then everything else happens on 10-row
    * frames (the running sums are windows over 10 rows, never a
    * corpus-sized range exchange).
    */
  def vocabGrowth(s: SparkSession, dir: String): DataFrame = {
    def bucketOf(id: Column): Column =
      pmod(conv(substring(md5(concat(lit("t38"), id.cast("string"))),
        1, 8), 16, 10).cast("long"), lit(10L))
    val nb = Dedup.shinglesOf(Tables.documents(s, dir))
      .select(bucketOf(col("doc_id")).as("bucket"), col("shingle"))
      .groupBy(col("shingle"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("new_shingles"))
    val db = Tables.documents(s, dir)
      .select(bucketOf(col("doc_id")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val w = Window.orderBy(col("bucket"))
    db.join(nb, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("new_shingles"), lit(0L)).as("new_shingles"))
      .withColumn("cum_docs", sum(col("n_docs")).over(w).cast("long"))
      .withColumn("cum_vocab", sum(col("new_shingles")).over(w).cast("long"))
      .withColumn("vocab_per_doc_milli",
        expr("(cum_vocab * 1000) DIV cum_docs"))
      .orderBy(col("bucket"))
  }

  /** t37 — LANGUAGE-LABEL CONFUSION matrix: the stored `lang` label
    * audited against t03's marker-word language-ID, one row per
    * (labeled, predicted) cell with the row-share of the label in bp
    * — the label-quality monitor every multilingual corpus runs
    * before TRUSTING its lang column for mix planning (t14) or
    * per-lang sampling (t11): a mislabeled slice shows up as
    * off-diagonal mass concentrated in one cell, a weak heuristic as
    * mass in the 'und' column. Complements s22's `agrees` (vector-
    * space mislabel audit) on the text side.
    *
    * Scale: predicted lang is the row-local t03 projection (fixed
    * regex set, scan speed) → ONE map-combinable (labeled, predicted)
    * aggregate; the row-share window runs on the AGGREGATED matrix
    * (≤ |langs|·(|langs|+1) rows) — never a corpus-sized window.
    */
  def langConfusion(s: SparkSession, dir: String): DataFrame =
    langConfusionOf(langGateFrame(s, dir))

  /** t37 over an explicit (lang, text) frame — the hand-walkable
    * body; the gated query runs it on [[langGateFrame]] (base ∪
    * plants — see [[langPlantRows]] for why the audit's signal is
    * planted).
    */
  private[graft] def langConfusionOf(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("lang").as("labeled_lang"),
        Text.langId(col("text")).as("predicted_lang"))
      .groupBy(col("labeled_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
    cells
      .withColumn("lang_total", sum(col("n_docs"))
        .over(Window.partitionBy(col("labeled_lang"))))
      .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
        expr("(n_docs * 10000) DIV lang_total").as("row_share_bp"))
      .orderBy(col("labeled_lang"), col("predicted_lang"))
  }

  /** t36's per-doc frame (spec surface): doc_id, lang, source, word/
    * sentence/syllable counts and the clamped integer-milli FRE.
    */
  private[graft] def readabilityFrame(s: SparkSession,
      dir: String): DataFrame = {
    val w = size(Text.tokens(col("text"))).cast("long")
    val sents = greatest(
      regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
    val syll = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        w.as("n_words"), sents.as("n_sents"), syll.as("n_syll"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_words"), col("n_sents"), col("n_syll"),
        greatest(lit(0L), least(lit(206835L),
          lit(206835L) - expr("(1015 * n_words) DIV n_sents")
            - expr("(84600 * n_syll) DIV n_words"))).as("fre_milli"))
  }
}
