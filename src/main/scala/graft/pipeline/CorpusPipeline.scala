package graft.pipeline

import graft.Tables
import graft.functions.Text
import graft.operators.{Curation, Dedup, TextOps}
import graft.sources.TableSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The MATERIALIZED corpus build: composes the engine's gated curation
  * operators into one crash-safe corpus RELEASE — the LLM-side twin of
  * [[InvoicePipeline]] (which materializes the reference's ETL,
  * pipeline_runner.py:45-179; this materializes the training-data
  * surface the reference never had).
  *
  * A release at `outDir` is itself a LAKE: `documents.parquet` holds
  * the curated corpus, so every `(SparkSession, dir)` operator in the
  * engine runs directly ON the release — the card and the packing
  * below are literally `Curation.corpusCard(s, release)` and
  * `TextOps.sequencePack(s, release)`, and a consumer can re-audit a
  * shipped release with t18/c03/t13 unchanged. Tables:
  *
  *   - `decisions.parquet`  — per-doc audit: why each source doc was
  *     kept or dropped (c06's governance table + the semantic-decontam
  *     and benchmark stages) and its leakage-safe split (c08)
  *   - `documents.parquet`  — kept docs, t17-excised text (token-
  *     rejoined — the release is whitespace-normalized BY CONSTRUCTION,
  *     the form every tokenizer-bound corpus ships in), with `split`
  *   - `packed.parquet`     — t10 context-window packing of the release
  *   - `manifest.parquet`   — per (split, shard) doc/token/bin
  *     accounting (the WebDataset-style shard manifest)
  *   - `card.parquet`       — c03's dataset card computed ON the release
  *   - `report.parquet`     — the build's stage-yield funnel (c07's
  *     shape over THIS build's decisions)
  *
  * Stage precedence (each doc gets ONE reason, the audit requirement):
  * benchmark exclusion (doc_id % 50 == 0, t12's split convention —
  * benchmark items never enter a training mix) → c06's quality gate /
  * tail cull / mix sampling → semantic decontamination (t33: a
  * paraphrased benchmark twin kills an otherwise-kept doc). Split
  * assignment is c08's cluster-hash rule, so no near-dup family ever
  * straddles train/val/test inside the release — a theorem the spec
  * replays with t18's audit.
  *
  * Crash safety: the WHOLE release materializes into a sibling temp
  * dir (the release-derived tables are computed by reading the staged
  * lake) and publishes with one [[TableSink.replaceDir]]-style swap —
  * a crash leaves either the previous intact release or the new one,
  * never a half-written mix of stages. Re-runs are deterministic and
  * idempotent (every stage is hash-ruled, no RNG).
  *
  * Scale shape: every stage rides its operator's documented plan
  * (c06: two doc-keyed joins; t33: cross-split band join; c08: d07's
  * checkpointed CC; t17: doc_id-keyed span machinery; t10: per-shard
  * windows). The pipeline adds only doc_id-keyed key-equality joins
  * and the final writes — nothing corpus-quadratic, no driver-side
  * data movement.
  */
object CorpusPipeline {

  /** Per-doc decision + split table from the SOURCE lake at `dir`. */
  def decisions(s: SparkSession, dir: String): DataFrame = {
    // the contract queries' factored UNSORTED bodies — joining under
    // their ORDER BYs would buy corpus-sized range exchanges
    val plan = Curation.mixPlanFrame(s, dir)
    // real corpus flags only — the gate plants exist for the driver
    // compare, not for the build
    val sem = Dedup.semanticDecontamFrame(s, dir)
      .filter(col("vec_id") < Dedup.GatePlantOffset)
      .select(col("vec_id").as("doc_id"), lit(true).as("sem_flag"))
    val splits = Curation.safeSplitFrame(s, dir)
      .select(col("doc_id"), col("cluster_id"), col("split"))
    plan
      .join(sem, Seq("doc_id"), "left")
      .join(splits, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("tercile"), col("quality_ok"),
        when(col("doc_id") % 50 === 0, lit("exclude_benchmark"))
          .when(col("decision") =!= "keep", col("decision"))
          .when(coalesce(col("sem_flag"), lit(false)), lit("drop_semantic"))
          .otherwise(lit("keep")).as("decision"),
        col("cluster_id"), col("split"))
      .withColumn("kept", col("decision") === "keep")
  }

  /** Build the release at `outDir` from the lake at `dir`; returns the
    * published stage-yield report (read back from the release — the
    * read IS the publish check).
    */
  def build(s: SparkSession, dir: String, outDir: String): DataFrame = {
    val dec = decisions(s, dir)
    // t17's unsorted body (the factored-body rule: consuming the
    // contract query's ORDER BY under these joins would buy a
    // corpus-sized range exchange for nothing)
    val tk = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .cache()
    val bench = tk.filter(col("doc_id") % 50 === 0)
      .filter(size(col("t")) >= 4)
      .select(explode(sequence(lit(1), size(col("t")) - 3)).as("i"), col("t"))
      .select(array_join(slice(col("t"), col("i"), lit(4)), " ").as("shingle"))
      .distinct()
    val excised = TextOps.exciseAgainst(
      tk.filter(col("doc_id") % 50 =!= 0), bench, 4)
    try {
      publishDir(s, outDir) { tmp =>
        write(dec.orderBy(col("doc_id")), s"$tmp/decisions.parquet")
        // materialized stages are READ BACK, not re-planned — the
        // decision plan (CC + t33 + terciles) runs exactly once
        val decR = s.read.parquet(s"$tmp/decisions.parquet")
        val curated = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"))
          .join(decR.filter(col("kept")).select(col("doc_id"), col("split")),
            Seq("doc_id"))
          .join(excised.select(col("doc_id"), col("clean_text")), Seq("doc_id"))
          .select(col("doc_id"), col("clean_text").as("text"), col("lang"),
            col("source"), length(col("clean_text")).cast("long").as("n_chars"),
            col("split"))
        write(curated.orderBy(col("doc_id")), s"$tmp/documents.parquet")
        // release-derived tables run ON the staged release lake
        write(TextOps.sequencePack(s, tmp), s"$tmp/packed.parquet")
        val manifest = s.read.parquet(s"$tmp/packed.parquet")
          .join(Tables.documents(s, tmp).select(col("doc_id"), col("split")),
            Seq("doc_id"))
          .groupBy(col("split"), col("shard_id"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tokens")).cast("long").as("n_tokens"),
            countDistinct(struct(col("lang"), col("bin_id"))).cast("long")
              .as("n_bins"))
          .orderBy(col("split"), col("shard_id"))
        write(manifest, s"$tmp/manifest.parquet")
        write(Curation.corpusCard(s, tmp), s"$tmp/card.parquet")
        // the report writes LAST — inside the staged dir it is the
        // completion marker for the swap's write phase
        write(report(decR), s"$tmp/report.parquet")
      }
    } finally tk.unpersist()
    s.read.parquet(s"$outDir/report.parquet").orderBy(col("ord"))
  }

  /** c07's funnel shape over THIS build's decision table: one row per
    * stage in precedence order, chain identity n_in(k+1) = n_kept(k).
    */
  private def report(dec: DataFrame): DataFrame =
    dec.agg(count(lit(1)).cast("long").as("n0"),
        sum(when(col("decision") === "exclude_benchmark", 1L).otherwise(0L))
          .as("nb"),
        sum(when(col("decision") === "drop_quality", 1L).otherwise(0L))
          .as("nq"),
        sum(when(col("decision") === "drop_tail", 1L).otherwise(0L)).as("nt"),
        sum(when(col("decision") === "drop_sampled", 1L).otherwise(0L))
          .as("ns"),
        sum(when(col("decision") === "drop_semantic", 1L).otherwise(0L))
          .as("nm"))
      .select(expr("""stack(6,
          0, 'ingest',            n0,                n0,
          1, 'benchmark_split',   n0,                n0 - nb,
          2, 'quality_gate',      n0 - nb,           n0 - nb - nq,
          3, 'tail_cull',         n0 - nb - nq,      n0 - nb - nq - nt,
          4, 'mix_sample',        n0 - nb - nq - nt, n0 - nb - nq - nt - ns,
          5, 'semantic_decontam', n0 - nb - nq - nt - ns,
                                  n0 - nb - nq - nt - ns - nm)
        AS (ord, stage, n_in, n_kept)"""))
      .select(col("ord").cast("int").as("ord"), col("stage"),
        col("n_in").cast("long").as("n_in"),
        col("n_kept").cast("long").as("n_kept"))
      .withColumn("n_dropped", expr("n_in - n_kept"))
      .withColumn("drop_bp",
        expr("CAST((n_in - n_kept) * 10000 DIV greatest(n_in, 1) AS BIGINT)"))
      .orderBy(col("ord"))

  /** Release-over-release CHANGELOG, per doc: the governance diff a
    * corpus team publishes next to release N+1's card (what entered,
    * what left, what moved and WHY — the release-notes table of
    * versioned corpus releases, and the between-builds regression
    * alarm at doc granularity where c07's funnel is the stage-level
    * one). Reads only the two releases' `decisions.parquet` /
    * `documents.parquet` — it diffs PUBLISHED artifacts, so it runs
    * without the source lakes that built them.
    *
    * Classes (one per doc, precedence top-down): `added_source` /
    * `removed_source` (the doc exists in only one release's source
    * audit), `now_kept` / `now_dropped` (the keep verdict flipped —
    * `reasons` carries old→new), `reason_changed` (dropped in both,
    * different stage), `unchanged_dropped`, `split_moved` (kept in
    * both, c08 split changed — the leakage-relevant event),
    * `text_changed` (kept in both, release text differs — an
    * excision change), `unchanged`.
    *
    * Scale shape: one doc_id-keyed full-outer join of the two
    * decision tables + two doc_id-keyed left joins for the release
    * text hashes — all key-equality, no corpus-sized broadcast; the
    * summary is one map-combinable aggregate.
    */
  def releaseDiffDocs(s: SparkSession, oldDir: String,
      newDir: String): DataFrame = {
    def dec(d: String, suf: String) = s.read.parquet(s"$d/decisions.parquet")
      .select(col("doc_id"), col("decision").as(s"decision_$suf"),
        col("split").as(s"split_$suf"), col("kept").as(s"kept_$suf"))
    def txt(d: String, suf: String) = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as(s"h_$suf"))
    dec(oldDir, "old").join(dec(newDir, "new"), Seq("doc_id"), "full_outer")
      .join(txt(oldDir, "old"), Seq("doc_id"), "left")
      .join(txt(newDir, "new"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("kept_old").isNull, lit("added_source"))
          .when(col("kept_new").isNull, lit("removed_source"))
          .when(col("kept_new") && !col("kept_old"), lit("now_kept"))
          .when(col("kept_old") && !col("kept_new"), lit("now_dropped"))
          .when(!col("kept_old") && !col("kept_new") &&
            col("decision_old") =!= col("decision_new"),
            lit("reason_changed"))
          .when(!col("kept_old") && !col("kept_new"),
            lit("unchanged_dropped"))
          .when(col("split_old") =!= col("split_new"), lit("split_moved"))
          .when(col("h_old") =!= col("h_new"), lit("text_changed"))
          .otherwise(lit("unchanged")).as("change"),
        concat_ws("->", coalesce(col("decision_old"), lit("absent")),
          coalesce(col("decision_new"), lit("absent"))).as("reasons"),
        concat_ws("->", coalesce(col("split_old"), lit("-")),
          coalesce(col("split_new"), lit("-"))).as("splits"))
  }

  /** [[releaseDiffDocs]] rolled up to the per-class summary (with
    * integer-bp share of all diffed docs — the headline table).
    */
  def releaseDiff(s: SparkSession, oldDir: String,
      newDir: String): DataFrame = {
    val d = releaseDiffDocs(s, oldDir, newDir)
      .groupBy(col("change")).agg(count(lit(1)).cast("long").as("n_docs"))
    val tot = d.agg(sum(col("n_docs")).cast("long").as("n_total"))
    d.join(broadcast(tot), lit(true))
      .select(col("change"), col("n_docs"),
        expr("CAST(n_docs * 10000 DIV greatest(n_total, 1) AS BIGINT)")
          .as("share_bp"))
      .orderBy(col("change"))
  }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Whole-release atomic publish: [[TableSink.replaceDir]] when a
    * previous release exists (two-rename swap + listing-cache refresh),
    * a single rename for a fresh target — either way the visible
    * `path` is never a partially-built release.
    */
  private def publishDir(s: SparkSession, path: String)
      (writeAll: String => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) TableSink.replaceDir(s, path)(writeAll)
    else {
      val tmp = new org.apache.hadoop.fs.Path(path + "__build_tmp")
      fs.delete(tmp, true)
      writeAll(tmp.toString)
      Option(p.getParent).foreach(fs.mkdirs)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"CorpusPipeline: could not publish $p")
      s.catalog.refreshByPath(path)
    }
  }
}
