package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c01 — the end-to-end corpus-curation DAG as ONE declarative query:
  *
  *   quality gate (t02) → keep-best exact dedup (d08) →
  *   deterministic stratified sample (t11) → context-window pack (t10)
  *
  * This is the composition a training-data pipeline actually runs,
  * and the point of building every stage as DataFrame algebra: the
  * stages fuse into a single Catalyst plan (one scan, one dedup
  * shuffle, one pack window — the sample is a scan-level filter), so
  * "pipeline" is just a bigger query, not an orchestration layer.
  */
object Curation {

  def curate(s: SparkSession, dir: String, minQualityBp: Int = 4000,
      capacity: Int = 512, nShards: Int = 8): DataFrame = {
    val qualityBp = round(Text.qualityScore(col("text")) * 10000).cast("long")
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        qualityBp.as("quality_bp"),
        md5(Text.normalize(col("text"))).as("content_hash"),
        Text.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .filter(col("quality_bp") >= minQualityBp)
    // keep-best per content group (argmax quality, min doc_id on ties)
    val keeper = base.groupBy(col("content_hash"))
      .agg(max(struct(col("quality_bp").as("q"), (-col("doc_id")).as("nid")))
        .as("m"))
      .select(col("content_hash"), (-col("m.nid")).as("doc_id"))
    val deduped = base.join(keeper, Seq("content_hash", "doc_id"))
    // deterministic hash-bucket sample with per-language rates — the
    // SAME transform t11 and the streaming twin use (one definition)
    val sampled = TextOps.sampleTransform(deduped).drop("keep_pct")
    // context-window packing over (lang, sub-shard)
    val w = Window.partitionBy(col("lang"), col("shard_id"))
      .orderBy(col("doc_id"))
    sampled
      .withColumn("shard_id", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("prev_cum",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard_id"), col("quality_bp"),
        col("n_tokens"),
        floor(col("prev_cum") / capacity).cast("long").as("bin_id"),
        (col("prev_cum") % capacity).as("bin_offset"))
      .orderBy(col("lang"), col("shard_id"), col("doc_id"))
  }
}
