package graft.streaming

import graft.functions.Text
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** t19's incremental-ingest twin: arriving docs are span-self-deduped
  * against the LAKE's window-fingerprint index plus their own batch —
  * the d10/d11 daily-ingest shape lifted to span level. The lake side
  * is a static (sh, lake_canon) index (one (doc_id, i) struct per
  * distinct window fingerprint — in production precomputed and stored
  * bucketed by sh via TableSink, never re-tokenized per batch; struct
  * least/min order lexicographically, so arbitrarily long docs rank
  * correctly, see [[TextOps.posKey]]); each micro-batch
  * tokenizes only its own docs, takes the window-wise min of
  * (lake canon, batch canon) as the global first occurrence, and
  * excises every later occurrence with the shared
  * [[TextOps.exciseHits]] core.
  *
  * Parity contract (spec-asserted): within one batch, output rows
  * equal batch [[TextOps.selfDedup]] over (lake ∪ batch) restricted
  * to the batch's doc_ids — `least(lake_canon, batch_canon)` IS the
  * global min since every occurrence lives on one side or the other.
  * Both sides assume ingested doc_ids are DISJOINT from lake doc_ids
  * (the d10/d11 ingest contract): a re-delivered doc_id that already
  * exists in the lake makes its batch posKey EQUAL the lake canon, so
  * the batch copy survives as "canonical" instead of being excised —
  * dedupe-by-doc_id upstream (TableSink.appendIfAbsent) before span
  * self-dedup.
  *
  * Two index modes:
  *  - [[startToParquet]] probes a STATIC snapshot ([[lakeIndex]]) —
  *    cheapest, but a window duplicated across two DELTA batches yet
  *    absent from the lake is not deduped across the batch boundary;
  *  - [[startFolding]] closes that seam: each batch min-merges its
  *    own canon keys back into a parquet-backed index (one
  *    `delta_id=<batch>` partition per micro-batch, overwritten on
  *    re-delivery), and probes read min-per-sh over base+deltas.
  *    Min-merge is associative, commutative, and idempotent — the
  *    EventStream agg-merge law — so at-least-once re-delivery and
  *    any later compaction of deltas (TableSink.compact at 100 TB)
  *    leave the index identical.
  */
object SelfDedupStream {

  /** Static lake index: min position key per window fingerprint. */
  def lakeIndex(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val tk = graft.Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
    TextOps.windowFingerprints(tk, n)
      .groupBy(col("sh"))
      .agg(min(TextOps.posKey).as("lake_canon"))
      .cache()
  }

  /** One micro-batch, idempotent (per-batch-id overwrite partition —
    * at-least-once re-delivery replaces, never duplicates).
    */
  def writeBatch(batch: DataFrame, lakeIdx: DataFrame, outPath: String,
      batchId: Long, n: Int = 8): Unit = {
    val tk = batch.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .cache()
    try {
      val g = TextOps.windowFingerprints(tk, n)
      val batchCanon = g.groupBy(col("sh"))
        .agg(min(TextOps.posKey).as("batch_canon"))
      // least() skips nulls, so a lake-absent window falls back to the
      // batch canon; a batch position equal to the global min is the
      // canonical occurrence and survives
      val hit = g.join(batchCanon, "sh")
        .join(lakeIdx, Seq("sh"), "left")
        .filter(TextOps.posKey =!=
          least(col("lake_canon"), col("batch_canon")))
        .select(col("doc_id"), col("i"))
      TextOps.exciseHits(tk, hit, n)
        .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    } finally { tk.unpersist(); () }
  }

  /** Drain `inDir` (arriving docs, documents schema) against the lake
    * at `dir`, landing deduped docs under `outPath` (one batch_id
    * partition per micro-batch).
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val idx = lakeIndex(s, dir)
    s.readStream.schema(IncrementalLshStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, idx, outPath, id)
      }
      .start()
  }

  /** Current index state: min canon per window fingerprint over the
    * base snapshot and every folded delta. The aggregate is the probe
    * side of one batch's key-equality join — narrow (16-byte sh +
    * one struct) and map-side combinable.
    */
  def readIndex(s: SparkSession, idxDir: String): DataFrame =
    s.read.parquet(idxDir)
      .groupBy(col("sh")).agg(min(col("lake_canon")).as("lake_canon"))

  /** One micro-batch against the EVOLVING index: probe min(base ∪
    * deltas), excise, then fold this batch's canon keys in as the
    * `delta_id=b<id>` partition (overwrite — re-delivery replaces,
    * and min-merge idempotency makes the replay a no-op).
    */
  def writeBatchFold(batch: DataFrame, idxDir: String, outPath: String,
      batchId: Long, n: Int = 8): Unit = {
    val tk = batch.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .cache()
    try {
      val g = TextOps.windowFingerprints(tk, n)
      // feeds the probe join AND the index fold — two actions
      val batchCanon = g.groupBy(col("sh"))
        .agg(min(TextOps.posKey).as("batch_canon"))
        .cache()
      try {
        val hit = g.join(batchCanon, "sh")
          .join(readIndex(batch.sparkSession, idxDir), Seq("sh"), "left")
          .filter(TextOps.posKey =!=
            least(col("lake_canon"), col("batch_canon")))
          .select(col("doc_id"), col("i"))
        TextOps.exciseHits(tk, hit, n)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        batchCanon.select(col("sh"), col("batch_canon").as("lake_canon"))
          .write.mode("overwrite").parquet(s"$idxDir/delta_id=b$batchId")
      } finally { batchCanon.unpersist(); () }
    } finally { tk.unpersist(); () }
  }

  /** [[startToParquet]] with the cross-delta-batch seam closed: the
    * lake snapshot is materialized once as the index's base delta,
    * then every micro-batch probes base+deltas and folds its canon
    * keys back in.
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String, idxDir: String): StreamingQuery = {
    val base = new org.apache.hadoop.fs.Path(s"$idxDir/delta_id=base")
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base))
      lakeIndex(s, dir).write.mode("overwrite").parquet(base.toString)
    s.readStream.schema(IncrementalLshStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchFold(batch, idxDir, outPath, id)
      }
      .start()
  }
}
