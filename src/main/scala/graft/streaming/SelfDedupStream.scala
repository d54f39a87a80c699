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
  * Known seam (documented, same class as d10/d11's static index): a
  * window duplicated across TWO DELTA batches but absent from the
  * lake is not deduped across the batch boundary — production folds
  * each batch's new canon keys back into the index (an idempotent
  * min-merge, the EventStream agg-merge shape).
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
}
