package graft.streaming

import graft.operators.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of t25 (operators.Bpe.bpeApply): ARRIVING documents
  * are tokenized with a FROZEN BPE tokenizer trained once from the
  * lake — the production shape: the tokenizer is a versioned offline
  * artifact, ingest applies it and monitors fit.
  *
  *  - the frozen artifact is (a) the memoized word → symbol-count
  *    table (vocab-bounded, cached) and (b) the learned merge pairs
  *    (1-row frames, cached) — both computed once from the lake;
  *  - KNOWN words resolve through the memo's key-equality left join;
  *    OOV words — the seam batch t25 never hits, since its vocab IS
  *    the corpus — fall back to row-local application of the merge
  *    RULES (charSyms + one mergePass per round), so new content
  *    tokenizes instead of dropping; the memo is pure memoization
  *    (spec-asserted: an empty memo changes nothing but cost);
  *  - per-doc OOV token counts ride along — a rising OOV share is
  *    the tokenizer-drift/re-train signal a corpus build watches;
  *  - a doc arrives in exactly one micro-batch and scoring is a pure
  *    function of (doc, frozen artifact) ⇒ no cross-batch state;
  *  - the sink OVERWRITES its own batch_id=<id> partition per
  *    delivery (the IncrementalLshStream idempotency contract), so
  *    at-least-once re-delivery cannot duplicate rows.
  */
object BpeApplyStream {

  /** Incoming documents (the testdata documents schema). */
  val schema = IncrementalLshStream.schema

  /** Frozen tokenizer from the lake: the memoized word table and the
    * learned merge-pair rows, renamed (pa$i, pb$i) so rounds chain in
    * one projection. All cached — every micro-batch probes them.
    */
  def frozenTokenizer(s: SparkSession, dir: String,
      rounds: Int = 2): (DataFrame, Seq[DataFrame]) = {
    val (fin, merges) = Bpe.learn(s, dir, rounds)
    val memo = fin.select(col("word"),
      size(col("syms")).cast("long").as("memo_syms")).cache()
    val frozen = merges.zipWithIndex.map { case (m, i) =>
      m.select(col("pa").as(s"pa${i + 1}"), col("pb").as(s"pb${i + 1}"))
        .cache()
    }
    (memo, frozen)
  }

  /** One micro-batch through the shared frozen-apply path. */
  def scoreBatch(batch: DataFrame, memo: DataFrame,
      merges: Seq[DataFrame]): DataFrame =
    Bpe.applyFrozen(batch, memo, merges).orderBy(col("doc_id"))

  /** One micro-batch, written idempotently into its own batch_id
    * partition (overwrite, never append — at-least-once re-delivery).
    */
  def writeBatch(batch: DataFrame, memo: DataFrame, merges: Seq[DataFrame],
      outPath: String, batchId: Long): Unit = {
    val b = batch.cache() // referenced twice: word counts + doc list
    try scoreBatch(b, memo, merges)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving delta docs) through the frozen tokenizer
    * trained on `dir`, landing per-doc stats under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val (memo, merges) = frozenTokenizer(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, memo, merges, outPath, id)
      }
      .start()
  }
}
