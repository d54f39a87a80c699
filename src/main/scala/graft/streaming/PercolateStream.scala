package graft.streaming

import graft.Tables
import graft.functions.Text
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming PERCOLATOR (twin #19 — s13's ingest shape, the
  * Elasticsearch-percolate/alerting pattern): STANDING keyword
  * queries are matched against ARRIVING documents — the inversion of
  * search, where the query set is the stored artifact and every new
  * doc is probed against it ("alert me when a doc about X lands").
  *
  *  - the lexical stats (per-term df over the fixed standing vocab +
  *    the 1-row (N, T) totals) are computed ONCE from the lake and
  *    cached — the FROZEN model, exactly DsirStream's contract: a
  *    frozen model makes the score a pure per-doc function, so there
  *    is no cross-batch state at all;
  *  - scoring runs through the EXACT batch code path
  *    (Similarity.bm25ScoredPairs) — stream/batch parity by
  *    construction, spec-asserted;
  *  - match semantics are percolation's: only (standing query, doc)
  *    pairs sharing ≥ 1 term emerge (the tf probe is an inner join) —
  *    a doc matching nothing produces no alert rows;
  *  - the seam (documented, the DsirStream precedent): batch s13
  *    trains df/totals on the corpus it scores; the stream scores
  *    against lake-only stats — parity is "stream == batch scorer
  *    under the same frozen stats", not "== s13 on lake ∪ delta";
  *    re-deriving stats per batch would re-scan the lake per trigger;
  *  - the sink OVERWRITES its own batch_id=<id> partition per
  *    delivery (the IncrementalLshStream idempotency contract).
  */
object PercolateStream {

  /** Incoming documents (the testdata documents schema). */
  val schema = IncrementalLshStream.schema

  /** Frozen lexical stats from the lake: (dft ≤ |vocab| rows, tot
    * 1 row), both cached — every micro-batch probes them.
    */
  def lakeStats(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val dl = docs.select(col("doc_id"), size(col("t")).cast("long").as("len"))
      .cache() // feeds the totals AND the df path's doc set
    val tot = dl.agg(count(lit(1)).cast("long").as("nn"),
      sum(col("len")).cast("long").as("tt")).cache()
    val dft = Similarity.bm25Tf(docs)
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
      .cache()
    (dft, tot)
  }

  /** One micro-batch through the shared scoring path: every arriving
    * doc × every standing query it shares a term with, scored under
    * the frozen stats.
    */
  def scoreBatch(batch: DataFrame, dft: DataFrame, tot: DataFrame): DataFrame = {
    val tk = batch.select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val dl = tk.select(col("doc_id"), size(col("t")).cast("long").as("len"))
    Similarity.bm25ScoredPairs(batch.sparkSession,
        Similarity.bm25Tf(tk), dl, dft, tot)
      .orderBy(col("doc_id"), col("qid"))
  }

  /** One micro-batch, written idempotently into its own batch_id
    * partition (overwrite, never append — at-least-once re-delivery).
    */
  def writeBatch(batch: DataFrame, dft: DataFrame, tot: DataFrame,
      outPath: String, batchId: Long): Unit = {
    val b = batch.cache() // referenced twice: tf side + length side
    try scoreBatch(b, dft, tot)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving docs) against the standing queries with
    * stats frozen from `dir`, landing alert rows under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val (dft, tot) = lakeStats(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, dft, tot, outPath, id)
      }
      .start()
  }
}
