package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming twin of d11 (operators.Dedup.incrementalLsh): ARRIVING
  * documents are near-dup-checked against the static lake index —
  * the production shape of incremental ingest, where the lake is
  * minhashed once and every new batch only hashes itself.
  *
  *  - signatures are computed with `Dedup.rowMinhashCols`, the
  *    row-local STATELESS minhash formulation (no explode/groupBy —
  *    a per-doc aggregation would be unbounded streaming state;
  *    bit-parity with the batch signatures is spec-asserted);
  *  - the band-key probe into the lake index is a stream-static
  *    equi-join (stateless);
  *  - the per-doc best-match argmax runs inside `foreachBatch` —
  *    a delta doc arrives in exactly one micro-batch, so per-batch
  *    batch semantics give the exact d11 answer without any
  *    cross-batch state;
  *  - the sink is IDEMPOTENT under foreachBatch's at-least-once
  *    contract: each delivery OVERWRITES its own batch_id=<id>
  *    partition directory, so a crash between the sink write and
  *    the checkpoint commit re-delivers into the same path instead
  *    of appending duplicates (spec-asserted by double delivery).
  */
object IncrementalLshStream {

  /** Incoming documents (the testdata documents schema). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Static lake signature index from the lake's documents (the
    * d10/d11 convention: doc_id % 10 != 0). Cache it — every
    * micro-batch probes it.
    */
  def lakeSignatures(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(s, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .cache()

  /** One micro-batch: stateless row-local signatures, probe the lake,
    * classify. Docs with <3 tokens have no shingles (null signature)
    * and are `kept` — the batch operator reports them identically.
    */
  def classifyBatch(batch: DataFrame, lakeSig: DataFrame): DataFrame = {
    val sig = batch.select(col("doc_id") +:
      Dedup.rowMinhashCols(col("text")): _*)
    val best = Dedup.bestLakeMatch(sig.filter(col("m0").isNotNull), lakeSig)
    batch.select(col("doc_id"))
      .join(best, col("doc_id") === col("delta_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "near_dup_of_index")
          .otherwise("kept").as("status"),
        col("dup_of"), col("est_sim_bp"))
  }

  /** One micro-batch, written idempotently: the arriving batch is
    * cached (classifyBatch references it twice — signature side and
    * doc-list side), classified, and OVERWRITTEN into the batch's
    * own batch_id partition so re-delivery of the same id cannot
    * duplicate rows.
    */
  def writeBatch(batch: DataFrame, lakeSig: DataFrame, outPath: String,
      batchId: Long): Unit = {
    val b = batch.cache()
    try classifyBatch(b, lakeSig)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving delta docs) against the lake in `dir`,
    * landing classifications under `outPath` (one batch_id partition
    * per micro-batch — see [[writeBatch]]).
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val lakeSig = lakeSignatures(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, lakeSig, outPath, id)
      }
      .start()
  }
}
