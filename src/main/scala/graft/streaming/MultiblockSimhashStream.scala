package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming incremental twin of d13 (the Manku multi-block hamming
  * near-dup): ARRIVING documents are fingerprinted STATELESSLY and
  * probed against the static lake fingerprint index — the recall-
  * exact construction (any pair within hamming 3 shares ≥ 1 of the 4
  * blocks) at ingest time, where the lake is fingerprinted once and
  * every new batch only fingerprints itself.
  *
  *  - delta fingerprints come from `Dedup.rowMultiblockFpCols`, the
  *    row-local HOF formulation (no explode/groupBy — a per-doc
  *    aggregation would be unbounded streaming state; bit-parity
  *    with the batch fingerprints is spec-asserted), at the block
  *    width FROZEN from the lake's corpus count on the driving
  *    session (the StoreIngestStream layout discipline — deriving
  *    inside the batch closure could diverge from the lake index);
  *  - the 4-block key probe into the lake index is a stream-static
  *    equi-join (stateless), and the per-doc best-match argmin runs
  *    inside foreachBatch — a doc arrives in exactly one batch;
  *  - the sink OVERWRITES a per-batch-id partition (idempotent under
  *    foreachBatch's at-least-once re-delivery — the ExciseStream
  *    shape).
  */
object MultiblockSimhashStream {

  /** Static lake fingerprint index (doc_id, fp0, fp1) from the lake's
    * documents (the d10/d11 convention: doc_id % 10 != 0). Cache it —
    * every micro-batch probes it.
    */
  def lakeFingerprints(s: SparkSession, dir: String): DataFrame =
    Dedup.multiblockFrame(s, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .cache()

  /** One micro-batch: stateless row-local fingerprints at the FROZEN
    * lake width, probe the lake, classify (near_dup_of_index with the
    * best match, or kept).
    */
  def classifyBatch(batch: DataFrame, lakeFp: DataFrame,
      bits: Int): DataFrame = {
    val deltaFp = batch.select(
      col("doc_id") +: Dedup.rowMultiblockFpCols(col("text"), bits): _*)
    val best = Dedup.bestBlockMatch(deltaFp, lakeFp, bits)
    batch.select(col("doc_id"))
      .join(best, col("doc_id") === col("delta_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "near_dup_of_index")
          .otherwise("kept").as("status"),
        col("dup_of"), col("hamming"))
  }

  /** Write one micro-batch idempotently (batch cached — referenced by
    * the fingerprint side and the doc-list side).
    */
  def writeBatch(batch: DataFrame, lakeFp: DataFrame, bits: Int,
      outPath: String, batchId: Long): Unit = {
    val b = batch.cache()
    try classifyBatch(b, lakeFp, bits)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving delta docs) against the lake in `dir`,
    * landing classifications under `outPath`. The block width is
    * frozen HERE, on the driving session, and closed over.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val lakeFp = lakeFingerprints(s, dir)
    val bits = Dedup.mbDocBits(s, dir)
    s.readStream.schema(IncrementalLshStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, lakeFp, bits, outPath, id)
      }
      .start()
  }
}
