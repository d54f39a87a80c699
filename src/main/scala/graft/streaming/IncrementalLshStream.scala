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
  *  - sink appends per-batch results; checkpointing makes the drain
  *    exactly-once (availableNow).
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

  /** Drain `inDir` (arriving delta docs) against the lake in `dir`,
    * appending classifications to `outPath` exactly once.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val lakeSig = lakeSignatures(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        classifyBatch(batch, lakeSig)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }
}
