package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming INGEST path of the vector store (the write side of
  * s03/s08): arriving embeddings are assigned to their IVF cell and
  * SQ8-encoded against STATIC index artifacts — the production shape
  * where centroids and quantization ranges are trained once (on the
  * lake) and every new batch only encodes itself; queries then scan
  * the cell-partitioned code table (s06/s08's read side).
  *
  *  - centroids and the SQ8 param row are computed once from the
  *    lake dir and cached — each micro-batch is one broadcast scan
  *    of itself (cell argmax via TopKPerKey, codes via the shared
  *    sq8Code lambda), no shuffle of anything corpus-sized;
  *  - the sink lands `cid`-PARTITIONED parquet (the cell id IS the
  *    partition key at 100 TB) under a per-batch-id directory
  *    OVERWRITTEN on re-delivery, so foreachBatch's at-least-once
  *    contract cannot duplicate vectors (the ExciseStream shape);
  *  - batch/stream parity is exact: assignment and codes of an
  *    arriving vector depend only on the static artifacts, not on
  *    which batch carried the vector (spec-asserted).
  */
object VectorIngestStream {

  /** Arriving embeddings (the testdata embeddings schema). */
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Static index artifacts from the lake: the coarse k-means
    * centroids (s03's — K(n) frozen at train time on the DRIVING
    * session; the memoized frame is already cached+materialized) and
    * the SQ8 param row. Cached — every batch uses both.
    */
  def staticArtifacts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val cent = Similarity.coarseCentroids(s, dir)
    val params = Similarity.sq8Params(
      graft.Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
      .cache()
    (cent, params)
  }

  /** One micro-batch: cell-assign (top-1) + SQ8-encode the arriving
    * vectors against the static artifacts. The session is taken from
    * the batch frame itself — inside foreachBatch that is the
    * streaming clone, which needs its OWN GraftExtensions install for
    * the TopKPerKey strategy (the outer session's experimental
    * methods don't reach the clone).
    */
  def encodeBatch(batch: DataFrame, cent: DataFrame,
      params: DataFrame): DataFrame = {
    val e = batch.select(col("vec_id"), col("embedding"))
    val cells = Similarity.cellAssignmentsOf(batch.sparkSession, e, cent)
      .filter(col("rr") === 1)
      .select(col("vec_id"), col("cid"))
    Similarity.sq8Codes(e, params)
      .join(cells, "vec_id")
      .select(col("vec_id"), col("cid"), col("codes"))
  }

  /** Write one micro-batch idempotently: the arriving frame is
    * cached (referenced by the assignment AND the code side), encoded
    * once, and OVERWRITTEN into the batch's own batch_id directory,
    * cell-partitioned inside it.
    */
  def writeBatch(batch: DataFrame, cent: DataFrame,
      params: DataFrame, outPath: String, batchId: Long): Unit = {
    val b = batch.cache()
    try encodeBatch(b, cent, params)
      .write.partitionBy("cid").mode("overwrite")
      .parquet(s"$outPath/batch_id=$batchId")
    finally { b.unpersist(); () }
  }

  /** Drain `inDir` (arriving embeddings) against the lake index in
    * `dir`, landing cell-partitioned codes under `outPath`.
    */
  def startToParquet(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String): StreamingQuery = {
    val (cent, params) = staticArtifacts(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, cent, params, outPath, id)
      }
      .start()
  }
}
