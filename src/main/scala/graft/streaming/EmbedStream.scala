package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Text-to-vector INGEST (twin #29): arriving documents are embedded
  * by t35's hashing-trick projection and folded straight into the
  * vector store — the full "raw text → queryable index" ingest path,
  * with no model artifact to load because the feature-hashing
  * embedder is deterministic arithmetic (its "model" is a hash
  * function). Composes the two seams the engine already proves
  * separately: TextOps.hashedEmbeddingOf (batch/stream parity by
  * construction — one shared body) and IndexStore.foldBatch (fold ==
  * frozen-model rebuild, IndexStoreSpec).
  *
  * Embedding a batch is row-local work (token explode → md5 → one
  * map-combinable (doc, dim) aggregate over the BATCH, never the
  * lake), so the stream scales with arrival rate, not corpus size.
  * Token-less documents produce NO vector by design — a zero vector
  * has no cosine direction, so there is nothing to index; the
  * curation gates upstream (c01/c05) are where empty docs get
  * quarantined.
  *
  * Two harnesses share the encoder:
  *  - [[startEmbedding]] lands `(vec_id, embedding)` rows into an
  *    embeddings lake under per-batch-id directories OVERWRITTEN on
  *    re-delivery (the at-least-once idempotency shape every sink
  *    here uses);
  *  - [[startIndexing]] drains straight through
  *    IndexStore.foldBatch, so arriving TEXT keeps every per-vector
  *    family and the kNN graph consistent — the StoreIngestStream
  *    loop with the embedder fused in front.
  */
object EmbedStream {

  /** Arriving documents (the testdata documents schema). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** One micro-batch: t35's sparse projection of the batch, densified
    * to the embeddings-table shape `(vec_id, embedding:
    * Array[Float])` with vec_id = doc_id. Untouched coordinates are
    * 0; docs with no tokens emit no row (see object Scaladoc).
    */
  def embedBatch(batch: DataFrame, dims: Int = 64): DataFrame =
    graft.operators.TextOps.hashedEmbeddingOf(
        batch.select(col("doc_id"), col("text")), dims)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("weight"))))
        .as("m"))
      .select(col("doc_id").as("vec_id"),
        expr(s"transform(sequence(0, ${dims - 1})," +
          " i -> CAST(coalesce(m[i], 0L) AS FLOAT))").as("embedding"))

  /** Drain `inDir` (arriving documents) into an embeddings lake at
    * `outDir`, one overwritten batch_id directory per delivery.
    */
  def startEmbedding(s: SparkSession, inDir: String, outDir: String,
      checkpoint: String, dims: Int = 64): StreamingQuery =
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        embedBatch(batch, dims).write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$id")
        ()
      }
      .start()

  /** Drain `inDir` (arriving documents) through the embedder into
    * the vector store at `idxDir` built from the lake at `dir` — the
    * StoreIngestStream fold with text in front. The graph band layout
    * is frozen HERE on the caller's session (the session-keyed
    * TableStats rule); the store must already be built.
    */
  def startIndexing(s: SparkSession, inDir: String, dir: String,
      idxDir: String, checkpoint: String, dims: Int = 64): StreamingQuery = {
    val bands = GraphIngestStream.lakeBands(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // foreachBatch binds a CLONED session — fold through it
        graft.sources.IndexStore.foldBatch(batch.sparkSession, dir,
          idxDir, embedBatch(batch, dims), id, Some(bands))
      }
      .start()
  }
}
