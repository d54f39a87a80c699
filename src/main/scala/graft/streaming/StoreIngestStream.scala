package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The whole-store ingest driver (twin #27): arriving vectors drain
  * through sources.IndexStore.foldBatch, so ONE stream keeps every
  * per-vector family (cells, lsh, pqcodes, sq8codes) AND the kNN
  * graph consistent with the lake — the production maintenance loop
  * of a vector store, where indexes are encoded once per ingest and
  * never rebuilt from the corpus.
  *
  * All fold semantics (frozen static artifacts, row-local encodes,
  * per-batch-id overwrite idempotency, the graph's monotone delta
  * merge) live in IndexStore/GraphIngestStream; this object is only
  * the Structured Streaming harness around them. The store must be
  * built (IndexStore.build) before the stream starts — the fold
  * encodes against the STORED artifacts by design, so there is
  * nothing sensible to do on an empty store.
  */
object StoreIngestStream {

  /** Arriving embeddings (the testdata embeddings schema). */
  val schema: StructType = VectorIngestStream.schema

  /** Drain `inDir` (arriving vectors) into the store at `idxDir`
    * built from the lake at `dir`.
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      idxDir: String, checkpoint: String): StreamingQuery = {
    // freeze the band layout HERE, on the caller's session — the
    // TableStats memo/injection is session-keyed, so deriving it
    // inside foreachBatch (a cloned session) could both re-count the
    // lake and diverge from the layout the graph was seeded under
    val bands = GraphIngestStream.lakeBands(s, dir)
    s.readStream.schema(schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // foreachBatch binds a CLONED session — fold through it so
        // installed extensions and reads live on the right session
        graft.sources.IndexStore.foldBatch(batch.sparkSession, dir,
          idxDir, batch, id, Some(bands))
      }
      .start()
  }
}
