package graft.streaming

import graft.Tables
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Streaming twin of Relational.approxStats (r12, twin #25): the
  * deterministic KMV + histogram sketches maintained AT INGEST — the
  * whole reason r11 replaced the engine-opaque HLL/GK sketches is
  * that a deterministic sketch is a VALUE two systems can exchange
  * and fold; this twin is that exchange.
  *
  * State layout (two delta families + a frozen meta under
  * `stateDir`):
  *  - `kmv/delta_id=*` — each delta holds its OWN ≤k smallest
  *    distinct (st, h) hashes. Per-delta capping is LOSSLESS for the
  *    merged k-min set (a hash in the merged k smallest is
  *    necessarily within its own delta's k smallest — the
  *    monotone-merge property, same argument as
  *    PostingIngestStream's impact cap), and min-merge is idempotent
  *    under replay, so at-least-once re-delivery cannot bias the
  *    estimate even before the partition overwrite guarantees kick
  *    in.
  *  - `hist/delta_id=*` — per-delta (st, b, nb) bucket counts at the
  *    FROZEN width; exact under sum-merge because count partials are
  *    disjoint by delivery (the r19 agg-merge law).
  *  - `meta` — the histogram width w, derived ONCE from the lake's
  *    max cents at seed time (the DriftStream frozen-model seam:
  *    a width re-derivation is a re-index, not a fold — deltas
  *    priced above the frozen max OPEN NEW BUCKETS beyond the seeded
  *    0..255 range (histPartial is an unclamped c DIV w), the
  *    documented out-of-range signal the monitor reads as re-index
  *    pressure, not an error; batch r12 derives w from its own
  *    corpus, so parity is scoped to in-range deltas).
  *
  * Parity contract (spec-asserted): after draining deltas whose
  * prices stay within the lake's max, readStats equals batch r12
  * over lake ∪ deltas exactly — both sides assemble through the
  * SHARED Relational.approxFromPartials arithmetic, and both sketch
  * merges are exact (k-min re-cap; bucket-count sum).
  */
object SketchStream {

  /** Incoming orders (the testdata orders schema). */
  val schema: StructType = DqStream.schema

  val K = 1024

  private val metaSchema = StructType(Seq(StructField("w", LongType)))
  private val kmvSchema = StructType(Seq(
    StructField("st", StringType), StructField("h", LongType)))
  private val histSchema = StructType(Seq(
    StructField("st", StringType), StructField("b", LongType),
    StructField("nb", LongType)))

  /** Seed the state from the lake: its KMV k-min delta, its bucket
    * counts, and the FROZEN width from the lake's max cents.
    */
  def seedFromLake(s: SparkSession, dir: String, stateDir: String,
      k: Int = K): Unit = {
    graft.plans.GraftExtensions.install(s)
    val o = Tables.orders(s, dir)
    val cents = Relational.orderCents(o).cache()
    try {
      val w = math.max(1L,
        cents.agg(max(col("c"))).collect().head.getLong(0) / 256L)
      s.createDataFrame(java.util.Collections.singletonList(
        org.apache.spark.sql.Row(w)), metaSchema)
        .write.mode("overwrite").parquet(s"$stateDir/meta")
      graft.plans.TopK.perKey(Relational.kmvHashes(o), Seq(col("st")),
          Seq(col("h").asc), k)
        .select(col("st"), col("h"))
        .write.mode("overwrite").parquet(s"$stateDir/kmv/delta_id=base")
      histPartial(cents, w)
        .write.mode("overwrite").parquet(s"$stateDir/hist/delta_id=base")
    } finally { cents.unpersist(); () }
  }

  /** One delivery's bucket counts at the frozen width. */
  private def histPartial(cents: DataFrame, w: Long): DataFrame =
    cents.groupBy(col("st"), expr(s"c DIV ${w}L").as("b"))
      .agg(count(lit(1)).cast("long").as("nb"))

  private def frozenW(s: SparkSession, stateDir: String): Long =
    s.read.schema(metaSchema).parquet(s"$stateDir/meta")
      .collect().head.getLong(0)

  /** One micro-batch: fold the delivery's KMV k-min and bucket-count
    * partials into its own delta partitions (overwrite — re-delivery
    * replaces; both merges are idempotent under replacement anyway).
    */
  def writeBatch(batch: DataFrame, stateDir: String, batchId: Long,
      k: Int = K): Unit = {
    val ss = batch.sparkSession // foreachBatch binds a CLONED session
    graft.plans.GraftExtensions.install(ss)
    val b = batch.cache() // feeds the kmv AND hist partials
    try {
      graft.plans.TopK.perKey(Relational.kmvHashes(b), Seq(col("st")),
          Seq(col("h").asc), k)
        .select(col("st"), col("h"))
        .write.mode("overwrite").parquet(s"$stateDir/kmv/delta_id=b$batchId")
      histPartial(Relational.orderCents(b), frozenW(ss, stateDir))
        .write.mode("overwrite").parquet(s"$stateDir/hist/delta_id=b$batchId")
    } finally { b.unpersist(); () }
  }

  /** The live r12 answer: re-cap the unioned k-min deltas (distinct
    * first — the same hash may ride the lake and a delta), sum the
    * bucket deltas, assemble through the shared batch arithmetic.
    * Empty-state tolerant via BatchReads-style explicit schemas.
    */
  def readStats(s: SparkSession, stateDir: String, k: Int = K): DataFrame = {
    graft.plans.GraftExtensions.install(s)
    val w = frozenW(s, stateDir)
    val kept = graft.plans.TopK.perKey(
      s.read.schema(kmvSchema).parquet(s"$stateDir/kmv")
        .select(col("st"), col("h")).distinct(),
      Seq(col("st")), Seq(col("h").asc), k)
    val hist = s.read.schema(histSchema).parquet(s"$stateDir/hist")
      .groupBy(col("st"), col("b"))
      .agg(sum(col("nb")).cast("long").as("nb"))
      .select(col("st"), lit(w).as("w"), col("b"), col("nb"))
    Relational.approxFromPartials(kept, hist, k)
  }

  /** Drain `inDir` (arriving order deliveries) into the sketch state
    * seeded from the lake at `dir`.
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      stateDir: String, checkpoint: String, k: Int = K): StreamingQuery = {
    val base = new org.apache.hadoop.fs.Path(s"$stateDir/kmv/delta_id=base")
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) seedFromLake(s, dir, stateDir, k)
    // one file = one delivery (the DqStream convention)
    s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, stateDir, id, k)
      }
      .start()
  }
}
