package graft.streaming

import graft.{Tables, TableStats}
import graft.functions.Text
import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** d16's incremental-ingest twin: arriving documents pass the BLOOM
  * membership pre-gate against lake ∪ everything already ingested,
  * then fold their own bits in — the gate a 100 TB ingest runs in
  * front of exact dedup, maintained BY the stream it shields.
  *
  * The bloom position set is the textbook streaming fold grain:
  * per-batch position sets merge by plain set UNION — associative,
  * commutative, and IDEMPOTENT (the EventStream agg-merge law), so
  * at-least-once re-delivery and any later delta compaction leave the
  * filter bit-identical. Same for the exact content-hash family the
  * false-positive audit needs. Both live as delta layouts under one
  * store root:
  *
  *   bloomDir/pos/delta_id={base,b0,b1,…}   the bloom bit set
  *   bloomDir/ch/delta_id={base,b0,…}       exact content hashes
  *   bloomDir/meta                          the FROZEN width m
  *
  * m is sized ONCE at seed time with growth headroom (a bloom cannot
  * be widened without rehashing everything — the classic property;
  * saturation is visible in the audit's rising FP share, the retrain
  * trigger) and closed over by the foreachBatch closure — the
  * session-keyed-state rule: the micro-batch frame is bound to a
  * CLONED session, so layout constants are frozen on the driving
  * session, never re-derived inside the closure.
  *
  * Classification per batch is the batch d16 core against the CURRENT
  * store state EXCLUDING the batch's own delta partitions (a doc must
  * never match itself; the exclusion also makes re-delivery exact —
  * a crash BETWEEN the output write and the folds replays against
  * the same effective state even if one fold landed). Output rows
  * land in a per-batch_id OVERWRITE partition (idempotent sink).
  */
object BloomGateStream {

  /** A delta family (`path/delta_id=*`) as one frame, or an EMPTY
    * frame with the family's schema when nothing has landed yet —
    * the BatchReads rule: schema inference on a partitionless path
    * throws, and a dashboard polling a pre-seed store must survive
    * (round-10 advice, applied here from birth).
    */
  private def familyOrEmpty(s: SparkSession, path: String,
      valueField: org.apache.spark.sql.types.StructField): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasDelta = fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("delta_id="))
    if (hasDelta) s.read.parquet(path)
    else s.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(valueField, StructField("delta_id", StringType))))
  }

  /** Current bloom bit set: distinct positions over base + every
    * folded delta, optionally excluding one batch's own delta.
    */
  def readBits(s: SparkSession, bloomDir: String,
      excludeBatch: Option[Long] = None): DataFrame = {
    val all = familyOrEmpty(s, s"$bloomDir/pos",
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType))
    val kept = excludeBatch match {
      case Some(id) => all.filter(col("delta_id") =!= s"b$id")
      case None     => all
    }
    kept.select(col("pos")).distinct()
  }

  /** Current exact content-hash set (the FP audit's truth side). */
  def readHashes(s: SparkSession, bloomDir: String,
      excludeBatch: Option[Long] = None): DataFrame = {
    val all = familyOrEmpty(s, s"$bloomDir/ch",
      org.apache.spark.sql.types.StructField("ch",
        org.apache.spark.sql.types.StringType))
    val kept = excludeBatch match {
      case Some(id) => all.filter(col("delta_id") =!= s"b$id")
      case None     => all
    }
    kept.select(col("ch")).distinct()
  }

  /** The frozen filter width (read once per stream start, driver-side
    * 1-row lookup).
    */
  def frozenM(s: SparkSession, bloomDir: String): Long =
    s.read.parquet(s"$bloomDir/meta").head().getAs[Long]("m")

  /** Seed the store from an explicit (doc_id, text) corpus at an
    * explicit width. Families are written with the GUARDED one (meta,
    * the existence check of [[startFolding]]) LAST, so a crash
    * mid-seed re-seeds everything.
    */
  def seed(docs: DataFrame, bloomDir: String, m: Long): Long = {
    val s = docs.sparkSession
    val hashed = docs.select(md5(Text.normalize(col("text"))).as("ch"))
      .distinct().cache()
    try {
      hashed.select(explode(Dedup.bloomPositions(col("ch"), m)).as("pos"))
        .distinct()
        .write.mode("overwrite").parquet(s"$bloomDir/pos/delta_id=base")
      hashed.write.mode("overwrite").parquet(s"$bloomDir/ch/delta_id=base")
      s.createDataFrame(Seq(Tuple1(m))).toDF("m")
        .coalesce(1).write.mode("overwrite").parquet(s"$bloomDir/meta")
    } finally { hashed.unpersist(); () }
    m
  }

  /** Seed from the lake slice of `dir` (the d10/d11 convention:
    * doc_id % 10 ≠ 0), sized for `headroom`× corpus growth —
    * m = bloomBits(n · headroom), i.e. log₂(headroom) doublings of
    * ingest before the filter saturates past its design fill.
    */
  def seedFromLake(s: SparkSession, dir: String, bloomDir: String,
      headroom: Int = 8, mOverride: Option[Long] = None): Long = {
    val n = TableStats.rowCount(s, dir, "documents")(
      Tables.documents(s, dir).count())
    val m = mOverride.getOrElse(Dedup.bloomBits(math.max(n, 1L) * headroom))
    val lake = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text"))
    seed(lake, bloomDir, m)
  }

  /** One batch's d16 classification against explicit bit/hash sets —
    * the batch core shared by the stream and the parity spec.
    */
  def classifyBatch(batch: DataFrame, bits: DataFrame, hashes: DataFrame,
      m: Long): DataFrame = {
    val hashed = batch
      .select(col("doc_id"), md5(Text.normalize(col("text"))).as("ch"))
    val hits = hashed
      .select(col("doc_id"),
        explode(Dedup.bloomPositions(col("ch"), m)).as("pos"))
      .join(bits.withColumn("set_bit", lit(true)), Seq("pos"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("set_bit"), 1L).otherwise(0L)).as("n_hit"))
    hashed
      .join(hashes.withColumn("in_store", lit(true)), Seq("ch"), "left")
      .join(hits, "doc_id")
      .select(col("doc_id"), col("n_hit"),
        (col("n_hit") === Dedup.BloomK).as("bloom_hit"),
        coalesce(col("in_store"), lit(false)).as("exact_dup"))
      .withColumn("false_positive", col("bloom_hit") && !col("exact_dup"))
  }

  /** One micro-batch: classify against the store (own delta excluded),
    * land the gate rows idempotently, then fold this batch's bits and
    * hashes in as its own OVERWRITE delta partitions.
    */
  def writeBatchFold(batch: DataFrame, bloomDir: String, outPath: String,
      batchId: Long, m: Long): Unit = {
    val s = batch.sparkSession
    // referenced by the probe, the exact check and both folds
    val hashed = batch
      .select(col("doc_id"), col("text"),
        md5(Text.normalize(col("text"))).as("ch"))
      .cache()
    try {
      classifyBatch(hashed, readBits(s, bloomDir, Some(batchId)),
        readHashes(s, bloomDir, Some(batchId)), m)
        .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      hashed.select(explode(Dedup.bloomPositions(col("ch"), m)).as("pos"))
        .distinct()
        .write.mode("overwrite").parquet(s"$bloomDir/pos/delta_id=b$batchId")
      hashed.select(col("ch")).distinct()
        .write.mode("overwrite").parquet(s"$bloomDir/ch/delta_id=b$batchId")
    } finally { hashed.unpersist(); () }
  }

  /** Segment merge: fold every pos/ch delta into a fresh base (set
    * union is associative, commutative and idempotent, so the merge
    * is EXACT — reads are unchanged and later folds against the
    * merged base stay exact), swapped in crash-safe via
    * TableSink.replaceDir. At 100 TB this is the small-file
    * compaction the delta layout needs periodically; m is untouched
    * (a bloom cannot be resized without rehashing — a saturated
    * filter is rebuilt via [[seed]] at a new m, not compacted).
    */
  def compact(s: SparkSession, bloomDir: String): Unit = {
    val pos = readBits(s, bloomDir)
    graft.sources.TableSink.replaceDir(s, s"$bloomDir/pos") { tmp =>
      pos.write.parquet(s"$tmp/delta_id=base")
    }
    val ch = readHashes(s, bloomDir)
    graft.sources.TableSink.replaceDir(s, s"$bloomDir/ch") { tmp =>
      ch.write.parquet(s"$tmp/delta_id=base")
    }
  }

  /** Drain `inDir` (arriving docs, documents schema) through the
    * folding gate: seed the store from `dir`'s lake if absent, freeze
    * m, then classify + fold per micro-batch. Gate rows land under
    * `outPath` (one batch_id partition per micro-batch).
    */
  def startFolding(s: SparkSession, inDir: String, dir: String,
      outPath: String, checkpoint: String, bloomDir: String,
      headroom: Int = 8): StreamingQuery = {
    val meta = new Path(s"$bloomDir/meta")
    val fs = meta.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) seedFromLake(s, dir, bloomDir, headroom)
    val m = frozenM(s, bloomDir) // frozen on the driving session
    s.readStream.schema(IncrementalLshStream.schema).parquet(inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchFold(batch, bloomDir, outPath, id, m)
      }
      .start()
  }
}
