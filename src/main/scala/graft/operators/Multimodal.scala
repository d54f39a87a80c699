package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.7): media payloads are
  * opaque `binary` columns with typed metadata alongside. The Spark
  * plumbing (binary encoding, schema, partition-wise batch processing
  * via mapPartitions on a typed Dataset) is real, and the decode step
  * has TWO kernels behind the [[Multimodal.BlobDecoder]] seam: the
  * deterministic byte-statistics STUB the driver-gated queries pin
  * (the DuckDB oracle replays its arithmetic — it has no media
  * codec), and [[Multimodal.ImageIoDecoder]], a REAL PNG/JPEG decoder
  * through the JRE's own `javax.imageio` (no external libs) that
  * turns m02/m07 into a true perceptual image pipeline
  * (spec-covered with round-tripped PNGs). Audio/video codecs remain
  * out of container scope; they drop into the same seam.
  */
object Multimodal {

  /** Blob row: what a media table looks like — opaque bytes + typed
    * metadata (mirrors how image/audio/video columns ride along a
    * 100 TB pipeline without being interpreted by the engine).
    */
  case class Blob(doc_id: Long, kind: String, byte_len: Long,
      content_hash: String, payload: Array[Byte])

  /** One feature row per 16-byte stripe of the payload. `mean_milli`
    * is the stripe's mean byte value in integer milli-units
    * (`sum*1000 / n` with integer floor division) — scalar columns
    * only, so the cross-engine compare can sort/hash rows.
    */
  case class StripeFeature(doc_id: Long, kind: String, byte_len: Long,
      stripe_no: Int, n_bytes: Int, mean_milli: Long)

  /** documents.text → opaque binary payload + metadata. */
  def blobs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      // route a deterministic fake modality from the source id
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      octet_length(col("text")).cast("long").as("byte_len"),
      md5(col("text")).as("content_hash"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** m01 — oracle-checkable metadata projection of the blob table. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    blobs(s, dir)
      .select(col("doc_id"), col("kind"), col("byte_len"), col("content_hash"))
      .orderBy(col("doc_id"))

  /** m03 — frame sampling plumbing: one row per sampled frame offset
    * per blob (4 evenly-spaced offsets), with a deterministic
    * 16-byte-window digest standing in for the decoded frame. The
    * one-to-many explode + offset arithmetic + per-frame digest is
    * exactly the shape a real video frame-sampler has; only the codec
    * is stubbed.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        octet_length(col("text")).cast("long").as("byte_len"), col("text"))
      .select(col("doc_id"), col("kind"), col("text"),
        explode(sequence(lit(0), lit(3))).as("frame_no"),
        col("byte_len"))
      .select(col("doc_id"), col("kind"), col("frame_no"),
        floor(col("byte_len") * col("frame_no") / 4).cast("long").as("offset"),
        col("text"))
      .select(col("doc_id"), col("kind"), col("frame_no"), col("offset"),
        md5(col("text").substr((col("offset") + 1).cast("int"), lit(16)))
          .as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_no"))

  /** m05 — per-modality corpus statistics: the shard-planning query a
    * multimodal pipeline runs before decode (how much of each
    * modality, how big, how many stripes will the decoder see). One
    * aggregate over blob metadata — byte math only, scan-speed.
    */
  def modalityStats(s: SparkSession, dir: String): DataFrame =
    blobs(s, dir)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("byte_len")).as("min_bytes"),
        max(col("byte_len")).as("max_bytes"),
        sum(ceil(col("byte_len") / 16.0).cast("long")).as("total_stripes"))
      .orderBy(col("kind"))

  /** m06 — multimodal training-sample assembly: each document pairs
    * with its embedding vector (doc_id = vec_id key-equality join)
    * and samples interleave ROUND-ROBIN BY MODALITY into fixed-size
    * batches, so every batch mixes image/audio/video instead of
    * clumping one modality — the batch-composition step of a
    * multimodal trainer. Per-modality rank is a window over the three
    * modality partitions (each scales with corpus/3); the vector side
    * contributes its self-dot (norm², milli-floored — same
    * fixed-association FloatVecDot arithmetic the oracle replays).
    */
  def modalityInterleave(s: SparkSession, dir: String,
      batchSize: Int = 8): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        graft.functions.Text.tokenCountWs(col("text")).cast("long")
          .as("n_tokens"))
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        floor(graft.functions.Vector.dot(col("embedding"), col("embedding"))
          * 1000).cast("long").as("norm2_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind")).orderBy(col("doc_id"))
    docs.join(vecs, col("doc_id") === col("vec_id"))
      .withColumn("modality_rank", row_number().over(w))
      .select(col("doc_id"), col("kind"), col("n_tokens"), col("norm2_milli"),
        floor((col("modality_rank") - 1) / batchSize).cast("long")
          .as("batch_id"),
        ((col("modality_rank") - 1) % batchSize).cast("int").as("slot"))
      .orderBy(col("kind"), col("batch_id"), col("slot"))
  }

  /** Pluggable decode/feature-extract kernel: one Blob in, zero or
    * more StripeFeature rows out, executed partition-wise on
    * executors — the seam where a real codec (pillow/ffmpeg via a
    * Pandas UDF bridge, or a JVM decoder) drops in without touching
    * the operator's Spark plumbing (schema, typed Dataset,
    * mapPartitions batch shape). Implementations must be Serializable:
    * the instance ships in the task closure.
    */
  trait BlobDecoder extends Serializable {
    def decode(b: Blob): Iterator[StripeFeature]
  }

  /** Default STUB decoder (no image/audio libs in this container):
    * deterministic per-16-byte-stripe mean byte values, one row per
    * stripe (integer milli-units — floor division is exact on both
    * engines, no float summation order to disagree about).
    */
  object StripeStubDecoder extends BlobDecoder {
    override def decode(b: Blob): Iterator[StripeFeature] =
      b.payload.grouped(16).zipWithIndex.map { case (st, i) =>
        val sum = st.foldLeft(0L)((acc, x) => acc + (x & 0xff))
        StripeFeature(b.doc_id, b.kind, b.byte_len, i, st.length,
          sum * 1000L / st.length)
      }
  }

  /** REAL image decoder through the JDK's own codec (r10 verdict
    * item 5): `javax.imageio` ships with the JRE — no external libs
    * — so PNG/JPEG payloads decode for real behind the same
    * [[BlobDecoder]] seam. Emits the 16 pHash-style 4×4 GRID-CELL
    * gray means (stripe_no = row·4+col, mean luma in milli-units;
    * integer Rec.601 luma and floor divisions only, so recomputation
    * is bit-stable), which is exactly the input [[blobDedup]]'s
    * threshold fingerprint wants — with this decoder m07 is a true
    * perceptual image dedup. Payloads ImageIO cannot decode (plain
    * text, truncated bytes) and images smaller than the grid fall
    * back to the stub's byte-stripe features, so mixed blob tables
    * keep working. The DRIVER-GATED queries keep the stub default:
    * DuckDB has no PNG codec to replay, and the oracle contract is
    * pinned to the stub arithmetic (documented on the class).
    */
  object ImageIoDecoder extends BlobDecoder {
    override def decode(b: Blob): Iterator[StripeFeature] = {
      // NonFatal, not just IOException (r11 advice): corrupt-but-
      // recognized payloads throw RuntimeExceptions (CMMException /
      // IllegalArgumentException from broken JPEG color profiles) —
      // an undecodable blob must fall back to the stub, never fail
      // the whole job
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth < 4 || img.getHeight < 4)
        StripeStubDecoder.decode(b)
      else {
        val w = img.getWidth
        val h = img.getHeight
        (0 until 16).iterator.map { j =>
          val (r, c) = (j / 4, j % 4)
          val (x0, x1) = (c * w / 4, (c + 1) * w / 4)
          val (y0, y1) = (r * h / 4, (r + 1) * h / 4)
          var sum = 0L
          var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
              n += 1
              x += 1
            }
            y += 1
          }
          StripeFeature(b.doc_id, b.kind, b.byte_len, j, n.toInt,
            sum * 1000L / n)
        }
      }
    }
  }

  /** m02 — decode/feature-extract: partition-wise batch op over the
    * typed Dataset, with the per-blob kernel supplied by `decoder`
    * (default = the stripe stub; the driver-gate oracle replays the
    * stub's arithmetic).
    */
  def extractFeatures(s: SparkSession, dir: String,
      decoder: BlobDecoder = StripeStubDecoder): DataFrame =
    extractFeaturesOf(s, blobs(s, dir), decoder)

  /** m02 over an EXPLICIT blob frame — real media tables (and the
    * ImageIoDecoder spec) feed through the identical plumbing.
    */
  def extractFeaturesOf(s: SparkSession, blobFrame: DataFrame,
      decoder: BlobDecoder): DataFrame = {
    import s.implicits._
    blobFrame.as[Blob].mapPartitions(_.flatMap(decoder.decode))
      .toDF().orderBy(col("doc_id"), col("stripe_no"))
  }

  /** m07 — BLOB-level near-dup (the image-dedup step of a multimodal
    * pipeline — d01–d12 cover text and embeddings; this covers the
    * media payloads): a 16-bit perceptual fingerprint per blob — bit
    * j set iff stripe j's mean exceeds the 16-stripe average, the
    * pHash recipe with the DCT swapped for the container's stub
    * decoder (a real pHash drops in through the same [[BlobDecoder]]
    * seam m02 uses, nothing downstream changes) — then d03's
    * hamming-band trick: same-modality pairs sharing either 8-bit
    * half are candidates (a (kind, band, bucket) EQUI-join, never
    * all-pairs), kept at hamming ≤ 3. Fingerprints are integer-exact
    * (floor divisions only) so the oracle rebuilds them bit-for-bit.
    * Scale: one decoder pass + a 2-key band join on a 16-bit space —
    * the fixed-width ceiling documented on d03 applies identically
    * (widen the fingerprint for corpora past ~10⁶ blobs per kind).
    */
  def blobDedup(s: SparkSession, dir: String,
      decoder: BlobDecoder = StripeStubDecoder, maxHamming: Int = 3): DataFrame =
    blobDedupOf(s, blobs(s, dir), decoder, maxHamming)

  /** m07 over an EXPLICIT blob frame — the seam real media tables
    * (and the ImageIoDecoder spec) enter through.
    */
  def blobDedupOf(s: SparkSession, blobFrame: DataFrame,
      decoder: BlobDecoder = StripeStubDecoder, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val feats = blobFrame.as[Blob]
      .mapPartitions(_.flatMap(decoder.decode)).toDF()
      .filter(col("byte_len") >= 256 && col("stripe_no") < 16)
    val fp = feats
      .groupBy(col("doc_id"), col("kind"))
      .agg(array_sort(collect_list(struct(col("stripe_no"), col("mean_milli"))))
        .as("a"))
      .filter(size(col("a")) === 16)
      .withColumn("avg_milli", floor(expr(
        "aggregate(a, 0L, (acc, x) -> acc + x.mean_milli)") / 16).cast("long"))
      .withColumn("fp", expr(
        "aggregate(a, 0L, (acc, x) -> acc + IF(x.mean_milli > avg_milli, " +
          "shiftleft(1L, x.stripe_no), 0L))"))
      .select(col("doc_id"), col("kind"), col("fp"))
    val banded = fp.select(col("doc_id"), col("kind"), col("fp"),
      explode(array(
        struct(lit(0).as("band"), col("fp").bitwiseAND(lit(255L)).as("bucket")),
        struct(lit(1).as("band"), shiftright(col("fp"), 8).as("bucket"))))
        .as("b"))
      .select(col("doc_id"), col("kind"), col("fp"),
        col("b.band").as("band"), col("b.bucket").as("bucket"))
    val a = banded.select(col("doc_id").as("doc_a"), col("kind"),
      col("fp").as("fp_a"), col("band"), col("bucket"))
    val b = banded.select(col("doc_id").as("doc_b"), col("kind"),
      col("fp").as("fp_b"), col("band"), col("bucket"))
    a.join(b, Seq("kind", "band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("kind"),
        col("fp_a"), col("fp_b")).distinct()
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("kind"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** m08 — dataloader SHARD MANIFEST: blobs assigned to training
    * shards by salted hash (t16's deterministic-shuffle convention —
    * reproducible, no RNG), one manifest row per (shard, modality)
    * with item count and byte volume — the webdataset/tar-shard
    * manifest a multimodal trainer reads to plan workers, plus the
    * balance audit (a shard 2× its peers straggles every epoch).
    *
    * Scale shape: the shard assignment is a row-local projection on
    * the metadata columns (the payload bytes are never touched — at
    * 100 TB the manifest job reads only parquet metadata columns,
    * column pruning keeps blobs on disk); one (shard, kind)-keyed
    * map-combinable aggregate onto a frame bounded at
    * |shards|·|modalities| rows at any corpus size.
    */
  def shardManifest(s: SparkSession, dir: String,
      nShards: Int = 8): DataFrame =
    blobs(s, dir)
      .select(col("kind"), col("byte_len"),
        pmod(conv(substring(
            md5(concat(lit("m08"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"), lit(nShards.toLong)).as("shard_id"))
      .groupBy(col("shard_id"), col("kind"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum(col("byte_len")).cast("long").as("total_bytes"),
        max(col("byte_len")).cast("long").as("max_bytes"))
      .orderBy(col("shard_id"), col("kind"))
}
