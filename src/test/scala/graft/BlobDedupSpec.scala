package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** m07 blob near-dup: planted-pair recall and band-pruning behavior
  * on a controlled corpus (doc ids chosen ≡ 0 mod 3 so all blobs
  * share the 'image' modality and pair freely).
  */
class BlobDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-blob").toString
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim // ~350B
    val nearDup = "The" + base.drop(3) // 1-byte case change in stripe 0
    val shifted = " " + base // every stripe's content moves one byte
    Seq(
      (0L, base), (3L, nearDup), (6L, shifted),
      (9L, ("all work and no play makes a dull boy indeed today " * 8).trim),
      (12L, "tiny")) // < 256 bytes: no fingerprint, never paired
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    d
  }

  test("m07 pairs near-identical blobs and skips short/unrelated ones") {
    val rows = operators.Multimodal.blobDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    // a 1-byte perturbation moves one stripe mean a hair: fingerprints
    // differ in at most a few bits and the pair survives the band join
    assert(rows.contains((0L, 3L)), s"near-dup pair missed: ${rows.keySet}")
    assert(rows((0L, 3L)) <= 3)
    // the short blob has no 16-stripe fingerprint — never appears
    assert(!rows.keySet.exists(p => p._1 == 12L || p._2 == 12L))
  }

  test("m07 fingerprints are deterministic across recomputation") {
    val a = operators.Multimodal.blobDedup(spark, dir).collect().toSeq
    val b = operators.Multimodal.blobDedup(spark, dir).collect().toSeq
    assert(a == b)
  }

  /** A 32×32 RGB PNG: 4×4 grid of bright/dark cells (brightness by
    * `brightCell` over the cell index 0..15) with per-pixel
    * deterministic noise — keeps the encoded size past the 256-byte
    * fingerprint floor and off trivial-compression paths.
    */
  private def gridPng(brightCell: Int => Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val cell = (y / 8) * 4 + (x / 8)
      val base = if (brightCell(cell)) 220 else 30
      val v = base + (x * x * 7 + y * y * 13 + x * y * 3) % 23
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def blobRow(id: Long, payload: Array[Byte]) =
    operators.Multimodal.Blob(id, "image", payload.length.toLong,
      java.security.MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString, payload)

  test("ImageIoDecoder: real PNG round-trip — grid features, near-dup found, stub fallback") {
    import operators.Multimodal
    def checker(cell: Int) = (cell / 4 + cell % 4) % 2 == 0
    val a = gridPng(checker)
    val b = gridPng(cell => checker(cell) && cell != 0) // 1 cell darkened
    val c = gridPng(cell => cell % 2 == 0) // vertical stripes: 8 bits off
    assert(a.length >= 256 && b.length >= 256 && c.length >= 256)
    val blobFrame = Seq(blobRow(0L, a), blobRow(3L, b), blobRow(6L, c),
      blobRow(9L, "not an image at all, plain text bytes".getBytes("UTF-8")))
      .toDF()
    // m02 through the REAL decoder: decoded blobs emit exactly the 16
    // 4x4 grid cells (64 px each), bright/dark cell means separate
    val feats = Multimodal.extractFeaturesOf(spark, blobFrame,
      Multimodal.ImageIoDecoder).collect()
    val aRows = feats.filter(_.getAs[Long]("doc_id") == 0L)
    assert(aRows.length == 16 && aRows.forall(_.getAs[Int]("n_bytes") == 64))
    val means = aRows.sortBy(_.getAs[Int]("stripe_no"))
      .map(_.getAs[Long]("mean_milli"))
    assert(means(0) > 200000L && means(1) < 50000L, means.toSeq.toString)
    // the non-image payload fell back to the byte-stripe stub (its
    // stripe count tracks payload length, not the 4x4 grid)
    val dRows = feats.filter(_.getAs[Long]("doc_id") == 9L)
    assert(dRows.length == (37 + 15) / 16, dRows.length.toString)
    // m07 through the REAL decoder: the one-cell edit survives as a
    // near-dup (hamming <= 3), the inverted board never pairs with a
    val pairs = Multimodal.blobDedupOf(spark, blobFrame,
      Multimodal.ImageIoDecoder).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs.contains((0L, 3L)), s"planted PNG near-dup missed: $pairs")
    assert(pairs((0L, 3L)) <= 3, pairs.toString)
    assert(!pairs.contains((0L, 6L)) && !pairs.contains((3L, 6L)), pairs.toString)
    // decoding is bit-stable across recomputation
    val again = Multimodal.extractFeaturesOf(spark, blobFrame,
      Multimodal.ImageIoDecoder).collect()
    assert(feats.toSeq == again.toSeq)
  }

  test("m08 shard manifest: complete, balanced, deterministic") {
    val rows = operators.Multimodal.shardManifest(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // every blob lands in exactly one (shard, kind) cell
    assert(rows.map(_.getAs[Long]("n_items")).sum == n)
    assert(rows.forall(r => r.getAs[Long]("total_bytes") > 0 &&
      r.getAs[Long]("max_bytes") <= r.getAs[Long]("total_bytes")))
    // salted-hash sharding balances: per-shard item counts within 2x
    // of the mean (a straggler shard costs every epoch)
    val byShard = rows.groupBy(_.getAs[Long]("shard_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_items")).sum }
    assert(byShard.size == 8, byShard.toString)
    val mean = n.toDouble / 8
    byShard.foreach { case (sh, c) =>
      assert(c > mean / 2 && c < mean * 2, s"shard $sh unbalanced: $c") }
    // reproducible — no RNG anywhere in the assignment
    val again = operators.Multimodal.shardManifest(spark, sf0001).collect()
    assert(rows.toSeq == again.toSeq)
  }
}
