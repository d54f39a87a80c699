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
