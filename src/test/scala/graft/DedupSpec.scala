package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** Dedup semantics on crafted corpora: exact copies collapse, near
  * duplicates surface through MinHash-LSH and n-gram Jaccard, and
  * unrelated docs stay apart.
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dedup").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    val nearDup = base.replace("lazy dog", "sleepy dog") // 1-word edit
    val unrelated = "completely different content about spark query engines and " +
      "distributed columnar execution with whole stage codegen " * 3
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),        // exact dup of 0
      (2L, "  " + base + " ", "en", "src2", base.length + 3L), // ws-normalized dup
      (3L, nearDup, "en", "src3", nearDup.length.toLong),  // near dup of 0
      (4L, unrelated, "en", "src4", unrelated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup collapses byte- and whitespace-identical docs") {
    val rows = operators.Dedup.exact(spark, dir).collect()
    assert(rows.length == 3)
    val keeper0 = rows.find(_.getAs[Long]("keeper_doc_id") == 0L).get
    assert(keeper0.getAs[Long]("n_copies") == 3) // docs 0,1,2
  }

  test("minhash LSH surfaces the near duplicate with high est_sim") {
    val pairs = operators.Dedup.minhashLsh(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_sim"))).toSeq
    // exact dups: est_sim = 1.0
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1 && p._3 == 1.0))
    // near dup of 0 must be found with est_sim below 1 but high
    assert(pairs.exists(p => p._1 == 0 && p._2 == 3 && p._3 > 0.5))
    // unrelated doc never pairs
    assert(!pairs.exists(p => p._1 == 4 || p._2 == 4))
  }

  test("ngram jaccard finds the near duplicate exactly") {
    val pairs = operators.Dedup.ngramJaccard(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jaccard_bp"))).toSeq
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1 && p._3 == 10000))
    val near = pairs.find(p => p._1 == 0 && p._2 == 3)
    assert(near.isDefined && near.get._3 > 5000 && near.get._3 < 10000)
    assert(!pairs.exists(p => p._1 == 4 || p._2 == 4))
  }

  test("simhash hamming distance: dups at 0, near-dups small, unrelated apart") {
    val pairs = operators.Dedup.simhash(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSeq
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1 && p._3 == 0))
    assert(pairs.filter(p => p._2 == 3 || p._1 == 3).forall(_._3 <= 8))
    assert(!pairs.exists(p => p._1 == 4 || p._2 == 4))
  }
}
