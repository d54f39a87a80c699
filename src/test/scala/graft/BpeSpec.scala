package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** t24/t25 — BPE tokenizer training + apply. Hand-walks both merge
  * rounds on a corpus small enough to verify on paper, pins the
  * greedy left-to-right non-overlap rule (the fold/parity-rule
  * equivalence), and checks the apply stats tie out.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** low×5, lower×2, newest×3.
    * Round-1 pairs: (l,o)=7 (o,w)=7 (w,e)=5 (e,r)=2 (n,e)=3 (e,w)=3
    * (e,s)=3 (s,t)=3 → tie at 7 breaks (a ASC) to (l,o).
    * Round-2: (lo,w)=7 wins → "low".
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bpe").toString
    Seq(
      (0L, "low low low low low", "en", "src0", 19L),
      (1L, "lower lower", "en", "src0", 11L),
      (2L, "newest newest newest", "en", "src1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    d
  }

  test("t24 learns (l,o) then (lo,w) on the hand-walked corpus") {
    val rows = operators.Bpe.bpeTrain(spark, dir).collect()
    val merges = rows.filter(_.getAs[String]("kind") == "merge")
      .sortBy(_.getAs[Int]("ord"))
      .map(r => (r.getAs[Int]("ord"), r.getAs[String]("sym"), r.getAs[Long]("cnt")))
    assert(merges.toSeq == Seq((1, "lo", 7L), (2, "low", 7L)))
    val vocab = rows.filter(_.getAs[String]("kind") == "vocab")
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("cnt")).toMap
    // low→[low]×5, lower→[low,e,r]×2, newest→[n,e,w,e,s,t]×3
    assert(vocab == Map("low" -> 7L, "e" -> 8L, "r" -> 2L, "n" -> 3L,
      "w" -> 3L, "s" -> 3L, "t" -> 3L))
  }

  test("merge pass is greedy left-to-right non-overlapping") {
    val d = Files.createTempDirectory("graft-bpe2").toString
    // aaaa×2 and aaa×1: round 1 learns (a,a) (count 2·3+2=8) and must
    // merge aaaa→[aa,aa] and aaa→[aa,a] (NOT [a,aa] — left-greedy);
    // round 2 learns (aa,aa)=2 (ties (aa,a)=1 lose on count).
    Seq((0L, "aaaa aaaa aaa", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val rows = operators.Bpe.bpeTrain(spark, d).collect()
    val merges = rows.filter(_.getAs[String]("kind") == "merge")
      .sortBy(_.getAs[Int]("ord"))
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("cnt")))
    assert(merges.toSeq == Seq(("aa", 8L), ("aaaa", 2L)))
    val vocab = rows.filter(_.getAs[String]("kind") == "vocab")
      .map(r => r.getAs[String]("sym") -> r.getAs[Long]("cnt")).toMap
    // aaaa→[aaaa]×2; aaa→[aa,a]: greedy left keeps the single 'a' LAST
    assert(vocab == Map("aaaa" -> 2L, "aa" -> 1L, "a" -> 1L))
  }

  test("t25 apply stats tie out with the learned merges") {
    val rows = operators.Bpe.bpeApply(spark, dir).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0: low×5 → 5 tokens, 15 char syms, 5 bpe syms
    assert(byDoc(0L).getAs[Long]("n_tokens") == 5L)
    assert(byDoc(0L).getAs[Long]("n_char_syms") == 15L)
    assert(byDoc(0L).getAs[Long]("n_bpe_syms") == 5L)
    assert(byDoc(0L).getAs[Long]("compression_bp") == 3333L)
    // doc 1: lower×2 → [low,e,r]: 2 tokens, 10 chars, 6 syms
    assert(byDoc(1L).getAs[Long]("n_bpe_syms") == 6L)
    // doc 2: newest unmerged → 18 chars, 18 syms, compression 10000
    assert(byDoc(2L).getAs[Long]("n_bpe_syms") == 18L)
    assert(byDoc(2L).getAs[Long]("compression_bp") == 10000L)
  }

  test("t34 fertility rolls up t25 per (lang, source), hand-walked") {
    val rows = operators.Bpe.tokenizerFertility(spark, dir).collect()
    val bySlice = rows.map(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")) -> r).toMap
    assert(bySlice.keySet == Set(("en", "src0"), ("en", "src1")))
    // src0 = docs 0+1: 7 tokens, 25 chars, 5+6=11 bpe syms
    val s0 = bySlice(("en", "src0"))
    assert(s0.getAs[Long]("n_docs") == 2L)
    assert(s0.getAs[Long]("n_tokens") == 7L)
    assert(s0.getAs[Long]("n_char_syms") == 25L)
    assert(s0.getAs[Long]("n_bpe_syms") == 11L)
    assert(s0.getAs[Long]("fertility_bp") == 11L * 10000 / 7)  // 15714
    assert(s0.getAs[Long]("compression_bp") == 4400L)
    // src1 = doc 2 alone: merges don't apply → fertility 6 syms/word
    val s1 = bySlice(("en", "src1"))
    assert(s1.getAs[Long]("n_docs") == 1L)
    assert(s1.getAs[Long]("n_tokens") == 3L)
    assert(s1.getAs[Long]("n_bpe_syms") == 18L)
    assert(s1.getAs[Long]("fertility_bp") == 60000L)
    assert(s1.getAs[Long]("compression_bp") == 10000L)
  }
}
