package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** Semantic contracts for the round-3 training-data operators
  * (decontamination, repetition stats, domain mixing) on crafted
  * corpora — the sf* oracle checks the cross-engine arithmetic, these
  * check the operators actually detect what they claim to.
  */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("graft-textops").toString
    rows.map { case (id, text, lang) => (id, text, lang, "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    d
  }

  test("t12 flags training docs sharing an 8-gram with the benchmark slice") {
    val bench = (1 to 12).map(i => s"eval$i").mkString(" ")
    val leaked = "prefix words here " + (1 to 9).map(i => s"eval$i").mkString(" ")
    val clean = (1 to 12).map(i => s"train$i").mkString(" ")
    // doc 0 and 50 are the benchmark (doc_id % 50 == 0)
    val dir = mkDocs(Seq(
      (0L, bench, "en"), (50L, "another benchmark doc entirely", "en"),
      (1L, leaked, "en"), (2L, clean, "en")))
    val rows = operators.TextOps.decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated"))).toMap
    // benchmark docs are not in the output at all
    assert(!rows.contains(0L) && !rows.contains(50L))
    // leaked doc shares the eval1..eval8 and eval2..eval9 8-grams
    assert(rows(1L) == ((2L, true)), rows(1L).toString)
    assert(rows(2L) == ((0L, false)))
  }

  test("t35 hashed embedding matches a hand-computed projection and keeps canceled dims") {
    def hv(word: String): (Int, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(word.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      ((h % 64).toInt, if ((h / 64) % 2 == 0) 1L else -1L)
    }
    // find two words hashing to the SAME dim with OPPOSITE signs: a
    // doc holding exactly that pair must emit its dim with weight 0
    // (touched-but-canceled rows stay — the contract)
    val pool = (0 until 500).map(i => s"w$i").map(w => (w, hv(w)))
    val (wPos, wNeg) = pool.groupBy(_._2._1).values.flatMap { ws =>
      for {
        a <- ws.filter(_._2._2 == 1L).take(1)
        b <- ws.filter(_._2._2 == -1L).take(1)
      } yield (a._1, b._1)
    }.head
    val dir = mkDocs(Seq(
      (1L, "alpha beta alpha", "en"), (2L, "gamma", "en"),
      (3L, s"$wPos $wNeg", "en")))
    val out = operators.TextOps.hashedEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val (da, sa) = hv("alpha"); val (db, sb) = hv("beta")
    val (dg, sg) = hv("gamma"); val (dc, _) = hv(wPos)
    val exp1 =
      if (da == db) Map((1L, da) -> (2 * sa + sb))
      else Map((1L, da) -> 2 * sa, (1L, db) -> sb)
    assert(out == exp1 ++ Map((2L, dg) -> sg, (3L, dc) -> 0L))
  }

  test("t17 excises merged contaminated spans and keeps the rest") {
    val bench = (1 to 10).map(i => s"eval$i").mkString(" ")
    // doc 1: clean prefix + eval1..eval6 leak + clean suffix. The leak
    // produces three overlapping contaminated 4-grams (starts 4,5,6)
    // that must merge into ONE span covering tokens 4..9 (6 tokens)
    val leaked = "keep these three " + (1 to 6).map(i => s"eval$i").mkString(" ") +
      " tail words"
    val clean = (1 to 8).map(i => s"train$i").mkString(" ")
    val fully = (3 to 8).map(i => s"eval$i").mkString(" ") // every token covered
    val dir = mkDocs(Seq(
      (0L, bench, "en"), (1L, leaked, "en"), (2L, clean, "en"), (3L, fully, "en")))
    val rows = operators.TextOps.contaminationExcise(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_spans"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    // benchmark doc is not in the output
    assert(!rows.contains(0L))
    // overlapping gram hits merged into one span; surviving tokens kept in order
    assert(rows(1L) == ((1, 6L, "keep these three tail words")), rows(1L).toString)
    // clean doc untouched, token-joined text preserved
    assert(rows(2L) == ((0, 0L, clean)))
    // fully-contaminated doc: everything excised, empty (not null) text
    assert(rows(3L) == ((1, 6L, "")))
  }

  test("t19 self-dedup keeps first occurrence, excises every later one") {
    val phrase = (1 to 8).map(i => s"dup$i").mkString(" ")
    val dir = mkDocs(Seq(
      (1L, s"a b c $phrase x y", "en"),   // canonical occurrence (pos 4)
      (2L, s"p q $phrase r", "en"),       // later doc — excised
      (3L, phrase, "en"),                 // whole doc duplicated — emptied
      (4L, s"z $phrase m $phrase w", "en"), // two later occurrences, two spans
      (5L, (1 to 10).map(i => s"u$i").mkString(" "), "en"))) // unique — untouched
    val rows = operators.TextOps.selfDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_spans"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    // first occurrence survives in full
    assert(rows(1L) == ((0, 0L, s"a b c $phrase x y")), rows(1L).toString)
    assert(rows(2L) == ((1, 8L, "p q r")), rows(2L).toString)
    assert(rows(3L) == ((1, 8L, "")), rows(3L).toString)
    // within-doc repeats of an already-canonical phrase: both spans go
    assert(rows(4L) == ((2, 16L, "z m w")), rows(4L).toString)
    assert(rows(5L)._1 == 0 && rows(5L)._3.startsWith("u1 "))
  }

  test("t19 canon ranks lexicographically for docs past 1M tokens (stride-key regression)") {
    // The r1–r9 BIGINT key doc_id*1e6+i TIED these two occurrences
    // (0*1e6+1000001 == 1*1e6+1), so neither was excised and the
    // duplicate silently survived; with ANY longer doc-0 offset the
    // stride key would even mis-rank doc 1 as canonical. The struct
    // key orders (0, 1000001) < (1, 1): doc 1's copy must be the hit.
    import org.apache.spark.sql.functions._
    val phrase = (1 to 8).map(i => s"w$i")
    val planted = array(phrase.map(lit): _*)
    val tk = Seq(0L, 1L).toDF("doc_id").select(col("doc_id"),
      when(col("doc_id") === 0L,
        concat(expr("transform(sequence(1, 1000000), x -> concat('u', x))"), planted))
        .otherwise(planted).as("t"))
    val hits = operators.TextOps.selfDedupHitFrame(tk, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("i"))).toSet
    assert(hits == Set((1L, 1)), hits.toString)
  }

  test("t20 benchmark overlap reports per-bench-doc leak fraction") {
    val benchA = (1 to 12).map(i => s"e$i").mkString(" ")  // 5 windows
    val benchB = (1 to 8).map(i => s"b$i").mkString(" ")   // 1 window
    val leakTrain = "x y " + (1 to 8).map(i => s"e$i").mkString(" ") // leaks window 1
    val cleanTrain = (1 to 10).map(i => s"c$i").mkString(" ")
    val dir = mkDocs(Seq(
      (0L, benchA, "en"), (50L, benchB, "en"),
      (1L, leakTrain, "en"), (2L, cleanTrain, "en")))
    val rows = operators.TextOps.benchmarkOverlap(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_leaked"),
          r.getAs[Long]("leak_bp"))).toMap
    // only benchmark docs appear
    assert(rows.keySet == Set(0L, 50L))
    // exactly one of benchA's 5 windows appears in the train split
    assert(rows(0L) == ((5L, 1L, 2000L)), rows(0L).toString)
    assert(rows(50L) == ((1L, 0L, 0L)), rows(50L).toString)
  }

  test("t30 ngram novelty scores unshared windows, distinct per doc") {
    val unique = (1 to 12).map(i => s"a$i").mkString(" ")   // 5 windows, all own
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")    // 1 window
    val partly = "x y " + shared                            // 3 windows, 1 shared
    val rep = ((1 to 8) ++ (1 to 8)).map(i => s"r$i").mkString(" ")
    val dir = mkDocs(Seq(
      (0L, unique, "en"), (1L, shared, "en"), (2L, partly, "en"),
      (3L, "short", "en"), (4L, rep, "en")))
    val rows = operators.TextOps.ngramNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_bp"))).toMap
    assert(rows(0L) == ((5L, 5L, 10000L)), rows(0L).toString)
    assert(rows(1L) == ((1L, 0L, 0L)), rows(1L).toString)
    assert(rows(2L) == ((3L, 2L, 6666L)), rows(2L).toString)
    // len<n docs emit the zero row, not nothing
    assert(rows(3L) == ((0L, 0L, 0L)), rows(3L).toString)
    // within-doc repetition is NOT penalized: the repeated window
    // counts once (distinct) and stays novel (no other doc has it)
    assert(rows(4L) == ((8L, 8L, 10000L)), rows(4L).toString)
  }

  test("t32 template share is scoped per source") {
    val tpl = (1 to 8).map(i => s"nav$i").mkString(" ")
    val d = Files.createTempDirectory("graft-t32").toString
    Seq(
      (1L, s"$tpl u1a u1b", "srcA"),
      (2L, s"$tpl u2a u2b", "srcA"),
      (3L, s"$tpl u3a u3b", "srcA"),
      (4L, (1 to 8).map(i => s"x$i").mkString(" "), "srcA"),
      // the SAME window in another source is not template there —
      // cross-source repetition is language (t30), not furniture
      (5L, tpl, "srcB"))
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val rows = operators.TextOps.templateShare(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_template"),
          r.getAs[Long]("template_bp")))).toMap
    // srcA docs 1-3: 3 windows each, only the pure nav window recurs
    // in >= 3 srcA docs
    Seq(1L, 2L, 3L).foreach(id =>
      assert(rows(id) == ((3L, 1L, 3333L)), s"$id: ${rows(id)}"))
    assert(rows(4L) == ((1L, 0L, 0L)), rows(4L).toString)
    assert(rows(5L) == ((1L, 0L, 0L)), rows(5L).toString)
  }

  test("t31 zipf profile: histogram-derived min-ranks, shared bands on ties") {
    // freqs: a=4, b=2, c=2, d=1 → ranks: a=1 (band 0), b=c=2 (band 1,
    // shared — min-rank ties), d=4 (band 2)
    val dir = mkDocs(Seq((1L, "A a a", "en"), (2L, "a b b c c d", "en")))
    val rows = operators.TextOps.zipfProfile(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("min_freq"), r.getAs[Long]("max_freq")))).toMap
    assert(rows.keySet == Set(0, 1, 2), rows.toString)
    assert(rows(0) == ((1L, 4L, 4L, 4L)), rows(0).toString) // 'a' (case-folded)
    assert(rows(1) == ((2L, 4L, 2L, 2L)), rows(1).toString) // b, c share band
    assert(rows(2) == ((1L, 1L, 1L, 1L)), rows(2).toString) // d at rank 4
  }

  test("t21 lm surprisal: hand-computed integer floor-log2 bigram units") {
    // corpus bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; contexts a=3, b=2
    // u(a,b) = flog2(3)-flog2(3) = 0; u(b,a) = flog2(2)-flog2(1) = 1
    // u(b,c) = 1
    val dir = mkDocs(Seq(
      (0L, "a b a b", "en"),   // bigrams (a,b),(b,a),(a,b) -> units 1
      (1L, "a b c", "en"),     // bigrams (a,b),(b,c) -> units 1
      (2L, "x", "en")))        // no bigrams
    val rows = operators.TextOps.lmSurprisal(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("surprisal_units"),
          r.getAs[Long]("mean_centibits"))).toMap
    assert(rows(0L) == ((3L, 1L, 33L)), rows(0L).toString)
    assert(rows(1L) == ((2L, 1L, 50L)), rows(1L).toString)
    assert(rows(2L) == ((0L, 0L, 0L)), rows(2L).toString)
  }

  test("t22 DSIR upweights docs that look like the target domain") {
    val d = Files.createTempDirectory("graft-dsir").toString
    val tgtText = (1 to 30).map(i => s"alpha${i % 5}").mkString(" ")
    val rawText = (1 to 30).map(i => s"zulu${i % 5}").mkString(" ")
    val rows =
      (0L until 4L).map(i => (i, tgtText, "src0")) ++     // target slice
      (10L until 14L).map(i => (i, rawText, "src3")) ++   // raw background
      Seq((20L, tgtText, "src5"),   // probe A: target-looking raw doc
          (21L, rawText, "src5"))   // probe B: background-looking raw doc
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val out = operators.TextOps.dsirWeights(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("weight_units"), r.getAs[Boolean]("keep"))).toMap
    // the target-looking probe scores strictly above the background
    // probe, and the importance sign separates them
    assert(out(20L)._1 > out(21L)._1, s"${out(20L)} vs ${out(21L)}")
    assert(out(20L)._2, s"target-looking probe culled: ${out(20L)}")
    assert(!out(21L)._2, s"background probe kept: ${out(21L)}")
  }

  test("t23 classifier score is the exact hashed-weight sum, shuffle-free") {
    def weight(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 10000 % 17 - 8
    }
    val toks = Seq("the", "quick", "brown", "fox", "jumps")
    val dir = mkDocs(Seq((1L, toks.mkString(" "), "en")))
    val df = operators.TextOps.qualityClassifier(spark, dir)
    val r = df.collect().head
    val expected = toks.map(weight).sum
    assert(r.getAs[Int]("n_tokens") == 5)
    assert(r.getAs[Long]("score") == expected, s"score ${r.getAs[Long]("score")} != $expected")
    assert(r.getAs[Boolean]("label") == (expected > 0))
    // the scoring plan is a pure projection: no join, no aggregation
    // exchange anywhere — scan-speed at 100 TB
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate")
      && !plan.contains("SortAggregate"), plan.take(1200))
  }

  test("t13 repetition stats flag boilerplate, pass varied text") {
    val loop = ("spam ham " * 20).trim            // one dominant bigram
    val varied = (1 to 40).map(i => s"w$i").mkString(" ")
    val dir = mkDocs(Seq((1L, loop, "en"), (2L, varied, "en")))
    val rows = operators.TextOps.repetitionStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_bigram_bp"), r.getAs[Long]("dup_trigram_bp"),
          r.getAs[Boolean]("flagged"))).toMap
    // "spam ham" takes ~half the bigram occurrences; every trigram repeats
    assert(rows(1L)._1 >= 5000 && rows(1L)._2 == 10000 && rows(1L)._3)
    // varied text: every bigram unique (top = 1/39 ≈ 256 bp), no
    // repeated trigram — stays unflagged
    assert(rows(2L)._1 < 2000 && rows(2L)._2 == 0L && !rows(2L)._3)
  }

  test("t15 resample flattens the language mix toward sqrt shares") {
    // 1600 en vs 100 de: α=0.5 flattening keeps de fully and
    // downsamples en by sqrt(100/1600) = 1/4
    val dir = mkDocs(
      (0L until 1600L).map(i => (i, s"doc $i", "en")) ++
        (1600L until 1700L).map(i => (i, s"doc $i", "de")))
    val kept = operators.TextOps.mixResample(spark, dir).collect()
    val byLang = kept.groupBy(_.getAs[String]("lang")).map {
      case (l, rs) => l -> rs.length
    }
    assert(byLang("de") == 100) // rarest language: keep_bp = 10000
    // en keep rate ≈ 2500 bp; hash buckets are uniform so the kept
    // count lands near 400 — allow generous noise either side
    assert(byLang("en") > 300 && byLang("en") < 500, byLang)
    // thresholds surface in the output for auditability
    assert(kept.filter(_.getAs[String]("lang") == "en")
      .forall(_.getAs[Long]("keep_bp") == 2500L))
    // replayable: a second run keeps the identical doc set
    val again = operators.TextOps.mixResample(spark, dir).collect()
    assert(kept.map(_.getAs[Long]("doc_id")).toSet ==
      again.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("t16 global shuffle is a balanced deterministic permutation") {
    val dir = mkDocs((0L until 800L).map(i => (i, s"doc $i", "en")))
    val rows = operators.TextOps.globalShuffle(spark, dir).collect()
    // bijection: every doc appears exactly once
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == (0L until 800L).toSet)
    // positions are contiguous 1..n within each shard
    rows.groupBy(_.getAs[Long]("shard_id")).foreach { case (sh, rs) =>
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq ==
        (1 to rs.length).toSeq, s"shard $sh")
      // hash uniformity balances shards (800/8 = 100 expected)
      assert(rs.length > 60 && rs.length < 140, s"shard $sh: ${rs.length}")
    }
    // the order is NOT the input order (it actually shuffles): the
    // first shard's first few docs are not simply 0,1,2,...
    val firstShard = rows.filter(r => r.getAs[Long]("shard_id") == 0L)
      .sortBy(_.getAs[Int]("pos")).take(5).map(_.getAs[Long]("doc_id"))
    assert(firstShard.toSeq != firstShard.sorted.toSeq ||
      firstShard.headOption.exists(_ != 0L))
  }

  test("t14 domain mix weights move actual shares toward the target mix") {
    val dir = mkDocs(
      (0L until 80L).map(i => (i, s"doc $i", "en")) ++      // 80% actual vs 40% target
        (80L until 100L).map(i => (i, s"doc $i", "de")))    // 20% actual vs 15% target
    val rows = operators.TextOps.domainMix(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("weight_bp"))).toMap
    // en: floor(4000 * 100 / 80) = 5000 (downsample to half)
    assert(rows("en") == ((80L, 5000L)))
    // de: floor(1500 * 100 / 20) = 7500
    assert(rows("de") == ((20L, 7500L)))
  }

  test("t26 chunk split: 128-token windows on a 96 stride, 32-token overlap") {
    val dir = mkDocs(Seq(
      (0L, (1 to 200).map(i => s"w$i").mkString(" "), "en"), // 3 chunks
      (1L, (1 to 96).map(i => s"v$i").mkString(" "), "en"),  // exactly 1
      (2L, "a b c", "en")))                                  // 1 short chunk
    val rows = operators.TextOps.chunkSplit(spark, dir).collect()
    val d0 = rows.filter(_.getAs[Long]("doc_id") == 0L)
      .map(r => (r.getAs[Int]("chunk_id"), r.getAs[Long]("start_pos"),
        r.getAs[Long]("n_tokens")))
    // starts 1/97/193: full window, clipped 104, clipped tail 8 —
    // consecutive chunks overlap by 128-96 = 32 tokens
    assert(d0.toSeq == Seq((0, 1L, 128L), (1, 97L, 104L), (2, 193L, 8L)))
    assert(rows.count(_.getAs[Long]("doc_id") == 1L) == 1)
    val d2 = rows.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length == 1 && d2.head.getAs[Long]("n_tokens") == 3L)
    // chunk hashes are the d09-consumable content ids: distinct here
    assert(rows.map(_.getAs[String]("chunk_hash")).distinct.length == rows.length)
  }

  test("t28 source drift: the off-distribution source scores highest") {
    val d = Files.createTempDirectory("graft-t28").toString
    val typical = (1 to 40).map(i => s"tok${i % 12}").mkString(" ")
    val alien = (1 to 40).map(i => s"zz${i % 12}").mkString(" ")
    (Seq.tabulate(9) { i =>
      (i.toLong, typical, "en", s"src${i % 3}", typical.length.toLong)
    } :+ ((9L, alien, "en", "srcX", alien.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val rows = operators.TextOps.sourceDrift(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Long]("mean_centibits")).toMap
    // srcX's vocabulary is disjoint from the corpus bulk — its
    // per-token log-ratio must dominate every conforming source
    assert(Seq("src0", "src1", "src2").forall(s => rows("srcX") > rows(s)),
      rows.toString)
  }

  test("t27 exact sample: exactly min(k, n) rows per stratum, deterministic") {
    val dir = mkDocs(
      (0L until 60L).map(i => (i, s"doc $i", "en")) ++  // 60 > k=25
        (60L until 70L).map(i => (i, s"doc $i", "de"))) // 10 < k
    val rows = operators.TextOps.exactSample(spark, dir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang("en").length == 25 && byLang("de").length == 10)
    // rn is contiguous 1..k and the pick is deterministic across runs
    assert(byLang("en").map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 25))
    val again = operators.TextOps.exactSample(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rn"),
        r.getAs[Long]("doc_id"))).toSet
    assert(again == rows.map(r => (r.getAs[String]("lang"),
      r.getAs[Int]("rn"), r.getAs[Long]("doc_id"))).toSet)
  }

  test("s17 impact index: per-term cap, impact order, exact df") {
    // term 'hot' appears in 25 docs with tf = doc_id (distinct
    // impacts); the cap must keep the 20 HIGHEST-tf docs; 'cold'
    // appears in 2 docs and survives whole
    val dir = mkDocs(
      (1L to 25L).map(i => (i, Seq.fill(i.toInt)("hot").mkString(" "), "en")) ++
        Seq((30L, "cold other", "en"), (31L, "cold", "en")))
    val rows = operators.Similarity.impactIndex(spark, dir).collect()
    val hot = rows.filter(_.getAs[String]("term") == "hot")
      .sortBy(_.getAs[Int]("rn"))
    assert(hot.length == 20)
    assert(hot.forall(_.getAs[Long]("df") == 25L))
    // impact order: tf 25, 24, ..., 6 — doc_ids 25 down to 6
    assert(hot.map(_.getAs[Long]("tf")).toSeq == (25L to 6L by -1L))
    assert(hot.map(_.getAs[Long]("doc_id")).toSeq == (25L to 6L by -1L))
    assert(hot.map(_.getAs[Int]("rn")).toSeq == (1 to 20))
    val cold = rows.filter(_.getAs[String]("term") == "cold")
    assert(cold.length == 2 && cold.forall(_.getAs[Long]("df") == 2L))
    // tf ties rank by doc_id ascending
    assert(cold.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("doc_id")).toSeq
      == Seq(30L, 31L))
  }

  test("c06 mix plan: decision precedence recomputes from each row's own fields") {
    val rows = operators.Curation.mixPlan(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect =
        if (!r.getAs[Boolean]("quality_ok")) "drop_quality"
        else if (r.getAs[Int]("tercile") == 2) "drop_tail"
        else if (r.getAs[Long]("bucket") < r.getAs[Long]("keep_bp")) "keep"
        else "drop_sampled"
      assert(r.getAs[String]("decision") == expect, r.toString)
      assert(r.getAs[Boolean]("kept") == (expect == "keep"), r.toString)
      assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 10000)
      assert(r.getAs[Long]("keep_bp") <= 10000)
    }
    // the plan actually exercises multiple decision paths on real data
    assert(rows.map(_.getAs[String]("decision")).toSet.size >= 2)
    // tercile agrees with the t29 operator (shared body — spot-check)
    val t29 = operators.TextOps.perplexityBuckets(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("tercile")).toMap
    rows.foreach(r =>
      assert(r.getAs[Int]("tercile") == t29(r.getAs[Long]("doc_id"))))
  }

  test("t29 perplexity terciles: value-consistent, monotone, exact rule") {
    val rows = operators.TextOps.perplexityBuckets(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byVal = rows.groupBy(_.getAs[Long]("mean_centibits"))
    // equal scores always share a bucket (the property ntile breaks)
    byVal.foreach { case (v, rs) =>
      assert(rs.map(_.getAs[Int]("tercile")).toSet.size == 1, s"value $v") }
    // bucket name matches the tercile index
    rows.foreach { r =>
      assert(Seq("head", "middle", "tail")(r.getAs[Int]("tercile")) ==
        r.getAs[String]("bucket")) }
    // the exact histogram rule: tercile(v) = floor(3 * c_lt / n),
    // recomputed independently from the output itself
    val n = rows.length
    val vt = byVal.toSeq.sortBy(_._1)
    var cum = 0L
    vt.foreach { case (v, rs) =>
      assert(rs.head.getAs[Int]("tercile") == (3 * cum / n).toInt,
        s"value $v at c_lt=$cum")
      cum += rs.size
    }
    // monotone: higher surprisal can never land in an earlier bucket
    val ts = vt.map(_._2.head.getAs[Int]("tercile"))
    assert(ts == ts.sorted)
    // all three buckets populated on the real corpus (score spread)
    assert(rows.map(_.getAs[Int]("tercile")).toSet == Set(0, 1, 2))
  }

  test("t36 readability: hand-walked FRE milli, clamp, and slice rollup") {
    val dir = mkDocs(Seq(
      // w=5 (trailing '.' rides its token), sents=2, syll groups:
      // he-llo(2) w-o-rld(1) it(1) is(1) g-oo-d(1) = 6
      // fre = 206835 - (1015*5) div 2 - (84600*6) div 5
      //     = 206835 - 2537 - 101520 = 102778 → easy (≥ 60000)
      (1L, "Hello world. It is good.", "en"),
      // vowel-free single token: w=1, sents floored at 1, syll=0
      // fre = 206835 - 1015 - 0 = 205820 → easy
      (2L, "zzz", "en"),
      // 300 words, one sentence run → 206835 - 304500 - … < 0 → clamp 0
      (3L, (1 to 300).map(_ => "bla").mkString(" ") + "!", "de")))
    val perDoc = operators.TextOps.readabilityFrame(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_sents"),
          r.getAs[Long]("n_syll"), r.getAs[Long]("fre_milli")))).toMap
    assert(perDoc(1L) == ((5L, 2L, 6L, 102778L)), perDoc(1L).toString)
    assert(perDoc(2L) == ((1L, 1L, 0L, 205820L)), perDoc(2L).toString)
    assert(perDoc(3L)._4 == 0L, perDoc(3L).toString) // clamped
    val out = operators.TextOps.readability(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("mean_fre_milli"),
          r.getAs[Long]("easy_share_bp")))).toMap
    // en slice: mean = (102778 + 205820) div 2, both docs easy
    assert(out(("en", "s")) == ((2L, 154299L, 10000L)), out.toString)
    assert(out(("de", "s")) == ((1L, 0L, 0L)), out.toString)
  }

  test("t37 lang confusion: hand-walked matrix cells and row shares") {
    val dir = mkDocs(Seq(
      (1L, "a cat and a dog of note", "en"),       // en → en
      (2L, "der hund und die katze nicht", "en"),  // en → de (mislabel)
      (3L, "xyzzy qwerty", "de"),                  // de → und (no markers)
      (4L, "el que la los por", "es")))            // es → es
    val out = operators.TextOps.langConfusionOf(
        Tables.documents(spark, dir).select("lang", "text"))
      .collect()
      .map(r => (r.getAs[String]("labeled_lang"),
        r.getAs[String]("predicted_lang")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("row_share_bp")))).toMap
    assert(out.size == 4, out.toString)
    // the en label row splits 50/50 between the true cell and the
    // planted mislabel ('hund' must NOT match \bund\b — boundary)
    assert(out(("en", "en")) == ((1L, 5000L)), out.toString)
    assert(out(("en", "de")) == ((1L, 5000L)), out.toString)
    assert(out(("de", "und")) == ((1L, 10000L)), out.toString)
    assert(out(("es", "es")) == ((1L, 10000L)), out.toString)
  }

  test("t37 gate: every labeled language's modal DETECTED prediction is diagonal") {
    // the r11 verdict's criterion, on the real sf corpus + plants:
    // real docs abstain ('und' — the corpus carries no language
    // signal by construction), the 8 correct plants per language
    // dominate its detected row, the 1 mislabeled plant populates
    // exactly one off-diagonal cell
    val rows = operators.TextOps.langConfusion(spark, sf0001).collect()
      .map(r => (r.getAs[String]("labeled_lang"),
        r.getAs[String]("predicted_lang")) -> r.getAs[Long]("n_docs"))
    val langs = graft.functions.Text.markers.map(_._1)
    for (l <- langs) {
      val detected = rows.filter { case ((ll, p), _) =>
        ll == l && p != "und" }
      assert(detected.nonEmpty, s"$l: no detected cell")
      val modal = detected.maxBy(_._2)._1._2
      assert(modal == l, s"$l: modal detected prediction $modal")
      // the planted mislabel lands exactly one off-diagonal doc
      assert(detected.filter(_._1._2 != l).map(_._2).sum == 1L, s"$l")
    }
    // abstention regime present: every label also carries 'und' mass
    for (l <- langs)
      assert(rows.exists { case ((ll, p), _) => ll == l && p == "und" }, l)
  }

  test("t38 vocab growth: re-derived from raw text over the md5 buckets") {
    def bucketOf(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t38$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % 10
    }
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val byBucket = docs.groupBy(d => bucketOf(d._1))
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      val b = bucketOf(id)
      val t = text.trim.split("\\s+")
      t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).foreach { g =>
        firstSeen.get(g) match {
          case Some(prev) if prev <= b => ()
          case _ => firstSeen(g) = b
        }
      }
    }
    val expNew = firstSeen.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val out = operators.TextOps.vocabGrowth(spark, sf0001).collect()
    assert(out.length == byBucket.size)
    var cumDocs = 0L; var cumVocab = 0L
    out.sortBy(_.getAs[Long]("bucket")).foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("n_docs") == byBucket(b).length.toLong, s"b$b docs")
      assert(r.getAs[Long]("new_shingles") == expNew.getOrElse(b, 0L),
        s"b$b new")
      cumDocs += r.getAs[Long]("n_docs"); cumVocab += r.getAs[Long]("new_shingles")
      assert(r.getAs[Long]("cum_docs") == cumDocs)
      assert(r.getAs[Long]("cum_vocab") == cumVocab)
      assert(r.getAs[Long]("vocab_per_doc_milli") == cumVocab * 1000 / cumDocs)
    }
    // the curve actually bends: later buckets discover less than the
    // first (Heaps saturation is visible even at sf0.001 — measured)
    val marg = out.sortBy(_.getAs[Long]("bucket"))
      .map(_.getAs[Long]("new_shingles"))
    assert(marg.head > marg.last, marg.mkString(","))
  }
}
