package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** c05 data-quality suite: each check is violated by exactly one
  * planted defect on a 10-row orders table, so every metric value is
  * hand-computable and every verdict flips for a known reason.
  */
class DqSuiteSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dq").toString
    // 10 rows; defects: one duplicate key (1), one null custkey (row 9),
    // one orphan custkey 99 (row 10), one bad status (row 5), one
    // negative price (row 6)
    val orders = Seq(
      (1L, Option(1L), "O", 10.0),
      (1L, Option(2L), "F", 20.0), // duplicate o_orderkey
      (3L, Option(3L), "P", 30.0),
      (4L, Option(4L), "O", 40.0),
      (5L, Option(5L), "X", 50.0), // bad status
      (6L, Option(6L), "F", -5.0), // out-of-range price
      (7L, Option(7L), "O", 70.0),
      (8L, Option(8L), "F", 80.0),
      (9L, None, "O", 90.0),       // null custkey (also an RI orphan)
      (10L, Option(99L), "F", 99.0)) // orphan custkey
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/orders.parquet")
    (1L to 8L).map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/customer.parquet")
    d
  }

  test("c05: every planted defect surfaces in its check's metric") {
    val out = operators.Curation.dqSuite(spark, dir).collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("metric_bp"), r.getAs[Boolean]("passed")))).toMap
    assert(out.size == 6)
    assert(out("row_count") == ((10L, true)))
    assert(out("completeness_custkey") == ((9000L, false)))
    assert(out("uniqueness_orderkey") == ((9000L, false)))
    assert(out("accepted_status") == ((9000L, false)))
    assert(out("price_in_range") == ((9000L, false)))
    // orphans: the null custkey and custkey 99 → (10-2)/10
    assert(out("ref_integrity_customer") == ((8000L, false)))
  }

  test("c05 passes wholesale on the clean generated testdata") {
    val out = operators.Curation.dqSuite(spark, sf0001).collect()
    assert(out.length == 6)
    assert(out.forall(_.getAs[Boolean]("passed")),
      out.map(r => r.getAs[String]("check_name") + "=" +
        r.getAs[Long]("metric_bp")).mkString(", "))
  }

  test("r31 reconciliation: every class lands where its delta says") {
    val d = Files.createTempDirectory("graft-r31").toString
    val t0 = new java.sql.Timestamp(1704067200000L)
    Seq(
      (1L, Option(1L), "O", 10.00),  // lines sum exactly -> match
      (2L, Option(2L), "O", 10.50),  // 50c off -> rounding
      (3L, Option(3L), "O", 100.00), // wildly off -> mismatch
      (4L, Option(4L), "O", 25.00))  // no lines -> no_lines
      .map { case (k, c, st, p) => (k, c, st, p, t0, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/orders.parquet")
    Seq(
      (1L, 4.00, 0.0, 0.0), (1L, 6.00, 0.0, 0.0),
      (2L, 10.00, 0.0, 0.0),
      // 20.00 * 0.9 * 1.1 = 19.80 -> 1980 cents vs stored 10000
      (3L, 20.00, 0.1, 0.1))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/lineitem.parquet")
    val out = operators.Relational.reconciliation(spark, d).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("abs_delta_cents"),
          r.getAs[Long]("max_abs_delta")))).toMap
    assert(out.keySet == Set("match", "rounding", "mismatch", "no_lines"),
      out.keySet.toString)
    assert(out("match") == ((1L, 0L, 0L)), out("match").toString)
    assert(out("rounding") == ((1L, 50L, 50L)), out("rounding").toString)
    assert(out("mismatch") == ((1L, 8020L, 8020L)), out("mismatch").toString)
    // a line-less order's WHOLE stored amount is unexplained
    assert(out("no_lines") == ((1L, 2500L, 2500L)), out("no_lines").toString)
  }

  test("c07 cascade: stage chain is consistent and anchored at the train split") {
    val rows = operators.Curation.cascadeReport(spark, sf0001).collect()
      .sortBy(_.getAs[Int]("ord"))
    assert(rows.map(_.getAs[Int]("ord")).toSeq == (0 to 4))
    assert(rows.map(_.getAs[String]("stage")).toSeq == Seq(
      "ingest", "quality_gate", "exact_dedup", "decontaminate", "tail_cull"))
    // stage k+1 starts exactly where stage k ended
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_kept"),
        s"${b.getAs[String]("stage")} n_in != prior n_kept")
    }
    // the universe is the training split
    val nTrain = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter("doc_id % 50 <> 0").count()
    assert(rows(0).getAs[Long]("n_in") == nTrain)
    rows.foreach { r =>
      val (in, kept, dropped) = (r.getAs[Long]("n_in"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))
      assert(kept <= in && dropped == in - kept, r.toString)
      assert(r.getAs[Long]("drop_bp") == dropped * 10000 / math.max(in, 1L))
    }
    // every stage actually cuts something on the real corpus except
    // possibly dedup (synthetic docs are near-unique)
    assert(rows(1).getAs[Long]("n_dropped") > 0)
    assert(rows(4).getAs[Long]("n_kept") > 0)
  }

  test("c09 token budget: cap arithmetic holds and all three regimes appear") {
    val rows = operators.Curation.tokenBudgetPlan(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalAvail = rows.map(_.getAs[Long]("avail_tokens")).sum
    val budget = 3L * totalAvail
    val sw = rows.map(r =>
      r.getAs[Long]("avail_tokens") * r.getAs[Long]("weight")).sum
    rows.foreach { r =>
      val (a, w) = (r.getAs[Long]("avail_tokens"), r.getAs[Long]("weight"))
      val (tgt, srv) = (r.getAs[Long]("target_tokens"),
        r.getAs[Long]("served_tokens"))
      assert(w >= 1 && w <= 16, r.toString)
      // the budget split is exact integer floor division
      assert(tgt == budget * (a * w) / sw, r.toString)
      assert(srv == math.min(tgt, 4 * a), r.toString)
      assert(r.getAs[Long]("epochs_bp") == srv * 10000 / math.max(a, 1L))
      assert(r.getAs[Long]("shortfall_bp") ==
        (tgt - srv) * 10000 / math.max(tgt, 1L))
      assert(r.getAs[Boolean]("capped") == (tgt > srv), r.toString)
      assert(r.getAs[Long]("epochs_bp") <= 40000L, r.toString)
    }
    // floor division can only under-spend the budget
    assert(rows.map(_.getAs[Long]("target_tokens")).sum <= budget)
    // the md5 policy weights spread the corpus across every regime
    // the operator must price: capped at 4 epochs, 1-4 epochs, <1
    assert(rows.exists(_.getAs[Boolean]("capped")))
    assert(rows.exists(r => !r.getAs[Boolean]("capped") &&
      r.getAs[Long]("epochs_bp") >= 10000L))
    assert(rows.exists(_.getAs[Long]("epochs_bp") < 10000L))
  }

  test("c10 curriculum: stages are t29 terciles, within-shard order replays the salted hash") {
    val out = operators.Curation.curriculum(spark, sf0001).collect()
    val t29 = operators.TextOps.perplexityBuckets(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("tercile")).toMap
    // a permutation of the corpus, staged exactly as t29 buckets it
    assert(out.length == t29.size)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    out.foreach(r =>
      assert(r.getAs[Int]("stage") == t29(r.getAs[Long]("doc_id")), r.toString))
    assert(out.map(_.getAs[Int]("stage")).distinct.sorted.toSeq == Seq(0, 1, 2))
    // positions are contiguous 1..n per (stage, shard)
    out.groupBy(r => (r.getAs[Int]("stage"), r.getAs[Long]("shard_id")))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rs.length))
      }
    // one shard's within-stage order replays the salted md5 key
    def key(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"curr$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val (st, sh) = (out.head.getAs[Int]("stage"), out.head.getAs[Long]("shard_id"))
    val grp = out.filter(r =>
      r.getAs[Int]("stage") == st && r.getAs[Long]("shard_id") == sh)
    val got = grp.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("doc_id")).toSeq
    assert(got == got.sortBy(id => (key(id), id)), s"stage=$st shard=$sh")
  }

  /** Independent Scala re-derivation of every c11 LF vote from the
    * raw text — the whole sf0.001 corpus, row for row.
    */
  test("c11: LF votes re-derive from raw text; all vote classes live") {
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def lfs(text: String): (Int, Int, Int, Int) = {
      val toks = text.trim.split("\\s+").toSeq
      val n = toks.length
      val nd = toks.distinct.length
      val nstop = toks.count(t => t == "the" || t == "a")
      val lfLen = if (n >= 55) 1 else if (n < 20) -1 else 0
      val lfStop = if (nstop * 100 >= n * 16) -1 else if (nstop == 0) 0 else 1
      val lfRep = if (nd * 100 >= n * 40) 1 else if (nd * 100 < n * 32) -1 else 0
      val lfKw = if (toks.contains("slow")) -1
        else if (toks.contains("spark")) 1 else 0
      (lfLen, lfStop, lfRep, lfKw)
    }
    val out = operators.Curation.weakLabels(spark, sf0001).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val exp = lfs(texts(id))
      val got = (r.getAs[Int]("lf_len"), r.getAs[Int]("lf_stop"),
        r.getAs[Int]("lf_rep"), r.getAs[Int]("lf_kw"))
      assert(got == exp, s"doc $id: got $got expected $exp")
      val vote = exp._1 + exp._2 + exp._3 + exp._4
      assert(r.getAs[Int]("vote") == vote)
      val lbl = if (vote > 0) "keep" else if (vote < 0) "drop" else "abstain"
      assert(r.getAs[String]("label") == lbl)
    }
    val byLabel = out.groupBy(_.getAs[String]("label")).view.mapValues(_.length)
    assert(byLabel.keySet == Set("keep", "drop", "abstain"),
      byLabel.toMap.toString) // all three classes populated (measured)
  }

  test("c12: LF report re-aggregates c11's vote table exactly") {
    val votes = operators.Curation.weakLabels(spark, sf0001).collect()
    val n = votes.length.toLong
    val cols = Seq("lf_len", "lf_stop", "lf_rep", "lf_kw")
    val exp = cols.map { c =>
      val vs = votes.map(r => (r.getAs[Int](c), r.getAs[Int]("vote")))
      val active = vs.count(_._1 != 0).toLong
      val agree = vs.count { case (v, t) =>
        (v == 1 && t > 0) || (v == -1 && t < 0) }.toLong
      val conflict = vs.count { case (v, t) =>
        (v == 1 && t < 0) || (v == -1 && t > 0) }.toLong
      c -> ((active, active * 10000 / n, agree * 10000 / n,
        conflict * 10000 / n))
    }.toMap
    val out = operators.Curation.lfReport(spark, sf0001).collect()
      .map(r => r.getAs[String]("lf") ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("coverage_bp"),
          r.getAs[Long]("agree_bp"), r.getAs[Long]("conflict_bp")))).toMap
    assert(out == exp, s"got $out expected $exp")
    // every LF fires somewhere, none is unanimous noise
    out.values.foreach { case (active, cov, _, _) =>
      assert(active > 0L && cov > 0L)
    }
  }

  test("c13: pairwise LF correlation re-aggregates c11's votes exactly") {
    val votes = operators.Curation.weakLabels(spark, sf0001).collect()
    val n = votes.length.toLong
    val cols = Seq("lf_kw", "lf_len", "lf_rep", "lf_stop")
    val exp = (for {
      a <- cols; b <- cols if a < b
    } yield {
      val vs = votes.map(r => (r.getAs[Int](a), r.getAs[Int](b)))
      val overlap = vs.count { case (va, vb) => va != 0 && vb != 0 }.toLong
      val agree = vs.count { case (va, vb) => va != 0 && va == vb }.toLong
      val conflict = vs.count { case (va, vb) => va * vb < 0 }.toLong
      (a, b) -> ((overlap, overlap * 10000 / n, agree * 10000 / n,
        conflict * 10000 / n))
    }).toMap
    val out = operators.Curation.lfCorrelation(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lf_a"), r.getAs[String]("lf_b")) ->
        ((r.getAs[Long]("n_overlap"), r.getAs[Long]("overlap_bp"),
          r.getAs[Long]("agree_bp"), r.getAs[Long]("conflict_bp")))).toMap
    assert(out == exp, s"got $out expected $exp")
    assert(out.size == 6) // all unordered pairs of the 4 LFs
    // the matrix is informative: some pair overlaps, some pair
    // disagrees somewhere (measured at every SF)
    assert(out.values.exists(_._1 > 0L))
    assert(out.values.exists(_._4 > 0L))
  }
}
