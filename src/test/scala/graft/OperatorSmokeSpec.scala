package graft

/** Every driver-contract query runs at sf0.001 and yields a sane
  * result; plan-shape assertions confirm the scale-critical choices
  * (broadcast joins, parquet filter pushdown) actually materialize.
  */
class OperatorSmokeSpec extends SparkSpecBase {

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf0001)
      val n = df.count()
      // near-dup/threshold queries may legitimately be empty at tiny SF
      val mayBeEmpty = Set("d05_embedding_dup", "d04_ngram_jaccard",
        "d02_minhash_lsh", "d03_simhash")
      assert(n > 0 || mayBeEmpty(name), s"$name returned no rows")
    }
  }

  test("entry() returns rows for the driver smoke check") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("r37 sketch overlap tracks the exact per-pair intersections") {
    import org.apache.spark.sql.functions.col
    // exact truth per type pair from the raw events
    val tu = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byT = tu.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val rows = operators.Relational.sketchOverlap(spark, sf0001).collect()
    val types = byT.keySet.toSeq.sorted
    assert(rows.length == types.size * (types.size - 1) / 2, rows.length)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val exact = (byT(a) & byT(b)).size.toLong
      val est = r.getAs[Long]("est_overlap")
      // sketches below saturation are EXACT counts; at sf0.001 user
      // cardinalities sit under k=1024, so overlap must be exact too
      if (byT(a).size < 1024 && byT(b).size < 1024 &&
          (byT(a) ++ byT(b)).size < 1024)
        assert(est == exact, s"$a/$b: $est vs exact $exact")
      else assert(math.abs(est - exact).toDouble /
        math.max(exact, 1L) <= 0.15, s"$a/$b: $est vs $exact")
      assert(r.getAs[Long]("est_union") >=
        math.max(r.getAs[Long]("est_a"), r.getAs[Long]("est_b")))
    }
  }

  test("approx sketches land within 5% of the exact (r13) answers") {
    val approx = operators.Relational.approxStats(spark, sf0001).collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        ((r.getAs[Long]("approx_customers"),
          r.getAs[Long]("approx_median_cents"))))
      .toMap
    val exact = operators.Relational.exactStats(spark, sf0001).collect()
    assert(exact.nonEmpty && approx.size == exact.length)
    exact.foreach { r =>
      val (ac, am) = approx(r.getAs[String]("o_orderstatus"))
      val ec = r.getAs[Long]("exact_customers")
      val em = r.getAs[Double]("exact_median") * 100 // cents
      assert(math.abs(ac - ec).toDouble / ec <= 0.05, s"KMV off: $ac vs $ec")
      assert(math.abs(am - em) / em <= 0.05, s"histogram off: $am vs $em")
    }
  }

  test("r16 SCD2: changed keys close + reopen, removed close, added open") {
    val rows = operators.Relational.scd2Merge(spark, sf0001).collect()
    val byKey = rows.groupBy(_.getAs[Long]("key"))
    // %31 changed keys: a closed historical row AND a current row
    val changed = byKey.filter { case (k, rs) => k % 31 == 0 && k % 97 != 0 &&
      k < 10000000L }
    assert(changed.nonEmpty)
    changed.foreach { case (k, rs) =>
      assert(rs.length == 2, s"key $k: ${rs.length} rows")
      val closed = rs.find(!_.getAs[Boolean]("is_current")).get
      val cur = rs.find(_.getAs[Boolean]("is_current")).get
      assert(closed.getAs[java.sql.Date]("valid_to").toString == "2026-08-12")
      assert(cur.getAs[java.sql.Date]("valid_from").toString == "2026-08-12")
      assert(cur.isNullAt(cur.fieldIndex("valid_to")))
      assert(cur.getAs[Long]("value_cents") ==
        closed.getAs[Long]("value_cents") + 1)
    }
    // removed keys (%97): closed row only; inserted keys: current only
    byKey.filter(_._1 % 97 == 0).foreach { case (k, rs) =>
      assert(rs.length == 1 && !rs.head.getAs[Boolean]("is_current"), s"$k")
    }
    byKey.filter(_._1 >= 10000000L).foreach { case (k, rs) =>
      assert(rs.length == 1 && rs.head.getAs[Boolean]("is_current"), s"$k")
    }
    // unchanged keys stay a single current row with original window
    assert(byKey.exists { case (k, rs) => k % 31 != 0 && k % 97 != 0 &&
      k < 10000000L && rs.length == 1 && rs.head.getAs[Boolean]("is_current") })
  }

  test("m06 interleave: slots are contiguous per modality batch") {
    val rows = operators.Multimodal.modalityInterleave(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[String]("kind"), r.getAs[Long]("batch_id")))
      .foreach { case ((kind, b), rs) =>
        val slots = rs.map(_.getAs[Int]("slot")).sorted
        assert(slots.toSeq == (0 until rs.length).toSeq, s"$kind/$b")
        assert(rs.length <= 8)
      }
  }

  test("every query has oracle SQL or is a documented rows-only op") {
    // r11: the rows-only set is EMPTY — r12's engine sketches were
    // replaced by deterministic KMV/histogram sketches both engines
    // replay, so every one of the 140 queries is hash-gated
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("r02 plan broadcasts both dims and pushes the filter to parquet") {
    val plan = operators.Relational.enrichJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"),
      "filter not pushed to parquet scan")
  }

  test("q33 plan broadcasts the supplier dim") {
    val plan = operators.InvoiceAnalytics.topSuppliers(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("r01 scan prunes columns (no full-width lineitem read)") {
    val plan = operators.Relational.pricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  test("s01 plan keeps the query side broadcast (no corpus shuffle join)") {
    val plan = operators.Similarity.annBruteForce(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("d06 candidate generation is an equi-join (no nested-loop cartesian)") {
    val plan = operators.Dedup.fuzzyMatch(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("d05 candidate generation is an equi-join (no nested-loop cartesian)") {
    val plan = operators.Dedup.embeddingDup(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("s04 hybrid search: every join is key-equality, rerank is TopKPerKey") {
    val plan = operators.Similarity.hybridSearch(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("TopKPerKey"), plan.take(2000))
  }

  test("c01 curation fuses into one plan with a bounded shuffle count") {
    val plan = operators.Curation.curate(spark, sf0001)
      .queryExecution.executedPlan.toString
    // one dedup aggregation exchange + its join + the pack window +
    // the deterministic output sort — anything beyond ~5 exchanges
    // means a stage stopped fusing
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 5, s"curation plan shuffles $exchanges times:\n" +
      plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("r17 bin-join range join equals the naive inequality join") {
    import org.apache.spark.sql.functions._
    val got = operators.Relational.rangeJoinEvents(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("interval_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_follow"), r.getAs[Long]("follow_cents"))).toSet
    // reference: the textbook inequality join (fine at sf0.001; the
    // operator exists precisely because this shape dies at scale)
    val ev = Tables.events(spark, sf0001)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("interval_id"), col("user_id").as("i_uid"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 60 MINUTES")).as("end_ts"))
    val probe = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("ts"), col("value"))
    val naive = probe.join(err, probe("user_id") === err("i_uid") &&
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .groupBy(col("interval_id"), col("i_uid"))
      .agg(count(lit(1)).as("n_follow"),
        sum(floor(col("value") * 100)).cast("long").as("follow_cents"))
      .collect()
      .map(r => (r.getAs[Long]("interval_id"), r.getAs[Long]("i_uid"),
        r.getAs[Long]("n_follow"), r.getAs[Long]("follow_cents"))).toSet
    assert(got.nonEmpty && got == naive)
  }

  test("r17 plan is an equi-join on (user, bin) — no cartesian/BNLJ") {
    val plan = operators.Relational.rangeJoinEvents(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("r18 profile: counts are exact and the plan is one scan") {
    val rows = operators.Relational.profileTable(spark, sf0001).collect()
    assert(rows.length == 6)
    val n = Tables.orders(spark, sf0001).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L) // orders has no nulls
      assert(r.getAs[Long]("n_distinct") <= n)
    }
    val byCol = rows.map(r =>
      r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(byCol("o_orderkey") == n) // primary key
    assert(byCol("o_orderstatus") <= 3)
    val plan = operators.Relational.profileTable(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"profile should read orders once:\n${plan.take(2000)}")
  }

  test("t10/t11 plans are single-scan (no join, no extra shuffle)") {
    val packPlan = operators.TextOps.sequencePack(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!packPlan.contains("Join"), packPlan.take(1500))
    val samplePlan = operators.TextOps.stratifiedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!samplePlan.contains("Join") && !samplePlan.contains("Window"),
      samplePlan.take(1500))
    // the sample filter runs at scan level: one stage, no aggregation
    assert(!samplePlan.contains("HashAggregate"), samplePlan.take(1500))
  }
}
