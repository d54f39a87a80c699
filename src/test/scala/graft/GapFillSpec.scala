package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** r27 gap-fill: hand-walked dense-timeline semantics — zero-activity
  * hours materialize with n_events = 0, the forward fill carries the
  * LAST observed hourly spend (not a sum), per-event floor-cents
  * before any aggregation, and the grid is bounded by each user's own
  * [first, last] hour (no leading/trailing extrapolation).
  */
class GapFillSpec extends SparkSpecBase {
  import spark.implicits._

  private val baseNs = 1704067200L * 1000000000L // 2024-01-01 00:00 UTC
  private val h0 = 1704067200L / 3600L           // its epoch-hour id
  private def tsNs(min: Long): Long = baseNs + min * 60L * 1000000000L

  private def mkEvents(rows: Seq[(Long, Long, Double)]): String = {
    val d = Files.createTempDirectory("graft-gapfill").toString
    rows.zipWithIndex.map { case ((uid, m, v), i) =>
      (i.toLong, tsNs(m), uid, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    d
  }

  test("r27 gap-fill: dense grid, zero hours, forward-filled cents") {
    val dir = mkEvents(Seq(
      // u1: hours 0, 1, 1, 4 — hours 2 and 3 are gaps
      (1L, 10L, 1.25),   // hour 0 → 125 cents
      (1L, 70L, 2.50),   // hour 1 → 250
      (1L, 75L, 0.999),  // hour 1 → floor(99.9) = 99
      (1L, 250L, 3.00),  // hour 4 → 300
      // u2: a single event — a one-row timeline, no gaps
      (2L, 130L, 0.01))) // hour 2 → 1 cent
    val out = operators.Relational.gapFill(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("hour_id")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("filled_cents")))).toMap
    assert(out.size == 6, out.keySet.toString) // u1 hours 0..4 + u2 hour 2
    assert(out((1L, h0 + 0)) == ((1L, 125L)))
    assert(out((1L, h0 + 1)) == ((2L, 349L))) // 250 + 99, per-row floors
    assert(out((1L, h0 + 2)) == ((0L, 349L))) // gap: carried forward
    assert(out((1L, h0 + 3)) == ((0L, 349L)))
    assert(out((1L, h0 + 4)) == ((1L, 300L))) // new observation replaces
    assert(out((2L, h0 + 2)) == ((1L, 1L)))
  }

  test("r27 emits nothing for an empty events table") {
    val dir = mkEvents(Seq.empty)
    assert(operators.Relational.gapFill(spark, dir).count() == 0L)
  }

  test("r28 spend deciles: contiguous ordered bands, population adds up") {
    val rows = operators.Relational.spendDeciles(spark, sf0001).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (0 to 9),
      rows.map(_.getAs[Int]("decile")).mkString(","))
    // band ranges are disjoint and ordered across deciles
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_band") < b.getAs[Long]("min_band"),
        s"${a.getAs[Int]("decile")} overlaps ${b.getAs[Int]("decile")}")
    }
    // every customer lands in exactly one decile
    val nCust = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    // populations are ~n/10 to within the stated banding resolution
    val n = nCust.toDouble
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("n_customers") - n / 10) <= n / 5,
        s"decile ${r.getAs[Int]("decile")}: ${r.getAs[Long]("n_customers")}")
    }
  }

  test("r30 concurrency: sessions counted in every hour they span") {
    val dir = mkEvents(Seq(
      (1L, 10L, 0.0), (1L, 20L, 0.0),  // u1 session A: hour 0 only
      (1L, 190L, 0.0),                 // u1 session B: hour 3 (gap > 30min)
      (2L, 50L, 0.0), (2L, 80L, 0.0),  // u2: 30min gap = SAME session,
                                        // spans hours 0 and 1
      (3L, 0L, 0.0), (3L, 40L, 0.0))) // u3: two sessions, both hour 0
    val out = operators.Relational.concurrency(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_users")))).toMap
    assert(out.keySet == Set(h0, h0 + 1, h0 + 3), out.keySet.toString)
    // hour 0: u1-A, u2, and BOTH u3 sessions → 4 sessions, 3 users
    assert(out(h0) == ((4L, 3L)), out(h0).toString)
    // hour 1: u2's session is active though its only events are at
    // its edges — the span overlap the raw event table can't count
    assert(out(h0 + 1) == ((1L, 1L)), out(h0 + 1).toString)
    assert(out(h0 + 3) == ((1L, 1L)), out(h0 + 3).toString)
  }

  test("r29 transition matrix: hand-walked per-user pairs, bp shares") {
    // u1: view->click->purchase; u2: view->error, plus a same-ts tie
    // broken by event_id (view[id4] before error[id5])
    val d = Files.createTempDirectory("graft-trans").toString
    Seq(
      (0L, tsNs(0), 1L, "view", 0.0, "{}"),
      (1L, tsNs(1), 1L, "click", 0.0, "{}"),
      (2L, tsNs(2), 1L, "purchase", 0.0, "{}"),
      (4L, tsNs(5), 2L, "view", 0.0, "{}"),
      (5L, tsNs(5), 2L, "error", 0.0, "{}"), // same ts as id4
      (6L, tsNs(9), 3L, "view", 0.0, "{}")) // singleton: no pair
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    val out = operators.Relational.transitionMatrix(spark, d).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("prob_bp")))).toMap
    assert(out.size == 3, out.keySet.toString)
    // view has two outgoing transitions: ->click and ->error, 50/50
    assert(out(("view", "click")) == ((1L, 5000L)))
    assert(out(("view", "error")) == ((1L, 5000L)))
    assert(out(("click", "purchase")) == ((1L, 10000L)))
  }

  test("r32 interval union: overlap merges, containment adds nothing, " +
      "touching intervals coalesce, zero-duration clamps to 1s") {
    val dir = mkEvents(Seq(
      // u1: [0,90) ∪ [60,90) ∪ [0,10) → one island of 90 s;
      //     [120,125) → a second island of 5 s
      (1L, 0L, 90.0),   // [0, 90)
      (1L, 0L, 10.0),   // [0, 10) — wholly contained, adds nothing
      (1L, 1L, 30.0),   // [60, 90) — overlaps, extends nothing
      (1L, 2L, 5.9),    // [120, 125) — floor(5.9) = 5; gap → new island
      // u2: sub-second value clamps to a 1-second hold
      (2L, 0L, 0.4),
      // u3: [0,60) then [60,90) — touching merges (start == prev end)
      (3L, 0L, 60.0),
      (3L, 1L, 30.0)))
    val out = operators.Relational.intervalUnion(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_islands"),
          r.getAs[Long]("covered_s"), r.getAs[Long]("longest_s")))).toMap
    assert(out.size == 3, out.keySet.toString)
    assert(out(1L) == ((4L, 2L, 95L, 90L)), out(1L).toString)
    assert(out(2L) == ((1L, 1L, 1L, 1L)), out(2L).toString)
    assert(out(3L) == ((2L, 1L, 90L, 90L)), out(3L).toString)
  }

  test("r32 vs r30's shape: islands never exceed events, coverage " +
      "bounded by span, every sf0.001 user present exactly once") {
    val rows = operators.Relational.intervalUnion(spark, sf0001).collect()
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_islands") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("longest_s") <= r.getAs[Long]("covered_s"))
      assert(r.getAs[Long]("covered_s") >= r.getAs[Long]("n_islands"))
    }
  }

  test("r33 experiment readout: hand-walked daily rollup, md5 variants, " +
      "floor-cents revenue and cumulative curve") {
    // md5('exp1'||uid) % 2 assignment (replayed offline): u1, u3 →
    // control; u2, u4 → treatment
    val d = Files.createTempDirectory("graft-r33").toString
    val day2 = 24L * 60L // minute offset of day 2
    Seq(
      (0L, tsNs(0), 1L, "purchase", 1.999, "{}"),    // ctl d1: 199 cents
      (1L, tsNs(5), 1L, "view", 9.99, "{}"),         // ctl d1: not revenue
      (2L, tsNs(10), 3L, "purchase", 0.011, "{}"),   // ctl d1: 1 cent
      (3L, tsNs(day2), 1L, "purchase", 2.00, "{}"),  // ctl d2: 200
      (4L, tsNs(1), 2L, "purchase", 5.555, "{}"),    // trt d1: 555
      (5L, tsNs(2), 4L, "click", 3.0, "{}"),         // trt d1: not revenue
      (6L, tsNs(day2 + 1), 2L, "view", 1.0, "{}"))   // trt d2: 0 revenue
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    val out = operators.Relational.experimentReadout(spark, d).collect()
      .map(r => (r.getAs[String]("variant"),
        r.getAs[java.sql.Date]("day").toString) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"),
          r.getAs[Long]("cum_revenue_cents")))).toMap
    assert(out.size == 4, out.keySet.toString)
    assert(out(("control", "2024-01-01")) == ((2L, 3L, 2L, 200L, 200L)),
      out.toString)
    assert(out(("control", "2024-01-02")) == ((1L, 1L, 1L, 200L, 400L)),
      out.toString)
    assert(out(("treatment", "2024-01-01")) == ((2L, 2L, 1L, 555L, 555L)),
      out.toString)
    // a zero-revenue day still rides the cumulative curve
    assert(out(("treatment", "2024-01-02")) == ((1L, 1L, 0L, 0L, 555L)),
      out.toString)
  }

  test("r34 volume anomaly: hand-walked rates, spike ratio and staleness") {
    val d = Files.createTempDirectory("graft-r34").toString
    val day = 24L * 60L
    // type A: days 1..3 with 2/1/3 events (frontier day 3, spike on
    // the last day); type B: day 1 only with 4 events → 2 days stale
    Seq(
      (0L, tsNs(0), 1L, "A", 1.0, "{}"), (1L, tsNs(5), 2L, "A", 1.0, "{}"),
      (2L, tsNs(day), 1L, "A", 1.0, "{}"),
      (3L, tsNs(2 * day), 1L, "A", 1.0, "{}"),
      (4L, tsNs(2 * day + 1), 2L, "A", 1.0, "{}"),
      (5L, tsNs(2 * day + 2), 3L, "A", 1.0, "{}"),
      (6L, tsNs(1), 1L, "B", 1.0, "{}"), (7L, tsNs(2), 2L, "B", 1.0, "{}"),
      (8L, tsNs(3), 3L, "B", 1.0, "{}"), (9L, tsNs(4), 4L, "B", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    val out = operators.Relational.volumeAnomaly(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
          r.getAs[Long]("mean_daily"), r.getAs[Long]("last_day_events"),
          r.getAs[Long]("last_vs_mean_bp"), r.getAs[Long]("stale_days"))))
      .toMap
    assert(out.size == 2, out.toString)
    // A: mean = 6 div 3 = 2, last day 3 events → 15000 bp, fresh
    assert(out("A") == ((3L, 6L, 2L, 3L, 15000L, 0L)), out.toString)
    // B: one active day, flat ratio, 2 days behind the frontier
    assert(out("B") == ((1L, 4L, 4L, 4L, 10000L, 2L)), out.toString)
  }

  test("r35 cohort LTV: hand-walked triangle, floor-cents, churned " +
      "user still carried in the cohort denominator") {
    val d = Files.createTempDirectory("graft-r35").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // c1: Jan cohort, buys in Jan (10.005 + 20.00) and Mar (30.00);
    // c3: Jan cohort, buys ONCE in Jan (40.00) then churns;
    // c2: Mar cohort, single 5.999 order
    Seq(
      (1L, 1L, "O", 10.005, ts("2024-01-05"), "p"),
      (2L, 1L, "O", 20.00, ts("2024-01-20"), "p"),
      (3L, 1L, "O", 30.00, ts("2024-03-02"), "p"),
      (4L, 3L, "O", 40.00, ts("2024-01-09"), "p"),
      (5L, 2L, "O", 5.999, ts("2024-03-15"), "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/orders.parquet")
    val out = operators.Relational.cohortLtv(spark, d).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort").toString,
        r.getAs[Long]("age_months")) ->
        ((r.getAs[Long]("cohort_users"), r.getAs[Long]("active_users"),
          r.getAs[Long]("revenue_cents"), r.getAs[Long]("cum_revenue_cents"),
          r.getAs[Long]("ltv_cents")))).toMap
    assert(out.size == 3, out.toString)
    // Jan age 0: both users, 1000 (floor of 1000.5) + 2000 + 4000
    assert(out(("2024-01-01", 0L)) == ((2L, 2L, 7000L, 7000L, 3500L)),
      out.toString)
    // Jan age 2: only c1 still buys, but LTV divides by the COHORT
    assert(out(("2024-01-01", 2L)) == ((2L, 1L, 3000L, 10000L, 5000L)),
      out.toString)
    assert(out(("2024-03-01", 0L)) == ((1L, 1L, 599L, 599L, 599L)),
      out.toString)
  }

  test("r36 basket affinity: hand-walked support/confidence/lift, " +
      "co<2 screened, duplicate lines deduped") {
    val d = Files.createTempDirectory("graft-r36").toString
    // o1{p1,p2,p3} o2{p1,p1,p2} o3{p1,p2} o4{p3} — the repeated
    // (o2,p1) line must count once; only (p1,p2) reaches co ≥ 2
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$d/lineitem.parquet")
    val out = operators.Relational.basketAffinity(spark, d).collect()
    assert(out.length == 1, out.mkString(","))
    val r = out.head
    assert((r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
      r.getAs[Long]("co"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) ==
      ((1L, 2L, 3L, 3L, 3L)), r.toString)
    // support 3/4 orders; both confidences 3/3; lift 3·4/(3·3)
    assert(r.getAs[Long]("support_bp") == 7500L)
    assert(r.getAs[Long]("conf_a_bp") == 10000L)
    assert(r.getAs[Long]("conf_b_bp") == 10000L)
    assert(r.getAs[Long]("lift_milli") == 1333L)
  }
}
