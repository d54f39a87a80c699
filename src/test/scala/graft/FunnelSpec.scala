package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** r22 ordered funnel + r23 weekly cohort retention: hand-walked
  * corner cases for the greedy chained-min semantics (out-of-order
  * steps, same-timestamp ties, partial funnels) and Monday-week
  * cohort offsets.
  */
class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private val baseNs = 1704067200L * 1000000000L // 2024-01-01 UTC (a Monday)
  private def tsNs(min: Long): Long = baseNs + min * 60L * 1000000000L
  private def micros(min: Long): Long = tsNs(min) / 1000L

  /** events.parquet with ts as long nanos (the driver testdata's
    * TIMESTAMP(NANOS) shape Tables.events reads under nanosAsLong).
    */
  private def mkEvents(rows: Seq[(Long, Long, String)]): String = {
    val d = Files.createTempDirectory("graft-funnel").toString
    rows.zipWithIndex.map { case ((uid, m, typ), i) =>
      (i.toLong, tsNs(m), uid, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$d/events.parquet")
    d
  }

  test("r22 funnel: greedy chained-min with ties and out-of-order steps") {
    val dir = mkEvents(Seq(
      // u1: clean 3-step conversion
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 10L, "purchase"),
      // u2: click before view ignored; click tied with view excluded
      // (strict >); purchase BEFORE the counted click excluded
      (2L, 0L, "click"), (2L, 5L, "view"), (2L, 5L, "click"),
      (2L, 6L, "purchase"), (2L, 7L, "click"),
      // u3: purchase precedes the first view — stage 1 only
      (3L, 0L, "purchase"), (3L, 2L, "view"),
      // u4: only non-funnel events — excluded from the universe
      (4L, 0L, "error"), (4L, 1L, "signup"),
      // u5: funnel events but no view — stage 0
      (5L, 1L, "click"), (5L, 2L, "purchase")))
    val out = operators.Relational.funnel(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> (
        Option(r.getAs[java.sql.Timestamp]("first_view")).map(_.getTime),
        Option(r.getAs[java.sql.Timestamp]("first_click")).map(_.getTime),
        Option(r.getAs[java.sql.Timestamp]("first_purchase")).map(_.getTime),
        r.getAs[Int]("stage"))).toMap
    def ms(min: Long) = Some(micros(min) / 1000L)
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    assert(out(1L) == ((ms(0), ms(5), ms(10), 3)), out(1L).toString)
    assert(out(2L) == ((ms(5), ms(7), None, 2)), out(2L).toString)
    assert(out(3L) == ((ms(2), None, None, 1)), out(3L).toString)
    assert(out(5L) == ((None, None, None, 0)), out(5L).toString)
  }

  test("r24 chained-min funnel is row-identical to r22's array walk") {
    // same corner-case corpus as the r22 test: ties, out-of-order
    // steps, non-funnel users, partial funnels
    val dir = mkEvents(Seq(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 10L, "purchase"),
      (2L, 0L, "click"), (2L, 5L, "view"), (2L, 5L, "click"),
      (2L, 6L, "purchase"), (2L, 7L, "click"),
      (3L, 0L, "purchase"), (3L, 2L, "view"),
      (4L, 0L, "error"), (4L, 1L, "signup"),
      (5L, 1L, "click"), (5L, 2L, "purchase")))
    val a = operators.Relational.funnel(spark, dir).collect().map(_.toString)
    val b = operators.Relational.funnelChained(spark, dir).collect()
      .map(_.toString)
    assert(a.sameElements(b), s"${a.toSeq} vs ${b.toSeq}")
  }

  test("r26 windowed funnel: in-window converts, out-of-window stalls") {
    val dir = mkEvents(Seq(
      // u1: click 5 min after view, purchase 30 min after click —
      // fully inside the 60-min windows
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 35L, "purchase"),
      // u2: click 90 min after view — outside the window; the later
      // click can't rescue it (greedy measures from FIRST view)
      (2L, 0L, "view"), (2L, 90L, "click"), (2L, 95L, "purchase"),
      // u3: click in-window at +50, purchase 2h after click — stage 2
      (3L, 0L, "view"), (3L, 50L, "click"), (3L, 170L, "purchase"),
      // u4: click exactly AT the window edge (+60 min) — inclusive
      (4L, 0L, "view"), (4L, 60L, "click")))
    val out = operators.Relational.funnelWindowed(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 2), out.toString)
    // window can only reduce progress vs the unbounded funnel, and
    // where both reach a stage the timestamps agree (same greedy min)
    val unb = operators.Relational.funnel(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    operators.Relational.funnelWindowed(spark, dir).collect().foreach { r =>
      val u = unb(r.getAs[Long]("user_id"))
      assert(r.getAs[Int]("stage") <= u.getAs[Int]("stage"))
      if (r.getAs[Int]("stage") >= 2)
        assert(r.getAs[java.sql.Timestamp]("first_click") ==
          u.getAs[java.sql.Timestamp]("first_click"))
    }
  }

  test("r23 retention: Monday cohorts and integer week offsets") {
    val day = 24L * 60L
    val dir = mkEvents(Seq(
      // u1: cohort week of Jan 1; active weeks 0, 1 (two events), 2
      (1L, 0L, "view"), (1L, 9L * day, "click"), (1L, 10L * day, "click"),
      (1L, 15L * day, "view"),
      // u2: first event Tue Jan 9 -> cohort week Jan 8; active week 0
      (2L, 8L * day, "purchase"),
      // u3: cohort Jan 1 week, active weeks 0 and 2
      (3L, 3L * day, "error"), (3L, 16L * day, "view")))
    val out = operators.Relational.retentionCohorts(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("week_offset")) -> r.getAs[Long]("n_active")).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 2) -> 2L, ("2024-01-08", 0) -> 1L), out.toString)
  }
}
