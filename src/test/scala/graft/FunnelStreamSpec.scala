package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.FunnelStream
import org.apache.spark.sql.SaveMode

/** Streaming funnel (r22's twin): snapshot-on-advance semantics across
  * micro-batches, and the event-time TTL that bounds the state store —
  * an expired user's next event re-enters the funnel from stage 0.
  */
class FunnelStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def writeBatch(dir: String,
      rows: Seq[(Long, Timestamp, Long, String)]): Unit =
    rows.map { case (id, t, uid, typ) => (id, t, uid, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  test("funnel stream: last snapshot per user equals the batch walk (no TTL)") {
    val dir = Files.createTempDirectory("graft-funnel-stream").toString
    writeBatch(dir, Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(0), 2L, "click")))
    val stream = spark.readStream
      .schema(graft.streaming.EventStream.schema).parquet(dir)
    val q = FunnelStream.funnel(spark, stream, ttl = None)
      .writeStream.format("memory").queryName("funnel_plain")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      writeBatch(dir, Seq((3L, ts(5), 1L, "click"), (4L, ts(3), 2L, "view")))
      q.processAllAvailable()
      writeBatch(dir, Seq((5L, ts(9), 1L, "purchase"), (6L, ts(7), 2L, "click")))
      q.processAllAvailable()
      val rows = spark.table("funnel_plain").as[FunnelStream.FunnelRow]
        .collect()
      // snapshots only on advance: u1 advanced in all 3 batches
      assert(rows.count(_.user_id == 1L) == 3, rows.toSeq.toString)
      // u2's batch-1 click (no view yet) emitted the first-sight
      // stage-0 row, then view, then click advanced it twice more
      assert(rows.count(_.user_id == 2L) == 3, rows.toSeq.toString)
      val last = rows.groupBy(_.user_id).map { case (u, rs) =>
        u -> rs.maxBy(r => (r.stage, r.first_view.map(_.getTime)))
      }
      assert(last(1L) == FunnelStream.FunnelRow(1L, Some(ts(0)), Some(ts(5)),
        Some(ts(9)), 3), last(1L).toString)
      // u2: click@0 before any view ignored; view@3 then click@7
      assert(last(2L) == FunnelStream.FunnelRow(2L, Some(ts(3)), Some(ts(7)),
        None, 2), last(2L).toString)
    } finally q.stop()
  }

  test("funnel stream TTL: expired user re-enters from stage 0") {
    val dir = Files.createTempDirectory("graft-funnel-ttl").toString
    writeBatch(dir, Seq((1L, ts(0), 1L, "view")))
    val stream = spark.readStream
      .schema(graft.streaming.EventStream.schema).parquet(dir)
    val q = FunnelStream.funnel(spark, stream,
        ttl = Some(java.time.Duration.ofMinutes(60)))
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark past u1's t(0)+60min timeout (10-min
      // watermark delay: wm after this batch = t(190))
      writeBatch(dir, Seq((2L, ts(200), 9L, "view")))
      q.processAllAvailable()
      // timeout fires while processing the NEXT batch after the
      // watermark passed it — u1's state is dropped here
      writeBatch(dir, Seq((3L, ts(400), 9L, "click")))
      q.processAllAvailable()
      // u1 returns: with the old state this click@500 would advance
      // to stage 2 (first_view=t(0)); after expiry the click finds no
      // view, then view@510 restarts the funnel at stage 1
      writeBatch(dir, Seq(
        (4L, ts(500), 1L, "click"), (5L, ts(510), 1L, "view")))
      q.processAllAvailable()
      val u1 = spark.table("funnel_ttl").as[FunnelStream.FunnelRow]
        .collect().filter(_.user_id == 1L)
        .sortBy(_.first_view.map(_.getTime))
      assert(u1.length == 2, u1.toSeq.toString)
      assert(u1.head == FunnelStream.FunnelRow(1L, Some(ts(0)), None, None, 1))
      // re-initialized: fresh first_view, no stage-2 continuation
      assert(u1.last == FunnelStream.FunnelRow(1L, Some(ts(510)), None, None, 1),
        u1.toSeq.toString)
    } finally q.stop()
  }
}
