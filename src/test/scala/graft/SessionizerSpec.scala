package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.streaming.Sessionizer
import org.apache.spark.sql.SaveMode

/** flatMapGroupsWithState sessionization: sessions split on the
  * 30-min gap and closed sessions are emitted as the watermark
  * advances across micro-batches.
  */
class SessionizerSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming sessions close on gap and watermark timeout") {
    val dir = Files.createTempDirectory("graft-sess").toString
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    def write(batch: Seq[(Long, Timestamp, Long, String, Double, String)], f: String) =
      batch.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

    // batch 1: user 7 has two sessions separated by a 40-min gap
    write(Seq(
      (1L, ts(0), 7L, "click", 1.0, "{}"),
      (2L, ts(5), 7L, "click", 2.0, "{}"),
      (3L, ts(45), 7L, "click", 4.0, "{}")), "b1")

    val stream = spark.readStream
      .schema(graft.streaming.EventStream.schema).parquet(dir)
    val q = Sessionizer.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark past all gaps
      write(Seq((9L, ts(600), 8L, "click", 9.0, "{}")), "b2")
      q.processAllAvailable()
      // batch 3: another advance so batch-2 timeouts fire
      write(Seq((10L, ts(1200), 9L, "click", 1.0, "{}")), "b3")
      q.processAllAvailable()

      val out = spark.table("sessions").as[Sessionizer.Sess].collect()
        .filter(_.user_id == 7L).sortBy(_.session_start.getTime)
      assert(out.length == 2, s"expected 2 closed sessions, got ${out.toSeq}")
      assert(out(0).n_events == 2 && out(0).session_value == 3.0)
      assert(out(0).session_start == ts(0) && out(0).session_end == ts(5))
      assert(out(1).n_events == 1 && out(1).session_value == 4.0)
    } finally q.stop()
  }
}
