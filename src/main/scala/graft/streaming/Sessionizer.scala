package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via flatMapGroupsWithState —
  * the streaming twin of Relational.sessionize (gap-based sessions).
  * State is one open session per user; an event past the gap closes
  * and emits the previous session; event-time timeout flushes sessions
  * once the watermark passes last_ts + gap.
  */
object Sessionizer {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class Sess(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)
  case class State(startMs: Long, lastMs: Long, n: Long, sum: Double)

  val GapMs: Long = 30 * 60 * 1000L

  private def toSess(uid: Long, st: State): Sess =
    Sess(uid, new Timestamp(st.startMs), new Timestamp(st.lastMs), st.n, st.sum)

  def update(uid: Long, events: Iterator[Ev],
      state: GroupState[State]): Iterator[Sess] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSess(uid, _)).iterator
      state.remove()
      return out
    }
    var closed = List.empty[Sess]
    var cur = state.getOption
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(st) if t - st.lastMs <= GapMs =>
          cur = Some(State(st.startMs, math.max(st.lastMs, t), st.n + 1,
            st.sum + e.value))
        case Some(st) =>
          closed ::= toSess(uid, st)
          cur = Some(State(t, t, 1, e.value))
        case None =>
          cur = Some(State(t, t, 1, e.value))
      }
    }
    cur.foreach { st =>
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + GapMs)
    }
    closed.reverseIterator
  }

  /** events stream (schema EventStream.schema) → closed sessions. */
  def sessionize(spark: SparkSession, events: Dataset[_]): Dataset[Sess] = {
    import spark.implicits._
    events.toDF()
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
