package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of Relational.funnel (r22): a per-user ordered
  * funnel state machine via flatMapGroupsWithState. State is three
  * step timestamps (micros, -1 = not reached); an arriving batch's
  * funnel events replay in (ts, event_type) order — the same tie rule
  * as the batch sort_array walk — and a snapshot row is emitted
  * whenever the user's funnel advances (or on first sight), so the
  * LAST emission per user equals the batch funnel over the same
  * events. Greedy funnel state is monotone, so in-order delivery per
  * user (the ingest assumption, as with Sessionizer) makes stream and
  * batch agree exactly; an out-of-order event older than a recorded
  * step would need retraction, which no greedy engine does.
  *
  * State never times out here (a funnel is forever); production would
  * bound it with a TTL timeout exactly like Sessionizer's — the state
  * size is three longs per user either way.
  */
object FunnelStream {

  case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  case class St(t1: Long, t2: Long, t3: Long)
  case class FunnelRow(user_id: Long, first_view: Option[Timestamp],
      first_click: Option[Timestamp], first_purchase: Option[Timestamp],
      stage: Int)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  private def toTs(us: Long): Option[Timestamp] =
    if (us < 0) None
    else {
      val t = new Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      Some(t)
    }

  private def toRow(uid: Long, st: St): FunnelRow =
    FunnelRow(uid, toTs(st.t1), toTs(st.t2), toTs(st.t3),
      if (st.t3 >= 0) 3 else if (st.t2 >= 0) 2 else if (st.t1 >= 0) 1 else 0)

  def update(uid: Long, events: Iterator[Ev],
      state: GroupState[St]): Iterator[FunnelRow] = {
    val first = state.getOption.isEmpty
    val st0 = state.getOption.getOrElse(St(-1L, -1L, -1L))
    var st = st0
    events.toSeq.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
      val t = micros(e.ts)
      if (st.t1 < 0 && e.event_type == "view") st = st.copy(t1 = t)
      else if (st.t2 < 0 && st.t1 >= 0 && e.event_type == "click" &&
        t > st.t1) st = st.copy(t2 = t)
      else if (st.t3 < 0 && st.t2 >= 0 && e.event_type == "purchase" &&
        t > st.t2) st = st.copy(t3 = t)
    }
    if (st != st0 || first) {
      state.update(st)
      Iterator(toRow(uid, st))
    } else Iterator.empty
  }

  /** events stream (EventStream.schema) → funnel-advance snapshots. */
  def funnel(spark: SparkSession, events: Dataset[_]): Dataset[FunnelRow] = {
    import spark.implicits._
    events.toDF()
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
