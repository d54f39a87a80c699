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
  * State is BOUNDED by an event-time TTL (Sessionizer's timeout
  * shape): a user whose funnel hasn't advanced within `ttl` of the
  * watermark is dropped from the store, and a later event re-enters
  * the funnel from stage 0 — at 100 TB of users an unbounded "funnel
  * is forever" store grows without limit, so expiry is the default.
  * Pass `ttl = None` for the never-expire variant (the exact-parity
  * contract vs the batch funnel, which sees all history).
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

  def update(ttlMs: Option[Long])(uid: Long, events: Iterator[Ev],
      state: GroupState[St]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      // stale funnel: forget the user — snapshots were already
      // emitted at each advance, so expiry emits nothing; the next
      // event re-initializes from stage 0
      state.remove()
      return Iterator.empty
    }
    val first = state.getOption.isEmpty
    val st0 = state.getOption.getOrElse(St(-1L, -1L, -1L))
    var st = st0
    val evs = events.toSeq.sortBy(e => (micros(e.ts), e.event_type))
    evs.foreach { e =>
      val t = micros(e.ts)
      if (st.t1 < 0 && e.event_type == "view") st = st.copy(t1 = t)
      else if (st.t2 < 0 && st.t1 >= 0 && e.event_type == "click" &&
        t > st.t1) st = st.copy(t2 = t)
      else if (st.t3 < 0 && st.t2 >= 0 && e.event_type == "purchase" &&
        t > st.t2) st = st.copy(t3 = t)
    }
    if (st != st0 || first) {
      state.update(st)
      // TTL rides event time from the newest signal we have (funnel
      // step or raw event), so a quiet-but-advancing user stays live
      ttlMs.foreach { ttl =>
        val lastUs = math.max(math.max(st.t1, math.max(st.t2, st.t3)),
          evs.lastOption.map(e => micros(e.ts)).getOrElse(-1L))
        state.setTimeoutTimestamp(lastUs / 1000L + ttl)
      }
      Iterator(toRow(uid, st))
    } else Iterator.empty
  }

  /** events stream (EventStream.schema) → funnel-advance snapshots.
    * `ttl` bounds the state store (default 30 days of event time);
    * None preserves the exact never-expire batch-parity semantics.
    */
  def funnel(spark: SparkSession, events: Dataset[_],
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(30))
      ): Dataset[FunnelRow] = {
    import spark.implicits._
    val ttlMs = ttl.map(_.toMillis)
    val src = events.toDF()
      .filter(col("event_type").isin("view", "click", "purchase"))
    val withWm = ttlMs.fold(src)(_ => src.withWatermark("ts", "10 minutes"))
    withWm.select(col("user_id"), col("ts"), col("event_type")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        ttlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.EventTimeTimeout))(update(ttlMs))
  }
}
