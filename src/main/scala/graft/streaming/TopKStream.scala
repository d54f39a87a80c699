package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming top-k per key — the streaming twin of the batch
  * TopKPerKey operator: each key's state is its current bounded top-k
  * list (the same fixed-size mergeable buffer shape), updated per
  * micro-batch via mapGroupsWithState and emitted in update mode.
  * State size is O(k) per key regardless of stream length — the only
  * viable way to keep leaderboards over an unbounded stream.
  */
object TopKStream {

  case class Ev(user_id: Long, event_id: Long, value: Double)
  case class TopK(items: List[(Double, Long)]) // (value desc, event_id asc)
  case class UserTopK(user_id: Long, event_ids: Seq[Long], values: Seq[Double])

  def update(k: Int)(uid: Long, events: Iterator[Ev],
      state: GroupState[TopK]): UserTopK = {
    val merged = (state.getOption.map(_.items).getOrElse(Nil) ++
        events.map(e => (e.value, e.event_id)))
      .sortBy(t => (-t._1, t._2)).take(k)
    state.update(TopK(merged))
    UserTopK(uid, merged.map(_._2), merged.map(_._1))
  }

  /** events (user_id, event_id, value) → per-user running top-k. */
  def topKPerUser(events: DataFrame, k: Int): Dataset[UserTopK] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[TopK, UserTopK](GroupStateTimeout.NoTimeout)(update(k))
  }

  /** Start to a memory sink in update mode (latest top-k per user). */
  def startToMemory(events: DataFrame, name: String, k: Int) =
    topKPerUser(events, k)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .start()
}
