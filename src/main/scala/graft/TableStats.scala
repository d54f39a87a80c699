package graft

import org.apache.spark.sql.SparkSession

/** Scalar table statistics with an injection seam (round-10 verdict
  * item 6): the adaptive layout constants (d05's LSH band layout,
  * d12's K, d04/d14's shingle-df caps, s15's graph bands) all derive
  * from a corpus row count. At 100 TB that count must come from table
  * metadata — manifest/footer statistics the lake already maintains —
  * not from a scan job; [[inject]] is that seam. Absent an injected
  * value, the count is computed ONCE per (session, dir, key) and
  * memoized, so a Verify/Bench run prices each corpus count at most
  * one job however many queries derive their layout from it.
  *
  * The memo key includes the session: a fresh session (new data may
  * have landed) re-derives, matching how per-run manifest reads
  * behave in production.
  */
object TableStats {

  private val cache =
    new SessionMemo[(SparkSession, String, String), Long](_ => ())

  /** Provide a known row count (e.g. from lake manifest stats). */
  def inject(s: SparkSession, dir: String, key: String, n: Long): Unit =
    cache.put((s, dir, key), n)

  /** The injected or memoized count; `count` runs at most once per
    * (session, dir, key) as the fallback. Entries of stopped sessions
    * are purged, and TableSink.replaceDir invalidates the swapped
    * dir's entries (SessionMemo — the r12 lifecycle fix).
    */
  def rowCount(s: SparkSession, dir: String, key: String)
      (count: => Long): Long =
    cache.getOrElseUpdate((s, dir, key), count)
}
