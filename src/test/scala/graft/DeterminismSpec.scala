package graft

/** The correctness gate's foundation is run-to-run determinism:
  * every contract query must produce IDENTICAL rows on repeated
  * execution (float aggregation order, map iteration, partitioning
  * and join strategies may all legitimately vary between runs — the
  * operators are built so results don't). Catches nondeterminism
  * before the driver's oracle hash does.
  */
class DeterminismSpec extends SparkSpecBase {

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("")).sorted.toSeq

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name is run-to-run deterministic") {
      val a = fingerprint(fn(spark, sf0001))
      val b = fingerprint(fn(spark, sf0001))
      assert(a == b, s"$name differs between runs")
    }
  }
}
