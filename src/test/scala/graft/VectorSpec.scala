package graft

import graft.functions.Vector
import org.apache.spark.sql.functions._

/** FloatVecDot (native codegen expression) must agree bit-for-bit
  * with the higher-order-function formulation, in both codegen and
  * interpreted eval paths.
  */
class VectorSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val vecs: Seq[(Array[Float], Array[Float])] =
    (0 until 50).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }

  test("FloatVecDot matches HOF dot bit-for-bit (codegen path)") {
    val df = vecs.toDF("a", "b")
      .select(Vector.dot(col("a"), col("b")).as("fast"),
        Vector.dotHof(col("a"), col("b")).as("ref"))
    assert(df.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("FloatVecDot matches HOF dot (interpreted path)") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = vecs.take(5).toDF("a", "b")
        .select(Vector.dot(col("a"), col("b")).as("fast"),
          Vector.dotHof(col("a"), col("b")).as("ref"))
      assert(df.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("dot handles null vectors and empty arrays") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(3f, 4f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
      .select(Vector.dot(col("a"), col("b")))
    val out = df.collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(11.0), None, Some(0.0)))
  }

  test("dot replicates HOF null semantics: ragged and null-element inputs → NULL") {
    // r11 advice: the session-wide RewriteHofDotProduct rule claims
    // bit-for-bit result preservation, so the kernel must return NULL
    // exactly where aggregate(zip_with(...)) does — on a length
    // mismatch (zip_with null-pads) and on any null element
    val df = Seq(
      (Some(Seq(Option(1f), Option(2f), Option(3f))), Some(Seq(Option(3f), Option(4f)))),
      (Some(Seq(Option(1f), None)), Some(Seq(Option(3f), Option(4f)))),
      (Some(Seq(Option(1f), Option(2f))), Some(Seq(Option(3f), Option(4f)))))
      .toDF("a", "b")
      .select(Vector.dot(col("a"), col("b")).as("fast"),
        Vector.dotHof(col("a"), col("b")).as("ref"))
    val out = df.collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out.toSeq == Seq((None, None), (None, None),
      (Some(11.0), Some(11.0))), out.mkString(", "))
  }

  test("sortedIntersectCount equals array_intersect size on sorted long sets") {
    val rows = Seq(
      (Seq(1L, 3L, 7L, 9L), Seq(2L, 3L, 9L, 11L)),     // partial overlap
      (Seq(1L, 2L), Seq(3L, 4L)),                      // disjoint
      (Seq.empty[Long], Seq(1L)),                      // empty side
      (Seq(5L, 6L, 7L), Seq(5L, 6L, 7L)))              // identical
    val df = rows.toDF("a", "b").select(
      graft.functions.Vector.sortedIntersectCount(col("a"), col("b"))
        .as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("cosine of identical vectors is 1") {
    val df = Seq(Tuple1(Array(0.5f, -0.25f, 3f))).toDF("a")
      .select(Vector.cosine(col("a"), col("a")))
    assert(math.abs(df.collect().head.getDouble(0) - 1.0) < 1e-12)
  }

  test("signBucket partitions by coordinate signs deterministically") {
    val df = Seq(
      Array(1f, 1f, 1f), Array(-1f, 1f, 1f), Array(-1f, -1f, -1f))
      .map(Tuple1(_)).toDF("v")
      .select(Vector.signBucket(col("v"), Seq(1, 2, 3)))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(7, 6, 0))
  }
}
