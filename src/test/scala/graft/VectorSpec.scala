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
