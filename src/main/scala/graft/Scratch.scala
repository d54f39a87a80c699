package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Throwaway phase profiler for the optimization round (not part of
  * the driver contract; safe to delete).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    Sessions.warm(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def invoiceLineOld(c: Column): Column = {
      val t = trim(c)
      val pat = "^(\\d+)\\.\\s*(.*?)\\s*\\-?\\s*(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s*\\.?$"
      val matched = regexp_extract(t, pat, 0) =!= ""
      struct(
        when(matched, regexp_extract(t, pat, 2)).as("description"),
        when(matched, regexp_extract(t, pat, 3).cast(DoubleType)).as("qty"),
        when(matched, regexp_extract(t, pat, 4).cast(DoubleType)).as("price"),
        when(matched, regexp_extract(t, pat, 5).cast(DoubleType)).as("total"))
    }
    val items = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select(concat(col("l_linenumber").cast("string"), lit(". "),
        col("p_name"), lit(" - "), col("l_quantity").cast("string"), lit(" "),
        functions.Parse.centsStr(col("l_extendedprice")), lit(" "),
        functions.Parse.centsStr(col("l_quantity") * col("l_extendedprice")),
        lit(".")).as("line"))
      .cache()
    items.count()
    def invoiceLineA(c: Column): Column = {
      val t = trim(c)
      val pat = "^(\\d+)\\.\\s*(.*?)\\s*\\-?\\s*(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s*\\.?$"
      val matched = regexp_extract(t, pat, 0) =!= ""
      val parts = split(
        regexp_replace(t, pat, "$2\u0001$3\u0001$4\u0001$5"), "\u0001", -1)
      when(matched, struct(
        element_at(parts, 1).as("description"),
        element_at(parts, 2).cast(DoubleType).as("qty"),
        element_at(parts, 3).cast(DoubleType).as("price"),
        element_at(parts, 4).cast(DoubleType).as("total")))
      .otherwise(struct(
        lit(null).cast("string").as("description"),
        lit(null).cast("double").as("qty"),
        lit(null).cast("double").as("price"),
        lit(null).cast("double").as("total")))
    }
    def invoiceLineB(c: Column): Column = {
      val t = trim(c)
      val pat = "^(\\d+)\\.\\s*(.*?)\\s*\\-?\\s*(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s*\\.?$"
      val matched = regexp_extract(t, pat, 0) =!= ""
      val packed = regexp_replace(t, pat, "$2\u0001$3\u0001$4\u0001$5")
      val parsed = from_csv(when(matched, packed),
        org.apache.spark.sql.types.StructType.fromDDL(
          "description string, qty double, price double, total double"),
        Map("sep" -> "\u0001", "quote" -> ""))
      struct(
        parsed.getField("description").as("description"),
        parsed.getField("qty").as("qty"),
        parsed.getField("price").as("price"),
        parsed.getField("total").as("total"))
    }
    for (r <- 1 to 2) {
      time(s"r$r lines only noop") {
        items.write.format("noop").mode("overwrite").save()
      }
      time(s"r$r invoiceLine NEW noop") {
        items.select(functions.Parse.invoiceLine(col("line")).as("p"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$r invoiceLine OLD noop") {
        items.select(invoiceLineOld(col("line")).as("p"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$r invoiceLine A noop") {
        items.select(invoiceLineA(col("line")).as("p"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$r invoiceLine B noop") {
        items.select(invoiceLineB(col("line")).as("p"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$r p19 full") {
        SparkEntry.queries("p19_invoice_lines")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
