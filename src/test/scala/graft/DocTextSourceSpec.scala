package graft

import java.nio.file.{Files, Paths}
import graft.sources.DocSource

/** DataSource V2 'graft-docs' format: equals the DataFrame-built
  * textLines pipeline, prunes columns into the reader, and
  * partitions per file.
  */
class DocTextSourceSpec extends SparkSpecBase {

  private lazy val root: String = {
    val d = Files.createTempDirectory("graft-dsv2")
    Files.writeString(Paths.get(d.toString, "DA00564 Award Letter.pdf"),
      "STATE OF NORTH CAROLINA\nContract No. DA00564")
    Files.writeString(Paths.get(d.toString, "receipt_9.txt"),
      "ACME SDN BHD\nTAX INVOICE #123\nGST 6%")
    d.toString
  }

  test("graft-docs format matches the DataFrame textLines pipeline") {
    val v2 = spark.read.format("graft-docs").load(root)
      .select("file_name", "doc_type", "line_no", "line")
      .collect().map(_.toSeq).toSet
    val v1 = DocSource.textLines(DocSource.scanFiles(spark, root))
      .select("file_name", "doc_type", "line_no", "line")
      .collect().map(_.toSeq).toSet
    assert(v2 == v1)
    assert(v2.size == 5)
  }

  test("column pruning reaches the reader (scan schema is pruned)") {
    val df = spark.read.format("graft-docs").load(root).select("doc_type")
    val scan = df.queryExecution.executedPlan.toString
    assert("BatchScan [^\\[]*\\[doc_type#\\d+\\]".r.findFirstIn(scan).isDefined,
      scan.take(1200))
    assert(df.distinct().collect().map(_.getString(0)).toSet ==
      Set("nc_award_letter", "invoice"))
  }

  test("one input partition per file") {
    val df = spark.read.format("graft-docs").load(root)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("listing and reads go through the Hadoop FileSystem API (file:// scheme)") {
    // an explicit scheme-qualified URI must resolve through
    // Path.getFileSystem — java.nio would choke on "file:/..."
    val df = spark.read.format("graft-docs").load("file://" + root)
    assert(df.count() == 5)
    assert(df.select("path").distinct().collect()
      .forall(_.getString(0).startsWith("file:")))
    // pushdown still prunes whole files under the Hadoop listing
    val pruned = spark.read.format("graft-docs").load("file://" + root)
      .filter("doc_type = 'invoice'")
    assert(pruned.rdd.getNumPartitions == 1)
  }

  test("doc_type filter prunes whole files at planning time") {
    val df = spark.read.format("graft-docs").load(root)
      .filter("doc_type = 'invoice'")
    // only the receipt file becomes an input partition — the award
    // letter is never even opened
    assert(df.rdd.getNumPartitions == 1)
    assert(df.select("file_name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("receipt_9.txt"))
    // unpushable predicates keep full correctness: everything still
    // filters row-wise
    val none = spark.read.format("graft-docs").load(root)
      .filter("line LIKE '%GST%'")
    assert(none.count() == 1)
  }
}
