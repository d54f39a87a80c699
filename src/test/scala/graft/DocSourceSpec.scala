package graft

import java.nio.file.{Files, Paths}
import graft.sources.DocSource

/** binaryFile ingestion: recursive scan, metadata, doc-type routing,
  * and line explosion — the distributed twin of the reference's
  * per-file loop (pipeline_runner.run_extraction_pipeline).
  */
class DocSourceSpec extends SparkSpecBase {

  private lazy val root: String = {
    val d = Files.createTempDirectory("graft-docs")
    Files.createDirectories(Paths.get(d.toString, "2023-02-01"))
    Files.writeString(Paths.get(d.toString, "2023-02-01", "DA00564 Award Letter.pdf"),
      "STATE OF NORTH CAROLINA\nContract No. DA00564\nCounty: Craven")
    Files.writeString(Paths.get(d.toString, "receipt_001.txt"),
      "MR. D.I.Y. SDN BHD\nTAX INVOICE #12345\nGST 6% 2.55 42.45")
    d.toString
  }

  test("scanFiles lists recursively with metadata and doc-type routing") {
    val files = DocSource.scanFiles(spark, root).collect()
    assert(files.length == 2)
    val byName = files.map(r => r.getAs[String]("file_name") -> r).toMap
    assert(byName("DA00564 Award Letter.pdf").getAs[String]("doc_type") == "nc_award_letter")
    assert(byName("receipt_001.txt").getAs[String]("doc_type") == "invoice")
    assert(files.forall(_.getAs[Long]("byte_len") > 0))
  }

  test("scanFiles routes the REAL reference corpus filenames correctly") {
    // read-only scan of the reference's actual NC-DOT PDF tree — the
    // routing must recognize every document family from filenames
    val byType = DocSource.scanFiles(spark, "/root/reference/data/2023-nc-d1")
      .groupBy("doc_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // all five NC families recognized; a handful of variant names
    // (Award_Letter.docx.pdf, AwardLetter.pdf, Bid Summary.pdf) fall
    // through to 'invoice' exactly as the reference's matcher does
    assert(Set("nc_award_letter", "nc_bids_as_read", "nc_bid_tabs",
      "nc_invitation_to_bid", "nc_item_c").subsetOf(byType.keySet),
      byType.toString)
    assert(byType.getOrElse("invoice", 0L) <= 10, byType.toString)
    assert(byType.values.sum > 50)
  }

  test("textLines explodes decoded content to per-line rows") {
    val lines = DocSource.textLines(DocSource.scanFiles(spark, root))
    val award = lines.filter("doc_type = 'nc_award_letter'").collect()
    assert(award.length == 3)
    assert(award.map(_.getAs[String]("line")).contains("Contract No. DA00564"))
    assert(award.map(_.getAs[Int]("line_no")).toSet == Set(0, 1, 2))
  }
}
