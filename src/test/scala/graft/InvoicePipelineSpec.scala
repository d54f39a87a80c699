package graft

import java.nio.file.{Files, Paths}
import graft.pipeline.InvoicePipeline

/** Full reference workflow on crafted documents: files → lines →
  * metadata + table section → flat invoices table → the five
  * analytics queries.
  */
class InvoicePipelineSpec extends SparkSpecBase {

  private lazy val root: String = {
    val d = Files.createTempDirectory("graft-inv").toString
    Files.writeString(Paths.get(d, "invoice_a.txt"),
      """ACME SUPPLIES SDN BHD
        |123 Jalan Besar
        |TIN: 123456789
        |TAX INVOICE #100123
        |Invoice Date: Mar 5, 2018
        |Due Date: 2018-04-05
        |ID DESCRIPTION QTY PRICE TOTAL
        |1. FX100 Graphic Tablet - 1.0 1300.0 1300.0
        |2. Cable Pack - 2.0 50.0 100.0
        |Sub Total 1400.00
        |GST 6%
        |TOTAL 1484.00""".stripMargin)
    Files.writeString(Paths.get(d, "invoice_b.txt"),
      """PYEDRAIN SUPPLIER
        |TIN: 987654321
        |Receipt: 200456
        |Invoice Date: Apr 2, 2018
        |ID DESCRIPTION QTY PRICE TOTAL
        |1. Cable Pack - 1.0 50.0 50.0
        |Sub Total 50.00
        |GST 6%
        |TOTAL 53.00""".stripMargin)
    root0 = d
    d
  }
  private var root0: String = _

  test("pipeline builds the reference invoices schema") {
    val inv = InvoicePipeline.run(spark, root).cache()
    val rows = inv.collect()
    assert(rows.length == 3) // 2 items + 1 item
    val a = inv.filter("file = 'invoice_a.txt'")
    assert(a.count() == 2)
    val r = a.filter("description = 'FX100 Graphic Tablet'").collect().head
    assert(r.getAs[String]("supplier_name").startsWith("ACME SUPPLIES"))
    assert(r.getAs[String]("supplier_tin") == "123456789")
    assert(r.getAs[String]("invoice_number") == "100123")
    assert(r.getAs[java.sql.Date]("invoice_date").toString == "2018-03-05")
    assert(r.getAs[java.sql.Date]("due_date").toString == "2018-04-05")
    assert(r.getAs[Double]("qty") == 1.0)
    assert(r.getAs[Double]("price") == 1300.0)
    assert(r.getAs[Double]("tax_label") == 6.0)
    assert(math.abs(r.getAs[Double]("tax_amount") - 84.0) < 1e-9)
    assert(r.getAs[Double]("total_amount") == 1484.0)
  }

  private lazy val ncRoot: String = {
    val d = Files.createTempDirectory("graft-nc").toString
    // TWO contract blocks on one page — the reference's real layout
    Files.writeString(Paths.get(d, "L230201A_Item C Report.txt"),
      """STATE OF NORTH CAROLINA
        |DEPARTMENT OF TRANSPORTATION
        |LETTING OF MAY 3, 2023
        |DA00564
        |FED AID NO: BRZ-0711
        |Craven
        |TYPE OF WORK Grading, Drainage and Paving
        |LOCATION NC 43 Bridge 25
        |ESTIMATE 1,234,567.89
        |FINAL COMPLETION NOVEMBER 15, 2024
        |$ TOTALS
        |BLYTHE CONSTRUCTION, INC. 1,999,999.99
        |S T WOOTEN CORPORATION 2,111,000.50
        |ESTIMATE TOTAL 1,234,567.89
        |DA00565
        |FED AID NO: STATE FUNDED
        |Pasquotank
        |TYPE OF WORK Bridge Rehabilitation
        |LOCATION US 17 over Perquimans River
        |ESTIMATE 500,000.00
        |FINAL COMPLETION JUNE 1, 2025
        |$ TOTALS
        |BARNHILL CONTRACTING CO 450,100.10
        |ESTIMATE TOTAL 500,000.00""".stripMargin)
    Files.writeString(Paths.get(d, "DA00542 Invitation to Bid.txt"),
      """STATE OF NORTH CAROLINA
        |DEPARTMENT OF TRANSPORTATION
        |Division One:
        |NOTICE TO PROSPECTIVE BIDDERS
        |Requesting bids for the following project
        |12089199 - Milling, Resurfacing, and Shoulder Reconstruction
        |The Completion Date for this Contract is October 30, 2023
        |Bid Opening will be held on MAY 3, 2023""".stripMargin)
    Files.writeString(Paths.get(d, "DA00569 Award Letter.txt"),
      """STATE OF NORTH CAROLINA
        |DEPARTMENT OF TRANSPORTATION
        |NOTIFICATION OF AWARD
        |Contract No. DA00569
        |Federal Aid No.: STATE FUNDED
        |County: Craven
        |Description: Work Barge Skyco Drydock
        |We are pleased to inform you that BLYTHE CONSTRUCTION, INC.
        |has been awarded this contract based on the bid submitted on
        |May 3, 2023 in the amount of $1,862,371.25""".stripMargin)
    Files.writeString(Paths.get(d, "L230203 Bids As Read.txt"),
      """STATE OF NORTH CAROLINA
        |DEPARTMENT OF TRANSPORTATION
        |CONTRACT BIDS AS READ
        |Bid Opening
        |5/3/2023
        |Time: 2:00 PM
        |Contract: 00570123
        |Description: Resurfacing of US 64
        |and associated drainage work
        |CONTRACTOR AMOUNT BID
        |BLYTHE CONSTRUCTION, INC. $1,862,371.25
        |S T WOOTEN CORPORATION $1,900,000.00
        |ENGINEERS ESTIMATE $1,750,000.00
        |TOTAL BIDS RECEIVED: (2)""".stripMargin)
    Files.writeString(Paths.get(d, "DA00569 Bid Tabs.txt"),
      """STATE OF NORTH CAROLINA
        |DEPARTMENT OF TRANSPORTATION
        |May 03, 2023 2:30 PM
        |DA00569
        |Call Number 002
        |FED AID NO: STATE FUNDED
        |Resurfacing
        |US 70 Johnston County
        |Craven, Pasquotank
        |BLYTHE CONSTRUCTION, INC.
        |S T WOOTEN CORPORATION
        |ROADWAY ITEMS
        |0001 0000100000-N S1 MOBILIZATION Lump Sum $100,000.00 $95,000.00 $110,000.00 $105,000.00
        |0002 0000200000-N S1 ASPHALT CONCRETE 380,471 SY $12.50 $4,755,887.50 $13.00 $4,946,123.00""".stripMargin)
    d
  }

  test("doc-type router parses reference-shaped Item C and Invitation docs") {
    val routed = InvoicePipeline.routeNcDocs(spark, ncRoot)
    val itemC = routed("nc_item_c").collect()
    assert(itemC.length == 3) // 2 bids in block 1 + 1 bid in block 2
    // the second DA block parses independently of the first
    val b2 = itemC.find(_.getAs[String]("contract_id") == "DA00565").get
    assert(b2.getAs[String]("project_number") == "STATE FUNDED")
    assert(b2.getAs[String]("county") == "Pasquotank")
    assert(b2.getAs[String]("vendor_name") == "BARNHILL CONTRACTING CO")
    assert(b2.getAs[Double]("owner_cost_estimate") == 500000.00)
    assert(b2.getAs[java.sql.Date]("final_completion").toString == "2025-06-01")
    assert(b2.getAs[Double]("bid_value") == 450100.10)
    val b = itemC.find(_.getAs[String]("vendor_name")
      .startsWith("BLYTHE")).get
    assert(b.getAs[String]("contract_id") == "DA00564")
    assert(b.getAs[java.sql.Date]("letting_date").toString == "2023-05-03")
    assert(b.getAs[String]("project_number") == "BRZ-0711")
    assert(b.getAs[String]("county") == "Craven")
    assert(b.getAs[String]("proposal_description") ==
      "Grading, Drainage and Paving")
    assert(b.getAs[String]("location") == "NC 43 Bridge 25")
    assert(b.getAs[Double]("owner_cost_estimate") == 1234567.89)
    assert(b.getAs[java.sql.Date]("final_completion").toString == "2024-11-15")
    assert(b.getAs[Double]("bid_value") == 1999999.99)
    val inv = routed("nc_invitation_to_bid").collect()
    assert(inv.length == 1)
    val i = inv.head
    assert(i.getAs[String]("state_header") == "STATE OF NORTH CAROLINA")
    assert(i.getAs[String]("owner_header") == "DEPARTMENT OF TRANSPORTATION")
    assert(i.getAs[String]("division") == "Division One")
    assert(i.getAs[String]("contract_id") == "12089199")
    assert(i.getAs[String]("proposal_description") ==
      "Milling, Resurfacing, and Shoulder Reconstruction")
    assert(i.getAs[java.sql.Date]("completion_date").toString == "2023-10-30")
    assert(i.getAs[java.sql.Date]("letting_date").toString == "2023-05-03")
    val award = routed("nc_award_letter").collect()
    assert(award.length == 1)
    val a = award.head
    assert(a.getAs[String]("contract_id") == "DA00569")
    assert(a.getAs[String]("project_number") == "STATE FUNDED")
    assert(a.getAs[String]("county") == "Craven")
    assert(a.getAs[String]("description") == "Work Barge Skyco Drydock")
    // vendor prose spans a line break — the (?s) scan must cross it
    assert(a.getAs[String]("vendor") == "BLYTHE CONSTRUCTION, INC.")
    assert(a.getAs[java.sql.Date]("letting_date").toString == "2023-05-03")
    assert(a.getAs[Double]("award_value") == 1862371.25)
    assert(routed("other").count() == 0)
  }

  test("doc-type router parses Bids As Read and Bid Tabs docs (all 5 NC types)") {
    val routed = InvoicePipeline.routeNcDocs(spark, ncRoot)

    val bar = routed("nc_bids_as_read").collect()
    // 3 money lines: two contractors + the ENGINEERS ESTIMATE line
    // (the reference's contractor loop keeps any money-bearing line
    // not labelled CONTRACTOR/AMOUNT BID — parity preserved)
    assert(bar.length == 3)
    val blythe = bar.find(_.getAs[String]("contractor_name")
      .startsWith("BLYTHE")).get
    assert(blythe.getAs[String]("state_header") == "STATE OF NORTH CAROLINA")
    assert(blythe.getAs[String]("owner_header") == "DEPARTMENT OF TRANSPORTATION")
    // date on the line AFTER "Bid Opening"
    assert(blythe.getAs[String]("letting_date") == "5/3/2023")
    assert(blythe.getAs[String]("letting_time") == "2:00 PM")
    // the digit-less "CONTRACT BIDS AS READ" title is scanned past
    assert(blythe.getAs[String]("contract_id") == "00570123")
    assert(blythe.getAs[String]("description") ==
      "Resurfacing of US 64 and associated drainage work")
    assert(blythe.getAs[Double]("engineers_estimate") == 1750000.00)
    assert(blythe.getAs[Int]("total_bids_received") == 2)
    assert(blythe.getAs[Double]("amount_bid") == 1862371.25)
    assert(bar.exists(r => r.getAs[String]("contractor_name") ==
      "S T WOOTEN CORPORATION" && r.getAs[Double]("amount_bid") == 1900000.00))

    val bt = routed("nc_bid_tabs").collect()
    // 2 item lines × 2 bidders
    assert(bt.length == 4)
    val b1 = bt.find(r => r.getAs[String]("line_no") == "0001" &&
      r.getAs[Int]("bidder_index") == 1).get
    assert(b1.getAs[java.sql.Date]("letting_date").toString == "2023-05-03")
    assert(b1.getAs[String]("contract_id") == "DA00569")
    assert(b1.getAs[String]("call_number") == "002")
    assert(b1.getAs[String]("project_number") == "STATE FUNDED")
    assert(b1.getAs[String]("proposal_project_type") == "Resurfacing")
    assert(b1.getAs[String]("location") == "US 70 Johnston County")
    assert(b1.getAs[String]("counties") == "Craven, Pasquotank")
    assert(b1.getAs[String]("item_no") == "0000100000-N")
    assert(b1.getAs[String]("description") == "MOBILIZATION")
    // textual quantity: typed qty null, raw preserved
    assert(b1.isNullAt(b1.fieldIndex("qty")))
    assert(b1.getAs[String]("qty_raw") == "Lump Sum")
    assert(b1.getAs[String]("bidder_name") == "BLYTHE CONSTRUCTION, INC.")
    assert(b1.getAs[Double]("unit_price") == 100000.00)
    assert(b1.getAs[Double]("amount") == 95000.00)
    val b2b = bt.find(r => r.getAs[String]("line_no") == "0002" &&
      r.getAs[Int]("bidder_index") == 2).get
    assert(b2b.getAs[String]("description") == "ASPHALT CONCRETE")
    assert(b2b.getAs[Double]("qty") == 380471.0)
    assert(b2b.getAs[String]("unit") == "SY")
    assert(b2b.getAs[String]("bidder_name") == "S T WOOTEN CORPORATION")
    assert(b2b.getAs[Double]("unit_price") == 13.00)
    assert(b2b.getAs[Double]("amount") == 4946123.00)
  }

  test("parseAllNcDocs unions every routed type into the reference's one frame") {
    val all = InvoicePipeline.parseAllNcDocs(spark, ncRoot)
    val byType = all.groupBy("doc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("nc_item_c" -> 3L, "nc_invitation_to_bid" -> 1L,
      "nc_award_letter" -> 1L, "nc_bids_as_read" -> 3L, "nc_bid_tabs" -> 4L))
    // by-name union: type-specific columns survive, others are null
    val bt = all.filter("doc_type = 'nc_bid_tabs' AND line_no = '0001'")
      .collect().head
    assert(bt.getAs[String]("call_number") == "002")
    assert(bt.isNullAt(bt.fieldIndex("division"))) // invitation-only column
    val inv = all.filter("doc_type = 'nc_invitation_to_bid'").collect().head
    assert(inv.getAs[String]("division") == "Division One")
  }

  test("bid tabs fallback: a document with no item lines keeps doc fields") {
    val d = Files.createTempDirectory("graft-nc-fb").toString
    Files.writeString(Paths.get(d, "DA00001 Bid Tabs.txt"),
      """STATE OF NORTH CAROLINA
        |DEPARTMENT OF TRANSPORTATION
        |May 03, 2023
        |DA00001
        |Call Number 007""".stripMargin)
    val rows = InvoicePipeline.routeNcDocs(spark, d)("nc_bid_tabs").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("contract_id") == "DA00001")
    assert(rows.head.getAs[String]("call_number") == "007")
    assert(rows.head.isNullAt(rows.head.fieldIndex("line_no")))
    assert(rows.head.isNullAt(rows.head.fieldIndex("amount")))
  }

  test("the five reference analytics run over the pipeline output") {
    val inv = InvoicePipeline.run(spark, root).cache()
    import InvoicePipeline.Analytics._
    assert(docsProcessed(inv).count() == 2)
    val tv = totalValue(inv).collect()
    assert(tv.head.getAs[Double]("total_value") == 1484.0)
    val ts = topSuppliers(inv).collect()
    assert(ts.head.getAs[String]("supplier_name").startsWith("ACME"))
    val cp = commonProducts(inv).collect()
    assert(cp.head.getAs[String]("description") == "Cable Pack")
    assert(cp.head.getAs[Long]("occurrences") == 2)
    val mt = monthlyTrend(inv).collect()
    assert(mt.map(_.getAs[String]("month")).toSeq == Seq("Mar 2018", "Apr 2018"))
  }
}
