package graft.operators

import graft.Tables
import graft.functions.Parse
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-checkable queries exercising the Parse function library.
  * Pattern: construct the reference's input formats from table columns
  * (deterministically, in-engine), parse them back with the Parse
  * combinators, and emit values whose oracle is the round-trip
  * identity — so DuckDB verifies the parser without replicating it.
  */
object ParseOps {

  /** p01 — currency parsing (parse_utils.py:27-43): build
    * "$1,NNN.25"-style strings from event props and parse back.
    */
  def parseFloatQ(s: SparkSession, dir: String): DataFrame = {
    val k = regexp_extract(col("props"), "(\\d+)", 1)
    val money = concat(lit("$1,"), lpad(k, 3, "0"), lit(".25"))
    Tables.events(s, dir)
      .select(col("event_id"), money.as("money_str"),
        Parse.parseFloat(money).as("parsed"))
      .orderBy(col("event_id"))
  }

  /** p02 — multi-format date parsing (parse_utils.py:46-55): format
    * o_orderdate five different ways by key, parse all back with one
    * combinator; oracle is the original date.
    */
  def parseDateMultiQ(s: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate")
    val str = when(col("o_orderkey") % 5 === 0, date_format(d, "MMM d, yyyy"))
      .when(col("o_orderkey") % 5 === 1, date_format(d, "MMMM d, yyyy"))
      .when(col("o_orderkey") % 5 === 2, date_format(d, "yyyy-MM-dd"))
      .when(col("o_orderkey") % 5 === 3, date_format(d, "dd-MM-yyyy"))
      .otherwise(date_format(d, "M/d/yyyy"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), Parse.parseDateMulti(str).as("parsed_date"))
      .orderBy(col("o_orderkey"))
  }

  /** p03 — date-in-text scanning with 2-digit-year coercion
    * (parse_utils.py:58-100): embed dd-MM-yy in prose, recover the
    * date.
    */
  def findDateQ(s: SparkSession, dir: String): DataFrame = {
    val text = concat(lit("Item shipped "),
      date_format(col("l_shipdate"), "dd-MM-yy"),
      lit(" with note ref A"), col("l_orderkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Parse.findDate(text).as("found_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** p04 — tax-rate extraction (parse_utils.py:103-108): 'GST N%' →
    * N.0 built from l_tax.
    */
  def taxRateQ(s: SparkSession, dir: String): DataFrame = {
    val label = concat(lit("GST "),
      round(col("l_tax") * 100, 0).cast("int").cast("string"), lit("%"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Parse.taxRate(label).as("tax_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** p05 — invoice line-item parsing (parse_utils.py:129-169):
    * "NN. desc - qty price total." round trip.
    */
  def invoiceLineQ(s: SparkSession, dir: String): DataFrame = {
    val qty = col("l_quantity").cast("string")
    // floor-cents: engine-exact (see fixNullTotalQ)
    val price = (floor(col("l_extendedprice") * 100) / 100.0).cast("string")
    val total = (floor(col("l_quantity") * col("l_extendedprice") * 100) / 100.0)
      .cast("string")
    val line = concat(col("l_linenumber").cast("string"), lit(". "),
      col("p_name"), lit(" - "), qty, lit(" "), price, lit(" "), total, lit("."))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        Parse.invoiceLine(line).as("p"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("p.description").as("description"), col("p.qty").as("qty"),
        col("p.price").as("price"), col("p.total").as("total"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** p06 — document-type routing (pipeline_runner.py:4-21). */
  def docTypeQ(s: SparkSession, dir: String): DataFrame = {
    val name = when(col("doc_id") % 6 === 0, "DA00564 Award Letter.pdf")
      .when(col("doc_id") % 6 === 1, "DA00539_Bid Tabs.pdf")
      .when(col("doc_id") % 6 === 2, "DA00542 Invitation to Bid.pdf")
      .when(col("doc_id") % 6 === 3, "L230201A_Item C Report.pdf")
      .when(col("doc_id") % 6 === 4, "DA00543_Bids As Read.pdf")
      .otherwise("receipt_0001.jpg")
    Tables.documents(s, dir)
      .select(col("doc_id"), name.as("file_name"),
        Parse.docType(name, lit(null)).as("doc_type"))
      .orderBy(col("doc_id"))
  }

  /** p07 — null-total repair (parse_utils.py:110-116). */
  def fixNullTotalQ(s: SparkSession, dir: String): DataFrame = {
    // floor-cents instead of round: bit-identical across engines (no
    // round-half-mode divergence on exact .xx5 ties)
    val subtotal = floor(col("o_totalprice") * 90) / 100.0
    val tax = floor(col("o_totalprice") * 10) / 100.0
    val total = when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
      .otherwise(col("o_totalprice"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        Parse.fixNullTotal(total, subtotal, tax).as("total_amount"))
      .orderBy(col("o_orderkey"))
  }

  /** p08 — invoice-number extraction (parse_utils.py:188-198):
    * 'TAX INVOICE #NNN' and 'RNNNNNNN' forms.
    */
  def invoiceNumberQ(s: SparkSession, dir: String): DataFrame = {
    val key = (col("o_orderkey") + 100000).cast("string")
    val str = when(col("o_orderkey") % 2 === 0,
        concat(lit("TAX INVOICE #"), key))
      .otherwise(concat(lit("Ref R"), lpad(key, 7, "0"), lit(" end")))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), Parse.invoiceNumber(str).as("invoice_number"))
      .orderBy(col("o_orderkey"))
  }

  /** p09 — OCR word→line grouping by y-tolerance
    * (ocr_utils.py:89-126 `group_ocr_words`): events act as OCR words
    * (page=user_id, y0=int(value), x0=event_id, word=event_type).
    * Chain rule: consecutive-y gap > 10 starts a new line. One shuffle
    * on user_id; the same lag+cumsum pattern sessionize uses.
    */
  def ocrLineGroupingQ(s: SparkSession, dir: String): DataFrame =
    groupOcrWords(Tables.events(s, dir)
      .select(col("user_id").as("page"), floor(col("value")).cast("int").as("y0"),
        col("event_id").as("x0"), col("event_type").as("word")))
      .orderBy(col("page"), col("line_id"))

  /** The reusable word→line grouping core (ocr_utils.py:89-126
    * `group_ocr_words`): input must carry (page, y0, x0, word); any
    * upstream word source — events projection (p09) or parsed
    * tesseract TSV (p20) — feeds the same chain rule.
    */
  def groupOcrWords(words: DataFrame): DataFrame = {
    val byPage = Window.partitionBy(col("page")).orderBy(col("y0"), col("x0"))
    words
      .withColumn("prev_y", lag(col("y0"), 1).over(byPage))
      .withColumn("new_line",
        when(col("prev_y").isNull || col("y0") - col("prev_y") > 10, 1)
          .otherwise(0))
      .withColumn("line_id", sum(col("new_line")).over(byPage))
      .groupBy(col("page"), col("line_id"))
      .agg(count(lit(1)).as("n_words"),
        min(col("y0")).as("y_top"), max(col("y0")).as("y_bottom"),
        array_join(
          transform(array_sort(collect_list(struct(col("y0"), col("x0"), col("word")))),
            t => t.getField("word")), " ").as("line_text"))
  }

  /** Parses tesseract `image_to_data` TSV text into word rows — the
    * reference's `read_bbox_and_words` ingestion (ocr_utils.py:17-34):
    * header skipped, only level-5 (word) rows with non-negative conf
    * and non-blank text survive, and the (x2, y2) corner is
    * left+width / top+height exactly as the reference derives it.
    * Pure string splitting inside whole-stage codegen; `df` carries
    * `keyCols` and the TSV text in `tsvCol` (one document per row).
    */
  def ocrTsvRows(df: DataFrame, tsvCol: String, keyCols: Seq[String]): DataFrame = {
    val f = col("f")
    df.select(keyCols.map(col) :+ explode(split(col(tsvCol), "\n")).as("l"): _*)
      .withColumn("f", split(col("l"), "\t"))
      // tesseract TSV: level page block par line word left top w h conf text
      .filter(size(f) >= 12 && element_at(f, 1) === "5" &&
        element_at(f, 11).cast("double") >= 0 &&
        trim(element_at(f, 12)) =!= "")
      .select(keyCols.map(col) ++ Seq(
        element_at(f, 2).cast("int").as("page"),
        element_at(f, 3).cast("int").as("block_num"),
        element_at(f, 4).cast("int").as("par_num"),
        element_at(f, 5).cast("int").as("line_num"),
        element_at(f, 6).cast("int").as("word_num"),
        element_at(f, 7).cast("int").as("x0"),
        element_at(f, 8).cast("int").as("y0"),
        (element_at(f, 7).cast("int") + element_at(f, 9).cast("int")).as("x2"),
        (element_at(f, 8).cast("int") + element_at(f, 10).cast("int")).as("y2"),
        element_at(f, 11).cast("double").as("conf"),
        element_at(f, 12).as("text")): _*)
  }

  /** p20 — OCR TSV ingestion under the oracle: one synthetic
    * tesseract-TSV document per page (header row, a structural
    * level-2/conf=-1 row, and one level-5 word row per event),
    * re-parsed by the shared `ocrTsvRows`. The oracle computes the
    * surviving word rows directly from the events table, so the
    * equality proves the TSV round-trip (header/structural filtering,
    * bbox arithmetic) — the same transform `group_ocr_words` (p09)
    * consumes on real tesseract output.
    */
  def ocrTsvQ(s: SparkSession, dir: String): DataFrame = {
    val header =
      "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext"
    val wordLine = concat_ws("\t", lit("5"), col("user_id").cast("string"),
      lit("1"), lit("1"), lit("1"), col("event_id").cast("string"),
      col("event_id").cast("string"),
      floor(col("value")).cast("int").cast("string"),
      (length(col("event_type")) * 7).cast("string"), lit("12"),
      (lit(90) + pmod(col("event_id"), lit(10))).cast("double").cast("string"),
      col("event_type"))
    val tsv = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), wordLine.as("wl"))
      .groupBy(col("user_id"))
      .agg(concat_ws("\n",
        lit(header),
        // structural row: level 2, conf -1, empty text — must be dropped
        concat_ws("\t", lit("2"), col("user_id").cast("string"), lit("1"),
          lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"), lit("0"),
          lit("-1"), lit("")),
        array_join(transform(
          array_sort(collect_list(struct(col("event_id"), col("wl")))),
          t => t.getField("wl")), "\n")).as("tsv"))
      .select(concat(lit("page_"), col("user_id").cast("string")).as("filename"),
        col("tsv"))
    ocrTsvRows(tsv, "tsv", Seq("filename"))
      .orderBy(col("filename"), col("x0"))
  }

  /** p12 — whole-document detail-line parsing, the shape of the NC
    * 'CONTRACT BIDS AS READ' parser (parse_utils.py:943-1094): one
    * synthetic document per customer (header + one money line per
    * order, assembled in-engine), then the parser explodes lines,
    * filters money lines, and extracts contractor + amount — one row
    * per bid. Demonstrates group→document→explode round-tripping at
    * scan speed.
    */
  def ncBidLinesQ(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100).cast("long")
    val amountStr = concat((cents / 100).cast("long").cast("string"),
      lit("."), lpad(pmod(cents, lit(100)).cast("string"), 2, "0"))
    val line = concat(lit("VENDOR "), col("o_custkey").cast("string"),
      lit("-"), col("o_orderkey").cast("string"), lit(" $"), amountStr)
    val docs = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), line.as("line"))
      .groupBy(col("o_custkey"))
      .agg(concat_ws("\n",
        lit("CONTRACT BIDS AS READ") +:
        Seq(array_join(transform(
          array_sort(collect_list(struct(col("o_orderkey"), col("line")))),
          t => t.getField("line")), "\n")): _*).as("doc"))
    // the shared document-level parser (NcDocs.parseBidsAsRead) is the
    // same code the router runs on real files — the query synthesizes
    // reference-shaped documents and projects its bid columns
    NcDocs.parseBidsAsRead(docs, "doc", Seq("o_custkey"))
      .select(col("o_custkey"), col("contractor_name"), col("amount_bid"))
      .orderBy(col("o_custkey"), col("contractor_name"))
  }

  /** p13 — NC 'Bid Tabs' whole-document parsing
    * (parse_utils.py:1099-1425 `parse_nc_bid_tabs`): one synthetic
    * document per order — a vendor-name header block (two
    * company-suffix lines, the reference's bidder list) above item
    * lines "NNNN <item_no> <sect> <description> <qty> EA $u1 $a1 $u2
    * $a2" — parsed by the SAME shared parser the doc-type router runs
    * on real files (NcDocs.parseBidTabs): per-line token surgery, the
    * qty/unit layout cases, and the one-line→N-bidder fan-out against
    * the header's bidder list.
    */
  def ncBidTabsQ(s: SparkSession, dir: String): DataFrame = {
    val u1 = Parse.centsStr(col("l_extendedprice") / col("l_quantity"))
    val a1 = Parse.centsStr(col("l_extendedprice"))
    val u2 = Parse.centsStr(col("l_extendedprice") * 1.1 / col("l_quantity"))
    val a2 = Parse.centsStr(col("l_extendedprice") * 1.1)
    val line = concat(lpad(col("l_linenumber").cast("string"), 4, "0"),
      lit(" "), lpad(col("l_partkey").cast("string"), 10, "0"), lit("-N S1 "),
      col("p_name"), lit(" "),
      col("l_quantity").cast("int").cast("string"), lit(" EA $"),
      u1, lit(" $"), a1, lit(" $"), u2, lit(" $"), a2)
    val docs = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), line.as("line"))
      .groupBy(col("l_orderkey"))
      .agg(concat_ws("\n",
        lit("ACME PAVING INC\nBLUE RIDGE CONSTRUCTION LLC") +:
        Seq(array_join(transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("line")))),
          t => t.getField("line")), "\n")): _*).as("doc"))
    NcDocs.parseBidTabs(docs, "doc", Seq("l_orderkey"))
      .select(col("l_orderkey"), col("line_no").cast("int").as("l_linenumber"),
        col("description"), col("qty"), col("bidder_index"),
        col("unit_price"), col("amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("bidder_index"))
  }

  /** p14 — OCR receipt product-line parsing
    * (parse_utils.py:318-809 `extract_product_info` PRICE_PATTERNS):
    * the five SKU/qty/price layout variants constructed by key and
    * parsed back with the multi-pattern receipt parser.
    */
  def receiptLinesQ(s: SparkSession, dir: String): DataFrame = {
    val sku = (col("l_partkey") + 10000).cast("string")
    val qty = col("l_quantity").cast("int").cast("string")
    val price = Parse.centsStr(col("l_extendedprice") / col("l_quantity"))
    val total = Parse.centsStr(col("l_extendedprice"))
    val k = col("l_orderkey") % 5
    val line = when(k === 0, concat_ws(" ", sku, qty, lit("X"), price, total))
      .when(k === 1, concat_ws(" ", sku, lit("X"), price, total))
      .when(k === 2, concat_ws(" ", sku, price, qty, lit("X"), total))
      .when(k === 3, concat_ws(" ", price, qty, lit("X"), total))
      .otherwise(concat_ws(" ", qty, lit("X"), price, total))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        Parse.receiptLine(line).as("p"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("p.sku").as("sku"), col("p.qty").as("qty"),
        col("p.unit_price").as("unit_price"),
        col("p.line_total").as("line_total"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** p15 — NC 'Item C' report parsing (parse_utils.py:1479-1718
    * `parse_nc_item_c`): one synthetic Item C page per order — STATE
    * OF/DEPARTMENT header, month-name letting date, DA##### contract
    * line, FED AID project number + county line, TYPE OF WORK /
    * LOCATION labels, owner-cost ESTIMATE money scan, FINAL COMPLETION
    * date, and a "$ TOTALS"→"ESTIMATE TOTAL" vendor section emitting
    * one row per vendor bid. All regex fields stay in codegen; the
    * vendor fan-out is one explode.
    */
  def ncItemCQ(s: SparkSession, dir: String): DataFrame = {
    val key5 = lpad(col("o_orderkey").cast("string"), 5, "0")
    val ck = col("o_custkey").cast("string")
    val lettingStr = upper(date_format(col("o_orderdate"), "MMMM d, yyyy"))
    val compStr = upper(date_format(date_add(col("o_orderdate"), 180), "MMMM d, yyyy"))
    val doc = concat_ws("\n",
      lit("STATE OF NORTH CAROLINA"),
      lit("DEPARTMENT OF TRANSPORTATION"),
      concat(lit("LETTING OF "), lettingStr),
      concat(lit("DA"), key5),
      concat(lit("FED AID NO: BRZ-"), col("o_orderkey").cast("string")),
      lit("Craven"),
      concat(lit("TYPE OF WORK "), col("o_orderpriority")),
      concat(lit("LOCATION NC-"), ck),
      concat(lit("ESTIMATE "), Parse.centsStr(col("o_totalprice"))),
      concat(lit("FINAL COMPLETION "), compStr),
      lit("$ TOTALS"),
      concat(lit("VENDOR "), ck, lit("-A "), Parse.centsStr(col("o_totalprice") * 0.95)),
      concat(lit("VENDOR "), ck, lit("-B "), Parse.centsStr(col("o_totalprice") * 1.05)),
      concat(lit("ESTIMATE TOTAL "), Parse.centsStr(col("o_totalprice"))))
    NcDocs.parseItemC(
        Tables.orders(s, dir).select(col("o_orderkey"), doc.as("doc")),
        "doc", Seq("o_orderkey"))
      .orderBy(col("o_orderkey"), col("vendor_name"))
  }

  /** p16 — NC 'Invitation to Bid' parsing (parse_utils.py:1721-1877
    * `parse_nc_invitation_to_bid`): STATE/owner header (bounded scan),
    * Division line (trailing colon stripped), the "Requesting
    * bids…"-anchored "<id> – <description>" line, and the Completion
    * Date / Bid Opening month-name dates — one row per document.
    */
  def ncInvitationQ(s: SparkSession, dir: String): DataFrame = {
    val key5 = lpad(col("o_orderkey").cast("string"), 5, "0")
    val divN = (col("o_custkey") % 14 + 1).cast("string")
    // completion in title case, letting uppercase — both must parse
    val compStr = date_format(date_add(col("o_orderdate"), 365), "MMMM d, yyyy")
    val lettingStr = upper(date_format(col("o_orderdate"), "MMMM d, yyyy"))
    val doc = concat_ws("\n",
      lit("STATE OF NORTH CAROLINA"),
      lit("DEPARTMENT OF TRANSPORTATION"),
      concat(lit("Division "), divN, lit(":")),
      lit("NOTICE TO PROSPECTIVE BIDDERS"),
      lit("Requesting bids for the following project"),
      concat(lit("DA"), key5, lit(" - "), col("o_orderpriority")),
      concat(lit("The Completion Date for this Contract is "), compStr),
      concat(lit("Bid Opening will be held on "), lettingStr))
    NcDocs.parseInvitation(
        Tables.orders(s, dir).select(col("o_orderkey"), doc.as("doc")),
        "doc", Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** p17 — NC 'Notification of Award' letter parsing
    * (parse_utils.py:832-940 `parse_nc_award_letter`): label:value
    * header block plus three prose scans (awarded vendor, bid
    * submission date, award amount) — one row per letter. With p12
    * (bids-as-read), p13 (bid tabs), p15 (Item C) and p16
    * (invitation), all five routed NC doc types now have a dedicated
    * parser.
    */
  def ncAwardLetterQ(s: SparkSession, dir: String): DataFrame = {
    val key5 = lpad(col("o_orderkey").cast("string"), 5, "0")
    val lettingStr = date_format(col("o_orderdate"), "MMMM d, yyyy")
    val doc = concat_ws("\n",
      lit("STATE OF NORTH CAROLINA"),
      lit("DEPARTMENT OF TRANSPORTATION"),
      lit("NOTIFICATION OF AWARD"),
      concat(lit("Contract No. DA"), key5),
      lit("Federal Aid No.: STATE FUNDED"),
      lit("County: Craven"),
      concat(lit("Description: "), col("o_orderpriority")),
      concat(lit("We are pleased to inform you that VENDOR "),
        col("o_custkey").cast("string"),
        lit(" has been awarded this contract")),
      concat(lit("based on the bid submitted on "), lettingStr,
        lit(" in the amount of $"), Parse.centsStr(col("o_totalprice"))))
    NcDocs.parseAwardLetter(
        Tables.orders(s, dir).select(col("o_orderkey"), doc.as("doc")),
        "doc", Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** p18 — the pipeline's per-file metadata extractor
    * (InvoicePipeline.fileMetadata ← reference
    * extract_invoice_metadata, parse_utils.py:172-296) under the
    * oracle gate: one synthetic invoice document per order (supplier
    * + address lines, TIN, TAX INVOICE #, dates, GST, Sub Total,
    * TOTAL), exploded to (path, line_no, line) rows and run through
    * the REAL fileMetadata aggregation — so the driver verifies the
    * same code path the end-to-end pipeline uses.
    */
  def invoiceMetadataQ(s: SparkSession, dir: String): DataFrame = {
    val ck = col("o_custkey").cast("string")
    val gst = (col("o_orderkey") % 3 * 2 + 4).cast("int").cast("string")
    val docLines = array(
      concat(lit("SUPPLIER "), ck, lit(" CORP")),
      concat(lit("12 MAIN ST UNIT "), ck),
      concat(lit("TIN: "), (col("o_custkey") + 1000000000L).cast("string")),
      concat(lit("TAX INVOICE #"), (col("o_orderkey") + 100000).cast("string")),
      concat(lit("Invoice Date: "), date_format(col("o_orderdate"), "MMM d, yyyy")),
      concat(lit("Due Date: "), date_format(date_add(col("o_orderdate"), 30),
        "yyyy-MM-dd")),
      concat(lit("GST "), gst, lit("%")),
      concat(lit("Sub Total "), Parse.centsStr(col("o_totalprice"))),
      concat(lit("TOTAL "), Parse.centsStr(col("o_totalprice") * 1.06)))
    val lines = Tables.orders(s, dir)
      .select(col("o_orderkey").cast("string").as("path"),
        col("o_orderkey").cast("string").as("file_name"),
        lit("invoice").as("doc_type"),
        posexplode(docLines).as(Seq("line_no", "line")))
    graft.pipeline.InvoicePipeline.fileMetadata(lines)
      .select(col("path").cast("long").as("o_orderkey"),
        col("supplier_name"), col("supplier_tin"), col("invoice_number"),
        col("invoice_date"), col("due_date"), col("tax_label"),
        col("subtotal_amount"), col("total_amount"))
      .orderBy(col("o_orderkey"))
  }

  /** p19 — the pipeline's table-section extractor
    * (InvoicePipeline.lineItems ← reference extract_table_section,
    * parse_utils.py:299-308) under the oracle gate: per order, a
    * synthetic document with preamble noise, the table header, one
    * "N. desc - qty price total." line per lineitem, and the
    * "Sub Total" terminator — run through the REAL lineItems
    * window-state machine (rows outside header→SubTotal must be
    * ignored, rows inside parse via Parse.invoiceLine).
    */
  def invoiceLinesQ(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val pre = orders.select(col("o_orderkey").cast("string").as("path"),
      explode(array(
        struct(lit(0).as("line_no"),
          concat(lit("INVOICE FOR CUSTOMER "), col("o_custkey")).as("line")),
        struct(lit(1).as("line_no"), lit("ID DESCRIPTION QTY PRICE TOTAL").as("line")),
        struct(lit(1000).as("line_no"),
          concat(lit("Sub Total "), Parse.centsStr(col("o_totalprice"))).as("line")),
        struct(lit(1001).as("line_no"),
          // after the terminator: must NOT parse as an item
          lit("99. POISON ROW - 1 1.00 1.00.").as("line")))).as("x"))
      .select(col("path"), col("x.line_no").as("line_no"), col("x.line").as("line"))
    val items = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").cast("string").as("path"),
        (col("l_linenumber") + 1).as("line_no"),
        concat(col("l_linenumber").cast("string"), lit(". "), col("p_name"),
          lit(" - "), col("l_quantity").cast("string"), lit(" "),
          Parse.centsStr(col("l_extendedprice")), lit(" "),
          Parse.centsStr(col("l_quantity") * col("l_extendedprice")), lit("."))
          .as("line"))
    graft.pipeline.InvoicePipeline.lineItems(pre.union(items))
      .select(col("path").cast("long").as("o_orderkey"),
        (col("line_no") - 1).cast("int").as("l_linenumber"),
        col("description"), col("qty"), col("price"), col("total"))
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  /** p10 — NC label:value extraction (parse_utils.py:853-877 and the
    * other NC parsers): multi-line label blocks round-tripped.
    */
  def ncLabelExtractQ(s: SparkSession, dir: String): DataFrame = {
    val contractId = concat(lit("DA"), lpad(col("o_orderkey").cast("string"), 5, "0"))
    val text = concat(
      lit("Contract No. "), contractId, lit("\n"),
      lit("County: Craven\n"),
      lit("Description: "), col("o_orderpriority"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        Parse.labelValue(text, "Contract No\\.").as("contract_id"),
        Parse.labelValue(text, "County").as("county"),
        Parse.labelValue(text, "Description").as("description"))
      .orderBy(col("o_orderkey"))
  }
}
