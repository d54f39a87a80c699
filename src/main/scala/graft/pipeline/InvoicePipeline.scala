package graft.pipeline

import graft.functions.Parse
import graft.sources.DocSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end distributed twin of the reference's
  * run_extraction_pipeline (lib/pipeline_runner.py:45-179): a
  * directory of raw documents → per-line text → per-file metadata +
  * line items → one flat invoices DataFrame with the reference's
  * `invoices` schema (analytics.sql:13-34).
  *
  * The PDF/OCR decode step is the stubbed multimodal path (no pdf or
  * tesseract libs in this container): text-bearing files are decoded
  * in-engine; scanned media would enter through
  * operators.Multimodal.extractFeatures. Everything downstream —
  * routing, parsing, assembly — is the real engine.
  *
  * Scale design: one shuffle (groupBy path) builds per-file metadata;
  * line items stay row-parallel and join the broadcast metadata —
  * at 100 TB the unit of work is a file, and files partition evenly.
  */
object InvoicePipeline {

  /** Per-file metadata the reference extracts in
    * extract_invoice_metadata (parse_utils.py:172-296): first
    * non-empty lines = supplier, regex scans for TIN / invoice number
    * / dates / GST amounts.
    */
  def fileMetadata(lines: DataFrame): DataFrame = {
    val l = col("line")
    // earliest non-null value by line number — deterministic under any
    // partitioning/retry order (first(ignoreNulls) is not)
    val firstNonNull: Column => Column = c =>
      min(when(c.isNotNull, struct(col("line_no"), c.as("v")))).getField("v")
    // one projection, not 9 chained withColumns: none of these columns
    // reference each other, and the chain's per-Project analyzer +
    // codegen cost dominated p13's profile (SURVEY §5 r8 note)
    lines
      .select(col("path"), col("file_name"), col("doc_type"), col("line_no"),
        when(regexp_extract(l, "(?i)(?<!G)TIN[:\\s]+(\\d+)", 1) =!= "",
          regexp_extract(l, "(?i)(?<!G)TIN[:\\s]+(\\d+)", 1)).as("tin"),
        Parse.invoiceNumber(l).as("inv_no"),
        when(lower(l).contains("invoice date"),
          Parse.parseDateMulti(regexp_extract(l, "(?i)Invoice Date[:\\s]+(.+)", 1)))
          .as("inv_date"),
        Parse.findDate(l).as("any_date"),
        when(lower(l).contains("due date"),
          Parse.parseDateMulti(regexp_extract(l, "(?i)Due Date[:\\s]+(.+)", 1)))
          .as("due_date"),
        when(upper(l).contains("GST"), Parse.taxRate(l)).as("gst_rate"),
        when(lower(l).rlike("sub\\s*total"),
          Parse.parseFloat(regexp_extract(l, "([\\d,]+\\.\\d+)", 1)))
          .as("subtotal"),
        when(upper(l).rlike("^TOTAL\\b"),
          Parse.parseFloat(regexp_extract(l, "([\\d,]+\\.\\d+)", 1)))
          .as("grand_total"),
        when(col("line_no") < 2 && trim(l) =!= "", trim(l))
          .as("supplier_line"))
      .groupBy(col("path"), col("file_name"), col("doc_type"))
      .agg(
        // line_no-ordered join of the first lines (collect_list order
        // is nondeterministic; the struct sort pins it)
        array_join(transform(array_sort(collect_list(
            when(col("supplier_line").isNotNull,
              struct(col("line_no"), col("supplier_line"))))),
          t => t.getField("supplier_line")), " ").as("supplier_name"),
        firstNonNull(col("tin")).as("supplier_tin"),
        firstNonNull(col("inv_no")).as("invoice_number"),
        coalesce(firstNonNull(col("inv_date")), min(col("any_date")))
          .as("invoice_date"),
        firstNonNull(col("due_date")).as("due_date"),
        firstNonNull(col("gst_rate")).as("tax_label"),
        firstNonNull(col("subtotal")).as("subtotal_amount"),
        firstNonNull(col("grand_total")).as("total_amount"))
  }

  /** Line items: the reference's table section between the header and
    * 'Sub Total' (extract_table_section, parse_utils.py:299-308),
    * parsed row-parallel with Parse.invoiceLine.
    */
  def lineItems(lines: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("line_no"))
    lines
      .withColumn("in_table",
        sum(when(col("line").contains("ID DESCRIPTION QTY PRICE TOTAL"), 1)
          .when(col("line").contains("Sub Total"), -1).otherwise(0)).over(w))
      // row filter = the bare MATCH TEST (true exactly where the
      // parsed description is non-null — the old struct-field filter
      // forced the packed replace + from_csv to evaluate even under a
      // count-pruned plan, the r13 p19 regression); non-item rows die
      // here before any field decoding runs on them
      .filter(col("in_table") === 1 &&
        !col("line").contains("ID DESCRIPTION QTY PRICE TOTAL") &&
        Parse.invoiceLineMatches(col("line")))
      .select(col("path"), col("line_no"), Parse.invoiceLine(col("line")).as("p"))
      .select(col("path"), col("line_no"),
        col("p.description"), col("p.qty"), col("p.price"), col("p.total"))
  }

  /** Full pipeline: root dir → invoices-schema DataFrame (one row per
    * line item, metadata repeated — exactly the reference's flat
    * `invoices` table).
    */
  def run(spark: SparkSession, root: String, companyId: Int = 1,
      country: String = "US", processedDate: String = "2026-08-12"): DataFrame = {
    val lines = DocSource.textLines(DocSource.scanFiles(spark, root))
      .filter(trim(col("line")) =!= "")
      // referenced by both the metadata aggregate and the line-item
      // pass — cache so the files are read and line-split once
      .cache()
    val meta = fileMetadata(lines)
    val items = lineItems(lines)
    items.join(meta, "path")
      .select(
        lit(companyId).as("company_id"),
        lit(country).as("country"),
        to_date(lit(processedDate)).as("processed_date"),
        col("supplier_name"), col("supplier_tin"),
        col("invoice_number"), col("invoice_date"), col("due_date"),
        col("description"), col("qty"), col("price"), col("total"),
        col("tax_label"),
        (col("subtotal_amount") * col("tax_label") / lit(100.0)).as("tax_amount"),
        Parse.fixNullTotal(col("total_amount"), col("subtotal_amount"),
          col("subtotal_amount") * col("tax_label") / lit(100.0)).as("total_amount"),
        col("file_name").as("file"))
  }

  /** Doc-type router (reference parse_document_by_type,
    * parse_utils.py:1882-1945): whole-file text fans out to the parser
    * its doc_type routes to. NC structured docs parse document-at-a-
    * time (NcDocs); `invoice` files flow through `run`'s
    * line-granular path. Unrouted types fall through as raw text —
    * same contract as the reference's final return.
    */
  def routeNcDocs(spark: SparkSession, root: String): Map[String, DataFrame] = {
    val docs = DocSource.scanFiles(spark, root)
      .withColumn("text", decode(col("content"), "UTF-8"))
      .select(col("path"), col("file_name"), col("doc_type"), col("text"))
    val keys = Seq("path", "file_name")
    def typed(t: String) = docs.filter(col("doc_type") === t)
    Map(
      "nc_item_c" -> graft.operators.NcDocs.parseItemC(
        typed("nc_item_c"), "text", keys),
      "nc_invitation_to_bid" -> graft.operators.NcDocs.parseInvitation(
        typed("nc_invitation_to_bid"), "text", keys),
      "nc_award_letter" -> graft.operators.NcDocs.parseAwardLetter(
        typed("nc_award_letter"), "text", keys),
      "nc_bids_as_read" -> graft.operators.NcDocs.parseBidsAsRead(
        typed("nc_bids_as_read"), "text", keys),
      "nc_bid_tabs" -> graft.operators.NcDocs.parseBidTabs(
        typed("nc_bid_tabs"), "text", keys),
      "other" -> docs.filter(!col("doc_type")
        .isin("nc_item_c", "nc_invitation_to_bid", "nc_award_letter",
          "nc_bids_as_read", "nc_bid_tabs", "invoice"))
        .select(col("path"), col("file_name"), col("doc_type"),
          col("text").as("raw_text")))
  }

  /** The reference run loop's FINAL shape: every routed document's
    * typed rows appended into ONE frame (pipeline_runner.py
    * accumulates all parsers' records into a single DataFrame before
    * the load). Schemas differ per type, so the union is by-name with
    * missing columns nulled — exactly what the reference's
    * heterogeneous record dicts produce — plus a doc_type
    * discriminator per row.
    */
  def parseAllNcDocs(spark: SparkSession, root: String): DataFrame = {
    val routed = routeNcDocs(spark, root)
    Seq("nc_item_c", "nc_invitation_to_bid", "nc_award_letter",
      "nc_bids_as_read", "nc_bid_tabs", "other")
      .map(t => routed(t).withColumn("doc_type", lit(t)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** The reference's five analytics queries (analytics.sql:56-100)
    * verbatim over a pipeline-produced invoices DataFrame.
    */
  object Analytics {
    def docsProcessed(inv: DataFrame): DataFrame =
      inv.groupBy(col("invoice_number").as("invoice"))
        .agg(countDistinct(col("invoice_number")).as("quantity"))
        .orderBy(col("invoice"))

    def totalValue(inv: DataFrame): DataFrame =
      inv.groupBy(col("invoice_number").as("invoice"))
        .agg(sum_distinct(col("total_amount")).as("total_value"))
        .orderBy(col("total_value").desc)

    def topSuppliers(inv: DataFrame, n: Int = 5): DataFrame =
      inv.groupBy(col("supplier_name"))
        .agg(sum(col("total_amount")).as("total_spent"))
        .orderBy(col("total_spent").desc).limit(n)

    def commonProducts(inv: DataFrame, n: Int = 5): DataFrame =
      inv.groupBy(col("description"))
        .agg(count(lit(1)).as("occurrences"))
        .orderBy(col("occurrences").desc).limit(n)

    def monthlyTrend(inv: DataFrame): DataFrame =
      inv.groupBy(date_format(date_trunc("month", col("invoice_date")),
          "MMM yyyy").as("month"))
        .agg(sum(col("total_amount")).as("total_value"),
          min(col("invoice_date")).as("_first"))
        .orderBy(col("_first")).drop("_first")
  }
}
