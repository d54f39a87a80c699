package graft.operators

import graft.functions.Parse
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-document NC parsers as reusable column sets: the same field
  * extraction backs both the oracle-checked queries (ParseOps
  * p15/p16, which synthesize documents from table columns) and
  * InvoicePipeline's doc-type router over real files — exactly the
  * reference's parse_document_by_type split
  * (parse_utils.py:1882-1945).
  */
object NcDocs {

  private val vendorLinePat = "^(.*?)\\s*([\\d,]+\\.\\d{2})$"

  /** The "$ TOTALS" → "ESTIMATE TOTAL"/"LETTING TOTAL" vendor block
    * (parse_utils.py:1645-1674).
    */
  def vendorSection(doc: Column): Column =
    regexp_extract(doc,
      "(?s)\\$ TOTALS\\n(.*?)\\n(?:ESTIMATE TOTAL|LETTING TOTAL)", 1)

  /** Item C over whole documents: `df` must carry `keyCols` and the
    * document text in `docCol`; emits one row per vendor bid with all
    * scalar fields repeated (the reference's record-per-vendor shape).
    *
    * A real Item C report carries MULTIPLE "DA#####" contract blocks
    * per page (reference splits on the contract-id lines,
    * parse_utils.py:1534-1543); the document is split the same way
    * (zero-width lookahead before each DA line) and each block parses
    * independently. Page-level fields (headers, letting date) come
    * from the whole document, exactly as the reference does.
    */
  def parseItemC(df: DataFrame, docCol: String, keyCols: Seq[String]): DataFrame = {
    val doc = col(docCol)
    val pageFields = Seq(
      Parse.ncStateHeader(doc).as("state_header"),
      Parse.ncOwnerHeader(doc).as("owner_header"),
      Parse.monthNameDate(doc).as("letting_date"))
    val blockFields = Seq(
      regexp_extract(col("blk"), "(?m)^(DA\\d{5})$", 1).as("contract_id"),
      Parse.labelValue(col("blk"), "FED AID NO").as("project_number"),
      regexp_extract(col("blk"), "(?m)^FED AID NO[^\\n]*\\n([^\\n]+)", 1)
        .as("county"),
      Parse.labelValue(col("blk"), "TYPE OF WORK").as("proposal_description"),
      Parse.labelValue(col("blk"), "LOCATION").as("location"),
      Parse.parseFloat(regexp_extract(col("blk"),
        "ESTIMATE\\s+([\\d,]+\\.\\d{2})", 1)).as("owner_cost_estimate"),
      Parse.monthNameDateAfter(col("blk"), "FINAL COMPLETION")
        .as("final_completion"))
    df.select(keyCols.map(col) ++ pageFields :+
        // split into per-contract blocks at each DA##### line
        explode(split(doc, "(?m)(?=^DA\\d{5}$)")).as("blk"): _*)
      .filter(col("blk").rlike("(?m)^DA\\d{5}$"))
      .select(keyCols.map(col) ++
        Seq(col("state_header"), col("owner_header"), col("letting_date")) ++
        blockFields :+
        explode(split(vendorSection(col("blk")), "\n")).as("vl"): _*)
      .filter(regexp_extract(col("vl"), "[\\d,]+\\.\\d{2}", 0) =!= "")
      .withColumn("vendor_name", trim(regexp_extract(col("vl"), vendorLinePat, 1)))
      .withColumn("bid_value",
        Parse.parseFloat(regexp_extract(col("vl"), vendorLinePat, 2)))
      .drop("vl")
  }

  /** Invitation to Bid fields (parse_utils.py:1721-1877
    * `parse_nc_invitation_to_bid`): headers, Division line (trailing
    * colon stripped), the "Requesting bids…"-anchored
    * "<id> – <description>" line, Completion Date / Bid Opening
    * month-name dates.
    */
  def invitationFields(doc: Column): Seq[Column] = {
    val reqNext = regexp_extract(doc, "(?i)REQUESTING BIDS[^\\n]*\\n([^\\n]+)", 1)
    val idDescPat = "^\\s*(\\S+)\\s*[–-]\\s*(.+)$"
    Seq(
      Parse.ncStateHeader(doc).as("state_header"),
      Parse.ncOwnerHeader(doc).as("owner_header"),
      rtrim(Parse.headerLine(doc, "(?i)\\bDIVISION\\b"), ":").as("division"),
      regexp_extract(reqNext, idDescPat, 1).as("contract_id"),
      regexp_extract(reqNext, idDescPat, 2).as("proposal_description"),
      Parse.monthNameDateAfter(doc, "Completion Date").as("completion_date"),
      Parse.monthNameDateAfter(doc, "Bid Opening").as("letting_date"))
  }

  /** Invitation to Bid over whole documents — one row per document. */
  def parseInvitation(df: DataFrame, docCol: String,
      keyCols: Seq[String]): DataFrame =
    df.select(keyCols.map(col) ++ invitationFields(col(docCol)): _*)

  /** Award Letter fields (parse_utils.py:832-940
    * `parse_nc_award_letter`): Contract No. / Federal Aid No. /
    * County / Description label lines, the "inform you that <vendor>
    * has been" prose scan, "bid submitted on <date>", and the
    * "amount … $N.NN" award value.
    */
  def awardLetterFields(doc: Column): Seq[Column] = Seq(
    Parse.ncStateHeader(doc).as("state_header"),
    Parse.ncOwnerHeader(doc).as("owner_header"),
    Parse.labelValue(doc, "Contract No\\.").as("contract_id"),
    Parse.labelValue(doc, "Federal Aid No\\.").as("project_number"),
    Parse.labelValue(doc, "County").as("county"),
    Parse.labelValue(doc, "Description").as("description"),
    trim(regexp_extract(doc, "(?is)inform you that\\s+(.+?)\\s+has been", 1))
      .as("vendor"),
    Parse.monthNameDateAfter(doc, "bid submitted on").as("letting_date"),
    Parse.parseFloat(regexp_extract(doc,
      "(?is)amount\\b.*?\\$?\\s*([\\d,]+\\.\\d{2})", 1)).as("award_value"))

  /** Award Letter over whole documents — one row per document. */
  def parseAwardLetter(df: DataFrame, docCol: String,
      keyCols: Seq[String]): DataFrame =
    df.select(keyCols.map(col) ++ awardLetterFields(col(docCol)): _*)
}
