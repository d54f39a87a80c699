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
        // split into per-contract blocks at each DA##### line. The
        // delimiter consumes the PRECEDING newline so the regex engine
        // only attempts matches at '\n' positions — the r8 p15 profile
        // measured the old per-character zero-width form
        // ("(?m)(?=^DA\d{5}$)") at 1.3 s of the query's 1.95 s. A
        // block therefore ends without its trailing newline, which no
        // block-field regex depends on ((?m)$ matches end-of-string).
        explode(split(doc, "\\n(?=DA\\d{5}(\\n|$))")).as("blk"): _*)
      // blocks were split AT every DA##### line, so a block contains
      // one iff it STARTS with one — anchored prefix test, no
      // multiline re-scan
      .filter(col("blk").rlike("^DA\\d{5}(\\n|$)"))
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

  private val moneyPat = "([\\d,]+\\.\\d{2})"

  /** 'CONTRACT BIDS AS READ' over whole documents
    * (parse_utils.py:943-1094 `parse_nc_bids_as_read`): doc-level
    * fields (headers, letting date/time, contract id, multiline
    * description, engineer's estimate, total bids received) repeated
    * onto one row per contractor money line; a document with no
    * parseable contractor lines still yields one row with the
    * doc-level fields (the reference's fallback record) via the left
    * join. All extraction is regex/Column — whole-stage codegen, one
    * explode, no shuffle beyond the caller's.
    */
  def parseBidsAsRead(df: DataFrame, docCol: String,
      keyCols: Seq[String]): DataFrame = {
    val doc = col(docCol)
    val dateRe = "(\\d{1,2}/\\d{1,2}/\\d{4})"
    // "bid opening" line, allowing the date on the following line
    val bidOpenSpan = regexp_extract(doc, "(?im)^(bid opening[^\\n]*\\n?[^\\n]*)", 1)
    def nonEmpty(c: Column): Column = when(c =!= "", c)
    val docFields = Seq(
      Parse.ncStateHeader(doc).as("state_header"),
      Parse.ncOwnerHeader(doc).as("owner_header"),
      coalesce(nonEmpty(regexp_extract(bidOpenSpan, dateRe, 1)),
        nonEmpty(regexp_extract(doc, dateRe, 1))).as("letting_date"),
      nonEmpty(regexp_extract(doc,
        "(?im)^time[^\\n]*?(\\d{1,2}:\\d{2}\\s*[AP]M)", 1)).as("letting_time"),
      // first "contract…" line carrying ≥5 digits on it, else the
      // line after one — digit-less title lines ("CONTRACT BIDS AS
      // READ") are scanned past, like the reference's line loop
      coalesce(
        nonEmpty(regexp_extract(doc, "(?im)^contract[^\\n]*?(\\d{5,})", 1)),
        nonEmpty(regexp_extract(doc,
          "(?im)^contract[^\\n]*\\n[^\\n]*?(\\d{5,})", 1))).as("contract_id"),
      // description: after the label, accumulating lines until the
      // CONTRACTOR table header (or end of document)
      nonEmpty(trim(regexp_replace(regexp_extract(doc,
        "(?ims)^description[:\\s]*(.*?)(?=^contractor\\b|\\z)", 1),
        "\\s+", " "))).as("description"),
      Parse.parseFloat(regexp_extract(doc,
        "(?i)ENGINEERS ESTIMATE\\s*\\$?\\s*" + moneyPat, 1))
        .as("engineers_estimate"),
      nonEmpty(regexp_extract(doc,
        "(?i)TOTAL BIDS RECEIVED[:\\s]*\\(?(\\d+)", 1)).cast("int")
        .as("total_bids_received"))
    // referenced twice (bidder-line fan-out + fallback join)
    val docs = df.select(keyCols.map(col) ++ docFields :+ doc.as("_doc"): _*)
      .cache()
    val linePat = "^(.*?)\\s*\\$?\\s*" + moneyPat + ".*$"
    val bidders = docs
      .select(keyCols.map(col) :+
        explode(split(col("_doc"), "\n")).as("l"): _*)
      .withColumn("l", trim(col("l")))
      .filter(regexp_extract(col("l"), moneyPat, 0) =!= "")
      .withColumn("contractor_name",
        trim(regexp_extract(col("l"), linePat, 1)))
      .filter(col("contractor_name") =!= "" &&
        !upper(col("contractor_name")).isin("CONTRACTOR", "AMOUNT BID"))
      .select(keyCols.map(col) :+ col("contractor_name") :+
        Parse.parseFloat(regexp_extract(col("l"), linePat, 2))
          .as("amount_bid"): _*)
    docs.drop("_doc").join(bidders, keyCols, "left")
  }

  private val endWords = "INC|LLC|CO|COMPANY|CORP|CORPORATION|LTD"

  /** 'Bid Tabs' over whole documents (parse_utils.py:1099-1425
    * `parse_nc_bid_tabs`): doc-level fields (headers, month-name
    * letting date, DA contract id, call number, FED AID project
    * number + the two following lines, counties) plus one row per
    * (item line, bidder). Bidder names come from the company-suffix
    * lines above the first `NNNN ` item line; each item line carries
    * one trailing (unit_price, amount) money pair per bidder — when
    * fewer pairs than bidders are present the reference's 1-bidder
    * fallback applies. Token surgery is all regex/array Columns; the
    * per-line bidder fan-out is a bounded transform+explode.
    */
  def parseBidTabs(df: DataFrame, docCol: String,
      keyCols: Seq[String]): DataFrame = {
    val doc = col(docCol)
    def nonEmpty(c: Column): Column = when(c =!= "", c)
    val fedAidSpan = regexp_extract(doc,
      "(?im)^[^\\n]*FED AID NO[^\\n]*\\n([^\\n]*)\\n?([^\\n]*)", 0)
    // vendor block: the text above the first item line; names are the
    // company-suffix runs without digits (reference's end-word split)
    val vendorBlock = regexp_extract(doc, "(?ms)\\A(.*?)(?=^\\d{3,4}\\s)", 1)
    val vendorPat =
      s"([A-Za-z][A-Za-z .,&'-]*?\\b(?:$endWords)\\b\\.?)"
    val docFields = Seq(
      Parse.ncStateHeader(doc).as("state_header"),
      Parse.ncOwnerHeader(doc).as("owner_header"),
      Parse.monthNameDate(doc).as("letting_date"),
      nonEmpty(regexp_extract(doc, "\\b(DA\\d{5,})\\b", 1)).as("contract_id"),
      nonEmpty(trim(regexp_extract(doc,
        "(?im)FED AID NO[:\\s]*([^\\n]+)", 1))).as("project_number"),
      nonEmpty(trim(regexp_extract(fedAidSpan,
        "(?m)\\n([^\\n]*)", 1))).as("proposal_project_type"),
      nonEmpty(trim(regexp_extract(fedAidSpan,
        "(?m)\\n[^\\n]*\\n([^\\n]*)", 1))).as("location"),
      nonEmpty(regexp_extract(doc,
        "(?i)\\bCall\\s+Number\\s+(\\d+)\\b", 1)).as("call_number"),
      nonEmpty(trim(regexp_extract(doc,
        "(?im)^(?!.*(?:miles|\\$|\\d))([^\\n]*,[^\\n]*)$", 1))).as("counties"),
      array_distinct(regexp_extract_all(vendorBlock, lit(vendorPat), lit(1)))
        .as("_vendors"))
    // referenced twice (line fan-out + doc-field/fallback join) — the
    // cache stops the upstream document assembly from executing twice
    val docs = df.select(keyCols.map(col) ++ docFields :+ doc.as("_doc"): _*)
      .cache()
    val isNum = (c: Column) =>
      translate(c, ",", "").rlike("^\\d+(\\.\\d+)?$")
    // only the bidder list rides the per-line explode; the other nine
    // doc-level fields rejoin by key AFTER the line fan-out, so the
    // wide columns never multiply by the line count
    // STAGE SHAPE NOTE (r8 p13 profile): each withColumn is one more
    // Project for the analyzer and a wider codegen unit — on this
    // parser's ~30-expression tree that one-off cost (first-run 9.5 s,
    // re-analysis ~0.9 s/run at sf0.1) exceeded the actual data work
    // (~1.4 s over 600 k lines). The chain is therefore collapsed into
    // the minimal projections whose columns don't reference each
    // other; expressions shared WITHIN a stage (prev/last/_core) stay
    // single-instance by living one projection upstream.
    val lines = docs
      .select(keyCols.map(col) :+ col("_vendors") :+
        explode(split(col("_doc"), "\n")).as("l0"): _*)
      .select(keyCols.map(col) :+ col("_vendors") :+
        regexp_replace(trim(col("l0")), "\\s+", " ").as("l"): _*)
      // cheap anchored prefilter FIRST — header/vendor lines die
      // before any money-token scanning runs on them
      .filter(col("l").rlike("^\\d{3,4}\\s"))
      // item lines: NNN(N) first token, ≥6 tokens, ≥2 money tokens
      .select(keyCols.map(col) ++ Seq(col("_vendors"), col("l"),
        regexp_extract_all(col("l"), lit("\\$?" + moneyPat + "\\b"), lit(1))
          .as("_money")): _*)
      .filter(size(col("_money")) >= 2 && size(split(col("l"), " ")) >= 6)
      // core tokens: everything before the first money token
      .select(keyCols.map(col) ++ Seq(col("_vendors"), col("_money"),
        split(trim(regexp_extract(col("l"),
          "^(.*?)\\s*\\$?\\s*[\\d,]+\\.\\d{2}\\b", 1)), " ").as("_core")): _*)
      .filter(size(col("_core")) >= 2)
    val last = element_at(col("_core"), -1)
    val prev = element_at(col("_core"), -2)
    // the reference's three qty/unit layouts; qty_raw keeps textual
    // quantities ("Lump Sum") verbatim as the reference does while the
    // typed qty column holds the parsed double
    val parsed = lines
      .select(keyCols.map(col) ++ Seq(col("_vendors"), col("_money"),
        when(isNum(prev) && !isNum(last),
            slice(col("_core"), lit(1), size(col("_core")) - 2))
          .when(!isNum(prev) && !isNum(last),
            slice(col("_core"), lit(1), size(col("_core")) - 2))
          .otherwise(slice(col("_core"), lit(1), size(col("_core")) - 1))
          .as("_head"),
        when(isNum(prev) && !isNum(last),
            translate(prev, ",", "").cast("double"))
          .when(isNum(last), translate(last, ",", "").cast("double"))
          .as("qty"),
        when(isNum(prev) && !isNum(last), prev)
          .when(!isNum(prev) && !isNum(last), concat_ws(" ", prev, last))
          .otherwise(last).as("qty_raw"),
        when(isNum(prev) && !isNum(last), last).as("unit"),
        // bidder pairs: last 2·n money tokens when n bidders are known
        // and present, else the 1-bidder fallback on the last pair
        when(size(col("_vendors")) >= 1 &&
            size(col("_money")) >= size(col("_vendors")) * 2,
          size(col("_vendors"))).otherwise(1).as("_nb")): _*)
      .select(keyCols.map(col) ++ Seq(col("_vendors"),
        col("qty"), col("qty_raw"), col("unit"), col("_nb"),
        element_at(col("_head"), 1).as("line_no"),
        when(size(col("_head")) >= 2, element_at(col("_head"), 2))
          .as("item_no"),
        when(size(col("_head")) >= 4,
          array_join(slice(col("_head"), lit(4), size(col("_head")) - 3), " "))
          .as("description"),
        slice(col("_money"), -(col("_nb") * 2), col("_nb") * 2)
          .as("_pairs")): _*)
    // bidder fan-out via a plain explode(sequence(...)) generator —
    // a transform(...) lambda here would drop the whole projection to
    // interpreted CodegenFallback on every line row
    val bi = col("_bi").cast("int")
    val items = parsed
      .select(keyCols.map(col) ++
        Seq(col("line_no"), col("item_no"), col("description"),
          col("qty"), col("qty_raw"), col("unit"), col("_vendors"),
          col("_pairs")) :+
        explode(sequence(lit(1), col("_nb"))).as("_bi"): _*)
      .select(keyCols.map(col) ++
        Seq(col("line_no"), col("item_no"), col("description"),
          col("qty"), col("qty_raw"), col("unit"),
          bi.as("bidder_index"),
          when(bi <= size(col("_vendors")), element_at(col("_vendors"), bi))
            .as("bidder_name"),
          Parse.parseFloat(element_at(col("_pairs"), bi * 2 - 1))
            .as("unit_price"),
          Parse.parseFloat(element_at(col("_pairs"), bi * 2))
            .as("amount")): _*)
    // doc-level fields attach here (and fallback-record parity: a
    // document with no item lines keeps them on one all-null-detail
    // row via the left join)
    docs.drop("_doc", "_vendors").join(items, keyCols, "left")
  }
}
