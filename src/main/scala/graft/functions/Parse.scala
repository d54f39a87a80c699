package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType}

/** Field-parsing combinators re-expressing the reference's regex/rule
  * parsers (reference: lib/parse_utils.py) as pure `Column`
  * expressions. Everything here stays inside whole-stage codegen — no
  * UDFs — so the parsers run at scan speed on a 100 TB corpus.
  */
object Parse {

  /** Currency/float cleaning: strip commas, `$`, whitespace; cast to
    * double (null on garbage). Reference: parse_utils.py:27-43
    * (`parse_float` / `clean_currency`).
    */
  def parseFloat(c: Column): Column =
    regexp_replace(trim(c), "[,$]", "").cast(DoubleType)

  /** Multi-format date normalization to DateType. Tries the same five
    * formats as the reference in order.
    * Reference: parse_utils.py:46-55 (`parse_date`).
    */
  def parseDateMulti(c: Column): Column = {
    val t = trim(c)
    coalesce(
      to_date(t, "MMM d, yyyy"),
      to_date(t, "MMMM d, yyyy"),
      to_date(t, "yyyy-MM-dd"),
      to_date(t, "dd-MM-yyyy"),
      to_date(t, "M/d/yyyy"))
  }

  /** Fix common OCR digit confusions inside numeric groups (O→0, S→5,
    * l/I→1). Reference: parse_utils.py:82-85.
    */
  def fixOcrDigits(c: Column): Column = {
    val o = regexp_replace(c, "(?<=\\d)[Oo](?=\\d)", "0")
    val s = regexp_replace(o, "(?<=\\d)[Ss](?=\\d)", "5")
    regexp_replace(s, "(?<=\\d)[lI](?=\\d)", "1")
  }

  /** dd[-/. ]mm[-/. ]yy(yy) scanner with 2-digit-year coercion
    * (<=30 → 2000s else 1900s): returns the first match in the string
    * as a DateType, null if none parses.
    * Reference: parse_utils.py:58-100 (`DATE_REGEX`, `_coerce_year`,
    * `_find_invoice_date` — note the reference returns the earliest
    * date over all lines; callers that need that apply min() over the
    * exploded lines, see p03 in Operators).
    */
  def findDate(c: Column): Column = {
    val s = fixOcrDigits(c)
    val pat = "(?<!\\d)(\\d{1,2})[-/.](\\d{1,2})[-/.](\\d{2,4})(?!\\d)"
    // ONE scan finds the first match; the groups are then re-derived
    // by splitting the ≤10-char match on its own separators (the
    // match is exactly g1[-/.]g2[-/.]g3, so the split IS the group
    // structure). The old per-group regexp_extract re-scanned the
    // full line 4× — group indexes defeat subexpression elimination.
    val m0 = regexp_extract(s, pat, 0)
    val p = split(m0, "[-/.]")
    val d = element_at(p, 1).cast("int")
    val m = element_at(p, 2).cast("int")
    val yRaw = element_at(p, 3).cast("int")
    val y = when(yRaw < lit(100),
        when(yRaw <= lit(30), yRaw + lit(2000)).otherwise(yRaw + lit(1900)))
      .otherwise(yRaw)
    // make_date → null on invalid combos like 31-02 (non-ANSI mode)
    when(m0 =!= "", make_date(y, m, d))
  }

  /** 'GST 8%' → 8.0. Reference: parse_utils.py:103-108
    * (`extract_tax_rate`).
    */
  def taxRate(c: Column): Column = {
    val m = regexp_extract(c, "(\\d+\\.?\\d*)\\s*%", 1)
    when(m =!= "", m.cast(DoubleType))
  }

  /** Invoice line "NN. DESCRIPTION ... qty price total" → struct
    * (description, qty, price, total).
    * Reference: parse_utils.py:129-169 (`parse_invoice_line`). The
    * reference takes the LAST three numbers on the line; we anchor the
    * same way with a greedy prefix.
    */
  private val invoiceLinePat =
    "^(\\d+)\\.\\s*(.*?)\\s*\\-?\\s*(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s+(\\d+(?:\\.\\d+)?)\\s*\\.?$"

  /** TRUE exactly where [[invoiceLine]] yields a parsed struct (its
    * description field is non-null on matched rows even when the
    * group is empty — the "D" sentinel): the bare match test, exposed
    * so row filters (InvoicePipeline.lineItems) need not reference
    * the struct — under a count-pruned plan the filter then costs ONE
    * regexp_extract, and the packed replace + from_csv prune away
    * entirely (the r13 p19 count-path regression). The \u0001 guard
    * drops the one input class the packing cannot represent: a line
    * already containing the separator would silently shift fields,
    * so it parses as no-match instead (the r13 advice item).
    */
  def invoiceLineMatches(c: Column): Column = {
    val t = trim(c)
    regexp_extract(t, invoiceLinePat, 0) =!= "" && !t.contains("")
  }

  def invoiceLine(c: Column): Column = {
    val t = trim(c)
    val pat = invoiceLinePat
    // TWO regex passes per row (match test + ONE replace packing all
    // groups behind \u0001 separators, decoded by from_csv into the
    // whole struct in one evaluation) instead of five — per-group
    // regexp_extract re-runs this backtracking pattern once per
    // group, and group indexes defeat subexpression elimination (a
    // split+element_at-per-field formulation re-evaluates the packed
    // string per field for the same reason; from_csv produces all
    // fields from one subtree — measured 4.6 s → 3.2 s over 600k
    // lines vs the extract form). The pattern is ^…$-anchored, so
    // replace rewrites exactly the one match; a line already
    // CONTAINING \u0001 would shift fields, so matched guards it
    // to no-match (invoiceLineMatches is the same predicate).
    val matched = regexp_extract(t, pat, 0) =!= "" && !t.contains("")
    // the "D" sentinel keeps an EMPTY description group distinguishable
    // from a CSV null (unquoted empty fields always read as null);
    // substr(2) strips it after the decode. On no-match rows `parsed`
    // is a null struct and every getField is null — the historical
    // all-null-FIELDS struct. The duplicate from_csv references are
    // collapsed by the OptimizeCsvJsonExprs optimizer rule (verified
    // by the micro-bench: this form is the fastest of four).
    val parsed = from_csv(
      when(matched, regexp_replace(t, pat, "D$2\u0001$3\u0001$4\u0001$5")),
      org.apache.spark.sql.types.StructType.fromDDL(
        "description string, qty double, price double, total double"),
      Map("sep" -> "\u0001", "quote" -> ""))
    struct(
      parsed.getField("description").substr(lit(2), lit(Int.MaxValue))
        .as("description"),
      parsed.getField("qty").as("qty"),
      parsed.getField("price").as("price"),
      parsed.getField("total").as("total"))
  }

  /** Filename/content → document type routing.
    * Reference: lib/pipeline_runner.py:4-21 (`detect_doc_type`).
    */
  def docType(fileName: Column, text: Column): Column = {
    val n = lower(fileName)
    val t = lower(coalesce(text, lit("")))
    when(n.contains("award letter") || t.contains("notification of award"),
        "nc_award_letter")
      .when(n.contains("bids as read"), "nc_bids_as_read")
      .when(n.contains("bid tabs"), "nc_bid_tabs")
      .when(n.contains("invitation to bid"), "nc_invitation_to_bid")
      .when(n.contains("item c"), "nc_item_c")
      .otherwise("invoice")
  }

  /** total := coalesce(total, coalesce(subtotal,0)+coalesce(tax,0)).
    * Reference: parse_utils.py:110-116 (`fix_null_total`).
    */
  def fixNullTotal(total: Column, subtotal: Column, tax: Column): Column =
    coalesce(total,
      coalesce(subtotal, lit(0.0)) + coalesce(tax, lit(0.0)))

  /** Invoice-number extraction: direct 'INVOICE/RECEIPT #NNN' forms,
    * else R/T-prefixed 6+-digit codes.
    * Reference: parse_utils.py:188-198.
    */
  def invoiceNumber(c: Column): Column = {
    val u = upper(c)
    val direct = regexp_extract(u,
      "\\b(?:INVOICE|RECEIPT|TAX\\s*INVOICE)\\s*#?\\s*[:\\-]?\\s*([A-Z]?\\d{3,})\\b", 1)
    val rt = regexp_extract(u, "\\b([RT]\\d{6,})\\b", 1)
    when(direct =!= "", direct).when(rt =!= "", rt)
  }

  /** Receipt product-line parser: the reference's OCR receipt
    * patterns (parse_utils.py:366-385 PRICE_PATTERNS), tried in the
    * same order:
    *   1. "SKU qty X price total"   — "9556268000210 3 X 15.00 45.00"
    *   2. "SKU X price total"       — "9072363 X 29.90 29.90" (qty=1)
    *   3. "SKU price qty X total"   — "9021937 3.90 1 X 3.90"
    *   4. "price qty X total"       — "3.90 1 X 3.90"
    *   5. "qty X price total"       — "1 X 29.90 29.90"
    * Returns struct(sku, qty, unit_price, line_total); null fields on
    * no match.
    */
  def receiptLine(c: Column): Column = {
    val t = regexp_replace(trim(c), "\\s+", " ")
    val num = "(\\d+(?:[.,]\\d{1,2}))"
    val pats = Seq(
      // (pattern, skuGroup, qtyGroup, priceGroup, totalGroup) 0=absent
      (s"^(\\d{5,}) (\\d{1,3}) ?[Xx] ?$num $num$$", 1, 2, 3, 4),
      (s"^(\\d{5,}) ?[Xx] ?$num $num$$", 1, 0, 2, 3),
      (s"^(\\d{5,}) $num (\\d{1,3}) ?[Xx] ?$num$$", 1, 3, 2, 4),
      (s"^$num (\\d{1,3}) ?[Xx] ?$num$$", 0, 2, 1, 3),
      (s"^(\\d{1,3}) ?[Xx] ?$num $num$$", 0, 1, 2, 3))
    // First matching pattern wins, and that ONE regexp_replace packs
    // every group into "sku\u0001qty\u0001price\u0001total"; from_csv
    // decodes the whole struct in one evaluation (the invoiceLine
    // rationale: per-field extraction re-runs the regex — or the
    // packing — once per field). All patterns are ^…$-anchored, all
    // groups are digit runs, so \u0001 never collides and an EMPTY
    // slot can only mean "group absent from this pattern" — the
    // default CSV nullValue="" maps it to the historical null sku.
    // Per row: one match test per pattern until the hit, then one
    // replace — the old per-field fold re-tested and re-extracted
    // per field, up to 8 regex runs for a pattern-1 row and ~24 for
    // a pattern-5 row.
    val packed = pats.foldRight(lit(null).cast("string")) {
      case ((pat, gs, gq, gp, gt), els) =>
        def ref(g: Int, absent: String) = if (g == 0) absent else "$" + g
        // absent qty defaults to 1 (pattern 2); absent sku stays ""
        val rep = Seq(ref(gs, ""), ref(gq, "1"), ref(gp, ""), ref(gt, ""))
          .mkString("\u0001")
        when(regexp_extract(t, pat, 0) =!= "", regexp_replace(t, pat, rep))
          .otherwise(els)
    }
    // decimal commas ("29,90") normalize BEFORE the decode — groups
    // are digit runs, so the replace cannot touch anything else
    val parsed = from_csv(regexp_replace(packed, ",", "."),
      org.apache.spark.sql.types.StructType.fromDDL(
        "sku string, qty double, unit_price double, line_total double"),
      Map("sep" -> "\u0001", "quote" -> ""))
    coalesce(parsed, struct(
      lit(null).cast("string").as("sku"),
      lit(null).cast("double").as("qty"),
      lit(null).cast("double").as("unit_price"),
      lit(null).cast("double").as("line_total")))
  }

  /** Label→value extraction for the NC parsers: returns the text after
    * `label` on its line. Reference: parse_utils.py:853-877 and the
    * other NC label:value scans.
    */
  def labelValue(text: Column, label: String): Column = {
    val pat = "(?i)" + label + "\\s*[:.]?\\s*([^\\n]+)"
    val v = trim(regexp_extract(text, pat, 1))
    when(v =!= "", v)
  }

  /** Line-number-bounded header scan: the first of the document's
    * first `maxLines` non-blank lines matching `pattern`, or null.
    * This is the positional variant of labelValue the NC header scans
    * need — the reference only honours "STATE OF …" / "DEPARTMENT
    * OF …" when they appear at the top of the page.
    * Reference: parse_utils.py:812-830 (`extract_nc_header`) and
    * :1428-1475 (`extract_generic_owner_header`).
    */
  def headerLine(text: Column, pattern: String, maxLines: Int = 15): Column = {
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val hit = filter(slice(lines, 1, maxLines), l => trim(l).rlike(pattern))
    trim(element_at(hit, 1))
  }

  /** "STATE OF …" header within the first 15 non-blank lines. */
  def ncStateHeader(text: Column): Column =
    headerLine(text, "(?i)^\\s*STATE OF\\b")

  /** Owner header (DEPARTMENT / TRANSPORTATION / HIGHWAY line) within
    * the first 15 non-blank lines.
    */
  def ncOwnerHeader(text: Column): Column =
    headerLine(text, "(?i)DEPARTMENT|TRANSPORTATION|HIGHWAY")

  private val monthPat =
    "(?i)\\b(?:JANUARY|FEBRUARY|MARCH|APRIL|MAY|JUNE|JULY|AUGUST|SEPTEMBER|OCTOBER|NOVEMBER|DECEMBER)\\s+\\d{1,2},\\s+\\d{4}"

  /** First month-name date in the text ("MAY 3, 2023" → date), any
    * case. Reference: the letting-date scan, parse_utils.py:1517-1527.
    */
  def monthNameDate(text: Column): Column = {
    val m = regexp_extract(text, monthPat, 0)
    when(m =!= "", to_date(initcap(lower(m)), "MMMM d, yyyy"))
  }

  /** First month-name date appearing after `marker` (a regex).
    * Reference: the "Completion Date …" / "Bid Opening …" scans,
    * parse_utils.py:1822-1859.
    */
  def monthNameDateAfter(text: Column, marker: String): Column =
    monthNameDate(regexp_extract(text, "(?is)" + marker + "(.*)", 1))

  /** Floor-cents money rendering ("1234.56") for synthesized
    * documents: floor instead of round so both engines derive the
    * identical string (SURVEY §6); one definition so the cents rule
    * can't drift between the queries that share it.
    */
  def centsStr(x: Column): Column = {
    val c = floor(x * 100).cast("long")
    // sign rendered separately so negative amounts stay decimal-
    // correct: -124 cents → "-1.24" (the truncate/pmod mix rendered
    // "-1.76" and dropped the sign entirely on -0.50)
    val a = abs(c)
    concat(when(c < 0, "-").otherwise(""), (a / 100).cast("long").cast("string"),
      lit("."), lpad(pmod(a, lit(100)).cast("string"), 2, "0"))
  }

  /** Lowercase + trim every column name — a schema (not data)
    * transform, so it is plan-only and free at any scale.
    * Reference: parse_utils.py:119-126 (`standardize_columns`).
    */
  def standardizeColumns(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.trim.toLowerCase): _*)
}
