package graft

import graft.functions.Parse
import org.apache.spark.sql.functions._

/** Unit checks of the Parse combinators against the reference
  * parsers' documented behaviors (lib/parse_utils.py).
  */
class ParseSpec extends SparkSpecBase {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("p20 ocrTsvRows parses tesseract TSV and feeds p09's line grouping") {
    // real tesseract image_to_data shape: header, structural rows
    // (level<5, conf -1, empty text), word rows — two visual lines
    // (y 10/12 within the 10px chain tolerance, y 40 a new line)
    val tsv = Seq(
      "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext",
      "1\t1\t0\t0\t0\t0\t0\t0\t600\t800\t-1\t",
      "2\t1\t1\t0\t0\t0\t10\t8\t200\t20\t-1\t",
      "5\t1\t1\t1\t1\t1\t10\t10\t50\t12\t96.2\tTAX",
      "5\t1\t1\t1\t1\t2\t70\t12\t80\t12\t91.0\tINVOICE",
      "5\t1\t1\t1\t2\t1\t10\t40\t60\t12\t88.5\tTotal",
      "5\t1\t1\t1\t1\t3\t160\t11\t30\t12\t42.0\t  " // blank text → dropped
    ).mkString("\n")
    val rows = operators.ParseOps.ocrTsvRows(
      Seq(("inv_001", tsv)).toDF("filename", "tsv"), "tsv", Seq("filename"))
    val got = rows.orderBy("y0", "x0").collect()
    assert(got.length == 3) // header + 2 structural + blank-text dropped
    val first = got.head
    assert(first.getAs[String]("filename") == "inv_001")
    assert(first.getAs[Int]("page") == 1 && first.getAs[Int]("x0") == 10 &&
      first.getAs[Int]("y0") == 10 && first.getAs[Int]("x2") == 60 &&
      first.getAs[Int]("y2") == 22 && first.getAs[Double]("conf") == 96.2 &&
      first.getAs[String]("text") == "TAX")
    // p09's grouping consumes the parsed words directly
    val lines = operators.ParseOps.groupOcrWords(
        rows.select(col("page"), col("y0"), col("x0"), col("text").as("word")))
      .orderBy("page", "line_id").collect()
    assert(lines.length == 2)
    assert(lines.head.getAs[String]("line_text") == "TAX INVOICE")
    assert(lines.head.getAs[Long]("n_words") == 2)
    assert(lines(1).getAs[String]("line_text") == "Total")
  }

  test("parseFloat strips $ and commas like parse_float") {
    val df = Seq("$1,234.56", " 42.45 ", "garbage", "7").toDF("s")
      .select(Parse.parseFloat(col("s")))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1234.56), Some(42.45), None, Some(7.0)))
  }

  test("parseDateMulti handles the reference's five formats") {
    val inputs = Seq("Mar 5, 1995", "March 5, 1995", "1995-03-05",
      "05-03-1995", "3/5/1995", "not a date")
    val out = inputs.toDF("s")
      .select(Parse.parseDateMulti(col("s")).cast("string")).collect().map(_.getString(0))
    assert(out.take(5).forall(_ == "1995-03-05"))
    assert(out(5) == null)
  }

  test("findDate scans dd-mm-yy with OCR digit fixes and year coercion") {
    val cases = Seq(
      "paid 28-03-18 at noon" -> "2018-03-28",     // yy<=30 → 2000s
      "ref 28/03/95" -> "1995-03-28",              // yy>30 → 1900s
      "smudged 28-03-2O18 total" -> "2018-03-28",  // O→0 between digits
      "bad 45-13-99 day" -> null,                  // invalid date → null
      "no date here" -> null)
    val out = cases.map(_._1).toDF("s")
      .select(Parse.findDate(col("s")).cast("string")).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
  }

  test("taxRate extracts 'GST 8%' → 8.0") {
    val out = Seq("GST 8%", "VAT 6.5 %", "no pct").toDF("s")
      .select(Parse.taxRate(col("s"))).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(8.0), Some(6.5), None))
  }

  test("invoiceLine parses 'NN. desc - qty price total.'") {
    val r = Seq("03. FX100 Graphic Tablet - 1.0 1300.0 1300.0.").toDF("s")
      .select(Parse.invoiceLine(col("s")).as("p")).select("p.*").collect().head
    assert(r.getString(0) == "FX100 Graphic Tablet")
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1300.0 && r.getDouble(3) == 1300.0)
  }

  test("docType routes by filename like detect_doc_type") {
    val cases = Seq(
      "DA00564 Award Letter.pdf" -> "nc_award_letter",
      "DA00543_Bids As Read.pdf" -> "nc_bids_as_read",
      "DA00539_Bid Tabs.pdf" -> "nc_bid_tabs",
      "DA00542 Invitation to Bid.pdf" -> "nc_invitation_to_bid",
      "L230201A_Item C Report.pdf" -> "nc_item_c",
      "receipt.jpg" -> "invoice")
    val out = cases.map(_._1).toDF("name")
      .select(Parse.docType(col("name"), lit(null))).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
  }

  test("docType routes on text content for award letters") {
    val out = Seq(("scan001.pdf", "... Notification of Award ..."))
      .toDF("name", "text")
      .select(Parse.docType(col("name"), col("text"))).collect().head.getString(0)
    assert(out == "nc_award_letter")
  }

  test("invoiceNumber handles direct and R/T-prefixed forms") {
    val cases = Seq(
      "TAX INVOICE #12345" -> "12345",
      "Receipt: 000306020352" -> "000306020352",
      "see R0001838981 thanks" -> "R0001838981",
      "nothing" -> null)
    val out = cases.map(_._1).toDF("s")
      .select(Parse.invoiceNumber(col("s"))).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
  }

  test("fixNullTotal fills total from subtotal+tax") {
    val df = Seq((Some(10.0), Some(9.0), Some(1.0)),
      (None, Some(9.0), Some(1.0)), (None, None, None))
      .toDF("t", "s", "x")
      .select(Parse.fixNullTotal(col("t"), col("s"), col("x")))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(10.0, 10.0, 0.0))
  }

  test("receiptLine parses the reference's five OCR receipt layouts") {
    // literal examples from parse_utils.py:366-385
    val cases = Seq(
      ("9556268000210 3 X 15.00 45.00", (Some("9556268000210"), 3.0, 15.0, 45.0)),
      ("9072363 X 29.90 29.90", (Some("9072363"), 1.0, 29.9, 29.9)),
      ("9021937 3.90 1 X 3.90", (Some("9021937"), 1.0, 3.9, 3.9)),
      ("3.90 1 X 3.90", (None, 1.0, 3.9, 3.9)),
      ("1 X 29.90 29.90", (None, 1.0, 29.9, 29.9)))
    val out = cases.map(_._1).toDF("s")
      .select(Parse.receiptLine(col("s")).as("p")).select("p.*").collect()
    cases.zip(out).foreach { case ((in, (sku, q, u, t)), r) =>
      assert(Option(r.getString(0)) == sku, in)
      assert(r.getDouble(1) == q && r.getDouble(2) == u && r.getDouble(3) == t, in)
    }
    // non-product lines must not match
    val none = Seq("TOTAL 45.00", "CASH 50.00", "random words").toDF("s")
      .select(Parse.receiptLine(col("s")).as("p")).select("p.unit_price").collect()
    assert(none.forall(_.isNullAt(0)))
  }

  test("labelValue extracts NC label:value lines") {
    val text = "Contract No. DA00569\nCounty: Craven\nDescription: Work Barge"
    val df = Seq(text).toDF("t").select(
      Parse.labelValue(col("t"), "Contract No\\."),
      Parse.labelValue(col("t"), "County"),
      Parse.labelValue(col("t"), "Description"))
    val r = df.collect().head
    assert(r.getString(0) == "DA00569")
    assert(r.getString(1) == "Craven")
    assert(r.getString(2) == "Work Barge")
  }

  test("headerLine honours the first-N-lines bound; NC header scans") {
    // STATE OF beyond line 15 must NOT be picked up
    val deep = (1 to 16).map(i => s"filler line $i").mkString("\n") +
      "\nSTATE OF NOWHERE"
    val top = "noise\nSTATE OF NORTH CAROLINA\nDEPARTMENT OF TRANSPORTATION\nbody"
    val r = Seq((top, deep)).toDF("a", "b").select(
      Parse.ncStateHeader(col("a")), Parse.ncOwnerHeader(col("a")),
      Parse.ncStateHeader(col("b"))).collect().head
    assert(r.getString(0) == "STATE OF NORTH CAROLINA")
    assert(r.getString(1) == "DEPARTMENT OF TRANSPORTATION")
    assert(r.isNullAt(2), "bound not applied: matched beyond line 15")
  }

  test("monthNameDate parses any-case month-name dates, first match wins") {
    val r = Seq(("Opening on MAY 3, 2023 and then June 9, 2024",
        "Completion Date is October 30, 2023", "no date here"))
      .toDF("a", "b", "c").select(
        Parse.monthNameDate(col("a")),
        Parse.monthNameDateAfter(col("b"), "Completion Date"),
        Parse.monthNameDate(col("c"))).collect().head
    assert(r.getDate(0).toString == "2023-05-03")
    assert(r.getDate(1).toString == "2023-10-30")
    assert(r.isNullAt(2))
  }

  test("standardizeColumns lowercases and trims column names") {
    val df = Seq((1, "x")).toDF(" Company_ID ", "Invoice_Number")
    assert(Parse.standardizeColumns(df).columns.toSeq ==
      Seq("company_id", "invoice_number"))
  }

  test("r13 single-pass parsers equal the per-group regexp_extract forms") {
    // The r13 optimization round rewrote invoiceLine / receiptLine /
    // findDate from N regexp_extract scans per row to one packed
    // regexp_replace (or match-then-split) pass. These reference
    // implementations are the OLD formulations verbatim — the spec
    // pins row-identical structs over every layout regime plus
    // garbage / near-miss / empty edges.
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DoubleType
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
    def receiptLineOld(c: Column): Column = {
      val t = regexp_replace(trim(c), "\\s+", " ")
      val num = "(\\d+(?:[.,]\\d{1,2}))"
      val pats = Seq(
        (s"^(\\d{5,}) (\\d{1,3}) ?[Xx] ?$num $num$$", 1, 2, 3, 4),
        (s"^(\\d{5,}) ?[Xx] ?$num $num$$", 1, 0, 2, 3),
        (s"^(\\d{5,}) $num (\\d{1,3}) ?[Xx] ?$num$$", 1, 3, 2, 4),
        (s"^$num (\\d{1,3}) ?[Xx] ?$num$$", 0, 2, 1, 3),
        (s"^(\\d{1,3}) ?[Xx] ?$num $num$$", 0, 1, 2, 3))
      def field(sel: ((String, Int, Int, Int, Int)) => Int,
          numeric: Boolean): Column =
        pats.foldRight(lit(null).cast(if (numeric) "double" else "string")) {
          case (p @ (pat, _, _, _, _), els) =>
            val g = sel(p)
            val matched = regexp_extract(t, pat, 0) =!= ""
            val v = if (g == 0) {
              if (numeric) lit(1.0) else lit(null).cast("string")
            } else {
              val raw = regexp_extract(t, pat, g)
              if (numeric) regexp_replace(raw, ",", ".").cast(DoubleType)
              else raw
            }
            when(matched, v).otherwise(els)
        }
      struct(
        field(_._2, numeric = false).as("sku"),
        field(_._3, numeric = true).as("qty"),
        field(_._4, numeric = true).as("unit_price"),
        field(_._5, numeric = true).as("line_total"))
    }
    def findDateOld(c: Column): Column = {
      val s = Parse.fixOcrDigits(c)
      val pat = "(?<!\\d)(\\d{1,2})[-/.](\\d{1,2})[-/.](\\d{2,4})(?!\\d)"
      val d = regexp_extract(s, pat, 1).cast("int")
      val m = regexp_extract(s, pat, 2).cast("int")
      val yRaw = regexp_extract(s, pat, 3).cast("int")
      val y = when(yRaw < lit(100),
          when(yRaw <= lit(30), yRaw + lit(2000)).otherwise(yRaw + lit(1900)))
        .otherwise(yRaw)
      when(regexp_extract(s, pat, 0) =!= "", make_date(y, m, d))
    }
    val lines = Seq(
      // invoice-line regimes: plain, dashed, trailing dot, int qty
      "1. WIDGET A - 2 3.50 7.00.", "12. part x 1 10.00 10.00",
      "3.   spaced   desc   4 1.25 5.00  .", "7. nums 1 2 3 4 5 6",
      // receipt regimes: all five layouts + comma decimals
      "9556268000210 3 X 15.00 45.00", "9072363 X 29.90 29.90",
      "9021937 3.90 1 X 3.90", "3.90 1 X 3.90", "1 X 29,90 29.90",
      "90219 3,90 2 X 7,80",
      // dates: separators, 2-digit years both coercion sides, OCR digits
      "paid 05-03-95 thanks", "due 5/3/07", "on 05.03.2024 ok",
      "x 1O-O3-24 y", "31-02-23 invalid feb", "9-9-99 and 1-1-01 twice",
      // garbage / near-miss / empty — incl. EMPTY description group
      // (from_csv must keep "" as "", not CSV-null it) and fields
      // with CSV-hostile content (commas, quotes)
      "", "   ", "no numbers here", "123456", "99. POISON ROW - 1 1.00 1.00.",
      "12345 X 9.999 9.99", "1234-5678",
      "1. - 2 3.50 7.00.", "5. a, \"b\" c - 1 2.00 2.00")
    val df = lines.toDF("s")
    val got = df.select(
      Parse.invoiceLine(col("s")).as("il"),
      Parse.receiptLine(col("s")).as("rl"),
      Parse.findDate(col("s")).as("fd"))
    val want = df.select(
      invoiceLineOld(col("s")).as("il"),
      receiptLineOld(col("s")).as("rl"),
      findDateOld(col("s")).as("fd"))
    assert(got.collect().toSeq == want.collect().toSeq)
  }
}
