package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.SparkSpec
import graft.lake.LakeTable
import graft.spec.{JobDestination, JobExtractor, JobRunner, JobSource, JobSpec, Projection}

/** [[XlsxExtractor]] against workbooks built in-test from the
  * SpreadsheetML parts themselves (an .xlsx IS a ZIP of XML — the test
  * fixture is the format spec, not a canned binary). Covers the
  * reference ExcelExtractor behaviors (reference:
  * engine/wprdc_etl/pipeline/extractors.py:234-296: sheet pick,
  * rows_to_skip, header row) plus the format corners: shared vs inline
  * vs formula-cached strings, booleans, error cells, sparse cells and
  * absent rows, rich-text/phonetic runs, and the multi-file distributed
  * scan. */
class XlsxSpec extends SparkSpec {

  // ---------------------------------------------------------- fixtures

  /** Minimal valid workbook ZIP: workbook.xml + its .rels + optional
    * shared strings + one part per sheet (worksheets/sheetN.xml). */
  private def workbook(sheets: Seq[(String, String)],
      sst: Seq[String] = Nil,
      rootedTarget: Boolean = false): Array[Byte] = {
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val rels = sheets.indices.map { i =>
      val target =
        if (rootedTarget) s"/xl/worksheets/sheet${i + 1}.xml"
        else s"worksheets/sheet${i + 1}.xml"
      s"""<Relationship Id="rId${i + 1}" Type="$rns/worksheet" Target="$target"/>"""
    }.mkString
    val entries = Seq(
      "xl/workbook.xml" ->
        s"""<?xml version="1.0"?><workbook xmlns="$ns" xmlns:r="$rns"><sheets>$sheetDecls</sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""") ++
      (if (sst.isEmpty) Nil else Seq("xl/sharedStrings.xml" ->
        s"""<?xml version="1.0"?><sst xmlns="$ns">${sst.mkString}</sst>""")) ++
      sheets.zipWithIndex.map { case ((_, rowsXml), i) =>
        s"xl/worksheets/sheet${i + 1}.xml" ->
          s"""<?xml version="1.0"?><worksheet xmlns="$ns"><sheetData>$rowsXml</sheetData></worksheet>"""
      }
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, xml) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(xml.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** One data row; cells are pre-rendered `<c>` fragments. */
  private def rowXml(cells: String*): String = s"<row>${cells.mkString}</row>"

  private def sCell(sstIdx: Int, ref: String = ""): String =
    s"""<c${refAttr(ref)} t="s"><v>$sstIdx</v></c>"""
  private def nCell(v: String, ref: String = ""): String =
    s"""<c${refAttr(ref)}><v>$v</v></c>"""
  private def inlineCell(v: String, ref: String = ""): String =
    s"""<c${refAttr(ref)} t="inlineStr"><is><t>$v</t></is></c>"""
  private def refAttr(ref: String) = if (ref.isEmpty) "" else s""" r="$ref""""

  private def write(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }

  /** The standard two-column fixture: header (name, age) + two rows. */
  private def dogBytes: Array[Byte] = workbook(
    sheets = Seq("Sheet1" ->
      (rowXml(sCell(0), sCell(1)) +
       rowXml(sCell(2), nCell("7")) +
       rowXml(sCell(3), nCell("63")))),
    sst = Seq("<si><t>Name</t></si>", "<si><t>Age</t></si>",
      "<si><t>mojo</t></si>", "<si><t>don</t></si>"))

  // ------------------------------------------------------------- tests

  test("colIndex: A→0, Z→25, AA→26, BC12→54; malformed rejected") {
    assert(XlsxExtractor.colIndex("A1") == 0)
    assert(XlsxExtractor.colIndex("Z9") == 25)
    assert(XlsxExtractor.colIndex("AA7") == 26)
    assert(XlsxExtractor.colIndex("BC12") == 54)
    intercept[IllegalArgumentException](XlsxExtractor.colIndex("12"))
  }

  test("xlsx: headers normalized, shared strings resolved, numbers raw") {
    val dir = tmpDir("xlsx-basic")
    val f = write(dir, "dogs.xlsx", dogBytes)
    val df = XlsxExtractor.xlsx(spark, f)
    assert(df.columns.toSeq == Seq("name", "age"))
    val rows = df.orderBy("name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("don", "mojo"))
    assert(rows(0).getString(1) == "63" && rows(1).getString(1) == "7")
  }

  test("xlsx: cell-type zoo — inline, formula-cached, bool, error, rich text") {
    // header + one row exercising every cell type; rich-text si with a
    // phonetic run that must NOT leak into the value
    val bytes = workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(sCell(0), sCell(1), sCell(2), sCell(3), sCell(4)) +
         rowXml(
           inlineCell("inl"),
           s"""<c t="str"><v>cached</v></c>""",
           s"""<c t="b"><v>1</v></c>""",
           s"""<c t="e"><v>#DIV/0!</v></c>""",
           sCell(5)))),
      sst = Seq("<si><t>a</t></si>", "<si><t>b</t></si>", "<si><t>c</t></si>",
        "<si><t>d</t></si>", "<si><t>e</t></si>",
        "<si><r><t>ri</t></r><r><t>ch</t></r><rPh><t>フリ</t></rPh></si>"))
    val dir = tmpDir("xlsx-zoo")
    val f = write(dir, "zoo.xlsx", bytes)
    val r = XlsxExtractor.xlsx(spark, f).collect()(0)
    assert(r.getString(0) == "inl")
    assert(r.getString(1) == "cached")
    assert(r.getString(2) == "true")
    assert(r.isNullAt(3), "error cells surface as null")
    assert(r.getString(4) == "rich", "rich-text runs concatenate, phonetic excluded")
  }

  test("xlsx: sparse cells land by reference; short rows null-pad, long truncate") {
    // row 2 present only in A and C (B omitted — Excel does this);
    // row 3 has only A; row 4 is wider than the header
    val bytes = workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(sCell(0), sCell(1), sCell(2)) +
         rowXml(nCell("1", "A2"), nCell("3", "C2")) +
         rowXml(nCell("4", "A3")) +
         rowXml(nCell("5"), nCell("6"), nCell("7"), nCell("8")))),
      sst = Seq("<si><t>x</t></si>", "<si><t>y</t></si>", "<si><t>z</t></si>"))
    val dir = tmpDir("xlsx-sparse")
    val f = write(dir, "sp.xlsx", bytes)
    val df = XlsxExtractor.xlsx(spark, f)
    assert(df.columns.toSeq == Seq("x", "y", "z"))
    val rows = df.orderBy("x").collect()
    assert(rows(0).getString(0) == "1" && rows(0).isNullAt(1)
      && rows(0).getString(2) == "3")
    assert(rows(1).getString(0) == "4" && rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).toSeq == Seq("5", "6", "7"), "extra cells truncated to header")
  }

  test("xlsx: skipRows drops leading garbage before the header") {
    val bytes = workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(inlineCell("Dog Report 2026")) +
         rowXml(inlineCell("generated by excel")) +
         rowXml(sCell(0), sCell(1)) +
         rowXml(sCell(2), nCell("7")))),
      sst = Seq("<si><t>Name</t></si>", "<si><t>Age</t></si>",
        "<si><t>mojo</t></si>"))
    val dir = tmpDir("xlsx-skip")
    val f = write(dir, "t.xlsx", bytes)
    val df = XlsxExtractor.xlsx(spark, f,
      XlsxExtractor.XlsxOptions(skipRows = 2))
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("mojo", "7")))
  }

  test("xlsx: sheet selection by name and by index; missing sheet fails") {
    val bytes = workbook(
      sheets = Seq(
        "first" -> (rowXml(inlineCell("h")) + rowXml(inlineCell("from-first"))),
        "second" -> (rowXml(inlineCell("h")) + rowXml(inlineCell("from-second")))))
    val dir = tmpDir("xlsx-sheets")
    val f = write(dir, "two.xlsx", bytes)
    val byIdx = XlsxExtractor.xlsx(spark, f,
      XlsxExtractor.XlsxOptions(sheetIndex = 1))
    assert(byIdx.collect()(0).getString(0) == "from-second")
    val byName = XlsxExtractor.xlsx(spark, f,
      XlsxExtractor.XlsxOptions(sheet = Some("second")))
    assert(byName.collect()(0).getString(0) == "from-second")
    // surfaces at plan time: headerNames parses the first file driver-side
    val err = intercept[IllegalArgumentException] {
      XlsxExtractor.xlsx(spark, f,
        XlsxExtractor.XlsxOptions(sheet = Some("nope")))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("xlsx: rooted relationship targets (/xl/…) resolve") {
    val bytes = workbook(
      sheets = Seq("Sheet1" -> (rowXml(inlineCell("h")) + rowXml(inlineCell("v")))),
      rootedTarget = true)
    val dir = tmpDir("xlsx-rooted")
    val f = write(dir, "r.xlsx", bytes)
    assert(XlsxExtractor.xlsx(spark, f).collect()(0).getString(0) == "v")
  }

  test("xlsx: directory of workbooks scans all files, header from first") {
    val dir = tmpDir("xlsx-many")
    write(dir, "a.xlsx", dogBytes)
    // second workbook: same layout, different rows
    write(dir, "b.xlsx", workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(sCell(0), sCell(1)) + rowXml(sCell(2), nCell("5")))),
      sst = Seq("<si><t>Name</t></si>", "<si><t>Age</t></si>",
        "<si><t>rex</t></si>")))
    val df = XlsxExtractor.xlsx(spark, dir)
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.orderBy("name").collect().map(_.getString(0)).toSeq ==
      Seq("don", "mojo", "rex"))
  }

  test("excelSerialToTimestamp: epoch anchor and fractional day") {
    import spark.implicits._
    val df = Seq("25569", "45000.5").toDF("serial")
      .select(XlsxExtractor.excelSerialToTimestamp(col("serial")).as("ts"))
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("s"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("1970-01-01 00:00:00", "2023-03-15 12:00:00"))
  }

  test("xlsx: styled-but-empty rows are not present rows; rPh never leaks; blank headers fall back") {
    // row 1 is a formatted-but-cell-less <row/> (must NOT count for
    // skipRows/header); header has a whitespace-only cell (must fall
    // back to positional, or normalization would name the column "");
    // the data row's inline string carries a phonetic run (excluded,
    // as in shared strings)
    val sheetXml =
      """<row ht="15"/>""" +
      rowXml(inlineCell("Name"), inlineCell("   ")) +
      rowXml(
        s"""<c t="inlineStr"><is><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh></is></c>""",
        inlineCell("x"))
    val bytes = workbook(Seq("Sheet1" -> sheetXml))
    val dir = tmpDir("xlsx-edge")
    val f = write(dir, "e.xlsx", bytes)
    val df = XlsxExtractor.xlsx(spark, f)
    assert(df.columns.toSeq == Seq("name", "c1"))
    val r = df.collect()(0)
    assert(r.getString(0) == "東京", "phonetic run must not leak into the value")
    assert(r.getString(1) == "x")
  }

  test("xlsx: sheetRows limit stops the parse; executor errors carry the file path") {
    val dir = tmpDir("xlsx-lim")
    write(dir, "a.xlsx", dogBytes)
    // driver-peek path: limit bounds the parse to skipRows+1 rows
    val bytes = Files.readAllBytes(Paths.get(dir, "a.xlsx"))
    assert(XlsxExtractor.sheetRows(bytes, None, 0, 2).size == 2)
    assert(XlsxExtractor.sheetRows(bytes, None, 0, Int.MaxValue).size == 3)
    // executor path: a corrupt second file must name itself in the error
    write(dir, "b.xlsx", Array[Byte](1, 2, 3, 4))
    val e = intercept[org.apache.spark.SparkException] {
      XlsxExtractor.xlsx(spark, dir).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("b.xlsx")),
      s"error must identify the corrupt file: ${chain(e).mkString(" | ")}")
  }

  test("xlsx: chartsheets are excluded from name/index selection") {
    // hand-built workbook: decl order [Chart1 -> chartsheets/…, Data ->
    // worksheets/…]; index 0 must resolve Data, matching the xls
    // BOUNDSHEET-type filter
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val entries = Seq(
      "xl/workbook.xml" ->
        s"""<?xml version="1.0"?><workbook xmlns="$ns" xmlns:r="$rns"><sheets><sheet name="Chart1" sheetId="1" r:id="rId1"/><sheet name="Data" sheetId="2" r:id="rId2"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        s"""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="$rns/chartsheet" Target="chartsheets/sheet1.xml"/><Relationship Id="rId2" Type="$rns/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/chartsheets/sheet1.xml" ->
        s"""<?xml version="1.0"?><chartsheet xmlns="$ns"/>""",
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0"?><worksheet xmlns="$ns"><sheetData>${rowXml(inlineCell("h")) + rowXml(inlineCell("from-data"))}</sheetData></worksheet>""")
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, xml) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(xml.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val dir = tmpDir("xlsx-chart")
    val f = write(dir, "c.xlsx", bos.toByteArray)
    assert(XlsxExtractor.xlsx(spark, f).collect()(0).getString(0) == "from-data")
    val err = intercept[IllegalArgumentException] {
      XlsxExtractor.xlsx(spark, f,
        XlsxExtractor.XlsxOptions(sheet = Some("Chart1")))
    }
    assert(err.getMessage.contains("no worksheet named"))
  }

  test("xlsx: corruption fuzz — mutated/truncated files throw cleanly, never hang or error") {
    val base = dogBytes
    var parsed = 0
    var threw = 0
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val mutated =
        if (seed % 3 == 0) base.take(rnd.nextInt(base.length)).toArray
        else {
          val b = base.clone()
          for (_ <- 0 until 8)
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          b
        }
      try {
        XlsxExtractor.sheetRows(mutated, None, 0, Int.MaxValue)
        parsed += 1
      } catch { case _: Exception => threw += 1 } // Errors propagate → fail
    }
    assert(threw > 0, "fuzz must actually hit failure paths")
    assert(parsed + threw == 200)
  }

  test("xlsx: real Excel-produced workbook (reference's own mock fixture)") {
    // Validation against an INDEPENDENT producer (a genuine Excel save,
    // with styles/theme parts, \r\n XML prologs, xml:space-preserved
    // strings, dimension/sheetView elements) — everything the in-test
    // builder doesn't emit. Expected values mirror the reference's own
    // unit test (reference: engine/wprdc_etl/test/unit/
    // test_extractor.py:62-79: headers One/Two/Three Things/
    // 'Trailing spaces   ' → one/two/three_things/trailing_spaces).
    // Cancels (not fails) when the reference checkout is absent — the
    // suite stays standalone.
    val fixture =
      "/root/reference/engine/wprdc_etl/test/mock/excel_mock.xlsx"
    assume(Files.exists(Paths.get(fixture)), "reference fixture not present")
    val df = XlsxExtractor.xlsx(spark, fixture)
    assert(df.columns.toSeq ==
      Seq("one", "two", "three_things", "trailing_spaces"))
    val rows = df.orderBy("one").collect()
    assert(rows.map(_.toSeq).toSeq == Seq(
      Seq("1", "aaa", "42370", "123"),
      Seq("2", "b", "42370", "456")))
    // the styled date cell is a raw 1900-system serial; the helper
    // converts it in-plan
    val day = df.select(date_format(
      XlsxExtractor.excelSerialToTimestamp(col("three_things")),
      "yyyy-MM-dd").as("d")).distinct().collect()
    assert(day.map(_.getString(0)).toSeq == Seq("2016-01-01"))
  }

  test("xlsx: corrupt shared-string indices (non-numeric, empty, out-of-range) surface as null") {
    val bytes = workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(inlineCell("h1"), inlineCell("h2"), inlineCell("h3")) +
         rowXml(
           s"""<c t="s"><v>abc</v></c>""",
           s"""<c t="s"><v/></c>""",
           s"""<c t="s"><v>99</v></c>"""))),
      sst = Seq("<si><t>only</t></si>"))
    val dir = tmpDir("xlsx-badsst")
    val f = write(dir, "bad.xlsx", bytes)
    val r = XlsxExtractor.xlsx(spark, f).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"corrupt pool indices must null out, got ${r.toSeq}")
  }

  test("xlsx: hidden/side files in a workbook directory are skipped like the scan skips them") {
    // the driver header peek must apply the same `.`/`_` listing filter
    // as Spark's file index, or a .crc/_SUCCESS side file (which sorts
    // FIRST) poisons the peek while the executors ignore it
    val dir = tmpDir("xlsx-hidden")
    write(dir, "dogs.xlsx", dogBytes)
    write(dir, ".dogs.xlsx.crc", Array[Byte](1, 2, 3))
    write(dir, "_SUCCESS", Array.empty[Byte])
    val df = XlsxExtractor.xlsx(spark, dir)
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.count() == 2)
  }

  test("xlsx: duplicate / normalize-colliding headers fail fast at plan time") {
    val bytes = workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(inlineCell("Total Cost"), inlineCell("total-cost")) +
         rowXml(nCell("1"), nCell("2")))))
    val dir = tmpDir("xlsx-dup")
    val f = write(dir, "d.xlsx", bytes)
    val e = intercept[IllegalArgumentException](XlsxExtractor.xlsx(spark, f))
    assert(e.getMessage.contains("duplicate header"), e.getMessage)
    assert(e.getMessage.contains("total_cost"), e.getMessage)
  }

  test("job end-to-end: Xlsx extractor with rowsToSkip maps sheet-side") {
    val work = tmpDir("job-xlsx")
    val bytes = workbook(
      sheets = Seq("Sheet1" ->
        (rowXml(inlineCell("TITLE ROW")) +
         rowXml(sCell(0), sCell(1)) +
         rowXml(sCell(2), nCell("7")) +
         rowXml(sCell(3), nCell("63")))),
      sst = Seq("<si><t>Name</t></si>", "<si><t>Age</t></si>",
        "<si><t>mojo</t></si>", "<si><t>don</t></si>"))
    val src = write(work, "dogs.xlsx", bytes)
    val lake = s"$work/lake"
    val spec = JobSpec(
      jobCode = "xlsx_dogs",
      source = JobSource.LocalFile(src),
      stagingDir = s"$work/staging",
      extractor = JobExtractor.Xlsx(),
      destination = JobDestination.Lake(lake, nBuckets = 2),
      rowsToSkip = 1, // must NOT line-strip the ZIP; skips sheet-side
      schema = Seq(
        Projection.Field("name", "name"),
        Projection.Field("age", "age", Some(IntegerType))),
      keyFields = Seq("name"))
    val r = JobRunner.run(spark, spec)
    assert(r.applied, s"job must apply, got $r")
    val got = LakeTable.load(spark, lake).read()
      .select("name", "age").orderBy("name").collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("don", 63), ("mojo", 7)))
  }
}
