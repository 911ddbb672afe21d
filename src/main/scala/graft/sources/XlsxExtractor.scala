package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XLSX (SpreadsheetML, ECMA-376) extractor — the reference's
  * `ExcelExtractor` (reference: engine/wprdc_etl/pipeline/extractors.py:
  * 234-296: openpyxl, sheet pick + `rows_to_skip` + header row), built on
  * nothing but the JDK: an `.xlsx` is a ZIP of XML parts, so
  * `java.util.zip` + StAX (`javax.xml.stream`) read it with zero extra
  * jars. The legacy binary `.xls` (OLE2) stays jar-blocked (SURVEY §2.2).
  *
  * Scale shape and header/padding semantics: [[SheetFrame]] (per-FILE
  * parallelism over a `binaryFile` scan — the gzip-CSV shape). Within a
  * file the parse is streaming (StAX pull over the zip entry; only the
  * shared-string pool and one row buffer are held), and the emitted rows
  * enter a normal codegen'd plan.
  *
  * Semantics, mirroring [[Extractors.csv]]'s declared-schema stance:
  * every cell surfaces as a STRING (shared/inline/formula-cached strings
  * verbatim; numbers as their raw serial text; booleans "true"/"false";
  * error cells null) and the caller casts — numeric Excel DATES are
  * serials, convertible in-plan with [[XlsxExtractor.excelSerialToTimestamp]].
  * Sparse cells (Excel omits empty cells and whole empty rows) surface as
  * nulls in their column positions; absent rows are simply not emitted,
  * so `skipRows` counts PRESENT leading rows.
  */
object XlsxExtractor {

  /** @param sheet       pick the worksheet by name; `None` → by index.
    * @param sheetIndex  0-based workbook-order index (used when `sheet`
    *                    is `None`); the reference defaults to the first.
    * @param skipRows    leading present rows to drop BEFORE the header
    *                    (the reference's `rows_to_skip`, etl_util.py:486).
    * @param header      first kept row names the columns. */
  final case class XlsxOptions(
      sheet: Option[String] = None,
      sheetIndex: Int = 0,
      skipRows: Int = 0,
      header: Boolean = true,
      normalizeHeaders: Boolean = true,
      emptyAsNull: Boolean = true)

  def xlsx(spark: SparkSession, pathGlob: String,
      opts: XlsxOptions = XlsxOptions()): DataFrame =
    SheetFrame.frame(spark, pathGlob,
      SheetFrame.Options(opts.sheet, opts.sheetIndex, opts.skipRows,
        opts.header, opts.normalizeHeaders, opts.emptyAsNull),
      sheetRows)

  /** Excel serial date/time → timestamp, for casting the raw serial
    * strings [[xlsx]] surfaces: days since the 1900 epoch (1899-12-30 —
    * the offset that absorbs Excel's phantom 1900-02-29), fractional part
    * = time of day, rounded to the nearest second. 25569 = serial of
    * 1970-01-01. Workbooks saved in the rare 1904 date system (Mac Excel
    * legacy) differ by a constant 1462 days — subtract it first. */
  def excelSerialToTimestamp(c: Column): Column =
    timestamp_seconds(
      round((c.cast("double") - lit(25569.0)) * 86400d).cast("long"))

  // ------------------------------------------------------------- parsing

  /** The first `limit` present rows of the selected sheet, as
    * column-positioned cell strings (null = absent/error cell). Pure
    * function of the bytes — executor-safe. Two passes over the zip
    * stream, each stopping as soon as it has what it needs: pass A
    * resolves the sheet part (workbook.xml sheet list + its .rels
    * id→part map) and loads the shared-string pool; pass B
    * stream-parses just that sheet, at most `limit` rows. Only
    * WORKSHEETS participate in name/index selection (chartsheets and
    * macro sheets are excluded, keeping the index space identical to
    * [[XlsExtractor]]'s, whose BOUNDSHEET filter does the same). */
  private[sources] def sheetRows(bytes: Array[Byte], sheet: Option[String],
      sheetIndex: Int, limit: Int): Vector[Vector[String]] = {
    var sheetDecls = Vector.empty[(String, String)] // (name, relId)
    var rels = Map.empty[String, String] // relId -> target part
    var sst = Vector.empty[String]
    var seen = 0
    forEachZipEntry(bytes) { (entry, in) =>
      entry match {
        case "xl/workbook.xml" => sheetDecls = parseWorkbook(in); seen += 1
        case "xl/_rels/workbook.xml.rels" => rels = parseRels(in); seen += 1
        // the OPC spec locates the pool via the relationship, not a
        // fixed name; accept the conventional name anywhere under xl/
        case e if e == "xl/sharedStrings.xml" ||
            e.endsWith("/sharedStrings.xml") =>
          sst = parseSharedStrings(in); seen += 1
        case _ => ()
      }
      seen == 3 // all parts found: stop inflating the rest
    }
    require(sheetDecls.nonEmpty,
      "not an xlsx workbook (no xl/workbook.xml sheets)")
    // resolve every declared sheet to its part; keep only worksheets
    def partOf(relId: String): Option[String] =
      rels.get(relId).map(t =>
        if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
    val sheets = sheetDecls.flatMap { case (n, relId) =>
      partOf(relId).filter(_.contains("worksheets/")).map(p => (n, p))
    }
    val (name, part) = sheet match {
      case Some(n) => sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"no worksheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))
      case None =>
        require(sheetIndex >= 0 && sheetIndex < sheets.size,
          s"sheetIndex $sheetIndex out of range (workbook has " +
            s"${sheets.size} worksheets)")
        sheets(sheetIndex)
    }
    var rows: Vector[Vector[String]] = null
    forEachZipEntry(bytes) { (entry, in) =>
      if (entry == part) rows = parseSheet(in, sst, limit)
      rows != null
    }
    require(rows != null, s"workbook has no part '$part' (sheet '$name')")
    rows
  }

  /** Applies `f` to each zip entry until it returns true (found what it
    * was looking for — the remaining entries are not inflated). */
  private def forEachZipEntry(bytes: Array[Byte])(
      f: (String, InputStream) => Boolean): Unit = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory).map(e => f(e.getName, zin))
      .find(identity): Unit
    finally zin.close()
  }

  /** Namespace-agnostic StAX reader (SpreadsheetML parts use either the
    * transitional or strict OOXML namespace; local names are stable), with
    * DTD/external-entity resolution off — workbook XML never needs either
    * and untrusted feeds must not get entity expansion. */
  private def xmlReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(in)
  }

  private def attr(r: XMLStreamReader, local: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local)
        return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  /** workbook.xml → workbook-ordered (sheet name, relationship id). */
  private def parseWorkbook(in: InputStream): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val r = xmlReader(in)
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet")
        for (n <- attr(r, "name"); id <- attr(r, "id")) out += ((n, id))
    } finally r.close()
    out.result()
  }

  /** workbook.xml.rels → relationship id → target part path. */
  private def parseRels(in: InputStream): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val r = xmlReader(in)
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship")
        for (id <- attr(r, "Id"); t <- attr(r, "Target")) out += id -> t
    } finally r.close()
    out.result()
  }

  /** sharedStrings.xml → the string pool, index = <si> order. Rich-text
    * runs (<r><t>…) concatenate; phonetic runs (<rPh>) are furigana
    * annotations, not cell content, and are excluded. */
  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var inT = false
    var phonetic = 0
    val r = xmlReader(in)
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "si" => sb.setLength(0)
        case "rPh" => phonetic += 1
        case "t" if phonetic == 0 => inT = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
          if inT => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "si" => out += sb.toString
        case "rPh" => phonetic -= 1
        case "t" => inT = false
        case _ => ()
      }
      case _ => ()
    } finally r.close()
    out.result()
  }

  /** One worksheet part → the first `limit` present rows as positioned
    * cell values. A `<row>` with no `<c>` children (a styled-but-empty
    * row) is NOT a present row — emitting it would let pure formatting
    * shift `skipRows`/header counting, and [[XlsExtractor]] (which only
    * sees cell records) could never agree with it. Phonetic runs
    * (`<rPh>`, furigana annotations) are excluded from inline strings
    * here exactly as [[parseSharedStrings]] excludes them from pooled
    * ones. */
  private def parseSheet(in: InputStream, sst: Vector[String], limit: Int)
      : Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var nRows = 0
    val row = new ArrayBuffer[String]
    val sb = new java.lang.StringBuilder
    var cellCol = 0 // 0-based column of the open cell
    var nextCol = 0 // where an r-less cell lands
    var cellType = "n"
    var sawValue = false
    var capture = false
    var hadCell = false // did this <row> contain any <c>?
    var phonetic = 0
    val r = xmlReader(in)
    try while (nRows < limit && r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row.clear(); nextCol = 0; hadCell = false
        case "c" =>
          cellCol = attr(r, "r").map(colIndex).getOrElse(nextCol)
          cellType = attr(r, "t").getOrElse("n")
          sb.setLength(0); sawValue = false; hadCell = true
        case "rPh" => phonetic += 1
        case "v" => capture = true; sawValue = true
        case "t" if phonetic == 0 => capture = true; sawValue = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
          if capture => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" | "t" => capture = false
        case "rPh" => phonetic -= 1
        case "c" =>
          val text = sb.toString
          val value: String =
            if (!sawValue) null
            else cellType match {
              // guard like the .xls twin: a corrupt/out-of-range OR
              // non-numeric pool index surfaces as null, not an
              // executor-killing throw
              case "s" =>
                text.trim.toIntOption
                  .filter(i => i >= 0 && i < sst.size).map(sst).orNull
              case "b" => if (text.trim == "1") "true" else "false"
              case "e" => null
              case _ => text // n, str (formula cache), inlineStr
            }
          while (row.size <= cellCol) row += null
          row(cellCol) = value
          nextCol = cellCol + 1
        case "row" => if (hadCell) { rows += row.toVector; nRows += 1 }
        case _ => ()
      }
      case _ => ()
    } finally r.close()
    rows.result()
  }

  /** "BC12" → 0-based column index (54). */
  private[sources] def colIndex(ref: String): Int = {
    var acc = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    require(acc > 0, s"malformed cell reference '$ref'")
    acc - 1
  }
}
