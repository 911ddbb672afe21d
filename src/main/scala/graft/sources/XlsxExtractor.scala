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

  /** All present rows of the selected sheet, as column-positioned cell
    * strings (null = absent/error cell). Pure function of the bytes —
    * executor-safe. Two passes over the zip stream: pass A resolves the
    * sheet part (workbook.xml sheet list + its .rels id→part map) and
    * loads the shared-string pool; pass B stream-parses just that sheet. */
  private[sources] def sheetRows(bytes: Array[Byte], sheet: Option[String],
      sheetIndex: Int): Vector[Vector[String]] = {
    var sheets = Vector.empty[(String, String)] // (name, relId)
    var rels = Map.empty[String, String] // relId -> target part
    var sst = Vector.empty[String]
    forEachZipEntry(bytes) {
      case ("xl/workbook.xml", in) => sheets = parseWorkbook(in)
      case ("xl/_rels/workbook.xml.rels", in) => rels = parseRels(in)
      case ("xl/sharedStrings.xml", in) => sst = parseSharedStrings(in)
      case _ => ()
    }
    require(sheets.nonEmpty, "not an xlsx workbook (no xl/workbook.xml sheets)")
    val (name, relId) = sheet match {
      case Some(n) => sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"no sheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))
      case None =>
        require(sheetIndex >= 0 && sheetIndex < sheets.size,
          s"sheetIndex $sheetIndex out of range (workbook has ${sheets.size})")
        sheets(sheetIndex)
    }
    val target = rels.getOrElse(relId,
      throw new IllegalArgumentException(
        s"sheet '$name' ($relId) has no workbook relationship"))
    // targets are relative to xl/ unless rooted ("/xl/worksheets/…")
    val part =
      if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
    var rows: Vector[Vector[String]] = null
    forEachZipEntry(bytes) {
      case (`part`, in) => rows = parseSheet(in, sst)
      case _ => ()
    }
    require(rows != null, s"workbook has no part '$part' (sheet '$name')")
    rows
  }

  private def forEachZipEntry(bytes: Array[Byte])(
      f: (String, InputStream) => Unit): Unit = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory).foreach(e => f(e.getName, zin))
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

  /** One worksheet part → present rows as positioned cell values. */
  private def parseSheet(in: InputStream, sst: Vector[String])
      : Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val row = new ArrayBuffer[String]
    val sb = new java.lang.StringBuilder
    var cellCol = 0 // 0-based column of the open cell
    var nextCol = 0 // where an r-less cell lands
    var cellType = "n"
    var sawValue = false
    var capture = false
    val r = xmlReader(in)
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row.clear(); nextCol = 0
        case "c" =>
          cellCol = attr(r, "r").map(colIndex).getOrElse(nextCol)
          cellType = attr(r, "t").getOrElse("n")
          sb.setLength(0); sawValue = false
        case "v" | "t" => capture = true; sawValue = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
          if capture => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" | "t" => capture = false
        case "c" =>
          val text = sb.toString
          val value: String =
            if (!sawValue) null
            else cellType match {
              case "s" => sst(text.trim.toInt)
              case "b" => if (text.trim == "1") "true" else "false"
              case "e" => null
              case _ => text // n, str (formula cache), inlineStr
            }
          while (row.size <= cellCol) row += null
          row(cellCol) = value
          nextCol = cellCol + 1
        case "row" => rows += row.toVector
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
