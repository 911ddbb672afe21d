package graft.sources

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Legacy binary XLS (BIFF8 inside an OLE2 compound file) extractor —
  * the reference's `OldExcelExtractor` (reference:
  * engine/wprdc_etl/pipeline/extractors.py:310-352: xlrd, sheet pick +
  * `rows_to_skip` + header row), built on nothing but the JDK. An .xls
  * is two public, fully-documented layers (MS-CFB + MS-XLS):
  *
  *  1. an OLE2 **compound file** — a mini FAT filesystem of 512-byte
  *     sectors (header DIFAT → FAT → directory; streams smaller than
  *     4096 bytes live in a mini-stream of 64-byte sectors with its own
  *     mini-FAT) holding a stream named `Workbook`;
  *  2. a **BIFF8 record stream** — (u16 opcode, u16 length, payload)
  *     records: workbook globals (shared-string table `SST` spanning
  *     `CONTINUE` records, `BOUNDSHEET` offsets, `DATE1904`), then one
  *     substream per sheet with cell records (`LABELSST`, `NUMBER`,
  *     `RK`/`MULRK`, `BOOLERR`, `LABEL`, `FORMULA`+`STRING`,
  *     `BLANK`/`MULBLANK`).
  *
  * Scale shape and header/padding semantics: [[SheetFrame]] (per-FILE
  * parallelism over a `binaryFile` scan). Cell semantics mirror
  * [[XlsxExtractor]] exactly: every cell surfaces as a STRING (strings
  * verbatim; numbers as their shortest serial text — integral doubles
  * drop the ".0", matching the raw text an xlsx stores; booleans
  * "true"/"false"; error cells null), the caller casts, and numeric
  * Excel dates are serials convertible in-plan with
  * [[XlsxExtractor.excelSerialToTimestamp]] (workbooks saved in the
  * 1904 date system carry serials 1462 days lower — probe with
  * [[isDate1904]] and add the constant first). Only BIFF8 (Excel
  * 97-2003, the format every surviving .xls feed uses) is supported —
  * BIFF5 workbooks fail fast with a clear error. */
object XlsExtractor {

  import LE.{u8, u16, u32}

  /** Same surface as [[XlsxExtractor.XlsxOptions]]. */
  final case class XlsOptions(
      sheet: Option[String] = None,
      sheetIndex: Int = 0,
      skipRows: Int = 0,
      header: Boolean = true,
      normalizeHeaders: Boolean = true,
      emptyAsNull: Boolean = true)

  def xls(spark: SparkSession, pathGlob: String,
      opts: XlsOptions = XlsOptions()): DataFrame =
    SheetFrame.frame(spark, pathGlob,
      SheetFrame.Options(opts.sheet, opts.sheetIndex, opts.skipRows,
        opts.header, opts.normalizeHeaders, opts.emptyAsNull),
      sheetRows)

  /** Driver-side probe for the 1904 date system (Mac Excel legacy,
    * BIFF `DATE1904` record): when true, every date serial in this
    * workbook is 1462 days lower than the 1900-system serials
    * [[XlsxExtractor.excelSerialToTimestamp]] expects — add 1462
    * before converting. */
  def isDate1904(bytes: Array[Byte]): Boolean =
    parseGlobals(Cfb.stream(bytes, Set("Workbook", "Book"))).date1904

  /** The first `limit` present rows of the selected sheet, as
    * column-positioned cell strings (null = absent/blank/error cell).
    * Pure function of the bytes — executor-safe. */
  private[sources] def sheetRows(bytes: Array[Byte], sheet: Option[String],
      sheetIndex: Int, limit: Int): Vector[Vector[String]] = {
    val wb = Cfb.stream(bytes, Set("Workbook", "Book"))
    val g = parseGlobals(wb)
    val (_, pos) = sheet match {
      case Some(n) => g.sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"no sheet named '$n' (have: ${g.sheets.map(_._1).mkString(", ")})"))
      case None =>
        require(sheetIndex >= 0 && sheetIndex < g.sheets.size,
          s"sheetIndex $sheetIndex out of range (workbook has ${g.sheets.size})")
        g.sheets(sheetIndex)
    }
    parseSheet(wb, pos, g.sst, limit)
  }

  // ------------------------------------------------------ BIFF8 records

  private val BOF = 0x0809
  private val EOF = 0x000A
  private val BOUNDSHEET = 0x0085
  private val SST = 0x00FC
  private val CONTINUE = 0x003C
  private val DATE1904 = 0x0022
  private val LABELSST = 0x00FD
  private val NUMBER = 0x0203
  private val RK = 0x027E
  private val MULRK = 0x00BD
  private val BOOLERR = 0x0205
  private val LABEL = 0x0204
  private val BLANK = 0x0201
  private val MULBLANK = 0x00BE
  private val FORMULA = 0x0006
  private val STRING = 0x0207

  private final case class Globals(
      sheets: Vector[(String, Int)], sst: Vector[String], date1904: Boolean)

  /** Workbook-globals substream: sheet directory, shared strings, date
    * system. Ends at the globals EOF; sheet substreams follow. */
  private def parseGlobals(wb: Array[Byte]): Globals = {
    require(wb.length >= 8 && u16(wb, 0) == BOF,
      "not a BIFF workbook stream (no BOF)")
    require(u16(wb, 4) == 0x0600,
      f"unsupported BIFF version 0x${u16(wb, 4)}%04x - only BIFF8 " +
        "(Excel 97-2003) .xls is supported")
    val sheets = Vector.newBuilder[(String, Int)]
    var sst = Vector.empty[String]
    var date1904 = false
    var i = 0
    var done = false
    while (!done && i + 4 <= wb.length) {
      val op = u16(wb, i)
      val len = u16(wb, i + 2)
      val b = i + 4
      var next = b + len
      op match {
        case BOUNDSHEET =>
          val pos = u32(wb, b)
          val dt = (u16(wb, b + 4) >> 8) & 0xFF
          // dt 0 = worksheet (charts/macros excluded from the index,
          // like xlrd's sheet list excludes nothing the user can read)
          if (dt == 0) sheets += ((shortString(wb, b + 6), pos))
        case SST =>
          // the SST may span CONTINUE records; gather all payloads and
          // parse through a boundary-aware cursor
          val segs = Vector.newBuilder[(Int, Int)]
          segs += ((b, b + len))
          var j = next
          while (j + 4 <= wb.length && u16(wb, j) == CONTINUE) {
            val cl = u16(wb, j + 2)
            segs += ((j + 4, j + 4 + cl))
            j = j + 4 + cl
          }
          next = j
          val cur = new BiffCursor(wb, segs.result())
          cur.skip(4) // total-use count; unique count follows
          val unique = cur.u32
          val out = Vector.newBuilder[String]
          var k = 0
          while (k < unique) { out += cur.readString(); k += 1 }
          sst = out.result()
        case DATE1904 => date1904 = len >= 2 && u16(wb, b) == 1
        case EOF => done = true
        case _ => ()
      }
      i = next
    }
    Globals(sheets.result(), sst, date1904)
  }

  /** Cell-record opcodes — the records that can open a new row. Used by
    * the `limit` early-stop: BIFF8 cell records are row-major within a
    * sheet substream, so once `limit` rows exist, the first cell record
    * addressing a NEW row proves the collected rows are complete. */
  private val cellOps =
    Set(LABELSST, NUMBER, RK, MULRK, BOOLERR, LABEL, BLANK, MULBLANK, FORMULA)

  /** One sheet substream (from its BOUNDSHEET offset) → the first
    * `limit` present rows. Nested substreams (embedded chart BOF/EOF
    * pairs) are skipped by depth tracking. */
  private def parseSheet(wb: Array[Byte], start: Int,
      sst: Vector[String], limit: Int): Vector[Vector[String]] = {
    require(start + 4 <= wb.length && u16(wb, start) == BOF,
      "BOUNDSHEET offset does not point at a BOF")
    val rows = mutable.TreeMap.empty[Int, ArrayBuffer[String]]
    def put(rw: Int, col: Int, v: String): Unit = {
      val r = rows.getOrElseUpdate(rw, new ArrayBuffer[String])
      while (r.size <= col) r += null
      r(col) = v
    }
    var depth = 0
    // a FORMULA whose cached result is a string is followed by a STRING
    // record carrying the value
    var pendingStr: Option[(Int, Int)] = None
    var i = start
    var done = false
    while (!done && i + 4 <= wb.length) {
      val op = u16(wb, i)
      val len = u16(wb, i + 2)
      val b = i + 4
      if (rows.size >= limit && cellOps(op) && !rows.contains(u16(wb, b))) {
        done = true
      } else op match {
        case BOF => depth += 1
        case EOF => depth -= 1; if (depth <= 0) done = true
        case _ if depth > 1 => () // inside an embedded object's substream
        case LABELSST =>
          val isst = u32(wb, b + 6)
          put(u16(wb, b), u16(wb, b + 2),
            if (isst >= 0 && isst < sst.size) sst(isst) else null)
        case NUMBER =>
          put(u16(wb, b), u16(wb, b + 2), fmtNum(f64(wb, b + 6)))
        case RK =>
          put(u16(wb, b), u16(wb, b + 2), fmtNum(decodeRk(u32(wb, b + 6))))
        case MULRK =>
          val rw = u16(wb, b)
          val colFirst = u16(wb, b + 2)
          val n = (len - 6) / 6
          var k = 0
          while (k < n) {
            put(rw, colFirst + k, fmtNum(decodeRk(u32(wb, b + 4 + 6 * k + 2))))
            k += 1
          }
        case BOOLERR =>
          val v =
            if (u8(wb, b + 7) != 0) null // error cell, like xlsx t="e"
            else if (u8(wb, b + 6) != 0) "true" else "false"
          put(u16(wb, b), u16(wb, b + 2), v)
        case LABEL => // inline string cell (rare in BIFF8; SST is normal)
          put(u16(wb, b), u16(wb, b + 2), xlString(wb, b + 6))
        case BLANK =>
          put(u16(wb, b), u16(wb, b + 2), null)
        case MULBLANK =>
          val rw = u16(wb, b)
          val colFirst = u16(wb, b + 2)
          val colLast = u16(wb, b + len - 2)
          var c = colFirst
          while (c <= colLast) { put(rw, c, null); c += 1 }
        case FORMULA =>
          val rw = u16(wb, b)
          val col = u16(wb, b + 2)
          if (u16(wb, b + 12) == 0xFFFF) u8(wb, b + 6) match {
            case 0 => pendingStr = Some((rw, col)) // STRING record follows
            case 1 => put(rw, col, if (u8(wb, b + 8) != 0) "true" else "false")
            case _ => put(rw, col, null) // error (2) or blank (3)
          }
          else put(rw, col, fmtNum(f64(wb, b + 6)))
        case STRING =>
          pendingStr.foreach { case (rw, col) =>
            put(rw, col, xlString(wb, b))
          }
          pendingStr = None
        case _ => ()
      }
      i = b + len
    }
    rows.valuesIterator.map(_.toVector).take(limit).toVector
  }

  /** RK-encoded number: bit 0 = /100, bit 1 = 30-bit int vs truncated
    * IEEE double (its top 30 mantissa/exponent bits). */
  private def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble // arithmetic shift keeps sign
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100 else v
  }

  /** Integral doubles print without the ".0" — the raw serial text an
    * xlsx stores for the same cell, keeping the two extractors'
    * outputs byte-identical for numeric data. */
  private def fmtNum(d: Double): String =
    if (!d.isInfinite && !d.isNaN && d == math.rint(d) && math.abs(d) < 1e15)
      d.toLong.toString
    else d.toString

  /** XLUnicodeString at a fixed offset: u16 cch, u8 flags (bit 0 =
    * 16-bit chars), chars. (Cell-record strings; never CONTINUE-split
    * in the records we read — only the SST needs the cursor.) */
  private def xlString(b: Array[Byte], off: Int): String = {
    val cch = u16(b, off)
    val high = (u8(b, off + 2) & 1) != 0
    decodeChars(b, off + 3, cch, high)
  }

  /** ShortXLUnicodeString (BOUNDSHEET name): u8 cch, u8 flags, chars. */
  private def shortString(b: Array[Byte], off: Int): String = {
    val cch = u8(b, off)
    val high = (u8(b, off + 1) & 1) != 0
    decodeChars(b, off + 2, cch, high)
  }

  private def decodeChars(b: Array[Byte], off: Int, cch: Int,
      high: Boolean): String = {
    val sb = new java.lang.StringBuilder(cch)
    var k = 0
    if (high) while (k < cch) {
      sb.append(((b(off + 2 * k) & 0xFF) | ((b(off + 2 * k + 1) & 0xFF) << 8)).toChar)
      k += 1
    }
    else while (k < cch) { sb.append((b(off + k) & 0xFF).toChar); k += 1 }
    sb.toString
  }

  /** Reader over the SST payload and its CONTINUE payloads as one
    * logical stream. Character data crossing into a CONTINUE record
    * re-reads a fresh flags byte there (the compressed/16-bit encoding
    * may switch mid-string — the one genuinely tricky rule in BIFF8);
    * headers and rich-text/phonetic tails cross boundaries raw. */
  private final class BiffCursor(data: Array[Byte], segs: Vector[(Int, Int)]) {
    private var s = 0
    private var p = segs.head._1

    private def ensure(): Unit =
      while (p == segs(s)._2 && s < segs.size - 1) { s += 1; p = segs(s)._1 }

    def u8: Int = {
      ensure()
      require(p < segs(s)._2, "truncated SST")
      val v = data(p) & 0xFF; p += 1; v
    }
    def u16: Int = u8 | (u8 << 8)
    def u32: Int = u16 | (u16 << 16)
    def skip(n: Int): Unit = {
      var r = n
      while (r > 0) {
        ensure()
        require(p < segs(s)._2, "truncated SST")
        val take = math.min(r, segs(s)._2 - p)
        p += take; r -= take
      }
    }

    /** XLUnicodeRichExtendedString, CONTINUE-aware. */
    def readString(): String = {
      val cch = u16
      val flags = u8
      var high = (flags & 0x01) != 0
      val ext = (flags & 0x04) != 0
      val rich = (flags & 0x08) != 0
      val cRun = if (rich) u16 else 0
      val cbExt = if (ext) u32 else 0
      val sb = new java.lang.StringBuilder(cch)
      var rem = cch
      while (rem > 0) {
        if (p == segs(s)._2) { // crossing into a CONTINUE mid-characters
          require(s < segs.size - 1, "truncated SST string")
          s += 1; p = segs(s)._1
          high = (data(p) & 0x01) != 0; p += 1 // fresh flags byte
        }
        val width = if (high) 2 else 1
        val take = math.min(rem, (segs(s)._2 - p) / width)
        require(take > 0, "malformed SST continuation")
        var k = 0
        if (high) while (k < take) {
          sb.append(((data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8)).toChar)
          p += 2; k += 1
        }
        else while (k < take) { sb.append((data(p) & 0xFF).toChar); p += 1; k += 1 }
        rem -= take
      }
      skip(4 * cRun) // rich-text runs: formatting only, not cell content
      skip(cbExt)    // phonetic/ext block: furigana annotations, excluded
      sb.toString
    }
  }

  // --------------------------------------------------- byte-level reads

  private def f64(b: Array[Byte], i: Int): Double = {
    var bits = 0L
    var k = 7
    while (k >= 0) { bits = (bits << 8) | (b(i + k) & 0xFFL); k -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }
}

/** Minimal OLE2 / MS-CFB compound-file reader: header DIFAT → FAT →
  * directory → stream bytes, with the mini-stream (sub-4096-byte
  * streams in 64-byte sectors, addressed by the mini-FAT through the
  * root entry's container stream) handled. Read-only, bounds-checked,
  * cycle-guarded; everything else in the container (storages, property
  * sets, summary info) is ignored. */
private[sources] object Cfb {

  import LE.{u16, u32}

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE

  /** The bytes of the first stream whose name is in `names`. */
  def stream(bytes: Array[Byte], names: Set[String]): Array[Byte] = {
    require(bytes.length >= 512 &&
      u32(bytes, 0) == 0xE011CFD0 && u32(bytes, 4) == 0xE11AB1A1,
      "not an OLE2 compound file (bad magic) - is this really an .xls?")
    val secShift = u16(bytes, 30)
    require(secShift >= 7 && secShift <= 12, s"implausible sector shift $secShift")
    val ssz = 1 << secShift
    val miniShift = u16(bytes, 32)
    val miniSize = 1 << miniShift
    val firstDir = u32(bytes, 48)
    val miniCutoff = u32(bytes, 56)
    val firstMiniFat = u32(bytes, 60)
    val firstDifat = u32(bytes, 68)
    val perSec = ssz / 4
    val maxSectors = bytes.length / ssz + 1

    // Long arithmetic: a corrupt/adversarial 30-bit sector id shifted
    // by secShift wraps Int and can alias offset 0, turning the bounds
    // check into a silent wrong-bytes read
    def secOff(id: Int): Long = (id.toLong + 1) << secShift
    def valid(id: Int): Boolean = id >= 0 && secOff(id) + ssz <= bytes.length

    // ---- FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    val fatSectors = ArrayBuffer.empty[Int]
    var k = 0
    while (k < 109) {
      val v = u32(bytes, 76 + 4 * k)
      if (v != FreeSect && v != EndOfChain) fatSectors += v
      k += 1
    }
    var ds = firstDifat
    var guard = 0
    while (ds != EndOfChain && ds != FreeSect && guard < maxSectors) {
      require(valid(ds), s"DIFAT sector $ds out of bounds")
      val off = secOff(ds).toInt // fits: valid() proved off + ssz <= length
      var j = 0
      while (j < perSec - 1) {
        val v = u32(bytes, off + 4 * j)
        if (v != FreeSect && v != EndOfChain) fatSectors += v
        j += 1
      }
      ds = u32(bytes, off + ssz - 4)
      guard += 1
    }
    require(guard < maxSectors, "DIFAT chain cycle")

    // ---- FAT
    val fat = new Array[Int](fatSectors.length * perSec)
    var fi = 0
    fatSectors.foreach { fs =>
      require(valid(fs), s"FAT sector $fs out of bounds")
      var j = 0
      while (j < perSec) { fat(fi) = u32(bytes, secOff(fs).toInt + 4 * j); fi += 1; j += 1 }
    }

    def chain(start: Int): Vector[Int] = {
      val out = Vector.newBuilder[Int]
      var id = start
      var n = 0
      while (id != EndOfChain && id != FreeSect) {
        require(id >= 0 && id < fat.length, s"sector $id beyond FAT")
        require(n <= fat.length, "FAT chain cycle")
        out += id; id = fat(id); n += 1
      }
      out.result()
    }

    /** Concatenated sector bytes of a regular-sector chain, truncated. */
    def readChain(start: Int, size: Long): Array[Byte] = {
      val ids = chain(start)
      val out = new Array[Byte](math.min(size, ids.length.toLong * ssz).toInt)
      var pos = 0
      ids.foreach { id =>
        require(valid(id), s"sector $id out of bounds")
        val n = math.min(ssz, out.length - pos)
        if (n > 0) System.arraycopy(bytes, secOff(id).toInt, out, pos, n)
        pos += n
      }
      out
    }

    // ---- directory: 128-byte entries over the dir chain
    val dir = readChain(firstDir, Long.MaxValue >> 8)
    final case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).flatMap { e =>
      val off = e * 128
      val nameLen = u16(dir, off + 64)
      if (nameLen < 2 || nameLen > 64) None
      else {
        val sb = new java.lang.StringBuilder
        var c = 0
        while (c < nameLen / 2 - 1) {
          sb.append(((dir(off + 2 * c) & 0xFF) |
            ((dir(off + 2 * c + 1) & 0xFF) << 8)).toChar)
          c += 1
        }
        Some(Entry(sb.toString, dir(off + 66) & 0xFF, u32(dir, off + 116),
          u32(dir, off + 120).toLong & 0xFFFFFFFFL))
      }
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("compound file has no root entry"))
    val target = entries.find(e => e.objType == 2 && names(e.name)).getOrElse(
      throw new IllegalArgumentException(
        s"no stream named ${names.mkString("/")} (have: " +
          s"${entries.filter(_.objType == 2).map(_.name).mkString(", ")})"))
    // CFB is uncompressed, so no stream can exceed the file itself — a
    // corrupt size field must not drive a multi-GB allocation
    require(target.size <= bytes.length,
      s"stream '${target.name}' claims ${target.size} bytes in a " +
        s"${bytes.length}-byte file")

    if (target.size >= miniCutoff) readChain(target.start, target.size)
    else {
      // ---- mini-stream: 64-byte sectors inside the root's container
      val container = readChain(root.start, root.size)
      val miniFatBytes = readChain(firstMiniFat, Long.MaxValue >> 8)
      val out = new Array[Byte](target.size.toInt)
      var id = target.start
      var pos = 0
      var n = 0
      while (id != EndOfChain && id != FreeSect && pos < out.length) {
        require(n.toLong * 4 <= miniFatBytes.length, "mini-FAT chain cycle")
        // Long products: a corrupt 26-bit mini-sector id times 64 wraps
        // Int and can alias offset 0, silently reading the wrong bytes
        val off = id.toLong * miniSize
        require(id >= 0 && off + miniSize <= container.length,
          s"mini sector $id out of bounds")
        val take = math.min(miniSize, out.length - pos)
        System.arraycopy(container, off.toInt, out, pos, take)
        pos += take
        require(id.toLong * 4 + 4 <= miniFatBytes.length,
          s"mini sector $id beyond mini-FAT")
        id = u32(miniFatBytes, id * 4)
        n += 1
      }
      require(pos == out.length,
        s"mini-stream chain ended early: $pos of ${out.length} bytes")
      out
    }
  }
}

/** Little-endian primitive reads shared by the two binary layers
  * ([[XlsExtractor]]'s BIFF records and [[Cfb]]'s container). */
private object LE {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def u32(b: Array[Byte], i: Int): Int = u16(b, i) | (u16(b, i + 2) << 16)
}
