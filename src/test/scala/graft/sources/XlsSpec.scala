package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.SparkSpec
import graft.lake.LakeTable
import graft.spec.{JobDestination, JobExtractor, JobRunner, JobSource, JobSpec, Projection}

/** [[XlsExtractor]] against workbooks built in-test from the two format
  * layers themselves (MS-CFB compound file + BIFF8 records — the
  * fixture is the format spec, not a canned binary). Covers the
  * reference OldExcelExtractor behaviors (reference:
  * engine/wprdc_etl/pipeline/extractors.py:310-352) plus the format
  * corners: both container layouts (mini-stream and regular sectors),
  * CONTINUE-split shared strings with a mid-string encoding switch,
  * every BIFF8 cell record type, and sheet selection. */
class XlsSpec extends SparkSpec {

  // ------------------------------------------------- byte-level builders

  private def u16b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def f64b(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(k => ((bits >> (8 * k)) & 0xFF).toByte).toArray
  }
  private def latin(s: String): Array[Byte] = s.map(_.toByte).toArray
  private def utf16(s: String): Array[Byte] =
    s.flatMap(c => Seq((c & 0xFF).toByte, ((c >> 8) & 0xFF).toByte)).toArray

  // ---------------------------------------------------- BIFF8 records

  private def rec(op: Int, payload: Array[Byte]): Array[Byte] =
    u16b(op) ++ u16b(payload.length) ++ payload

  /** XLUnicodeString: u16 cch, u8 flags, chars (latin or UTF-16LE). */
  private def xlStr(s: String): Array[Byte] = {
    val high = s.exists(_ > 0xFF)
    u16b(s.length) ++ Array((if (high) 1 else 0).toByte) ++
      (if (high) utf16(s) else latin(s))
  }

  private def sstRec(strings: Seq[String]): Array[Byte] =
    rec(0x00FC, u32b(strings.size) ++ u32b(strings.size) ++
      strings.flatMap(xlStr).toArray)

  private def cellHead(rw: Int, col: Int): Array[Byte] =
    u16b(rw) ++ u16b(col) ++ u16b(0) // rw, col, ixfe
  private def labelSst(rw: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, cellHead(rw, col) ++ u32b(isst))
  private def number(rw: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0203, cellHead(rw, col) ++ f64b(d))
  private def rkRec(rw: Int, col: Int, rkBits: Int): Array[Byte] =
    rec(0x027E, cellHead(rw, col) ++ u32b(rkBits))
  private def rkInt(v: Int): Int = (v << 2) | 2
  private def rkInt100(v: Int): Int = (v << 2) | 3
  private def rkFloat(d: Double): Int =
    ((java.lang.Double.doubleToLongBits(d) >>> 32) & 0xFFFFFFFCL).toInt
  private def mulRk(rw: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0x00BD, u16b(rw) ++ u16b(colFirst) ++
      rks.flatMap(r => u16b(0) ++ u32b(r)).toArray ++
      u16b(colFirst + rks.size - 1))
  private def boolErr(rw: Int, col: Int, v: Int, isErr: Int): Array[Byte] =
    rec(0x0205, cellHead(rw, col) ++ Array(v.toByte, isErr.toByte))
  private def blank(rw: Int, col: Int): Array[Byte] =
    rec(0x0201, cellHead(rw, col))
  private def mulBlank(rw: Int, c1: Int, c2: Int): Array[Byte] =
    rec(0x00BE, u16b(rw) ++ u16b(c1) ++
      Array.fill[Byte](2 * (c2 - c1 + 1))(0) ++ u16b(c2))
  private def formulaNum(rw: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0006, cellHead(rw, col) ++ f64b(d) ++ u16b(0) ++ u32b(0) ++ u16b(0))
  /** Cached-string formula: FormulaValue [type=0, …, 0xFFFF]; the value
    * arrives in the STRING record that follows. */
  private def formulaStr(rw: Int, col: Int): Array[Byte] =
    rec(0x0006, cellHead(rw, col) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ u16b(0) ++ u32b(0) ++ u16b(0))
  private def stringRec(s: String): Array[Byte] = rec(0x0207, xlStr(s))
  private def labelRec(rw: Int, col: Int, s: String): Array[Byte] =
    rec(0x0204, cellHead(rw, col) ++ xlStr(s))

  /** Globals (BOF, [mid: SST…], BOUNDSHEETs with patched stream
    * offsets, EOF) + per-sheet substreams (BOF, cells, EOF). */
  private def biffStream(globalsMid: Array[Byte],
      sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bofG = rec(0x0809, u16b(0x0600) ++ u16b(0x0005) ++ Array.fill[Byte](12)(0))
    val bofS = rec(0x0809, u16b(0x0600) ++ u16b(0x0010) ++ Array.fill[Byte](12)(0))
    val eof = rec(0x000A, Array.empty)
    // BOUNDSHEET: u32 pos, u16 flags, ShortXLUnicodeString name
    val bsSize = sheets.map { case (n, _) => 4 + 4 + 2 + 1 + 1 + n.length }.sum
    val globalsLen = bofG.length + globalsMid.length + bsSize + eof.length
    val bodies = sheets.map { case (_, cells) => bofS ++ cells ++ eof }
    val positions = bodies.scanLeft(globalsLen)((acc, sb) => acc + sb.length)
    val bs = sheets.zip(positions).map { case ((n, _), pos) =>
      rec(0x0085, u32b(pos) ++ u16b(0) ++
        Array(n.length.toByte, 0.toByte) ++ latin(n))
    }
    bofG ++ globalsMid ++ bs.flatten ++ eof ++ bodies.flatten
  }

  // ------------------------------------------------------ CFB container

  private val Free = 0xFFFFFFFF
  private val End = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private def dirEntry(name: String, objType: Int, start: Int, size: Int,
      child: Int): Array[Byte] = {
    val e = new Array[Byte](128)
    val nb = utf16(name)
    System.arraycopy(nb, 0, e, 0, nb.length)
    System.arraycopy(u16b(nb.length + 2), 0, e, 64, 2)
    e(66) = objType.toByte
    e(67) = 1 // black
    System.arraycopy(u32b(Free), 0, e, 68, 4) // left sibling
    System.arraycopy(u32b(Free), 0, e, 72, 4) // right sibling
    System.arraycopy(u32b(child), 0, e, 76, 4)
    System.arraycopy(u32b(start), 0, e, 116, 4)
    System.arraycopy(u32b(size), 0, e, 120, 4)
    e
  }

  private def fatSector(entries: Seq[Int]): Array[Byte] = {
    require(entries.size <= 128)
    (entries ++ Seq.fill(128 - entries.size)(Free)).flatMap(u32b).toArray
  }

  private def pad(b: Array[Byte], mult: Int): Array[Byte] =
    if (b.length % mult == 0) b
    else b ++ Array.fill[Byte](mult - b.length % mult)(0)

  /** Wrap a Workbook stream in a v3 compound file. `forceRegular` pads
    * the stream past the 4096-byte mini cutoff so it lands in regular
    * 512-byte sectors; otherwise small streams use the mini-stream
    * (64-byte sectors + mini-FAT), exactly like real Excel output. */
  private def cfb(stream0: Array[Byte], forceRegular: Boolean): Array[Byte] = {
    val header = new Array[Byte](512)
    System.arraycopy(
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte),
      0, header, 0, 8)
    System.arraycopy(u16b(0x003E), 0, header, 24, 2) // minor
    System.arraycopy(u16b(3), 0, header, 26, 2)      // major v3
    System.arraycopy(u16b(0xFFFE), 0, header, 28, 2) // little-endian
    System.arraycopy(u16b(9), 0, header, 30, 2)      // 512-byte sectors
    System.arraycopy(u16b(6), 0, header, 32, 2)      // 64-byte mini sectors
    System.arraycopy(u32b(1), 0, header, 44, 4)      // one FAT sector
    System.arraycopy(u32b(1), 0, header, 48, 4)      // dir at sector 1
    System.arraycopy(u32b(4096), 0, header, 56, 4)   // mini cutoff
    System.arraycopy(u32b(End), 0, header, 68, 4)    // no DIFAT chain
    // header DIFAT: FAT at sector 0, rest free
    System.arraycopy(u32b(0), 0, header, 76, 4)
    for (k <- 1 until 109)
      System.arraycopy(u32b(Free), 0, header, 76 + 4 * k, 4)

    if (forceRegular || stream0.length >= 4096) {
      // BIFF tolerates zero-byte tail padding (op 0 records past the
      // final EOF are never reached), so pad to the cutoff
      val stream = pad(
        if (stream0.length < 4096) stream0 ++ Array.fill[Byte](4096 - stream0.length)(0)
        else stream0, 512)
      val n = stream.length / 512
      System.arraycopy(u32b(End), 0, header, 60, 4) // no mini-FAT
      val fat = fatSector(
        Seq(FatSect, End) ++ (1 until n).map(i => 2 + i) ++ Seq(End))
      // the recorded size must be >= the mini cutoff or the container
      // is malformed (sub-cutoff streams live in the mini-stream);
      // BIFF tolerates the zero tail past the final EOF
      val dir = pad(
        dirEntry("Root Entry", 5, End, 0, child = 1) ++
          dirEntry("Workbook", 2, 2, stream.length, child = Free), 512)
      header ++ fat ++ dir ++ stream
    } else {
      val container = pad(stream0, 64)
      val nMini = container.length / 64
      val cont = pad(container, 512)
      val m = cont.length / 512
      System.arraycopy(u32b(2), 0, header, 60, 4) // mini-FAT at sector 2
      System.arraycopy(u32b(1), 0, header, 64, 4) // one mini-FAT sector
      val fat = fatSector(
        Seq(FatSect, End, End) ++ (1 until m).map(i => 3 + i) ++ Seq(End))
      val miniFat = fatSector((1 until nMini).map(identity) ++ Seq(End))
      val dir = pad(
        dirEntry("Root Entry", 5, 3, container.length, child = 1) ++
          dirEntry("Workbook", 2, 0, stream0.length, child = Free), 512)
      header ++ fat ++ dir ++ miniFat ++ cont
    }
  }

  private def write(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }

  /** The standard two-column fixture: header (Name, Age) + two rows. */
  private def dogStream: Array[Byte] = biffStream(
    sstRec(Seq("Name", "Age", "mojo", "don")),
    Seq("Sheet1" ->
      (labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
        labelSst(1, 0, 2) ++ rkRec(1, 1, rkInt(7)) ++
        labelSst(2, 0, 3) ++ number(2, 1, 63.0))))

  // ------------------------------------------------------------- tests

  test("xls: mini-stream container — headers normalized, SST resolved, numbers raw") {
    val dir = tmpDir("xls-mini")
    val bytes = cfb(dogStream, forceRegular = false)
    assert(dogStream.length < 4096, "fixture must exercise the mini-stream")
    val f = write(dir, "dogs.xls", bytes)
    val df = XlsExtractor.xls(spark, f)
    assert(df.columns.toSeq == Seq("name", "age"))
    val rows = df.orderBy("name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("don", "mojo"))
    assert(rows(0).getString(1) == "63" && rows(1).getString(1) == "7")
  }

  test("xls: regular-sector container reads identically") {
    val dir = tmpDir("xls-reg")
    val f = write(dir, "dogs.xls", cfb(dogStream, forceRegular = true))
    val df = XlsExtractor.xls(spark, f)
    assert(df.orderBy("name").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq ==
      Seq(("don", "63"), ("mojo", "7")))
  }

  test("xls: CONTINUE-split SST with a mid-string encoding switch") {
    // one string "hello→→" split across SST and CONTINUE: 5 latin chars
    // in the SST record, then the CONTINUE re-declares flags=1 (16-bit)
    // for the remaining 2 wide chars — the BIFF8 rule xlrd implements
    val s = "hello→→"
    val sstSplit =
      rec(0x00FC, u32b(1) ++ u32b(1) ++ u16b(s.length) ++
        Array(0.toByte) ++ latin("hello")) ++
      rec(0x003C, Array(1.toByte) ++ utf16("→→"))
    val stream = biffStream(sstSplit,
      Seq("Sheet1" -> (labelSst(0, 0, 0) ++ labelSst(1, 0, 0))))
    val dir = tmpDir("xls-cont")
    val f = write(dir, "c.xls", cfb(stream, forceRegular = false))
    val df = XlsExtractor.xls(spark, f)
    assert(df.columns.toSeq == Seq(s)) // lowercase, no spaces → unchanged
    assert(df.collect()(0).getString(0) == s)
  }

  test("xls: cell-record zoo — RK variants, MULRK, bool, error, formulas, label, blanks") {
    val header = (0 to 9).map(c => labelSst(0, c, c)).reduce(_ ++ _)
    val cells = header ++
      rkRec(1, 0, rkInt(-5)) ++            // signed 30-bit int RK
      rkRec(1, 1, rkInt100(1234)) ++       // 12.34 via /100
      rkRec(1, 2, rkFloat(1.5)) ++         // truncated-double RK
      mulRk(1, 3, Seq(rkInt(7), rkInt(8))) ++
      boolErr(1, 5, 1, 0) ++               // TRUE
      boolErr(1, 6, 0x2A, 1) ++            // #DIV/0! → null
      formulaNum(1, 7, 99.0) ++
      formulaStr(1, 8) ++ stringRec("cached") ++
      labelRec(1, 9, "inline")
    val stream = biffStream(
      sstRec((0 to 9).map(c => s"h$c")),
      Seq("Sheet1" -> cells))
    val dir = tmpDir("xls-zoo")
    val f = write(dir, "z.xls", cfb(stream, forceRegular = false))
    val r = XlsExtractor.xls(spark, f).collect()(0)
    assert(r.getString(0) == "-5")
    assert(r.getString(1) == "12.34")
    assert(r.getString(2) == "1.5")
    assert(r.getString(3) == "7" && r.getString(4) == "8")
    assert(r.getString(5) == "true")
    assert(r.isNullAt(6), "error cells surface as null")
    assert(r.getString(7) == "99")
    assert(r.getString(8) == "cached")
    assert(r.getString(9) == "inline")
  }

  test("xls: BLANK/MULBLANK extend rows with nulls; absent rows not emitted") {
    val stream = biffStream(
      sstRec(Seq("a", "b", "c", "v")),
      Seq("Sheet1" ->
        (labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
          // row 1: value in A only, BLANKs pad B..C
          (labelSst(1, 0, 3) ++ mulBlank(1, 1, 2)) ++
          // row 5 (rows 2-4 absent): sparse value in C only
          rkRec(5, 2, rkInt(9)))))
    val dir = tmpDir("xls-blank")
    val f = write(dir, "b.xls", cfb(stream, forceRegular = false))
    val df = XlsExtractor.xls(spark, f)
    val rows = df.orderBy(col("a").asc_nulls_last).collect()
    assert(rows.length == 2, "absent rows are not emitted")
    assert(rows(0).getString(0) == "v" && rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).getString(2) == "9")
  }

  test("xls: sheet selection by name and index; skipRows; serial dates") {
    val s1 = labelSst(0, 0, 0) ++ labelSst(1, 0, 1)
    val s2 =
      labelSst(0, 0, 2) ++ // garbage title row
        labelSst(1, 0, 3) ++ // header
        rkRec(2, 0, rkInt(42370)) // 2016-01-01 serial
    val stream = biffStream(
      sstRec(Seq("h", "from-first", "TITLE", "when")),
      Seq("first" -> s1, "second" -> s2))
    val dir = tmpDir("xls-sheets")
    val f = write(dir, "two.xls", cfb(stream, forceRegular = false))
    assert(XlsExtractor.xls(spark, f).collect()(0).getString(0) == "from-first")
    val second = XlsExtractor.xls(spark, f,
      XlsExtractor.XlsOptions(sheet = Some("second"), skipRows = 1))
    assert(second.columns.toSeq == Seq("when"))
    val day = second.select(date_format(
      XlsxExtractor.excelSerialToTimestamp(col("when")), "yyyy-MM-dd").as("d"))
      .collect()(0).getString(0)
    assert(day == "2016-01-01")
    val err = intercept[IllegalArgumentException] {
      XlsExtractor.xls(spark, f, XlsExtractor.XlsOptions(sheet = Some("nope")))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("xls: non-BIFF8 and non-OLE2 inputs fail fast with clear errors") {
    val dir = tmpDir("xls-bad")
    val notOle = write(dir, "a.xls", "name,age\nmojo,7\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      XlsExtractor.xls(spark, notOle)
    }
    assert(e1.getMessage.contains("OLE2"))
    // valid container, BIFF5 stream version
    val biff5 = rec(0x0809, u16b(0x0500) ++ u16b(0x0005) ++
      Array.fill[Byte](12)(0)) ++ rec(0x000A, Array.empty)
    val old = write(dir, "old.xls", cfb(biff5, forceRegular = false))
    val e2 = intercept[IllegalArgumentException] {
      XlsExtractor.xls(spark, old)
    }
    assert(e2.getMessage.contains("BIFF8"))
  }

  test("xls: isDate1904 probe; sheetRows limit early-stops the record walk") {
    val dir = tmpDir("xls-1904")
    val plain = cfb(dogStream, forceRegular = false)
    assert(!XlsExtractor.isDate1904(plain))
    val with1904 = cfb(biffStream(
      rec(0x0022, u16b(1)) ++ sstRec(Seq("h")),
      Seq("Sheet1" -> labelSst(0, 0, 0))), forceRegular = false)
    assert(XlsExtractor.isDate1904(with1904))
    // limit: the driver header peek parses only skipRows+1 rows
    assert(XlsExtractor.sheetRows(plain, None, 0, 1).size == 1)
    assert(XlsExtractor.sheetRows(plain, None, 0, 2).size == 2)
    assert(XlsExtractor.sheetRows(plain, None, 0, Int.MaxValue).size == 3)
  }

  test("xls: corruption fuzz — mutated/truncated files throw cleanly, never hang or error") {
    // at fleet scale one malformed feed file must fail with an
    // Exception the scan can attribute (SheetFrame wraps it with the
    // path), never an Error (OOM from a corrupt size field, stack
    // overflow) or a hang (FAT/record-walk cycle). Deterministic
    // seeded mutations over both container layouts.
    val bases = Seq(
      cfb(dogStream, forceRegular = false),
      cfb(dogStream, forceRegular = true))
    var parsed = 0
    var threw = 0
    for (seed <- 0 until 150; base <- bases) {
      val rnd = new scala.util.Random(seed)
      val mutated =
        if (seed % 3 == 0) base.take(rnd.nextInt(base.length)).toArray // truncate
        else {
          val b = base.clone()
          for (_ <- 0 until 8)
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          b
        }
      try {
        XlsExtractor.sheetRows(mutated, None, 0, Int.MaxValue)
        parsed += 1
      } catch { case _: Exception => threw += 1 } // Errors propagate → fail
    }
    assert(threw > 0, "fuzz must actually hit failure paths")
    assert(parsed + threw == 300)
  }

  test("job end-to-end: Xls extractor with rowsToSkip maps sheet-side") {
    val work = tmpDir("job-xls")
    val stream = biffStream(
      sstRec(Seq("TITLE ROW", "Name", "Age", "mojo", "don")),
      Seq("Sheet1" ->
        (labelSst(0, 0, 0) ++
          labelSst(1, 0, 1) ++ labelSst(1, 1, 2) ++
          labelSst(2, 0, 3) ++ rkRec(2, 1, rkInt(7)) ++
          labelSst(3, 0, 4) ++ number(3, 1, 63.0))))
    val src = write(work, "dogs.xls", cfb(stream, forceRegular = false))
    val lake = s"$work/lake"
    val spec = JobSpec(
      jobCode = "xls_dogs",
      source = JobSource.LocalFile(src),
      stagingDir = s"$work/staging",
      extractor = JobExtractor.Xls(),
      destination = JobDestination.Lake(lake, nBuckets = 2),
      rowsToSkip = 1, // must NOT line-strip the OLE2 container
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

  test("cfb: 31-bit sector ids are rejected, not Int-wrapped into aliased offsets") {
    // FAT sector id 0x007FFFFF: (id+1)<<9 == 2^32 Int-wraps to offset 0,
    // which a 32-bit bounds check accepts — the header bytes would be
    // silently read as the FAT. Patch header DIFAT slot 0 (offset 76).
    val reg = cfb(dogStream, forceRegular = true)
    System.arraycopy(u32b(0x007FFFFF), 0, reg, 76, 4)
    val e1 = intercept[IllegalArgumentException](
      Cfb.stream(reg, Set("Workbook")))
    assert(e1.getMessage.contains("out of bounds"), e1.getMessage)
    // Mini-stream start id 0x04000000: id*64 == 2^32 Int-wraps to
    // offset 0, aliasing the container head. Patch the Workbook
    // directory entry's start field (dir sector 1 → byte 1024, second
    // 128-byte entry, start at +116).
    val mini = cfb(dogStream, forceRegular = false)
    System.arraycopy(u32b(0x04000000), 0, mini, 1024 + 128 + 116, 4)
    val e2 = intercept[IllegalArgumentException](
      Cfb.stream(mini, Set("Workbook")))
    assert(e2.getMessage.contains("mini sector"), e2.getMessage)
  }
}
