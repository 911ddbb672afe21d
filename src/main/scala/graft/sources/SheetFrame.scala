package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spec.Projection

/** Shared plumbing for workbook-shaped extractors ([[XlsxExtractor]],
  * [[XlsExtractor]]): a workbook is a single compressed/binary stream
  * with no split points, so the unit of parallelism is the FILE —
  * `binaryFile` scan → per-file parse on the executors, a directory of
  * workbooks parsing across the cluster (the gzip-CSV shape; workbooks
  * cap at ~10^6 rows, so per-file cost is bounded). Header names come
  * from a driver-side peek of the first matched file — bounded by the
  * parser's row limit to `skipRows + 1` rows, so the peek is O(header)
  * like Spark's CSV header resolution, not a full parse. Every file
  * then drops its own `skipRows` + header rows, rows wider than the
  * header are truncated to it, narrower ones null-padded
  * (`try_element_at` past the end is null — ANSI-safe). A parse
  * failure on an executor is rethrown with the failing file's path —
  * in a many-thousand-file scan the operator must know which file to
  * quarantine. */
private[sources] object SheetFrame {

  /** `(bytes, sheetName, sheetIndex, maxRows)` → the first `maxRows`
    * present rows of the selected sheet as column-positioned cell
    * strings. Must be a pure executor-safe function of the bytes (no
    * session capture); `maxRows = Int.MaxValue` parses fully. */
  type Parser = (Array[Byte], Option[String], Int, Int) => Vector[Vector[String]]

  final case class Options(
      sheet: Option[String],
      sheetIndex: Int,
      skipRows: Int,
      header: Boolean,
      normalizeHeaders: Boolean,
      emptyAsNull: Boolean)

  def frame(spark: SparkSession, pathGlob: String, opts: Options,
      parse: Parser): DataFrame = {
    require(opts.skipRows >= 0, s"skipRows must be >= 0, got ${opts.skipRows}")
    val names = headerNames(spark, pathGlob, opts, parse)
    // captured by the executor closure: plain values only, no session
    val (sheet, sheetIndex, dropN) =
      (opts.sheet, opts.sheetIndex, opts.skipRows + (if (opts.header) 1 else 0))
    import spark.implicits._
    val rows = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        // parse is strict (full Vector), so its failures are caught
        // here and carry the file that caused them
        val parsed =
          try parse(bytes, sheet, sheetIndex, Int.MaxValue)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"$path: ${e.getMessage}", e)
          }
        parsed.iterator.drop(dropN).map(r => r.toSeq): Iterator[Seq[String]]
      }
    // try_element_at, not element_at: under ANSI (Spark 4 default) a
    // plain element_at THROWS past the array end; short rows must pad
    val named = rows.select(names.zipWithIndex.map { case (n, i) =>
      val v = try_element_at(col("value"), lit(i + 1))
      (if (opts.emptyAsNull) nullif(v, lit("")) else v).as(n)
    }: _*)
    if (opts.normalizeHeaders) Projection.normalizeHeaders(named) else named
  }

  /** Driver-side peek at the first matched file for the column names —
    * header values when `opts.header` (null/blank header cells fall
    * back to positional `cN` — a whitespace-only name would normalize
    * to the unreferenceable empty column name), else positional names
    * over the first data row's width. */
  private def headerNames(spark: SparkSession, pathGlob: String,
      opts: Options, parse: Parser): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(pathGlob)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // match the binaryFile scan's listing filter: Spark's file index
    // skips `.`/`_`-prefixed names (checksums, _SUCCESS, dotfiles), so
    // the driver peek must never land on a side file the executors
    // will not read
    def visible(q: Path): Boolean = {
      val n = q.getName
      !n.startsWith(".") && !n.startsWith("_")
    }
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .filter(st => visible(st.getPath))
      .flatMap(st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).filter(s => s.isFile && visible(s.getPath))
        else Array(st))
      .map(_.getPath).sortBy(_.toString)
    require(matched.nonEmpty, s"no workbook files match $pathGlob")
    val in = fs.open(matched.head)
    val bytes = try in.readAllBytes() finally in.close()
    val first = parse(bytes, opts.sheet, opts.sheetIndex, opts.skipRows + 1)
      .drop(opts.skipRows).headOption.getOrElse(
        throw new IllegalArgumentException(
          s"${matched.head}: no rows left after skipRows=${opts.skipRows}"))
    val names = first.zipWithIndex.map { case (v, i) =>
      if (opts.header && v != null && v.trim.nonEmpty) v else s"c$i"
    }.toSeq
    // fail fast on duplicate headers like the CSV reader does — a
    // duplicate (or normalize-colliding) pair would otherwise surface
    // far downstream as AMBIGUOUS_REFERENCE or land twice in the lake
    val effective =
      if (opts.normalizeHeaders) names.map(Projection.normalizeHeader)
      else names
    val dups = effective.groupBy(identity).collect {
      case (n, g) if g.size > 1 => n
    }
    require(dups.isEmpty,
      s"${matched.head}: duplicate header column(s)" +
        (if (opts.normalizeHeaders) " after normalization" else "") +
        s": ${dups.mkString(", ")}")
    names
  }
}
