package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spec.Projection

/** Tabular file extractors — the Spark-first re-expression of the
  * reference's extractor stack (reference:
  * engine/wprdc_etl/pipeline/extractors.py):
  *
  *  - `CSVExtractor` (extractors.py:222-232): configurable delimiter,
  *    header row → `spark.read.csv` options (distributed, pushdown-able).
  *  - header → schema-header normalization (extractors.py:141-155):
  *    lowercase, strip, spaces/hyphens → underscores.
  *  - `''` → null on every value (`handle_line`, extractors.py:157-162).
  *  - embedded repeated-header dedupe (`IsHeaderException`,
  *    exceptions.py:4-11; rows skipped at pipeline.py:385-386): some
  *    sources concatenate files and re-emit the header mid-stream; those
  *    rows are dropped by predicate, not by raising per-row.
  *  - truncated-tail tolerance (`retry_without_last_line`,
  *    pipeline.py:396-402) → CSV `mode=DROPMALFORMED` (row-level, exact —
  *    the reference can only drop the last buffered line).
  *  - `JSONExtractor` (extractors.py:164-220): a flat array of objects,
  *    "doesn't have any nested data structures" — `spark.read.json` with
  *    `multiLine` (headers = key union, richer than the reference's
  *    first-object-only headers).
  *
  * All of this runs inside the scan (codegen'd, column-pruned); nothing is
  * record-at-a-time.
  */
object Extractors {

  final case class CsvOptions(
      delimiter: String = ",",
      header: Boolean = true,
      normalizeHeaders: Boolean = true,
      emptyAsNull: Boolean = true,
      dropEmbeddedHeaders: Boolean = true,
      /** Row-exact truncated-tail tolerance (the reference can only drop
        * the last buffered line, pipeline.py:396-402). Spark's
        * DROPMALFORMED judges rows against a DECLARED schema — pair this
        * with [[CsvOptions.schema]] or short rows are merely null-padded. */
      dropMalformed: Boolean = false,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      encoding: String = "UTF-8")

  def csv(spark: SparkSession, path: String,
      opts: CsvOptions = CsvOptions()): DataFrame = {
    val base = spark.read
      .option("sep", opts.delimiter)
      .option("header", opts.header.toString)
      .option("encoding", opts.encoding)
      .option("mode", if (opts.dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
      .option("inferSchema", "false") // declared-schema world; caller casts
    // '' -> null at the parser (extractors.py:158: `'' -> None`)
    val withNull = if (opts.emptyAsNull) base.option("nullValue", "") else base
    val reader = opts.schema.fold(withNull)(withNull.schema)
    val raw = reader.csv(path)
    // a repeated embedded header row has every value equal to its own
    // (pre-normalization) column name; null-safe AND-fold, applied ONLY
    // when EVERY column is a string. Under a mixed schema the fold would
    // run over the string columns alone, and a legitimate data row whose
    // string cells happen to equal their column names (e.g. a 'type'
    // category literally valued "type") would be silently dropped; under
    // a typed schema an embedded header's non-string cells fail parsing
    // instead (DROPMALFORMED drops the row; PERMISSIVE nulls the cell,
    // and a header row with every string cell self-naming plus nulls
    // elsewhere is not a recoverable data row either way).
    val allString = raw.schema.fields.nonEmpty && raw.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.StringType)
    if (opts.dropEmbeddedHeaders && opts.header && !allString)
      // disclosed, not silent: the caller asked for header dropping but
      // a typed schema disables the value-equality filter; under
      // DROPMALFORMED the typed cells reject header rows anyway — under
      // PERMISSIVE they survive as junk rows (nulls + self-named strings)
      System.err.println(s"[csv] dropEmbeddedHeaders skipped for $path: " +
        "schema has non-string columns (use dropMalformed=true to shed " +
        "embedded header rows under a typed schema)")
    val noEmbedded =
      if (opts.dropEmbeddedHeaders && opts.header && allString)
        raw.filter(!raw.schema.fieldNames.toSeq
          .map(n => col(s"`$n`") <=> lit(n)).reduce(_ && _))
      else raw
    if (opts.normalizeHeaders) Projection.normalizeHeaders(noEmbedded)
    else noEmbedded
  }

  /** Flat JSON array/lines of objects (extractors.py:164-220). `multiLine`
    * handles the single-big-array layout the reference reads with
    * `json.load`; line-delimited JSON works with it off. */
  def json(spark: SparkSession, path: String, multiLine: Boolean = true,
      normalizeHeaders: Boolean = true): DataFrame = {
    val raw = spark.read.option("multiLine", multiLine.toString).json(path)
    if (normalizeHeaders) Projection.normalizeHeaders(raw) else raw
  }

  /** GeoJSON FeatureCollection → tabular frame — the distributed
    * re-expression of the reference's streaming GeoJSON→CSV converter
    * (reference: engine/geojson2csv.py:24-101): feature `properties`
    * become columns (key union — inference unions keys across features,
    * richer than the reference's two-pass set scan), `Point` geometries
    * add `LNG`/`LAT` columns, and `wkt` carries the well-known-text
    * rendering (pure string formatting from the coordinate arrays —
    * codegen'd concat/transform, no geometry library). Files mixing
    * geometry types of different coordinate depth fall back to
    * `geometry_json` passthrough (lossless; WKT needs a uniform inferred
    * coordinate schema). */
  def geoJson(spark: SparkSession, path: String,
      normalizeHeaders: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val fc = spark.read.option("multiLine", "true").json(path)
    val feats = fc.select(explode(col("features")).as("f"))
    val geomType = col("f.geometry.type")
    // coordinate nesting depth decides the WKT shape (Point=1 …
    // MultiPolygon=4); mixed-depth files infer to string and depth=0
    def depthOf(dt: org.apache.spark.sql.types.DataType, d: Int = 0): Int =
      dt match {
        case ArrayType(e, _) => depthOf(e, d + 1)
        case DoubleType | LongType => d
        case _ => 0
      }
    val coordsField = feats.select(col("f.geometry.coordinates")).schema.head
    val depth = depthOf(coordsField.dataType)
    def num(c: Column): Column = c.cast(DoubleType).cast("string")
    def pt(c: Column): Column = // [x, y] -> "x y"
      concat_ws(" ", num(element_at(c, 1)), num(element_at(c, 2)))
    def ring(c: Column): Column = // [[x,y],…] -> "x y, x y"
      concat_ws(", ", transform(c, pt _))
    def poly(c: Column): Column = // [[[x,y],…],…] -> "(ring), (ring)"
      concat_ws(", ", transform(c, r => concat(lit("("), ring(r), lit(")"))))
    val coords = col("f.geometry.coordinates")
    val wkt = depth match {
      case 1 => concat(lit("POINT ("), pt(coords), lit(")"))
      case 2 => when(geomType === "LineString",
          concat(lit("LINESTRING ("), ring(coords), lit(")")))
        .when(geomType === "MultiPoint",
          concat(lit("MULTIPOINT ("), ring(coords), lit(")")))
      case 3 => when(geomType === "Polygon",
          concat(lit("POLYGON ("), poly(coords), lit(")")))
        .when(geomType === "MultiLineString",
          concat(lit("MULTILINESTRING ("), poly(coords), lit(")")))
      case 4 => concat(lit("MULTIPOLYGON ("),
        concat_ws(", ",
          transform(coords, p => concat(lit("("), poly(p), lit(")")))),
        lit(")"))
      case _ => to_json(col("f.geometry")).as("geometry_json")
    }
    val lngLat =
      if (depth == 1)
        Seq(num(element_at(coords, 1)).cast(DoubleType).as("LNG"),
          num(element_at(coords, 2)).cast(DoubleType).as("LAT"))
      else Nil
    val out = feats.select(col("f.properties.*") +: lngLat :+
      wkt.as(if (depth == 0) "geometry_json" else "wkt"): _*)
    if (normalizeHeaders) Projection.normalizeHeaders(out) else out
  }

  /** Whole files as single binary records — the reference's
    * `FileExtractor` ("pass whole file through as the single record",
    * reference: engine/wprdc_etl/pipeline/extractors.py:36-57), mapped to
    * Spark's `binaryFile` source: (path, modificationTime, length,
    * content) with distributed reads and pushed path-glob filters. Pairs
    * with [[BinarySink.writeRows]] for the raw-artifact round trip. */
  def wholeFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Copy `path` into `stagingDir` minus its first `n` lines — the
    * capability shape of the reference's `rows_to_skip` option
    * (reference: engine/etl_util.py:486 "Necessary when extracting from
    * poorly formatted Excel files"; applied sheet-side at
    * engine/wprdc_etl/pipeline/extractors.py:247-258) for LINE-based
    * formats; xlsx jobs skip rows sheet-side instead
    * ([[XlsxExtractor.XlsxOptions.skipRows]] — stripping lines from a ZIP
    * container would corrupt it). A driver-side staging step like every
    * fetch, with the DISTRIBUTED scan starting at the stripped result.
    * Streams line-by-line; never materializes the file. */
  def stripLeadingRows(spark: SparkSession, path: String, stagingDir: String,
      n: Int, encoding: String = "UTF-8"): String = {
    require(n >= 0, s"rows to skip must be >= 0, got $n")
    val conf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(path)
    val dest = new org.apache.hadoop.fs.Path(stagingDir,
      s"skip$n-${src.getName}")
    val sfs = src.getFileSystem(conf)
    val dfs = dest.getFileSystem(conf)
    dfs.mkdirs(dest.getParent)
    // decode AND re-encode in the feed's own charset — a UTF-8 round trip
    // of e.g. Latin-1 bytes would mangle every non-ASCII value before the
    // CSV reader (configured with the same encoding) ever sees the file
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(sfs.open(src), encoding))
    try {
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(dfs.create(dest, true), encoding))
      var ok = false
      try {
        var i = 0
        var line = reader.readLine()
        while (line != null) {
          if (i >= n) { out.write(line); out.newLine() }
          i += 1
          line = reader.readLine()
        }
        ok = true
      } finally {
        out.close()
        // never leave a silently-truncated staged file behind
        if (!ok) dfs.delete(dest, false)
      }
    } finally reader.close()
    dest.toString
  }

  /** List member names of a ZIP archive (any Hadoop-visible FS). */
  def zipMembers(spark: SparkSession, zipPath: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(zipPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val zin = new java.util.zip.ZipInputStream(fs.open(p))
    try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory).map(_.getName).toList
    finally zin.close()
  }

  /** Extract one named member of a ZIP archive into `stagingDir` and
    * return the staged path, ready for any tabular extractor — the
    * JDK-only analog of the reference's `CompressedFileExtractor`
    * (reference: engine/wprdc_etl/pipeline/extractors.py:59-96, used by
    * real jobs e.g. engine/payload/house_cat/_flatbread.py:1095). A
    * driver-side staging fetch by design: the archive is a single
    * sequential stream (ZIP has no split points without the central
    * directory); the DISTRIBUTED part of the pipeline starts at the
    * staged file, which Spark then reads with full parallelism. Streams
    * archive → staging in 64 KiB chunks — never materializes the member
    * in memory. */
  def zipMember(spark: SparkSession, zipPath: String, member: String,
      stagingDir: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(zipPath)
    val fs = src.getFileSystem(conf)
    val zin = new java.util.zip.ZipInputStream(fs.open(src))
    try {
      val hit = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .find(e => !e.isDirectory && e.getName == member)
      require(hit.isDefined, s"member '$member' not found in $zipPath")
      val dest = new org.apache.hadoop.fs.Path(stagingDir,
        member.replace('/', '_'))
      val dfs = dest.getFileSystem(conf)
      dfs.mkdirs(dest.getParent)
      // shared copy loop: deletes the partial member on any failure
      BinarySink.streamToFile(zin, dfs, dest, overwrite = true)
      dest.toString
    } finally zin.close()
  }
}
