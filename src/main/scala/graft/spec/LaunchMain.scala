package graft.spec

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.{Extractors, XlsExtractor, XlsxExtractor}

/** CLI twin of the reference's `python launchpad.py <script> [flags]
  * [job codes]` (reference: engine/launchpad.py:249-337 main,
  * 42-144 parse_args, 117-123 job-code selection) — the primary UX a
  * rocket-etl user drives the engine with. The reference's per-dataset
  * script module holding `job_dicts` becomes a JSON jobs file holding an
  * array of declarative job objects; each parses to a [[JobSpec]] and the
  * fleet runs through [[JobRunner.runAll]] with the same selection and
  * per-job failure-isolation semantics.
  *
  * Usage: runMain graft.spec.LaunchMain <jobs.json> [flags] [job codes…]
  *
  * Flags (the subset of launchpad's parse_args with an engine-side
  * meaning; connector/notification flags have no analog here):
  *  - `--test`          destination dirs get a `_test` suffix and the
  *                      input-checksum gate is disabled — a test run must
  *                      neither touch the production table nor mark the
  *                      feed's content as already-loaded (the reference
  *                      swaps to a private test package, launchpad.py:64-70)
  *  - `--wipe_data` / `--dont_wipe_data`  force `alwaysWipeData` on/off
  *                      for every selected job (launchpad.py:84-95);
  *                      `--dont_wipe_data` wins if both are given
  *  - `--clear_first`   force `alwaysClearFirst` on (launchpad.py:79-83)
  *  - `--ignore_empty_rows`  force `dropEmptyRows` on (launchpad.py:100-103)
  *  - `--mute`          only print failures (launchpad.py:57-63)
  *
  * Remaining args are job codes: exact match, or `foo-` prefix match —
  * [[JobRunner.runAll]]'s selection. No codes = every job.
  *
  * The jobs file is a JSON array (or `{"jobs": […]}`) of objects:
  * {{{
  * { "job_code": "dog_licenses",
  *   "source":      {"type": "local", "path": "/data/dogs.csv"},
  *                  // {"type":"url","url":…} | {"type":"zip","zip":…,"member":…}
  *                  // | {"type":"command","argv":["sftp","-i","/key",
  *                  //    "{uri}","{dest}"],"uri":"user@host:/path/f.csv"}
  *                  //   (fetch through an external CLI — sftp/gsutil/aws)
  *                  // | {"type":"paged","url_template":
  *                  //    "https://api/rows?offset={offset}","page_size":1000,
  *                  //    "name":"feed","max_pages":10000}
  *                  //   (paged API; {page}=0-based index,
  *                  //    {offset}=page×page_size; stops at the first
  *                  //    empty page)
  *   "staging_dir": "/work/staging",
  *   "extractor":   {"type": "csv", "delimiter": ","},
  *                  // csv | json | xlsx | xls | geojson | wholefile;
  *                  // omit to infer from the source file's extension
  *                  // (the reference's select_extractor,
  *                  // etl_util.py:523-538): a bindir destination
  *                  // always gets wholefile, a known extension maps
  *                  // to its extractor, anything else is an error
  *   "destination": {"type": "lake", "dir": "/lake/dogs", "n_buckets": 32},
  *                  // lake | csvdir | bindir |
  *                  // {"type":"link","dir":"/lake/dogs","resource_name":
  *                  //  "Dogs (API)"} — registers the source URL on an
  *                  //  existing lake table, loading nothing (ckan_link)
  *   "rows_to_skip": 0,
  *   // "from" names are POST-normalization (csv/xlsx/xls default
  *   // normalize_headers=true: lowercased, spaces/hyphens → _, so a
  *   // "License ID" header arrives here as license_id)
  *   "schema":  [{"from": "license_id", "type": "int"},
  *               {"from": "color", "default": "unknown"}],
  *   "filters": [["breed", "!=", "pug"], ["zip", "in", ["15213","15222"]]],
  *   "key_fields": ["license_id"],
  *   "method": "upsert",
  *   "time_field": "ts" }
  * }}}
  * The `clean` seam (the reference's custom_processing, a code hook by
  * nature) is library-only: jobs that need it construct their [[JobSpec]]
  * in Scala and call [[JobRunner.runAll]] directly. */
object LaunchMain {

  final case class Options(
      jobsFile: String,
      codes: Seq[String],
      test: Boolean,
      mute: Boolean,
      wipeData: Option[Boolean],
      clearFirst: Boolean,
      ignoreEmptyRows: Boolean)

  private val Flags = Set("--test", "--mute", "--wipe_data",
    "--dont_wipe_data", "--clear_first", "--ignore_empty_rows")

  def parseArgs(args: Seq[String]): Options = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    flags.find(!Flags.contains(_)).foreach(f =>
      throw new IllegalArgumentException(
        s"unknown flag $f (known: ${Flags.toSeq.sorted.mkString(", ")})"))
    val jobsFile = positional.headOption.getOrElse(
      throw new IllegalArgumentException(
        "usage: LaunchMain <jobs.json> [flags] [job codes…]"))
    Options(
      jobsFile = jobsFile,
      codes = positional.tail,
      test = flags.contains("--test"),
      mute = flags.contains("--mute"),
      wipeData =
        if (flags.contains("--dont_wipe_data")) Some(false)
        else if (flags.contains("--wipe_data")) Some(true)
        else None,
      clearFirst = flags.contains("--clear_first"),
      ignoreEmptyRows = flags.contains("--ignore_empty_rows"))
  }

  // ---------------------------------------------------------- JSON → spec

  private def get(j: JValue, name: String): Option[JValue] =
    j \ name match {
      case JNothing | JNull => None
      case v => Some(v)
    }

  private def reqStr(j: JValue, name: String, ctx: String): String =
    get(j, name) match {
      case Some(JString(s)) => s
      case Some(v) => throw new IllegalArgumentException(
        s"$ctx: field '$name' must be a string, got ${compact(v)}")
      case None => throw new IllegalArgumentException(
        s"$ctx: missing required field '$name'")
    }

  private def optStr(j: JValue, name: String, ctx: String): Option[String] =
    get(j, name).map {
      case JString(s) => s
      case v => throw new IllegalArgumentException(
        s"$ctx: field '$name' must be a string, got ${compact(v)}")
    }

  private def optBool(j: JValue, name: String, default: Boolean,
      ctx: String): Boolean =
    get(j, name).fold(default) {
      case JBool(b) => b
      case v => throw new IllegalArgumentException(
        s"$ctx: field '$name' must be a boolean, got ${compact(v)}")
    }

  private def optInt(j: JValue, name: String, default: Int,
      ctx: String): Int =
    get(j, name).fold(default) {
      case JInt(i) if i.isValidInt => i.toInt
      case v => throw new IllegalArgumentException(
        s"$ctx: field '$name' must be an int, got ${compact(v)}")
    }

  private def compact(v: JValue): String = JsonMethods.compact(v)

  /** A JSON scalar as the Scala value [[FilterDsl]]/[[Projection]]
    * literals take. */
  private def scalar(v: JValue, ctx: String): Any = v match {
    case JString(s) => s
    case JBool(b) => b
    case JInt(i) if i.isValidLong => i.toLong
    case JInt(i) => throw new IllegalArgumentException(
      s"$ctx: integer $i is out of 64-bit range")
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JNull => null
    case other => throw new IllegalArgumentException(
      s"$ctx: expected a JSON scalar, got ${compact(other)}")
  }

  private def parseSource(j: JValue, ctx: String): JobSource = {
    val c = s"$ctx.source"
    reqStr(j, "type", c) match {
      case "local" => JobSource.LocalFile(reqStr(j, "path", c))
      case "url" => JobSource.Url(reqStr(j, "url", c))
      case "zip" => JobSource.ZipMember(
        reqStr(j, "zip", c), reqStr(j, "member", c))
      // fetch through an external CLI (sftp/gsutil/aws argv — the
      // reference's City-SFTP pattern, etl_util.py:442-469)
      case "command" =>
        val argv = parseStrings(j, "argv", c)
        require(argv.nonEmpty, s"$c: 'argv' must be a non-empty array")
        JobSource.Custom(new graft.sources.CommandStaging(argv),
          reqStr(j, "uri", c))
      // paged API: url_template with {page}/{offset} placeholders; pages
      // stage as one directory the extractor reads in parallel
      case "paged" =>
        val template = reqStr(j, "url_template", c)
        // an {offset} template without the real page size would advance
        // offsets 0,1,2,… — overlapping windows fetching duplicate rows
        // until the maxPages failure; there is no correct default
        if (template.contains("{offset}") && get(j, "page_size").isEmpty)
          throw new IllegalArgumentException(
            s"$c: an {offset} url_template requires 'page_size' (the " +
              "number of rows each page advances by)")
        JobSource.Custom(
          new graft.sources.PagedHttpStaging(
            template,
            optInt(j, "max_pages", 10000, c),
            optInt(j, "page_size", 1, c)),
          reqStr(j, "name", c))
      case t => throw new IllegalArgumentException(
        s"$c: unknown type '$t' (local|url|zip|command|paged)")
    }
  }

  private def parseExtractor(j: JValue, ctx: String): JobExtractor = {
    val c = s"$ctx.extractor"
    reqStr(j, "type", c) match {
      case "csv" => JobExtractor.Csv(Extractors.CsvOptions(
        delimiter = optStr(j, "delimiter", c).getOrElse(","),
        header = optBool(j, "header", default = true, c),
        normalizeHeaders = optBool(j, "normalize_headers", default = true, c),
        emptyAsNull = optBool(j, "empty_as_null", default = true, c),
        dropEmbeddedHeaders =
          optBool(j, "drop_embedded_headers", default = true, c),
        dropMalformed = optBool(j, "drop_malformed", default = false, c),
        schema = optStr(j, "schema_ddl", c).map { ddl =>
          try StructType.fromDDL(ddl)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"$c: bad schema_ddl '$ddl': ${e.getMessage}")
          }
        },
        encoding = optStr(j, "encoding", c).getOrElse("UTF-8")))
      case "json" => JobExtractor.Json(
        multiLine = optBool(j, "multiline", default = true, c))
      case "xlsx" => JobExtractor.Xlsx(XlsxExtractor.XlsxOptions(
        sheet = optStr(j, "sheet", c),
        sheetIndex = optInt(j, "sheet_index", 0, c),
        skipRows = optInt(j, "skip_rows", 0, c),
        header = optBool(j, "header", default = true, c),
        normalizeHeaders = optBool(j, "normalize_headers", default = true, c),
        emptyAsNull = optBool(j, "empty_as_null", default = true, c)))
      case "xls" => JobExtractor.Xls(XlsExtractor.XlsOptions(
        sheet = optStr(j, "sheet", c),
        sheetIndex = optInt(j, "sheet_index", 0, c),
        skipRows = optInt(j, "skip_rows", 0, c),
        header = optBool(j, "header", default = true, c),
        normalizeHeaders = optBool(j, "normalize_headers", default = true, c),
        emptyAsNull = optBool(j, "empty_as_null", default = true, c)))
      case "geojson" => JobExtractor.GeoJson
      case "wholefile" => JobExtractor.WholeFile
      case t => throw new IllegalArgumentException(
        s"$c: unknown type '$t' (csv|json|xlsx|xls|geojson|wholefile)")
    }
  }

  private def parseDestination(j: JValue, ctx: String): JobDestination = {
    val c = s"$ctx.destination"
    reqStr(j, "type", c) match {
      case "lake" => JobDestination.Lake(
        reqStr(j, "dir", c), optInt(j, "n_buckets", 32, c))
      case "csvdir" => JobDestination.CsvDir(reqStr(j, "dir", c))
      case "bindir" => JobDestination.BinaryDir(reqStr(j, "dir", c))
      // register the source URL on an existing lake table (ckan_link)
      case "link" => JobDestination.Link(
        reqStr(j, "dir", c), reqStr(j, "resource_name", c))
      case t => throw new IllegalArgumentException(
        s"$c: unknown type '$t' (lake|csvdir|bindir|link)")
    }
  }

  private def parseFields(j: JValue, ctx: String): Seq[Projection.Field] =
    get(j, "schema").fold(Seq.empty[Projection.Field]) {
      case JArray(fs) => fs.map { f =>
        val c = s"$ctx.schema"
        val from = optStr(f, "from", c).getOrElse("")
        val to = optStr(f, "to", c).getOrElse(from)
        require(to.nonEmpty, s"$c: a field needs 'to' (or a non-empty 'from')")
        Projection.Field(from, to,
          cast = optStr(f, "type", c).map { t =>
            try DataType.fromDDL(t)
            catch {
              case e: Exception => throw new IllegalArgumentException(
                s"$c: bad type '$t' for '$to': ${e.getMessage}")
            }
          },
          default = get(f, "default").map(scalar(_, s"$c.$to.default")))
      }
      case v => throw new IllegalArgumentException(
        s"$ctx: 'schema' must be an array, got ${compact(v)}")
    }

  private def parseFilters(j: JValue, ctx: String): Seq[FilterDsl.Pred] =
    get(j, "filters").fold(Seq.empty[FilterDsl.Pred]) {
      case JArray(ps) => ps.map {
        case JArray(List(JString(f), JString(op), v)) =>
          FilterDsl.Pred(f, op, v match {
            case JArray(vs) =>
              FilterDsl.Many(vs.map(scalar(_, s"$ctx.filters.$f")))
            case s => FilterDsl.Scalar(scalar(s, s"$ctx.filters.$f"))
          })
        case p => throw new IllegalArgumentException(
          s"$ctx: each filter is a [field, op, value] triple, " +
            s"got ${compact(p)}")
      }
      case v => throw new IllegalArgumentException(
        s"$ctx: 'filters' must be an array, got ${compact(v)}")
    }

  private def parseStrings(j: JValue, name: String, ctx: String): Seq[String] =
    get(j, name).fold(Seq.empty[String]) {
      case JArray(vs) => vs.map {
        case JString(s) => s
        case v => throw new IllegalArgumentException(
          s"$ctx: '$name' entries must be strings, got ${compact(v)}")
      }
      case v => throw new IllegalArgumentException(
        s"$ctx: '$name' must be an array, got ${compact(v)}")
    }

  /** Extension-driven extractor inference — the reference's
    * `select_extractor` (etl_util.py:523-538): a filestore (binary)
    * destination always takes the whole file; otherwise the extension
    * picks the tabular extractor. The reference's silent
    * anything-else→FileExtractor fallback is an error here: raw bytes
    * cannot load into a tabular destination, so the fallback could only
    * fail later and worse. */
  private def inferExtractor(source: JobSource, dest: JobDestination,
      ctx: String): JobExtractor = {
    if (dest.isInstanceOf[JobDestination.BinaryDir])
      return JobExtractor.WholeFile
    // a Link job never extracts (run() short-circuits before staging);
    // any placeholder satisfies the spec — an API URL has no extension
    // to infer from
    if (dest.isInstanceOf[JobDestination.Link])
      return JobExtractor.WholeFile
    val name = source match {
      case JobSource.LocalFile(uri) => uri
      case JobSource.Url(url) => url.takeWhile(c => c != '?' && c != '#')
      case JobSource.ZipMember(_, member) => member
      case JobSource.Custom(_, uri) => uri
    }
    name.split('.').last.toLowerCase match {
      case "csv" => JobExtractor.Csv()
      case "json" => JobExtractor.Json()
      case "geojson" => JobExtractor.GeoJson
      case "xlsx" => JobExtractor.Xlsx()
      case "xls" => JobExtractor.Xls()
      case ext => throw new IllegalArgumentException(
        s"$ctx: cannot infer an extractor from extension '$ext' of " +
          s"'$name' — set \"extractor\" explicitly")
    }
  }

  def parseJob(j: JValue): JobSpec = {
    val code = reqStr(j, "job_code", "job")
    val ctx = s"job '$code'"
    val source = parseSource(j \ "source", ctx)
    val destination = parseDestination(j \ "destination", ctx)
    JobSpec(
      jobCode = code,
      source = source,
      stagingDir = reqStr(j, "staging_dir", ctx),
      extractor = get(j, "extractor")
        .map(parseExtractor(_, ctx))
        .getOrElse(inferExtractor(source, destination, ctx)),
      destination = destination,
      rowsToSkip = optInt(j, "rows_to_skip", 0, ctx),
      schema = parseFields(j, ctx),
      filters = parseFilters(j, ctx),
      dropEmptyRows = optBool(j, "drop_empty_rows", default = false, ctx),
      keyFields = parseStrings(j, "key_fields", ctx),
      method = optStr(j, "method", ctx).getOrElse("upsert"),
      alwaysWipeData = optBool(j, "always_wipe_data", default = false, ctx),
      alwaysClearFirst =
        optBool(j, "always_clear_first", default = false, ctx),
      timeField = optStr(j, "time_field", ctx),
      checksumGate = optBool(j, "checksum_gate", default = true, ctx),
      ignoreIfSourceMissing =
        optBool(j, "ignore_if_source_missing", default = false, ctx))
  }

  /** Parse a jobs file's content: a JSON array of job objects, or an
    * object with a `jobs` array. Duplicate job codes are rejected — the
    * code is the selection key and the checksum-state key. */
  def parseJobs(json: String): Seq[JobSpec] = {
    val root = JsonMethods.parse(json)
    val arr = root match {
      case JArray(js) => js
      case obj: JObject => obj \ "jobs" match {
        case JArray(js) => js
        case _ => throw new IllegalArgumentException(
          "jobs file must be a JSON array of jobs or {\"jobs\": […]}")
      }
      case _ => throw new IllegalArgumentException(
        "jobs file must be a JSON array of jobs or {\"jobs\": […]}")
    }
    val specs = arr.map(parseJob)
    val dup = specs.groupBy(_.jobCode).collect { case (c, g) if g.size > 1 => c }
    require(dup.isEmpty, s"duplicate job_code(s): ${dup.mkString(", ")}")
    specs
  }

  /** Session-flag overrides applied to every selected job
    * (launchpad.py:84-103: the flags override each job_dict's own
    * settings for the run). */
  def applyFlags(spec: JobSpec, opts: Options): JobSpec = {
    // suffix the LAST PATH COMPONENT, not the raw string: "/lake/dogs/"
    // + "_test" would nest the test table INSIDE the production dir —
    // exactly what --test promises not to touch
    def testDir(d: String): String = new Path(d).suffix("_test").toString
    val dest =
      if (!opts.test) spec.destination
      else spec.destination match {
        case JobDestination.Lake(d, n) => JobDestination.Lake(testDir(d), n)
        case JobDestination.CsvDir(d) => JobDestination.CsvDir(testDir(d))
        case JobDestination.BinaryDir(d) => JobDestination.BinaryDir(testDir(d))
        // a --test link must attach to the TEST table, not production
        case JobDestination.Link(d, name) =>
          JobDestination.Link(testDir(d), name)
      }
    spec.copy(
      destination = dest,
      // a --test run must not record the content as loaded, or the next
      // production run of the same bytes would be checksum-skipped
      checksumGate = spec.checksumGate && !opts.test,
      alwaysWipeData = opts.wipeData.getOrElse(spec.alwaysWipeData),
      alwaysClearFirst = spec.alwaysClearFirst || opts.clearFirst,
      dropEmptyRows = spec.dropEmptyRows || opts.ignoreEmptyRows)
  }

  /** Parse args + jobs file, run the selected fleet, print one line per
    * job, return the number of failed jobs (the process exit code). */
  def run(spark: SparkSession, args: Seq[String]): Int = {
    val opts = parseArgs(args)
    val p = new Path(opts.jobsFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val specs = parseJobs(json).map(applyFlags(_, opts))
    val known = specs.map(_.jobCode).toSet
    opts.codes.filterNot(c => known.exists(k =>
      if (c.endsWith("-")) k.startsWith(c.dropRight(1)) else k == c))
      .foreach(c => System.err.println(s"[launch] WARNING: job code '$c' " +
        "selects nothing"))
    val results = JobRunner.runAll(spark, specs, opts.codes)
    var failures = 0
    results.foreach {
      case (code, Right(r)) =>
        val line = r.skipReason match {
          case Some(why) => s"[launch] $code: SKIP $why"
          case None => s"[launch] $code: applied rows=${r.rows}"
        }
        if (!opts.mute) println(line)
      case (code, Left(e)) =>
        failures += 1
        // failures always print, muted or not (the reference's mute stops
        // celebratory notifications, not error reporting, notify.py:3-36)
        System.err.println(s"[launch] $code: ERROR ${e.getClass.getName}: " +
          s"${e.getMessage}")
    }
    if (!opts.mute)
      println(s"[launch] ${results.size} job(s) run, $failures failed")
    failures
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.session("graft-launch")
    // stop the session BEFORE exiting — sys.exit inside a try would skip
    // the enclosing finally; then exit with the documented failure COUNT
    // (capped at the 8-bit exit-status range)
    val failures =
      try run(spark, args.toSeq)
      finally spark.stop()
    if (failures > 0) sys.exit(math.min(failures, 255))
  }
}
