package graft.spec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.HttpStaging

/** Dataset-catalog resolution — the Spark twin of the reference's ArcGIS
  * `data.json` utilities (reference: engine/arcgis_util.py:11-68): a DCAT
  * catalog maps a dataset TITLE to per-format download URLs, and a
  * standard fan-out turns one catalog entry into the format-family of job
  * specs (arcgis_util.py:70-195 `standard_arcgis_job_dicts`). Pure
  * config-layer resolution: the catalog file itself arrives through any
  * [[graft.sources.Staging]] (HTTP in a deployment, `file:`/localhost
  * in tests), and the output is plain [[JobSpec]] values for
  * [[JobRunner.runAll]].
  */
object Catalog {

  /** One resolved catalog dataset: its title and the (format title →
    * accessURL) distribution list, in catalog order. */
  final case class Entry(title: String, distributions: Seq[(String, String)])

  /** Resolve the single dataset titled `title` from a DCAT `data.json`
    * (reference: arcgis_util.py:11-23 `get_arcgis_dataset` — exactly one
    * match or an error naming the count). The catalog is parsed by the
    * JSON reader (schema inference unions keys across datasets), then the
    * matching entry collapses to a driver-side value — a catalog is
    * config-sized by construction. A distribution's URL is its
    * `accessURL` (the ArcGIS flavor the reference reads) falling back to
    * `downloadURL` (the plain-DCAT spelling many catalogs use instead). */
  def dataset(spark: SparkSession, dataJsonPath: String,
      title: String): Entry = {
    val hits = spark.read.option("multiLine", "true").json(dataJsonPath)
      .select(explode(col("dataset")).as("d"))
      .filter(col("d.title") === title)
      .select(col("d.title").as("title"),
        to_json(col("d.distribution")).as("dist"))
      .collect()
    require(hits.length == 1,
      s"${hits.length} datasets found with the title '$title'")
    val row = hits.head
    import org.json4s._
    def str(v: JValue, name: String): Option[String] = v \ name match {
      case JString(s) => Some(s)
      case _ => None
    }
    val dists = Option(row.getAs[String]("dist")).toSeq.flatMap { s =>
      org.json4s.jackson.JsonMethods.parse(s) match {
        case JArray(ds) => ds.map(d => (
          // plain-DCAT catalogs label the distribution via `format`
          // rather than ArcGIS's `title` — same fallback rule as the URL
          str(d, "title").orElse(str(d, "format")).orNull,
          str(d, "accessURL").orElse(str(d, "downloadURL")).orNull))
        case _ => Nil
      }
    }
    Entry(row.getAs[String]("title"), dists)
  }

  /** The download URL and filename for one format of a resolved dataset
    * (reference: arcgis_util.py:25-68 `get_arcgis_data_url`): format
    * titles match case-insensitively; the query string is stripped (the
    * reference strips it so the extension ends the filename and the
    * ArcGIS `outSR` reprojection parameter is dropped) unless `link=true`
    * (a web/API link wanted verbatim, the `ckan_link` shape). */
  def dataUrl(entry: Entry, format: String,
      link: Boolean = false): (String, String) = {
    val url = entry.distributions
      .collectFirst { case (f, u) if f != null && f.equalsIgnoreCase(format)
        => u }
      .getOrElse(throw new IllegalArgumentException(
        s"no distribution of type $format in dataset '${entry.title}' " +
          s"(have: ${entry.distributions.map(_._1).mkString(", ")})"))
    require(url != null, s"distribution $format of dataset " +
      s"'${entry.title}' carries no accessURL/downloadURL")
    if (link) return (url, "")
    val parts = url.split('?')
    require(parts.length <= 2, s"too many question marks in the url: $url")
    val stripped = parts(0)
    (stripped, stripped.split('/').last)
  }

  /** The standard per-dataset job fan-out (reference:
    * arcgis_util.py:70-195): a tabular CSV job plus raw-artifact jobs for
    * each geo format the catalog carries. Mirrors the reference's
    * dispositions —
    *
    *  - CSV → tabular load, `insert` with a pre-wipe (the reference sets
    *    `always_wipe_data`: ArcGIS snapshots replace, never upsert); lands
    *    in a lake table when `schema`+`keyFields` are given, else falls to
    *    a raw-artifact copy (the reference's "ckan if schema else
    *    ckan_filestore").
    *  - GeoJSON / KML / Shapefile → whole-file artifacts (filestore
    *    analog: [[JobDestination.BinaryDir]]).
    *
    * Like the reference, every standard FILE format must be present in
    * the catalog entry (a missing distribution raises). The fifth
    * standard job — the `ckan_link` pointer at the ArcGIS GeoService API
    * (arcgis_util.py:184-195) — is emitted for tabular fan-outs as a
    * [[JobDestination.Link]] on the CSV job's lake table (it runs after
    * the CSV job creates the table), and only when the catalog CARRIES a
    * GeoService distribution: a plain-DCAT catalog has no ArcGIS API,
    * and its absence must not fail the four file jobs. An artifact-only
    * fan-out has no table to hang the link on, so it is omitted there
    * too — resolve with `dataUrl(entry, "ArcGIS GeoService", link =
    * true)` and register by hand if needed. */
  def standardJobSpecs(
      entry: Entry,
      baseJobCode: String,
      stagingDir: String,
      destRoot: String,
      schema: Seq[Projection.Field] = Nil,
      keyFields: Seq[String] = Nil,
      csvOptions: graft.sources.Extractors.CsvOptions =
        graft.sources.Extractors.CsvOptions()): Seq[JobSpec] = {
    val (csvUrl, _) = dataUrl(entry, "CSV")
    val tabular = schema.nonEmpty && keyFields.nonEmpty
    val csvJob = JobSpec(
      jobCode = s"${baseJobCode}_csv",
      source = JobSource.Url(csvUrl),
      stagingDir = stagingDir,
      extractor =
        if (tabular) JobExtractor.Csv(csvOptions) else JobExtractor.WholeFile,
      destination =
        if (tabular) JobDestination.Lake(s"$destRoot/$baseJobCode")
        else JobDestination.BinaryDir(s"$destRoot/${baseJobCode}_files"),
      schema = schema,
      keyFields = keyFields,
      method = "insert",
      alwaysWipeData = tabular)
    val artifactJobs = Seq("GeoJSON", "KML", "Shapefile").map { fmt =>
      val (url, _) = dataUrl(entry, fmt)
      JobSpec(
        jobCode = s"${baseJobCode}_${fmt.toLowerCase}",
        source = JobSource.Url(url),
        stagingDir = stagingDir,
        extractor = JobExtractor.WholeFile,
        destination = JobDestination.BinaryDir(s"$destRoot/${baseJobCode}_files"))
    }
    // the API link job only exists where an API does: a plain-DCAT
    // catalog (no ArcGIS hub) has no GeoService distribution, and its
    // absence must not take down the four file jobs with it
    val apiUrl = entry.distributions.collectFirst {
      case (f, u) if f != null && u != null &&
        f.equalsIgnoreCase("ArcGIS GeoService") => u
    }
    val linkJobs =
      if (!tabular) Nil
      else apiUrl.toSeq.map(url => JobSpec(
        jobCode = s"${baseJobCode}_api",
        source = JobSource.Url(url),
        stagingDir = stagingDir,
        extractor = JobExtractor.WholeFile, // unused: Link skips the pipeline
        destination = JobDestination.Link(s"$destRoot/$baseJobCode",
          s"${entry.title} (API)")))
    (csvJob +: artifactJobs) ++ linkJobs
  }
}

/** Source-URL discovery by scraping a listing page — the reference's
  * `scrape_nth_link` (reference: engine/scraping_util.py:16-45): find
  * every `<a href>` whose URL ends in `.extension`, assert the expected
  * match count (a changed page should fail loudly, not silently fetch
  * the wrong file), return the nth, optionally regex-validated, resolved
  * absolute against the page URL. The page is fetched through
  * [[HttpStaging]] (same seam as every remote source; `file:` URLs drive
  * the identical path in tests). */
object Scrape {

  private val Href = java.util.regex.Pattern.compile(
    """(?is)<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""")

  private val Entity = java.util.regex.Pattern.compile(
    """&(?:(amp|lt|gt|quot|apos)|#(\d+)|#x([0-9a-fA-F]+));""")
  private val Named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'")

  /** Decode HTML character references in a harvested href — valid HTML
    * must escape `&` in attribute values as `&amp;`, so a query-string
    * URL harvested verbatim would send `amp;param` names to the server
    * (the reference's BeautifulSoup decodes entities for it). */
  private[spec] def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val m = Entity.matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val rep =
        if (m.group(1) != null) Named(m.group(1))
        else new String(Character.toChars(Integer.parseInt(
          Option(m.group(2)).getOrElse(m.group(3)),
          if (m.group(2) != null) 10 else 16)))
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  def nthLink(spark: SparkSession, pageUrl: String, extension: String,
      n: Int, expectedMatches: Option[Int] = None,
      regex: Option[String] = None,
      stagingDir: String): String = {
    val staged = HttpStaging.fetch(spark, pageUrl, stagingDir)
    val p = new org.apache.hadoop.fs.Path(staged)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val html =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val m = Href.matcher(html)
    val hrefs = Iterator.continually(m.find()).takeWhile(identity)
      .map(_ => unescape(Seq(m.group(1), m.group(2), m.group(3))
        .find(_ != null).getOrElse("")))
      .toList
    // the reference's filter is re.search(f".{extension}$") — one
    // arbitrary char then the extension at end-of-string (the dot is an
    // UNQUOTED regex dot there; mirrored verbatim)
    val extPat = java.util.regex.Pattern.compile(s".$extension$$")
    val docUrls = hrefs.filter(u => extPat.matcher(u).find())
    expectedMatches.foreach(e => require(docUrls.length == e,
      s"expected $e links ending in .$extension on $pageUrl, " +
        s"found ${docUrls.length} (page layout changed?)"))
    require(n >= 0 && n < docUrls.length,
      s"asked for link #$n but only ${docUrls.length} match on $pageUrl")
    val nth = docUrls(n)
    regex.foreach(r =>
      require(java.util.regex.Pattern.compile(r).matcher(nth).find(),
        s"link #$n ('$nth') does not match validation regex '$r'"))
    new java.net.URI(pageUrl).resolve(nth).toString
  }
}
