package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Fetch-by-shelled-command staging — the Spark twin of the reference's
  * City-SFTP CLI fetch (reference: engine/etl_util.py:442-469:
  * `fetch_city_file`/`download_city_directory` shell `sftp -i <keyfile>
  * host:/path <local_dir>` via `os.popen`). The reference's own answer
  * to "no client library" is to drive the installed CLI; this class is
  * that answer as a [[Staging]] impl, and doubles as the production plug
  * for any fetcher with a CLI but no jar on the classpath (`sftp`,
  * `gsutil cp`, `aws s3 cp`, `curl`) — the SFTP/GCS connector rows of
  * the survey deploy through it unchanged.
  *
  * `command` is the argv template; `{uri}` and `{dest}` placeholders are
  * substituted verbatim per argument (argv-style, never a shell string —
  * no quoting/injection surface). The command must create `{dest}`;
  * a non-zero exit or a missing output fails the fetch, and any partial
  * output is removed (same contract as [[HttpStaging]]'s truncation
  * cleanup). Stdout/stderr are captured into the failure message (the
  * reference prints each output line, etl_util.py:456-458).
  *
  * The staged name is the uri's basename, so re-fetching the same uri
  * overwrites the same staged path (the [[Staging]] idempotence rule).
  */
final class CommandStaging(command: Seq[String]) extends Staging {
  require(command.nonEmpty, "CommandStaging needs a non-empty argv")
  require(command.exists(_.contains("{dest}")),
    "CommandStaging argv must reference {dest} (the staged output path)")

  def fetch(spark: SparkSession, uri: String, stagingDir: String): String = {
    // the uri is remote-CLI syntax ('user@host:/path/f.csv', 'gs://…'),
    // NOT a Hadoop path — `new Path(uri)` would parse 'user@host' as a
    // URI scheme and throw; take the basename by string split and strip
    // characters Path can't carry in a child component
    val base = uri.substring(uri.lastIndexOf('/') + 1)
      .replaceAll("[:\\\\]", "_")
    val dest = new Path(stagingDir, if (base.isEmpty) "download" else base)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dest.getParent)
    val argv = command.map(_.replace("{uri}", uri)
      .replace("{dest}", dest.toUri.getPath))
    val pb = new ProcessBuilder(argv: _*).redirectErrorStream(true)
    val proc = pb.start()
    val output = CommandStaging.drainCapped(proc.getInputStream)
    val exit = proc.waitFor()
    if (exit != 0 || !fs.exists(dest)) {
      if (fs.exists(dest)) fs.delete(dest, false) // never keep a partial
      throw new java.io.IOException(
        s"fetch command ${argv.mkString("[", " ", "]")} " +
          (if (exit != 0) s"exited $exit" else "produced no output file") +
          (if (output.trim.isEmpty) "" else s"; output:\n${output.trim}"))
    }
    dest.toString
  }
}

object CommandStaging {
  private val CapChars = 64 * 1024

  /** Drain the child's merged output keeping only the LAST 64 KiB — the
    * output exists to decorate a failure message, and a chatty CLI's
    * progress stream on a multi-GB transfer must not accumulate on the
    * driver (the reference streams lines straight to the console,
    * etl_util.py:456-458). Draining also keeps the child from blocking
    * on a full pipe. */
  private def drainCapped(in: java.io.InputStream): String = {
    val reader = new java.io.InputStreamReader(in, "UTF-8")
    val sb = new StringBuilder
    var truncated = false
    try {
      val buf = new Array[Char](8192)
      var n = reader.read(buf)
      while (n >= 0) {
        sb.appendAll(buf, 0, n)
        if (sb.length > CapChars) {
          sb.delete(0, sb.length - CapChars)
          truncated = true
        }
        n = reader.read(buf)
      }
    } finally reader.close()
    if (truncated) "[… output truncated …]\n" + sb.toString else sb.toString
  }
}

/** Paged-API staging — the reference's pager shape (reference:
  * engine/payload/wprdc/g_analytics.py:309-324 `page_through_get_metrics`
  * loops `fetch(page_token)` until the response carries no next-page
  * token; the SOAP puller engine/payload/united_way/211.py:47-77 is the
  * same loop). The reference accumulates rows in memory on the driver;
  * here each page lands as its own staged FILE under one directory, so
  * the downstream `spark.read.json`/`csv` scan reads the page set with
  * full parallelism (one split per page) and the driver never holds a
  * record.
  *
  * `pageUrl(i)` renders the GET for 0-based page `i` (offset, page token
  * baked by the caller, cursor — whatever the API speaks). Paging stops
  * at the first page whose body is empty or whitespace-only (the generic
  * byte-level form of "no nextPageToken"); that sentinel page is not
  * staged. Pages must therefore be self-delimiting fragments — JSON
  * Lines, a JSON array per page (`multiLine` read), or headerless CSV.
  *
  * Exceeding `maxPages` FAILS (no silent truncation: a pager that quietly
  * stops mid-feed would present a partial corpus as complete). The staged
  * directory is wiped before fetching so a re-fetch that yields fewer
  * pages cannot leave stale tail pages behind (the [[Staging]]
  * idempotence rule, which per-file overwrite alone would break).
  *
  * The [[Staging]] `uri` names the staged subdirectory (the feed's
  * logical name); [[graft.spec.JobRunner]] accepts the returned directory
  * everywhere a staged file goes (checksum gate included).
  */
final class PagedHttpStaging(pageUrl: Int => String, maxPages: Int = 10000)
  extends Staging {
  require(maxPages > 0, s"maxPages must be positive, got $maxPages")

  def this(template: String, maxPages: Int, pageSize: Int) =
    this(PagedHttpStaging.render(template, pageSize), maxPages)

  def fetch(spark: SparkSession, uri: String, stagingDir: String): String = {
    val dir = new Path(stagingDir, new Path(uri).getName)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    var i = 0
    var done = false
    var ok = false
    try {
      while (!done) {
        if (i >= maxPages)
          throw new java.io.IOException(
            s"pager for $uri exceeded maxPages=$maxPages without an empty " +
              "page; raise maxPages or fix the feed's end-of-data signal")
        val page = new Path(dir, f"page-$i%05d")
        val in =
          try new java.net.URI(pageUrl(i)).toURL.openStream()
          catch {
            // page 0 failing to open IS "the source is missing" and keeps
            // its type; a MID-FEED page failure is a truncated fetch and
            // must not be mistaken for the benign no-file-this-month case
            // (JobSpec.ignoreIfSourceMissing matches on the exception type)
            case e: java.io.FileNotFoundException if i > 0 =>
              throw new java.io.IOException(
                s"pager for $uri: page $i failed mid-feed (pages 0-${i - 1} " +
                  "fetched); the feed is NOT complete", e)
          }
        try BinarySink.streamToFile(in, fs, page, overwrite = true)
        finally in.close()
        if (fs.getFileStatus(page).getLen == 0L || isBlank(fs, page)) {
          fs.delete(page, false)
          done = true
        } else i += 1
      }
      ok = true
    } finally {
      // a failed fetch must not leave a partial page set that reads as a
      // complete feed (same never-keep-a-partial contract as HttpStaging)
      if (!ok) fs.delete(dir, true)
    }
    dir.toString
  }

  /** Whitespace-only check without materializing the page: pages that
    * reach here are non-empty; only an all-whitespace prefix keeps the
    * scan going, so it terminates at the first real byte. */
  private def isBlank(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Boolean = {
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) {
        var j = 0
        while (j < n) {
          if (!Character.isWhitespace(buf(j).toChar)) return false
          j += 1
        }
        n = in.read(buf)
      }
      true
    } finally in.close()
  }
}

object PagedHttpStaging {
  /** The declarative (jobs-file) page-URL form: a template with `{page}`
    * (0-based page index) and/or `{offset}` (page index × `pageSize`)
    * placeholders — the two addressing shapes the reference's pagers use
    * (page tokens/numbers vs row offsets). At least one placeholder is
    * required: a constant URL would re-fetch the same page forever and
    * only stop at the maxPages failure. */
  private[sources] def render(template: String, pageSize: Int): Int => String = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    require(template.contains("{page}") || template.contains("{offset}"),
      s"page-URL template needs a {page} or {offset} placeholder: $template")
    i => template.replace("{page}", i.toString)
      .replace("{offset}", (i.toLong * pageSize).toString)
  }
}
