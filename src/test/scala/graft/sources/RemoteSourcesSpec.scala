package graft.sources

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, TestHttp}
import graft.lake.LakeTable
import graft.spec.{JobDestination, JobExtractor, JobRunner, JobSource, JobSpec}

/** Remote-source staging against a REAL HTTP server (the JDK's
  * `com.sun.net.httpserver` bound to 127.0.0.1 — zero egress, real
  * sockets): [[HttpStaging]] over http:// URLs end-to-end, the paged-API
  * fetch ([[PagedHttpStaging]]), and the shelled-command fetch
  * ([[CommandStaging]], the reference's City-SFTP CLI pattern,
  * reference: engine/etl_util.py:442-469). */
class RemoteSourcesSpec extends SparkSpec {

  private def withServer(routes: Map[String, () => (Int, String)])(
      f: String => Unit): Unit = TestHttp.withServer(routes)(f)

  private val csvBody = "id,name\n1,alpha\n2,beta\n"

  /** Staged page files, excluding Hadoop's hidden .crc sidecars. */
  private def pageFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filterNot(p => Paths.get(p).getFileName.toString.startsWith("."))
      .sorted.toSeq

  test("HttpStaging fetches over real HTTP and overwrites on refetch") {
    var version = "alpha"
    withServer(Map("/feed.csv" ->
        (() => (200, csvBody.replace("alpha", version))))) { base =>
      val staging = tmpDir("http-real")
      val staged = HttpStaging.fetch(spark, s"$base/feed.csv", staging)
      assert(staged.endsWith("feed.csv"))
      assert(Files.readString(Paths.get(staged)).contains("alpha"))
      version = "v2" // same uri, new content: same staged path, new bytes
      val again = HttpStaging.fetch(spark, s"$base/feed.csv", staging)
      assert(again == staged)
      assert(Files.readString(Paths.get(staged)).contains("v2"))
    }
  }

  test("ftp:// streams through HttpStaging's copy loop (loopback FTP, real JDK handler)") {
    // the reference's FTPConnector (connectors.py:228-272) maps to
    // HttpStaging AS-IS because the JDK ships an ftp: protocol handler;
    // until this test that was a documented assertion — here the real
    // FtpURLConnection logs in, negotiates passive mode, and RETRs over
    // loopback sockets into the identical staged-copy loop
    graft.TestFtp.withServer(Map(
        "/pub/feed.csv" -> csvBody.getBytes("UTF-8"))) { base =>
      val staging = tmpDir("ftp-real")
      val staged = HttpStaging.fetch(spark, s"$base/pub/feed.csv", staging)
      assert(staged.endsWith("feed.csv"))
      assert(Files.readString(Paths.get(staged)) == csvBody)
    }
  }

  test("ftp:// missing file fails and stages nothing") {
    graft.TestFtp.withServer(Map.empty) { base =>
      val staging = tmpDir("ftp-550")
      intercept[java.io.IOException] {
        HttpStaging.fetch(spark, s"$base/pub/gone.csv", staging)
      }
      assert(!Files.exists(Paths.get(staging, "gone.csv")),
        "a failed FTP fetch must not leave a staged file")
    }
  }

  test("JobRunner end-to-end over real FTP: CSV RETR into a lake table") {
    // the reference's FTPConnector feeding a tabular pipeline
    // (connectors.py:228-272 + the launchpad lifecycle) — ftp source,
    // CSV extractor, MERGE into the lake, all through the same JobSpec
    // the HTTP jobs use
    graft.TestFtp.withServer(Map(
        "/data/rows.csv" -> csvBody.getBytes("UTF-8"))) { base =>
      val work = tmpDir("ftp-job")
      val spec = JobSpec(
        jobCode = "ftp_csv",
        source = JobSource.Url(s"$base/data/rows.csv"),
        stagingDir = s"$work/staging",
        extractor = JobExtractor.Csv(),
        destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
        keyFields = Seq("id"))
      val r = JobRunner.run(spark, spec)
      assert(r.applied && r.rows == 2)
      val got = LakeTable.load(spark, s"$work/lake").read().collect()
      assert(got.map(_.getAs[String]("name")).toSet == Set("alpha", "beta"))
    }
  }

  test("HttpStaging on a 404 fails and stages nothing") {
    withServer(Map("/gone.csv" -> (() => (404, "")))) { base =>
      val staging = tmpDir("http-404")
      intercept[java.io.IOException] {
        HttpStaging.fetch(spark, s"$base/gone.csv", staging)
      }
      assert(!Files.exists(Paths.get(staging, "gone.csv")),
        "a failed fetch must not leave a staged file")
    }
  }

  test("JobRunner end-to-end over real HTTP: JSON GET into a lake table") {
    // the reference's HTTPConnector-returning-JSON shape
    // (connectors.py:156-175) as Url source + Json extractor
    val json = """[{"id": 1, "name": "alpha"}, {"id": 2, "name": "beta"}]"""
    withServer(Map("/rows.json" -> (() => (200, json)))) { base =>
      val work = tmpDir("http-job")
      val spec = JobSpec(
        jobCode = "http_json",
        source = JobSource.Url(s"$base/rows.json"),
        stagingDir = s"$work/staging",
        extractor = JobExtractor.Json(),
        destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
        keyFields = Seq("id"))
      val r = JobRunner.run(spark, spec)
      assert(r.applied && r.rows == 2)
      val got = LakeTable.load(spark, s"$work/lake").read().collect()
      assert(got.map(_.getAs[String]("name")).toSet == Set("alpha", "beta"))
    }
  }

  test("PagedHttpStaging stages one file per page until the empty page") {
    // 3 JSONL pages of 2 rows, then an empty page ends the feed
    def page(i: Int): String =
      if (i >= 3) ""
      else (0 until 2).map(j => s"""{"id": ${i * 2 + j}}""").mkString("\n")
    withServer((0 to 4).map(i =>
        s"/api/$i" -> (() => (200, page(i)))).toMap) { base =>
      val staging = tmpDir("pager")
      val pager = new PagedHttpStaging(i => s"$base/api/$i")
      val dir = pager.fetch(spark, "metrics-feed", staging)
      assert(dir.endsWith("metrics-feed"))
      assert(pageFiles(dir).length == 3,
        "the empty sentinel page must not stage")
      // the page set reads as ONE distributed scan
      val df = spark.read.json(dir)
      assert(df.count() == 6)
      assert(df.agg(org.apache.spark.sql.functions.max("id")).head.getLong(0)
        == 5L)
    }
  }

  test("PagedHttpStaging refetch removes stale tail pages") {
    var pages = 3
    withServer((0 to 4).map(i => s"/p/$i" -> (() =>
        (200, if (i < pages) s"""{"page": $i}""" else ""))).toMap) { base =>
      val staging = tmpDir("pager-stale")
      val pager = new PagedHttpStaging(i => s"$base/p/$i")
      val dir = pager.fetch(spark, "feed", staging)
      assert(pageFiles(dir).length == 3)
      pages = 1 // the feed shrank; a refetch must not keep old tail pages
      pager.fetch(spark, "feed", staging)
      assert(pageFiles(dir).length == 1,
        "stale pages from the longer previous fetch must be wiped")
    }
  }

  test("PagedHttpStaging fails loudly past maxPages (no silent truncation)") {
    withServer(Map("/p" -> (() => (200, """{"k": 1}""")))) { base =>
      val pager = new PagedHttpStaging(_ => s"$base/p", maxPages = 4)
      val e = intercept[java.io.IOException] {
        pager.fetch(spark, "endless", tmpDir("pager-max"))
      }
      assert(e.getMessage.contains("maxPages=4"))
    }
  }

  test("PagedHttpStaging treats a whitespace-only page as end-of-feed") {
    withServer(Map(
        "/w/0" -> (() => (200, """{"k": 1}""")),
        "/w/1" -> (() => (200, " \n\t "))) ) { base =>
      val pager = new PagedHttpStaging(i => s"$base/w/$i")
      val dir = pager.fetch(spark, "ws-feed", tmpDir("pager-ws"))
      assert(pageFiles(dir).length == 1)
    }
  }

  test("paged source drives a full job: checksum gate sees the page set") {
    var rows = Seq("""{"id": 1, "v": "a"}""", """{"id": 2, "v": "b"}""")
    withServer((0 to 3).map(i =>
        s"/j/$i" -> (() => (200, if (i == 0) rows.mkString("\n") else "")))
          .toMap) { base =>
      val work = tmpDir("pager-job")
      val spec = JobSpec(
        jobCode = "paged_api",
        source = JobSource.Custom(
          new PagedHttpStaging(i => s"$base/j/$i"), "api-feed"),
        stagingDir = s"$work/staging",
        extractor = JobExtractor.Json(multiLine = false),
        destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
        keyFields = Seq("id"))
      val r1 = JobRunner.run(spark, spec)
      assert(r1.applied && r1.rows == 2)
      // unchanged pages: the directory checksum gate skips the run
      val r2 = JobRunner.run(spark, spec)
      assert(!r2.applied && r2.skipReason.exists(_.contains("checksum")))
      // a changed page re-runs and upserts
      rows = Seq("""{"id": 1, "v": "a2"}""", """{"id": 2, "v": "b"}""")
      val r3 = JobRunner.run(spark, spec)
      assert(r3.applied)
      val got = LakeTable.load(spark, s"$work/lake").read().collect()
        .map(r => r.getAs[String]("conv_id") -> r.getAs[String]("v")).toMap
      assert(got("v1") == "a2")
    }
  }

  test("rowsToSkip rejects a staged directory with a clear error") {
    withServer(Map("/d/0" -> (() => (200, "x,y\n1,2")),
        "/d/1" -> (() => (200, ""))) ) { base =>
      val work = tmpDir("pager-skip")
      val spec = JobSpec(
        jobCode = "paged_skip",
        source = JobSource.Custom(
          new PagedHttpStaging(i => s"$base/d/$i"), "feed"),
        stagingDir = s"$work/staging",
        extractor = JobExtractor.Csv(),
        destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
        rowsToSkip = 1,
        keyFields = Seq("x"))
      val e = intercept[IllegalArgumentException](JobRunner.run(spark, spec))
      assert(e.getMessage.contains("paged fetch"))
    }
  }

  test("CommandStaging shells the fetch command (the sftp-CLI pattern)") {
    val work = tmpDir("cmd-ok")
    val srcPath = Paths.get(work, "remote.csv")
    Files.write(srcPath, csvBody.getBytes("UTF-8"))
    // the test's "sftp" is cp; production swaps in sftp/gsutil/aws argv
    val staging = new CommandStaging(Seq("/bin/cp", "{uri}", "{dest}"))
    val staged = staging.fetch(spark, srcPath.toString, s"$work/staging")
    assert(staged.endsWith("remote.csv"))
    assert(Files.readString(Paths.get(staged)) == csvBody)
  }

  test("CommandStaging surfaces a failing command's exit code and output") {
    val staging = new CommandStaging(
      Seq("/bin/sh", "-c", "echo no such host >&2; exit 3", "{dest}"))
    val e = intercept[java.io.IOException] {
      staging.fetch(spark, "any.csv", tmpDir("cmd-fail"))
    }
    assert(e.getMessage.contains("exited 3"))
    assert(e.getMessage.contains("no such host"))
  }

  test("CommandStaging fails when the command stages no output file") {
    val staging = new CommandStaging(Seq("/bin/sh", "-c", "true", "{dest}"))
    val e = intercept[java.io.IOException] {
      staging.fetch(spark, "any.csv", tmpDir("cmd-noout"))
    }
    assert(e.getMessage.contains("produced no output file"))
  }

  test("CommandStaging cleans up a partial output of a failed command") {
    val work = tmpDir("cmd-partial")
    val staging = new CommandStaging(
      Seq("/bin/sh", "-c", "echo partial > \"$1\"; exit 1", "sh", "{dest}"))
    intercept[java.io.IOException] {
      staging.fetch(spark, "any.csv", s"$work/staging")
    }
    assert(!Files.exists(Paths.get(work, "staging", "any.csv")),
      "a failed fetch must not leave a partial staged file")
  }

  test("CommandStaging requires a {dest} placeholder") {
    intercept[IllegalArgumentException] {
      new CommandStaging(Seq("/bin/cp", "{uri}", "/tmp/fixed"))
    }
  }

  test("CommandStaging stages a directory fetch (the wildcard-prefix CLI " +
      "pull) that a job reads as one scan") {
    // the reference's download_city_directory shells `sftp …/prefix* dir`
    // (etl_util.py:449-458); here the command stages N files into {dest}
    // and the extractor reads the whole set in parallel
    val work = tmpDir("cmd-dir")
    Files.createDirectories(Paths.get(s"$work/remote"))
    Files.write(Paths.get(s"$work/remote/a.csv"),
      "id,v\n1,x\n".getBytes("UTF-8"))
    Files.write(Paths.get(s"$work/remote/b.csv"),
      "id,v\n2,y\n".getBytes("UTF-8"))
    val spec = JobSpec(
      jobCode = "city_dir",
      source = JobSource.Custom(new CommandStaging(Seq(
        "/bin/sh", "-c", """mkdir -p "$2" && cp "$1"/*.csv "$2"""",
        "sh", "{uri}", "{dest}")), s"$work/remote"),
      stagingDir = s"$work/staging",
      extractor = JobExtractor.Csv(),
      destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
      keyFields = Seq("id"))
    val r = JobRunner.run(spark, spec)
    assert(r.applied && r.rows == 2)
    val got = LakeTable.load(spark, s"$work/lake").read().collect()
    assert(got.map(_.getAs[String]("v")).toSet == Set("x", "y"))
    // the directory checksum gate covers the staged file SET
    val r2 = JobRunner.run(spark, spec)
    assert(!r2.applied && r2.skipReason.exists(_.contains("checksum")))
  }

  test("CommandStaging handles remote-CLI uris that are not Hadoop paths") {
    // the class's primary documented shape: 'user@host:/path/f.csv' —
    // Hadoop Path would parse 'user@host' as a URI scheme and throw
    val work = tmpDir("cmd-sftp-uri")
    val staging = new CommandStaging(
      Seq("/bin/sh", "-c", "echo fetched > \"$1\"", "sh", "{dest}"))
    val staged = staging.fetch(spark,
      "pitt@ftp.example.gov:/pitt/dogs.csv", s"$work/staging")
    assert(staged.endsWith("dogs.csv"))
    assert(Files.readString(Paths.get(staged)).trim == "fetched")
    // a slashless uri sanitizes the colon out of the staged name
    val staged2 = staging.fetch(spark, "host:export.csv", s"$work/staging")
    assert(staged2.endsWith("host_export.csv"))
  }

  test("CommandStaging caps captured output in the failure message") {
    val staging = new CommandStaging(Seq("/bin/sh", "-c",
      "i=0; while [ $i -lt 4000 ]; do echo progress-line-$i; i=$((i+1)); " +
        "done; exit 2", "sh", "{dest}"))
    val e = intercept[java.io.IOException] {
      staging.fetch(spark, "big.csv", tmpDir("cmd-chatty"))
    }
    assert(e.getMessage.contains("exited 2"))
    assert(e.getMessage.contains("output truncated"),
      "oversized child output must be capped, not accumulated")
    assert(e.getMessage.length < 80 * 1024)
  }

  test("pager mid-feed failure is an IOException and wipes partial pages") {
    withServer(Map(
        "/mid/0" -> (() => (200, """{"k": 0}""")),
        "/mid/1" -> (() => (404, "")))) { base =>
      val staging = tmpDir("pager-midfail")
      val pager = new PagedHttpStaging(i => s"$base/mid/$i")
      val e = intercept[java.io.IOException] {
        pager.fetch(spark, "feed", staging)
      }
      // NOT FileNotFoundException: ignoreIfSourceMissing must not treat a
      // truncated feed as the benign no-file-this-month case
      assert(!e.isInstanceOf[java.io.FileNotFoundException])
      assert(e.getMessage.contains("mid-feed"))
      assert(!Files.exists(Paths.get(staging, "feed")),
        "a failed fetch must not leave a partial page set")
    }
  }

  test("pager first-page 404 keeps the source-missing exception type") {
    withServer(Map("/gone/0" -> (() => (404, "")))) { base =>
      val pager = new PagedHttpStaging(i => s"$base/gone/$i")
      intercept[java.io.FileNotFoundException] {
        pager.fetch(spark, "feed", tmpDir("pager-404"))
      }
    }
  }

  test("a feed with zero pages is a graceful zero-row skip, not a crash") {
    withServer(Map("/none/0" -> (() => (200, "")))) { base =>
      val work = tmpDir("pager-empty")
      val spec = JobSpec(
        jobCode = "empty_feed",
        source = JobSource.Custom(
          new PagedHttpStaging(i => s"$base/none/$i"), "feed"),
        stagingDir = s"$work/staging",
        extractor = JobExtractor.Json(multiLine = false),
        destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
        keyFields = Seq("id"))
      val r = JobRunner.run(spark, spec)
      assert(!r.applied && r.rows == 0)
      assert(r.skipReason.exists(_.contains("empty")))
    }
  }
}
