package graft.spec

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, TestHttp}
import graft.lake.LakeTable

/** Catalog resolution (the ArcGIS data.json twin, reference:
  * engine/arcgis_util.py) and listing-page link scraping (reference:
  * engine/scraping_util.py:16-45), both driven end-to-end against a real
  * localhost HTTP server. */
class CatalogSpec extends SparkSpec {

  private def dataJson(base: String): String = s"""{
    "dataset": [
      {
        "title": "Public Housing Buildings",
        "distribution": [
          {"title": "CSV",
           "accessURL": "$base/datasets/abc_0.csv?outSR=%7B%22wkid%22%3A102729%7D"},
          {"title": "GeoJSON", "accessURL": "$base/datasets/abc_0.geojson"},
          {"title": "KML", "accessURL": "$base/datasets/abc_0.kml"},
          {"title": "Shapefile", "accessURL": "$base/datasets/abc_0.zip"},
          {"title": "ArcGIS GeoService",
           "accessURL": "$base/api/FeatureServer/0?f=json"}
        ]
      },
      {"title": "Duplicated", "distribution": [
        {"title": "CSV", "accessURL": "$base/d1.csv"}]},
      {"title": "Duplicated", "distribution": [
        {"title": "CSV", "accessURL": "$base/d2.csv"}]},
      {"title": "No Files"}
    ]
  }"""

  private def writeFixture(dir: String, name: String, body: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, body.getBytes("UTF-8"))
    p.toString
  }

  test("dataset resolves a unique title; ambiguous and absent titles fail") {
    val work = tmpDir("catalog")
    val path = writeFixture(work, "data.json", dataJson("http://x"))
    val entry = Catalog.dataset(spark, path, "Public Housing Buildings")
    assert(entry.distributions.map(_._1) ==
      Seq("CSV", "GeoJSON", "KML", "Shapefile", "ArcGIS GeoService"))
    val dup = intercept[IllegalArgumentException](
      Catalog.dataset(spark, path, "Duplicated"))
    assert(dup.getMessage.contains("2 datasets"))
    val none = intercept[IllegalArgumentException](
      Catalog.dataset(spark, path, "Nope"))
    assert(none.getMessage.contains("0 datasets"))
  }

  test("dataUrl strips the query string, matches case-insensitively, " +
      "keeps links verbatim") {
    val work = tmpDir("catalog-url")
    val path = writeFixture(work, "data.json", dataJson("http://x"))
    val entry = Catalog.dataset(spark, path, "Public Housing Buildings")
    // the outSR query string is dropped (reference strips it so the
    // extension ends the filename and the projection param is ignored)
    assert(Catalog.dataUrl(entry, "csv") ==
      (("http://x/datasets/abc_0.csv", "abc_0.csv")))
    assert(Catalog.dataUrl(entry, "geojson")._2 == "abc_0.geojson")
    // link=true returns the API URL untouched, query string and all
    assert(Catalog.dataUrl(entry, "ArcGIS GeoService", link = true)._1
      == "http://x/api/FeatureServer/0?f=json")
    val e = intercept[IllegalArgumentException](
      Catalog.dataUrl(entry, "Esri Rest API"))
    assert(e.getMessage.contains("no distribution of type"))
  }

  test("standard fan-out resolves all formats and runs end-to-end") {
    val csv = "objectid,name\n1,North Tower\n2,South Tower\n"
    val geojson = """{"type": "FeatureCollection", "features": []}"""
    TestHttp.withServer(Map(
        "/datasets/abc_0.csv" -> (() => (200, csv)),
        "/datasets/abc_0.geojson" -> (() => (200, geojson)),
        "/datasets/abc_0.kml" -> (() => (200, "<kml/>")),
        "/datasets/abc_0.zip" -> (() => (200, "PKzip-bytes")))) { base =>
      val work = tmpDir("catalog-e2e")
      val path = writeFixture(work, "data.json", dataJson(base))
      val entry = Catalog.dataset(spark, path, "Public Housing Buildings")
      val specs = Catalog.standardJobSpecs(entry,
        baseJobCode = "housing",
        stagingDir = s"$work/staging",
        destRoot = s"$work/out",
        schema = Seq(
          Projection.Field("objectid", "objectid",
            Some(org.apache.spark.sql.types.IntegerType)),
          Projection.Field("name", "name")),
        keyFields = Seq("objectid"))
      assert(specs.map(_.jobCode) == Seq("housing_csv", "housing_geojson",
        "housing_kml", "housing_shapefile", "housing_api"))

      val results = JobRunner.runAll(spark, specs)
      assert(results.forall(_._2.isRight),
        results.collect { case (c, Left(e)) => s"$c: $e" }.mkString("; "))
      // tabular CSV landed in the lake
      val table = LakeTable.load(spark, s"$work/out/housing")
      val rows = table.read().collect()
      assert(rows.map(_.getAs[String]("name")).toSet ==
        Set("North Tower", "South Tower"))
      // the 5th job registered the API link on the table, query string
      // verbatim (the reference's ckan_link, loading nothing)
      assert(table.linkedResources ==
        Map("Public Housing Buildings (API)" ->
          s"$base/api/FeatureServer/0?f=json"))
      // re-running the unchanged link is a SKIP, not a fresh snapshot
      // version per scheduled run
      val vBefore = table.snapshot.version
      val again = JobRunner.run(spark, specs.last)
      assert(!again.applied &&
        again.skipReason.exists(_.contains("already registered")))
      assert(table.snapshot.version == vBefore,
        "an unchanged link must not publish a new snapshot version")
      // the geo artifacts landed as whole files
      val files = Files.list(Paths.get(s"$work/out/housing_files"))
        .toArray.map(_.toString)
        .filterNot(p => Paths.get(p).getFileName.toString.startsWith("."))
      assert(files.map(f => Paths.get(f).getFileName.toString).sorted.toSeq ==
        Seq("abc_0.geojson", "abc_0.kml", "abc_0.zip"))
      assert(Files.readString(Paths.get(s"$work/out/housing_files/abc_0.geojson"))
        == geojson)
    }
  }

  test("fan-out without a schema sends the CSV to the artifact path") {
    val work = tmpDir("catalog-noschema")
    val path = writeFixture(work, "data.json", dataJson("http://x"))
    val entry = Catalog.dataset(spark, path, "Public Housing Buildings")
    val specs = Catalog.standardJobSpecs(entry, "housing",
      s"$work/staging", s"$work/out")
    // reference: 'ckan' if schema is not None else 'ckan_filestore'
    assert(specs.head.extractor == JobExtractor.WholeFile)
    assert(specs.head.destination ==
      JobDestination.BinaryDir(s"$work/out/housing_files"))
    // no lake table to hang the API link on → no _api job
    assert(!specs.exists(_.jobCode.endsWith("_api")))
  }

  test("a catalog without a GeoService API still fans out the file jobs") {
    // plain-DCAT catalogs (no ArcGIS hub) have no API distribution; its
    // absence must not fail the construction of the four file jobs
    val entry = Catalog.Entry("Plain", Seq(
      "CSV" -> "http://x/d.csv", "GeoJSON" -> "http://x/d.geojson",
      "KML" -> "http://x/d.kml", "Shapefile" -> "http://x/d.zip"))
    val specs = Catalog.standardJobSpecs(entry, "plain", "/tmp/s", "/tmp/o",
      schema = Seq(Projection.Field("id", "id")), keyFields = Seq("id"))
    assert(specs.map(_.jobCode) == Seq("plain_csv", "plain_geojson",
      "plain_kml", "plain_shapefile"))
  }

  test("Link destination requires an existing table; never stages") {
    val spec = JobSpec(
      jobCode = "api_link",
      source = JobSource.Url("http://x/api/FeatureServer/0?f=json"),
      stagingDir = "/nonexistent/staging", // must never be touched
      extractor = JobExtractor.WholeFile,
      destination = JobDestination.Link("/nonexistent/table", "X (API)"))
    val e = intercept[IllegalArgumentException](JobRunner.run(spark, spec))
    assert(e.getMessage.contains("no lake table"))
  }

  test("dataset falls back to downloadURL; a URL-less distribution errors") {
    val work = tmpDir("catalog-dcat")
    val path = writeFixture(work, "data.json", """{
      "dataset": [{"title": "Plain DCAT", "distribution": [
        {"title": "CSV", "downloadURL": "http://x/plain.csv"},
        {"title": "KML"}]}]
    }""")
    val entry = Catalog.dataset(spark, path, "Plain DCAT")
    // plain-DCAT catalogs spell the URL downloadURL, not accessURL
    assert(Catalog.dataUrl(entry, "CSV")._1 == "http://x/plain.csv")
    val e = intercept[IllegalArgumentException](Catalog.dataUrl(entry, "KML"))
    assert(e.getMessage.contains("carries no accessURL/downloadURL"))
  }

  test("unescape inverts HTML attribute escaping on arbitrary URLs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic samples (fixed seed: a failing case must reproduce)
    def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
      val params = Gen.Parameters.default
      Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
        (s.next, g.apply(params, s))
      }.flatMap(_._2).take(n).toSeq
    }
    // URL-ish strings biased toward the characters escaping touches
    val urlish: Gen[String] = Gen.chooseNum(0, 24).flatMap(len =>
      Gen.listOfN(len, Gen.frequency(
        3 -> Gen.oneOf('&', '<', '>', '"', '\'', '#', ';'),
        5 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('/', '?', '=', '.', '-', '_'))).map(_.mkString))
    // the escaping a correct HTML serializer applies to attribute values
    def escape(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
    samples(urlish, 400, seed = 20260819L).foreach { s =>
      assert(Scrape.unescape(escape(s)) == s,
        s"unescape(escape) must be identity for ${s.map(_.toInt)}")
    }
    // numeric references decode to the same characters
    samples(urlish, 200, seed = 20260820L).foreach { s =>
      val numeric = s.flatMap(c => s"&#${c.toInt};")
      assert(Scrape.unescape(numeric) == s)
      val hex = s.flatMap(c => f"&#x${c.toInt}%x;")
      assert(Scrape.unescape(hex) == s)
    }
  }

  test("scraped hrefs decode HTML character references") {
    // valid HTML escapes & as &amp; in attributes; the harvested URL must
    // carry the real query-string separators
    assert(Scrape.unescape("/export?fmt=csv&amp;year=2024.csv")
      == "/export?fmt=csv&year=2024.csv")
    assert(Scrape.unescape("/a&#47;b&#x2F;c.csv") == "/a/b/c.csv")
    assert(Scrape.unescape("/plain.csv") == "/plain.csv")
    TestHttp.withServer(Map("/l" -> (() =>
        (200, """<a href="/dl?f=report&amp;ext=pdf&amp;name=x.pdf">x</a>""")))) {
      base =>
        val url = Scrape.nthLink(spark, s"$base/l", "pdf", 0,
          expectedMatches = Some(1), stagingDir = tmpDir("scrape-ent"))
        assert(url == s"$base/dl?f=report&ext=pdf&name=x.pdf")
    }
  }

  test("fan-out fails when a standard format is missing from the catalog") {
    val csvOnly = Catalog.Entry("X", Seq("CSV" -> "http://x/d.csv"))
    val e = intercept[IllegalArgumentException](
      Catalog.standardJobSpecs(csvOnly, "x", "/tmp/s", "/tmp/o"))
    assert(e.getMessage.contains("no distribution of type GeoJSON"))
  }

  private val listingHtml = """<html><body>
    <a href="/files/report_2023.pdf">2023</a>
    <a class="x" href='/files/report_2024.pdf'>2024</a>
    <a href=/files/report_2025.pdf>2025</a>
    <a href="/other/page.html">about</a>
    <a>no link here</a>
  </body></html>"""

  test("scrape nth link: filter by extension, count assert, regex, " +
      "relative resolution") {
    TestHttp.withServer(Map("/listing" -> (() => (200, listingHtml)))) {
      base =>
        val staging = tmpDir("scrape")
        // all three quoting styles parse; .html link filtered out
        val url = Scrape.nthLink(spark, s"$base/listing", "pdf", n = 1,
          expectedMatches = Some(3), regex = Some("report_\\d{4}"),
          stagingDir = staging)
        assert(url == s"$base/files/report_2024.pdf",
          "relative href must resolve against the page URL")

        // a changed page (wrong count) fails loudly
        val e = intercept[IllegalArgumentException] {
          Scrape.nthLink(spark, s"$base/listing", "pdf", n = 0,
            expectedMatches = Some(5), stagingDir = staging)
        }
        assert(e.getMessage.contains("expected 5 links"))

        // a failed validation regex fails loudly
        val r = intercept[IllegalArgumentException] {
          Scrape.nthLink(spark, s"$base/listing", "pdf", n = 0,
            regex = Some("annual_"), stagingDir = staging)
        }
        assert(r.getMessage.contains("validation regex"))
    }
  }

  test("scraped link drives a job: discover the URL, then load it") {
    val csv = "id,v\n1,a\n2,b\n"
    TestHttp.withServer(Map(
        "/downloads" -> (() =>
          (200, """<a href="/data/latest.csv">latest</a>""")),
        "/data/latest.csv" -> (() => (200, csv)))) { base =>
      val work = tmpDir("scrape-job")
      val url = Scrape.nthLink(spark, s"$base/downloads", "csv", 0,
        expectedMatches = Some(1), stagingDir = s"$work/staging")
      val spec = JobSpec(
        jobCode = "scraped",
        source = JobSource.Url(url),
        stagingDir = s"$work/staging",
        extractor = JobExtractor.Csv(),
        destination = JobDestination.Lake(s"$work/lake", nBuckets = 4),
        keyFields = Seq("id"))
      val r = JobRunner.run(spark, spec)
      assert(r.applied && r.rows == 2)
    }
  }
}
