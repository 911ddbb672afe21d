package graft.spec

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.lake.LakeTable

/** [[LaunchMain]] — the launchpad-CLI twin: jobs-file JSON → [[JobSpec]]s,
  * launchpad's flags and job-code selection, fleet run with per-job
  * failure isolation (reference: engine/launchpad.py:42-144, 222-337). */
class LaunchMainSpec extends SparkSpec {

  private def write(dir: String, name: String, text: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  private def fixture(work: String): String = {
    val dogs = write(work, "dogs.csv",
      "License ID,Breed,Color\n1,husky,grey\n2,pug,tan\n3,beagle,tri")
    val cats = write(work, "cats.csv", "Cat ID,Name\n1,mojo\n2,don")
    write(work, "jobs.json", s"""
      [
        { "job_code": "dog_licenses",
          "source": {"type": "local", "path": "$dogs"},
          "staging_dir": "$work/staging",
          "extractor": {"type": "csv"},
          "destination": {"type": "lake", "dir": "$work/lake/dogs", "n_buckets": 4},
          "schema": [
            {"from": "license_id", "type": "int"},
            {"from": "breed"},
            {"from": "color", "to": "colour", "default": "unknown"}],
          "filters": [["breed", "!=", "pug"]],
          "key_fields": ["license_id"] },
        { "job_code": "cat_licenses",
          "source": {"type": "local", "path": "$cats"},
          "staging_dir": "$work/staging",
          "extractor": {"type": "csv"},
          "destination": {"type": "lake", "dir": "$work/lake/cats", "n_buckets": 4},
          "key_fields": ["cat_id"] }
      ]""")
  }

  test("launch: jobs file runs end-to-end, JSON schema/filters/defaults applied") {
    val work = tmpDir("launch-e2e")
    val jobs = fixture(work)
    assert(LaunchMain.run(spark, Seq(jobs)) == 0)
    val dogs = LakeTable.load(spark, s"$work/lake/dogs").read().collect()
    assert(dogs.length == 2, "pug must be filtered by the JSON filter triple")
    val byId = dogs.map(r => r.getAs[String]("conv_id") ->
      r.getAs[String]("colour")).toMap
    assert(byId == Map("v1" -> "grey", "v3" -> "tri"))
    // the "type": "int" cast landed
    assert(dogs.head.schema("license_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(LakeTable.load(spark, s"$work/lake/cats").read().count() == 2)
  }

  test("launch: job-code exact and prefix selection, unknown code warns not fails") {
    val work = tmpDir("launch-sel")
    val jobs = fixture(work)
    assert(LaunchMain.run(spark, Seq(jobs, "cat_licenses")) == 0)
    assert(LakeTable.load(spark, s"$work/lake/cats").read().count() == 2)
    assert(!new java.io.File(s"$work/lake/dogs").exists,
      "unselected job must not run")
    assert(LaunchMain.run(spark, Seq(jobs, "dog-")) == 0) // prefix
    assert(LakeTable.load(spark, s"$work/lake/dogs").read().count() == 2)
    // a code that selects nothing: warns, runs zero jobs, exits clean
    assert(LaunchMain.run(spark, Seq(jobs, "zebra")) == 0)
  }

  test("launch: --test redirects destinations and disables the checksum gate") {
    val work = tmpDir("launch-test")
    val jobs = fixture(work)
    assert(LaunchMain.run(spark, Seq(jobs, "--test", "dog_licenses")) == 0)
    assert(LakeTable.load(spark, s"$work/lake/dogs_test").read().count() == 2)
    assert(!new java.io.File(s"$work/lake/dogs").exists,
      "--test must not touch the production table")
    // gate off under --test: the same bytes run again and still apply
    assert(LaunchMain.run(spark, Seq(jobs, "--test", "dog_licenses")) == 0)
    // and the test runs must not poison the production gate
    assert(LaunchMain.run(spark, Seq(jobs, "dog_licenses")) == 0)
    assert(LakeTable.load(spark, s"$work/lake/dogs").read().count() == 2)
  }

  test("launch: one failing job does not stop the fleet; exit count reflects it") {
    val work = tmpDir("launch-fail")
    val cats = write(work, "cats.csv", "Cat ID,Name\n1,mojo")
    val jobs = write(work, "jobs.json", s"""
      [
        { "job_code": "broken",
          "source": {"type": "local", "path": "$work/missing.csv"},
          "staging_dir": "$work/staging",
          "extractor": {"type": "csv"},
          "destination": {"type": "lake", "dir": "$work/lake/broken"},
          "key_fields": ["x"] },
        { "job_code": "cats",
          "source": {"type": "local", "path": "$cats"},
          "staging_dir": "$work/staging",
          "extractor": {"type": "csv"},
          "destination": {"type": "lake", "dir": "$work/lake/cats", "n_buckets": 4},
          "key_fields": ["cat_id"] }
      ]""")
    assert(LaunchMain.run(spark, Seq(jobs)) == 1)
    assert(LakeTable.load(spark, s"$work/lake/cats").read().count() == 1,
      "the job after the failed one must still run")
  }

  test("launch: flag overrides map onto the spec like launchpad's parse_args") {
    val base = JobSpec(
      jobCode = "j",
      source = JobSource.LocalFile("/x"),
      stagingDir = "/s",
      extractor = JobExtractor.Csv(),
      destination = JobDestination.Lake("/lake/t"),
      keyFields = Seq("k"))
    def opts(flags: String*) =
      LaunchMain.parseArgs(Seq("/jobs.json") ++ flags)
    assert(LaunchMain.applyFlags(base, opts("--wipe_data")).alwaysWipeData)
    assert(!LaunchMain.applyFlags(base.copy(alwaysWipeData = true),
      opts("--wipe_data", "--dont_wipe_data")).alwaysWipeData,
      "dont_wipe_data wins over both the flag and the job's own setting")
    assert(LaunchMain.applyFlags(base, opts("--clear_first")).alwaysClearFirst)
    assert(LaunchMain.applyFlags(base, opts("--ignore_empty_rows")).dropEmptyRows)
    val t = LaunchMain.applyFlags(base, opts("--test"))
    assert(t.destination == JobDestination.Lake("/lake/t_test", 32))
    assert(!t.checksumGate)
    assert(LaunchMain.applyFlags(base, opts()).checksumGate)
  }

  test("launch: parse errors are typed and name the offending job") {
    intercept[IllegalArgumentException](
      LaunchMain.parseArgs(Seq("/j.json", "--bogus")))
    intercept[IllegalArgumentException](LaunchMain.parseJobs("""{"x": 1}"""))
    val noCode = intercept[IllegalArgumentException](
      LaunchMain.parseJobs("""[{"source": {"type": "local", "path": "/x"}}]"""))
    assert(noCode.getMessage.contains("job_code"))
    def job(extra: String) = s"""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"}$extra }]"""
    val badFilter = intercept[IllegalArgumentException](
      LaunchMain.parseJobs(job(""", "filters": [["f", "=="]]""")))
    assert(badFilter.getMessage.contains("triple"))
    val badType = intercept[IllegalArgumentException](LaunchMain.parseJobs(
      job(""", "schema": [{"from": "a", "type": "nonsense"}]""")))
    assert(badType.getMessage.contains("bad type"))
    val badExt = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s", "extractor": {"type": "avro"},
         "destination": {"type": "lake", "dir": "/d"} }]"""))
    assert(badExt.getMessage.contains("unknown type 'avro'"))
    // duplicate job codes: parse the same code twice
    val dupJson = s"""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"} },
       { "job_code": "j", "source": {"type": "local", "path": "/y"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d2"} }]"""
    val dupErr = intercept[IllegalArgumentException](
      LaunchMain.parseJobs(dupJson))
    assert(dupErr.getMessage.contains("duplicate job_code"))
  }

  test("launch: null filter literals mean IS [NOT] NULL, not SQL = NULL") {
    import spark.implicits._
    val df = Seq(("1", Some("grey")), ("2", None), ("3", Some("tan")))
      .toDF("id", "color")
    def ids(p: FilterDsl.Pred): Set[String] =
      FilterDsl(df, Seq(p)).collect().map(_.getString(0)).toSet
    // == null / != null: the natural port of the reference's Python
    // `== None` triple — a blind `= NULL` compile would return 0 rows
    assert(ids(FilterDsl.Pred("color", "==",
      FilterDsl.Scalar(null))) == Set("2"))
    assert(ids(FilterDsl.Pred("color", "!=",
      FilterDsl.Scalar(null))) == Set("1", "3"))
    // null inside in/not-in adds (or negates) the IS NULL branch
    assert(ids(FilterDsl.Pred("color", "in",
      FilterDsl.Many(Seq("grey", null)))) == Set("1", "2"))
    assert(ids(FilterDsl.Pred("color", "not in",
      FilterDsl.Many(Seq("grey", null)))) == Set("3"))
    // ordering/substring ops reject a null literal at compile time
    intercept[IllegalArgumentException](
      FilterDsl.compileOne(FilterDsl.Pred("color", ">", FilterDsl.Scalar(null))))
    intercept[IllegalArgumentException](FilterDsl.compileOne(
      FilterDsl.Pred("color", "includes", FilterDsl.Scalar(null))))
    // and the JSON surface routes a null triple value through Scalar(null)
    val spec = LaunchMain.parseJobs("""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"},
         "filters": [["color", "==", null]] }]""").head
    assert(spec.filters.head.value == FilterDsl.Scalar(null))
  }

  test("launch: --test suffixes the path component, not the raw string") {
    val base = JobSpec(
      jobCode = "j",
      source = JobSource.LocalFile("/x"),
      stagingDir = "/s",
      extractor = JobExtractor.Csv(),
      destination = JobDestination.Lake("/lake/dogs/"), // trailing slash
      keyFields = Seq("k"))
    val t = LaunchMain.applyFlags(base,
      LaunchMain.parseArgs(Seq("/jobs.json", "--test")))
    // raw concat would produce /lake/dogs/_test — INSIDE the prod table
    assert(t.destination == JobDestination.Lake("/lake/dogs_test", 32))
  }

  test("launch: run returns the failure COUNT; parse errors carry context") {
    val work = tmpDir("launch-count")
    val jobs = write(work, "jobs.json", s"""
      [
        { "job_code": "b1", "source": {"type": "local", "path": "$work/m1.csv"},
          "staging_dir": "$work/staging", "extractor": {"type": "csv"},
          "destination": {"type": "lake", "dir": "$work/lake/b1"},
          "key_fields": ["x"] },
        { "job_code": "b2", "source": {"type": "local", "path": "$work/m2.csv"},
          "staging_dir": "$work/staging", "extractor": {"type": "csv"},
          "destination": {"type": "lake", "dir": "$work/lake/b2"},
          "key_fields": ["x"] }
      ]""")
    assert(LaunchMain.run(spark, Seq(jobs)) == 2)
    // a bad csv schema_ddl names the job and the field, not a bare
    // Spark ParseException
    val badDdl = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s",
         "extractor": {"type": "csv", "schema_ddl": "a int,, b string"},
         "destination": {"type": "lake", "dir": "/d"} }]"""))
    assert(badDdl.getMessage.contains("job 'j'") &&
      badDdl.getMessage.contains("schema_ddl"))
    // an out-of-Long-range integer says so, not "not a scalar"
    val big = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"},
         "filters": [["id", "==", 99999999999999999999999999]] }]"""))
    assert(big.getMessage.contains("out of 64-bit range"))
  }

  test("launch: omitted extractor infers from the source extension") {
    def spec(source: String, dest: String = """{"type": "lake", "dir": "/d"}""") =
      LaunchMain.parseJobs(s"""
        [{ "job_code": "j", "source": $source, "staging_dir": "/s",
           "destination": $dest }]""").head
    assert(spec("""{"type": "local", "path": "/data/dogs.CSV"}""")
      .extractor.isInstanceOf[JobExtractor.Csv])
    assert(spec("""{"type": "url", "url": "http://x/feed.json?key=1"}""")
      .extractor.isInstanceOf[JobExtractor.Json])
    assert(spec("""{"type": "zip", "zip": "/a.zip", "member": "m.xlsx"}""")
      .extractor.isInstanceOf[JobExtractor.Xlsx])
    assert(spec("""{"type": "local", "path": "/data/parcels.geojson"}""")
      .extractor == JobExtractor.GeoJson)
    assert(spec("""{"type": "local", "path": "/data/old.xls"}""")
      .extractor.isInstanceOf[JobExtractor.Xls])
    // binary destination always takes the whole file, whatever the name
    // (reference etl_util.py:525-526)
    assert(spec("""{"type": "local", "path": "/data/img.tiff"}""",
      """{"type": "bindir", "dir": "/d"}""") .extractor == JobExtractor.WholeFile)
    // unknown extension + tabular destination: typed error, not a
    // silent whole-file fallback
    val e = intercept[IllegalArgumentException](
      spec("""{"type": "local", "path": "/data/img.tiff"}"""))
    assert(e.getMessage.contains("cannot infer") && e.getMessage.contains("tiff"))
    // and an end-to-end run with the extractor omitted
    val work = tmpDir("launch-infer")
    val cats = write(work, "cats.csv", "Cat ID,Name\n1,mojo\n2,don")
    val jobs = write(work, "jobs.json", s"""
      [{ "job_code": "cats", "source": {"type": "local", "path": "$cats"},
         "staging_dir": "$work/staging",
         "destination": {"type": "lake", "dir": "$work/lake/cats", "n_buckets": 4},
         "key_fields": ["cat_id"] }]""")
    assert(LaunchMain.run(spark, Seq(jobs)) == 0)
    assert(graft.lake.LakeTable.load(spark, s"$work/lake/cats").read().count() == 2)
  }

  test("launch: filter 'in' takes a JSON array; scalars keep their JSON types") {
    val specs = LaunchMain.parseJobs("""
      [{ "job_code": "j", "source": {"type": "local", "path": "/x"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"},
         "filters": [["zip", "in", ["15213", "15222"]],
                     ["n", ">", 3],
                     ["ok", "==", true]] }]""")
    val Seq(inP, gtP, eqP) = specs.head.filters
    assert(inP.value == FilterDsl.Many(Seq("15213", "15222")))
    assert(gtP.value == FilterDsl.Scalar(3L))
    assert(eqP.value == FilterDsl.Scalar(true))
  }

  test("launch: command source fetches through the declared argv") {
    val work = tmpDir("launch-cmd")
    val remote = write(work, "remote.csv", "Id,V\n1,a\n2,b")
    val jobs = write(work, "jobs.json", s"""
      [{ "job_code": "cli_fetch",
         "source": {"type": "command",
                    "argv": ["/bin/cp", "{uri}", "{dest}"],
                    "uri": "$remote"},
         "staging_dir": "$work/staging",
         "destination": {"type": "lake", "dir": "$work/lake", "n_buckets": 4},
         "key_fields": ["id"] }]""")
    // extractor omitted: inferred from the uri's .csv extension
    assert(LaunchMain.run(spark, Seq(jobs)) == 0)
    assert(LakeTable.load(spark, s"$work/lake").read().count() == 2)
  }

  test("launch: paged source renders {page}/{offset} and loads all pages") {
    graft.TestHttp.withServer(Map(
        "/rows" -> (() => (200, ""))) ++ Seq(0, 10, 20).zipWithIndex.map {
          case (off, i) => s"/rows/$off" -> (() =>
            (200, if (i < 2) s"""{"id": $i, "off": $off}""" else ""))
        }.toMap) { base =>
      val work = tmpDir("launch-paged")
      val jobs = write(work, "jobs.json", s"""
        [{ "job_code": "paged_api",
           "source": {"type": "paged",
                      "url_template": "$base/rows/{offset}",
                      "page_size": 10,
                      "name": "rows-feed"},
           "staging_dir": "$work/staging",
           "extractor": {"type": "json", "multiline": false},
           "destination": {"type": "lake", "dir": "$work/lake", "n_buckets": 4},
           "key_fields": ["id"] }]""")
      assert(LaunchMain.run(spark, Seq(jobs)) == 0)
      val got = LakeTable.load(spark, s"$work/lake").read().collect()
      assert(got.map(_.getAs[Long]("off")).toSet == Set(0L, 10L),
        "offset must advance by page_size per page and stop at the empty page")
    }
  }

  test("launch: paged template without a placeholder is rejected") {
    val e = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j",
         "source": {"type": "paged", "url_template": "http://x/fixed",
                    "name": "f"},
         "staging_dir": "/s", "extractor": {"type": "json"},
         "destination": {"type": "lake", "dir": "/d"},
         "key_fields": ["id"] }]"""))
    assert(e.getMessage.contains("placeholder"))
  }

  test("launch: an {offset} template requires an explicit page_size") {
    // offsets advancing 0,1,2,… would fetch overlapping windows — there
    // is no correct default page size
    val e = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j",
         "source": {"type": "paged",
                    "url_template": "http://x/rows?offset={offset}",
                    "name": "f"},
         "staging_dir": "/s", "extractor": {"type": "json"},
         "destination": {"type": "lake", "dir": "/d"},
         "key_fields": ["id"] }]"""))
    assert(e.getMessage.contains("page_size"))
  }

  test("launch: link destination registers the URL on the jobs-file table") {
    val work = tmpDir("launch-link")
    val cats = write(work, "cats.csv", "Cat ID,Name\n1,mojo")
    val jobs = write(work, "jobs.json", s"""
      [{ "job_code": "cats",
         "source": {"type": "local", "path": "$cats"},
         "staging_dir": "$work/staging",
         "destination": {"type": "lake", "dir": "$work/lake", "n_buckets": 4},
         "key_fields": ["cat_id"] },
       { "job_code": "cats_api",
         "source": {"type": "url", "url": "http://x/api?f=json"},
         "staging_dir": "$work/staging",
         "destination": {"type": "link", "dir": "$work/lake",
                         "resource_name": "Cats (API)"} }]""")
    assert(LaunchMain.run(spark, Seq(jobs)) == 0)
    assert(LakeTable.load(spark, s"$work/lake").linkedResources ==
      Map("Cats (API)" -> "http://x/api?f=json"))
    // --test suffixes the link's table dir like every other destination
    val spec = LaunchMain.parseJobs(s"""
      [{ "job_code": "j", "source": {"type": "url", "url": "http://x/a"},
         "staging_dir": "/s",
         "destination": {"type": "link", "dir": "/lake/t",
                         "resource_name": "n"} }]""").head
    val tested = LaunchMain.applyFlags(spec, LaunchMain.Options(
      "f", Nil, test = true, mute = false, wipeData = None,
      clearFirst = false, ignoreEmptyRows = false))
    assert(tested.destination == JobDestination.Link("/lake/t_test", "n"))
  }

  test("launch: command source without argv or uri is rejected") {
    val noUri = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j",
         "source": {"type": "command", "argv": ["cp", "{uri}", "{dest}"]},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"},
         "key_fields": ["id"] }]"""))
    assert(noUri.getMessage.contains("uri"))
    val noArgv = intercept[IllegalArgumentException](LaunchMain.parseJobs("""
      [{ "job_code": "j",
         "source": {"type": "command", "uri": "u"},
         "staging_dir": "/s", "extractor": {"type": "csv"},
         "destination": {"type": "lake", "dir": "/d"},
         "key_fields": ["id"] }]"""))
    assert(noArgv.getMessage.contains("argv"))
  }
}
