package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.spec.{FilterDsl, Projection}
import org.apache.spark.sql.types.IntegerType

/** Extractor/sink parity with the reference's test_extractor.py /
  * test_loader.py behaviors (reference:
  * engine/wprdc_etl/test/unit/test_extractor.py:10-59, test CSV header
  * normalization + values + custom delimiter). */
class ExtractorsSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, text: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  test("csv: header normalization, ''->null, custom delimiter") {
    val dir = tmpDir("csv-ex")
    val f = writeFile(dir, "t.tsv",
      "First Name\tLast-Name\tAge\nmojo\tnixon\t\ndon\tknotts\t63\n")
    val df = Extractors.csv(spark, f, Extractors.CsvOptions(delimiter = "\t"))
    assert(df.columns.toSeq == Seq("first_name", "last_name", "age"))
    val rows = df.orderBy("first_name").collect()
    assert(rows(1).getString(0) == "mojo" && rows(1).isNullAt(2))
    assert(rows(0).getString(1) == "knotts" && rows(0).getString(2) == "63")
  }

  test("csv: embedded repeated header rows are dropped") {
    val dir = tmpDir("csv-hdr")
    val f = writeFile(dir, "cat.csv",
      "name,age\na,1\nname,age\nb,2\n")
    val df = Extractors.csv(spark, f)
    assert(df.count() == 2)
    assert(df.filter(df("name") === "name").count() == 0)
  }

  test("json: flat array of objects with key union") {
    val dir = tmpDir("json-ex")
    val f = writeFile(dir, "t.json",
      """[{"Name":"a","n":1},{"Name":"b","n":2,"extra":"x"}]""")
    val df = Extractors.json(spark, f)
    assert(df.columns.toSet == Set("name", "n", "extra"))
    assert(df.count() == 2)
  }

  test("tabular sink: create, append, header-compat rejection") {
    import spark.implicits._
    val dir = tmpDir("sink") + "/out"
    val df1 = Seq(("a", "1"), ("b", "2")).toDF("name", "age")
    TabularSink.append(df1, dir)
    // append with reordered columns is fine (aligned to committed header)
    TabularSink.append(Seq(("3", "c")).toDF("age", "name"), dir)
    assert(TabularSink.read(spark, dir).count() == 3)
    assert(TabularSink.read(spark, dir).columns.toSeq == Seq("name", "age"))
    // mismatched columns must fail fast
    intercept[IllegalArgumentException] {
      TabularSink.append(Seq(("x", "y")).toDF("name", "zip"), dir)
    }
    // insert-only, like the reference's assert
    intercept[IllegalArgumentException] {
      TabularSink.append(df1, dir, method = "upsert")
    }
  }

  test("filter DSL: every reference operator compiles and filters") {
    import spark.implicits._
    val df = Seq(("a", 1, "red dog"), ("b", 5, "blue cat"),
      ("c", 9, "red cat")).toDF("k", "n", "s")
    import FilterDsl._
    def run(p: Pred*): Set[String] =
      FilterDsl(df, p).select("k").as[String].collect().toSet
    assert(run(Pred("n", "==", Scalar(5))) == Set("b"))
    assert(run(Pred("n", "!=", Scalar(5))) == Set("a", "c"))
    assert(run(Pred("n", ">", Scalar(1)), Pred("n", "<=", Scalar(5))) == Set("b"))
    assert(run(Pred("k", "in", Many(Seq("a", "c")))) == Set("a", "c"))
    assert(run(Pred("k", "not in", Many(Seq("a", "c")))) == Set("b"))
    assert(run(Pred("s", "includes", Scalar("red"))) == Set("a", "c"))
    assert(run(Pred("s", "excludes", Scalar("cat"))) == Set("a"))
    assert(run() == Set("a", "b", "c")) // empty filter list = keep all
  }

  test("projection: rename, cast, default, order (marshmallow semantics)") {
    import spark.implicits._
    val df = Seq(("7", null.asInstanceOf[String])).toDF("Count", "Note")
    val out = Projection(df, Seq(
      Projection.Field("Count", "count", cast = Some(IntegerType)),
      Projection.Field("Note", "note", default = Some("n/a")),
      Projection.Field("", "source", default = Some("etl"))))
    assert(out.columns.toSeq == Seq("count", "note", "source"))
    val r = out.head()
    assert(r.getInt(0) == 7 && r.getString(1) == "n/a" && r.getString(2) == "etl")
  }
}
