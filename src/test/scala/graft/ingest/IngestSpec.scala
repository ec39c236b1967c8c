package graft.ingest

import java.nio.file.Files

import graft.SparkFixture
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class IngestSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def writeCsv(dir: String, name: String, lines: Seq[String]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    Files.write(p, String.join("\n", lines: _*).getBytes)
    p.toString
  }

  private lazy val csvDir = {
    val d = Files.createTempDirectory("graft-csv").toString
    writeCsv(d, "bundesliga_match_scores_1.csv", Seq(
      ",round,day,date,home,score,away",
      "0,Regular Season,Sun,2022-05-12,A,2-1,B",
      "1,Playoffs,Sat,2022-05-13,C,0-0,D"))
    d
  }

  test("header sniff: all-string schema, unnamed first column → data_id " +
      "(dags/…scores.py:164-172)") {
    val schema = SchemaInference.inferHeaderSchema(spark, csvDir)
    schema.fieldNames.toSeq shouldBe Seq("data_id", "round", "day", "date",
      "home", "score", "away")
    all(schema.fields.map(_.dataType)) shouldBe StringType
  }

  test("pandas-style 'Unnamed: 0' also normalizes to data_id") {
    SchemaInference.normalizeHeader(Seq("Unnamed: 0", "x")) shouldBe
      Seq("data_id", "x")
  }

  test("registry short-circuits the header sniff when configured") {
    val schema = SchemaInference.registryOrInfer(spark, csvDir,
      Map("e" -> Seq("a", "b")), "e")
    schema.fieldNames.toSeq shouldBe Seq("a", "b")
  }

  test("external table: schema-on-read temp view, queryable via SQL " +
      "(dags/…scores.py:174-206)") {
    val df = ExternalTable.register(spark, "bundesliga_match_scores", csvDir)
    df.count() shouldBe 2
    spark.sql("SELECT round FROM t_bundesliga_match_scores WHERE data_id = '0'")
      .head().getString(0) shouldBe "Regular Season"
    // every column is string — schema-on-read, typing deferred
    all(df.schema.fields.map(_.dataType)) shouldBe StringType
  }

  test("external table: SQL-DDL form (CREATE TABLE … USING csv LOCATION)") {
    val df = ExternalTable.registerDdl(spark, "scores_ddl", csvDir)
    df.count() shouldBe 2
    spark.sql("SELECT round FROM t_scores_ddl WHERE data_id = '1'")
      .head().getString(0) shouldBe "Playoffs"
    all(df.schema.fields.map(_.dataType)) shouldBe StringType
    spark.sql("DROP TABLE t_scores_ddl")
  }

  test("external table: JSON and ORC staging formats round-trip") {
    val d = Files.createTempDirectory("graft-fmt").toString
    val src = spark.range(5).selectExpr("id", "concat('v', id) AS v")
    src.write.mode("overwrite").json(s"$d/j")
    src.write.mode("overwrite").orc(s"$d/o")
    ExternalTable.registerJson(spark, "fmt_json", s"$d/j").count() shouldBe 5
    ExternalTable.registerOrc(spark, "fmt_orc", s"$d/o").count() shouldBe 5
    spark.sql("SELECT v FROM t_fmt_orc WHERE id = 3").head()
      .getString(0) shouldBe "v3"
  }

  test("external table: configurable delimiter (the reference's " +
      "file_delimiter, settings.txt:3) plus quote and escape dialects") {
    val d = Files.createTempDirectory("graft-dialect").toString
    // pipe-delimited, standard CSV quote-doubling: a field with the
    // delimiter inside quotes and an embedded doubled quote
    writeCsv(d, "scores.csv", Seq(
      "data_id|team|note",
      "0|A|\"has|pipe\"",
      "1|B|\"say \"\"hi\"\"\"",
      "2|C|plain"))
    val df = ExternalTable.register(spark, "dialect", d, delimiter = "|")
    df.count() shouldBe 3
    val notes = df.orderBy("data_id").collect().map(_.getString(2))
    notes shouldBe Array("has|pipe", "say \"hi\"", "plain")
  }

  test("permissive staging: malformed rows captured, not dropped or " +
      "fatal, and countable through the check report") {
    val d = Files.createTempDirectory("graft-corrupt").toString
    writeCsv(d, "landing.csv", Seq(
      "data_id,team,score",
      "0,A,3",
      "1,B,2,EXTRA,TOKENS", // too many columns → malformed
      "2,C,1",
      "3,D,0,SPILL"))       // malformed again
    // cached: Spark refuses corrupt-column-only queries on a lazy
    // CSV relation (it would need a second differently-parsed scan)
    val df = ExternalTable.registerPermissive(spark, "landing", d).cache()
    // nothing dropped: all 4 data rows present, corrupt ones flagged
    df.count() shouldBe 4
    df.schema.fieldNames should contain("_corrupt_record")
    val corrupt = df.filter(org.apache.spark.sql.functions
      .col("_corrupt_record").isNotNull)
    corrupt.count() shouldBe 2
    // raw lines preserved for quarantine/repair
    corrupt.collect().map(_.getAs[String]("_corrupt_record"))
      .toSet shouldBe Set("1,B,2,EXTRA,TOKENS", "3,D,0,SPILL")
    // …and surfaced through the fused single-pass check report
    // alongside ordinary constraints
    import graft.check._
    val results = CheckRunner.run(df,
      Seq(Malformed(), NotNull("team")))
    results.find(_.check == "malformed__corrupt_record")
      .get.violations shouldBe 2L
    // clean rows parse: the good half behaves like a normal staged read
    df.filter(org.apache.spark.sql.functions
        .col("_corrupt_record").isNull)
      .select("team").collect().map(_.getString(0))
      .sorted shouldBe Array("A", "C")
    df.unpersist()
  }

  test("file sensor: finds files that arrive before timeout; soft-fails " +
      "to empty otherwise (dags/…scores.py:54-67)") {
    val found = FileSensor.await(spark, s"$csvDir/*.csv",
      FileSensor.SensorConfig(pokeIntervalMs = 10, timeoutMs = 1000))
    found should have size 1

    val none = FileSensor.await(spark, s"$csvDir/nope-*.csv",
      FileSensor.SensorConfig(pokeIntervalMs = 10, timeoutMs = 50,
        retries = 1, softFail = true))
    none shouldBe empty

    a[java.util.concurrent.TimeoutException] should be thrownBy {
      FileSensor.await(spark, s"$csvDir/nope-*.csv",
        FileSensor.SensorConfig(pokeIntervalMs = 10, timeoutMs = 50,
          retries = 0, softFail = false))
    }
  }

  test("file sensor: sees a file that lands mid-poll") {
    val d = Files.createTempDirectory("graft-late").toString
    val t = new Thread(() => {
      Thread.sleep(150)
      writeCsv(d, "late.csv", Seq("a", "1"))
    })
    t.start()
    val found = FileSensor.await(spark, s"$d/*.csv",
      FileSensor.SensorConfig(pokeIntervalMs = 25, timeoutMs = 5000))
    t.join()
    found should have size 1
  }
}
