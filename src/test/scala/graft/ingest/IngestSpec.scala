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
