package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate

import graft.SparkFixture
import graft.check.{ColumnsMatchOrdered, InSet, NotNull}
import graft.ingest.FileSensor
import graft.meta.{MetaEntry, MetadataStore}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** End-to-end: the full 10-task reference DAG shape (SURVEY.md §3.1)
  * against a temp landing zone — sense → partition → metadata update →
  * read-back → staged copy → external table → validation checkpoint.
  */
class IngestPipelineSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val entity = "bundesliga_match_scores"

  private def setup(): (String, String, MetadataStore) = {
    val root = Files.createTempDirectory("graft-e2e").toString
    val landing = s"$root/landing"
    new java.io.File(landing).mkdirs()
    Files.write(java.nio.file.Paths.get(landing, s"${entity}_1.csv"),
      (Seq(",round,day,date,home,score,away",
        "0,Regular Season,Sun,2022-05-12,A,2-1,B",
        "1,Playoffs,Sat,2022-05-12,C,0-0,D",
        "2,Regular Season,Mon,2022-05-12,E,3-2,F")
        .mkString("\n")).getBytes)
    val meta = new MetadataStore(spark, s"$root/meta")
    meta.init(Seq(MetaEntry(entity, "transactional", "")))
    (root, landing, meta)
  }

  test("full pipeline run: stages, validates, updates metadata") {
    val (root, landing, meta) = setup()
    val result = IngestPipeline.run(spark, meta, PipelineConfig(
      entity = entity,
      landingGlob = s"$landing/${entity}*",
      rawRoot = s"$root/raw",
      runDate = LocalDate.of(2022, 5, 12),
      sensor = FileSensor.SensorConfig(pokeIntervalMs = 10, timeoutMs = 1000),
      checks = Seq(
        ColumnsMatchOrdered(Seq("data_id", "round", "day", "date", "home",
          "score", "away")),
        InSet("round", Seq("Regular Season", "Playoffs")),
        InSet("day", Seq("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")),
        NotNull("date"), NotNull("home"), NotNull("away"),
        NotNull("score"))))

    result.sensedFiles should have size 1
    result.partitionSuffix shouldBe "2022/may/12/"
    result.stagedCount shouldBe 3
    result.validationPassed shouldBe true
    // metadata table is the source of truth for the staged path
    meta.get(entity) shouldBe
      Some(s"transactional/$entity/2022/may/12/")
    result.metadataPath shouldBe
      s"$root/raw/transactional/transactional/$entity/2022/may/12/"
    // the external view answers SQL over the staged partition
    spark.sql(s"SELECT count(*) FROM t_$entity").head().getLong(0) shouldBe 3
  }

  test("sensor soft-fail: empty landing zone → empty result, no error " +
      "(soft_fail=True, dags/…scores.py:62)") {
    val (root, _, meta) = setup()
    val result = IngestPipeline.run(spark, meta, PipelineConfig(
      entity = entity,
      landingGlob = s"$root/empty/*.csv",
      rawRoot = s"$root/raw",
      runDate = LocalDate.of(2022, 5, 12),
      sensor = FileSensor.SensorConfig(pokeIntervalMs = 10, timeoutMs = 50,
        retries = 0)))
    result.sensedFiles shouldBe empty
    result.stagedCount shouldBe 0
  }

  test("validation catches planted violations") {
    val (root, landing, meta) = setup()
    Files.write(java.nio.file.Paths.get(landing, s"${entity}_2.csv"),
      (Seq(",round,day,date,home,score,away",
        "3,NOT A ROUND,Sun,2022-05-12,G,1-1,H").mkString("\n")).getBytes)
    val result = IngestPipeline.run(spark, meta, PipelineConfig(
      entity = entity,
      landingGlob = s"$landing/${entity}*",
      rawRoot = s"$root/raw2",
      runDate = LocalDate.of(2022, 5, 12),
      sensor = FileSensor.SensorConfig(pokeIntervalMs = 10, timeoutMs = 1000),
      checks = Seq(InSet("round", Seq("Regular Season", "Playoffs")))))
    result.validationPassed shouldBe false
    result.checkResults.head.violations shouldBe 1L
  }
}
