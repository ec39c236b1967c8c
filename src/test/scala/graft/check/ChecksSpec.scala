package graft.check

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ChecksSpec extends AnyFunSuite with SparkFixture with Matchers {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      ("Regular Season", "Sun", Some("2022-05-12"), 10),
      ("Regular Season", "Mon", None, 20),
      ("Playoffs", "Funday", Some("2022-05-13"), -5),
      ("Regular Season", "Sat", Some("2022-05-14"), 10)
    ).toDF("round", "day", "date", "attendance")
  }

  test("NotNull counts null rows") {
    val r = CheckRunner.run(df, Seq(NotNull("date")))
    r.head.violations shouldBe 1L
    r.head.passed shouldBe false
  }

  test("InSet counts out-of-set rows (GE expectation shape)") {
    val days = Seq("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat")
    val r = CheckRunner.run(df, Seq(InSet("day", days)))
    r.head.violations shouldBe 1L
  }

  test("NonNegative and Unique evaluate in the same pass") {
    val r = CheckRunner.run(df,
      Seq(NonNegative("attendance"), Unique(Seq("attendance"))))
    r.map(_.violations) shouldBe Seq(1L, 1L) // one negative; 10 duplicated
  }

  test("Between counts out-of-range rows inclusively, null violates") {
    val r = CheckRunner.run(df, Seq(Between("attendance", 0, 15)))
    r.head.violations shouldBe 2L // -5 below, 20 above; 10s pass inclusive
  }

  test("duplicate check ids are rejected up front") {
    val dup = Seq(InSet("day", Seq("Sun")), InSet("day", Seq("Mon")))
    an[IllegalArgumentException] should be thrownBy CheckRunner.run(df, dup)
    an[IllegalArgumentException] should be thrownBy CheckRunner.reportDf(df, dup)
  }

  test("ColumnsMatchOrdered is metadata-only") {
    val ok = CheckRunner.run(df,
      Seq(ColumnsMatchOrdered(Seq("round", "day", "date", "attendance"))))
    ok.head.passed shouldBe true
    val bad = CheckRunner.run(df,
      Seq(ColumnsMatchOrdered(Seq("day", "round", "date", "attendance"))))
    bad.head.passed shouldBe false
  }

  test("observed metrics: suite evaluated during the write action, " +
      "matching the standalone pass") {
    val suite: Seq[Check] = Seq(
      NotNull("date"),
      InSet("round", Seq("Regular Season", "Playoffs")),
      NonNegative("attendance"),
      Unique(Seq("round", "day")))
    val (instrumented, obs) = CheckRunner.observed(df, suite)
    // the action that would materialize the table IS the validation scan
    instrumented.write.format("noop").mode("overwrite").save()
    val inflight = CheckRunner.observedResults(obs, suite)
    val standalone = CheckRunner.run(df, suite)
    inflight.map(_.check) shouldBe standalone.map(_.check)
    // row checks match exactly; Unique is exact here too (4 rows is
    // far inside approx_count_distinct's exact-when-small regime)
    inflight.map(_.violations) shouldBe standalone.map(_.violations)
  }

  test("full suite: results keep declaration order; success aggregates") {
    val suite: Seq[Check] = Seq(
      ColumnsMatchOrdered(Seq("round", "day", "date", "attendance")),
      InSet("round", Seq("Regular Season", "Playoffs")),
      NotNull("date"),
      Unique(Seq("round", "day")))
    val r = CheckRunner.run(df, suite)
    r.map(_.check) shouldBe Seq("columns_match_ordered", "inset_round",
      "notnull_date", "unique_round_day")
    r.map(_.violations) shouldBe Seq(0L, 0L, 1L, 0L)
    CheckRunner.success(r) shouldBe false
  }
}
