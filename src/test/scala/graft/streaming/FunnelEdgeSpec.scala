package graft.streaming

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Edge-case contract tests for the 3-stage funnel state machine,
  * run in BATCH mode (flatMapGroupsWithState executes on a batch
  * Dataset too) with hand-crafted timestamp collisions that real
  * event data only produces occasionally.
  */
class FunnelEdgeSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def events(rows: (Long, Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .selectExpr("user_id", "timestamp_micros(ts_us) AS ts",
        "event_id", "event_type")
  }

  test("same-microsecond stages are NOT a progression") {
    val df = events(
      (1L, 1000L, 1L, "s1"), (1L, 1000L, 2L, "s2"),
      (1L, 1000L, 3L, "s3"),
      // control user: strictly increasing → completes
      (2L, 1000L, 4L, "s1"), (2L, 2000L, 5L, "s2"),
      (2L, 3000L, 6L, "s3"))
    val got = StatefulOps
      .funnelProgress(spark, df, "s1", "s2", "s3",
        maxSpanMicros = 10000L)
      .collect()
    got.map(_.user_id).toSeq shouldBe Seq(2L)
    got.head.s1_event_id shouldBe 4L
    got.head.s3_event_id shouldBe 6L
  }

  test("a same-ts s2 is skipped but a later s2 still completes") {
    val df = events(
      (1L, 1000L, 1L, "s1"),
      (1L, 1000L, 2L, "s2"), // tie — ignored
      (1L, 2000L, 3L, "s2"), // strict — accepted
      (1L, 3000L, 4L, "s3"))
    val got = StatefulOps
      .funnelProgress(spark, df, "s1", "s2", "s3",
        maxSpanMicros = 10000L)
      .collect()
    got.length shouldBe 1
    got.head.s2_event_id shouldBe 3L
  }

  test("expired progress resets and a fresh journey completes") {
    val df = events(
      (1L, 1000L, 1L, "s1"), (1L, 2000L, 2L, "s2"),
      (1L, 99999999L, 3L, "s3"), // > span from s1 — expires progress
      (1L, 100000000L, 4L, "s1"), (1L, 100000001L, 5L, "s2"),
      (1L, 100000002L, 6L, "s3"))
    val got = StatefulOps
      .funnelProgress(spark, df, "s1", "s2", "s3",
        maxSpanMicros = 10000L)
      .collect()
    got.length shouldBe 1
    got.head.s1_event_id shouldBe 4L
  }

  test("identical stage names are rejected loudly") {
    an[IllegalArgumentException] should be thrownBy
      StatefulOps.funnelProgress(spark, events(), "a", "a", "b", 10L)
  }
}
