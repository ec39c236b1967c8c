package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Cross-witness between the BATCH first-journey funnel (q307's
  * first-anchored SQL rule) and the streaming state machine
  * (funnelProgress): whenever the SQL rule emits a user, the
  * machine's FIRST completion for that user must be the identical
  * (s1, s2, s3) triple — the machine may additionally complete users
  * whose first attempt expired and a later anchor succeeded, which
  * is exactly the set no first-anchored SQL can express.
  */
class FunnelCrossSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"
  private val SpanUs = 5L * 24 * 3600 * 1000000

  test("SQL first-journeys are exactly the machine's first " +
      "completions for those users") {
    val ev = Tables.events(spark, sfDir)
    val machine = StatefulOps
      .funnelProgress(spark, ev, "view", "click", "purchase", SpanUs)
      .collect()
      .groupBy(_.user_id)
      .map { case (u, cs) => // first completion = earliest s3 ts
        u -> cs.minBy(c => (c.s3_ts_us, c.s3_event_id))
      }

    val q = graft.queries.Registry.all
      .find(_.name == "q307_first_journey").get
    val sqlRows = q.run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    sqlRows should not be empty
    sqlRows.foreach { case (u, (a, b, c)) =>
      withClue(s"user $u:") {
        val m = machine.get(u)
        m should not be None
        (m.get.s1_event_id, m.get.s2_event_id, m.get.s3_event_id)
          .shouldBe((a, b, c))
      }
    }
  }
}
