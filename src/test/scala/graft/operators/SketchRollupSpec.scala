package graft.operators

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SketchRollup contract: merged daily sketches give the SAME
  * estimate as sketching the raw union (merge consistency — the
  * property that makes pre-aggregation safe), and estimates stay
  * inside the HLL error band vs exact distinct counts.
  */
class SketchRollupSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("weekly rollup of daily sketches equals sketching raw events") {
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"),
        weekofyear(col("ts")).as("week"), col("user_id"))

    val daily = SketchRollup.build(ev, "user_id",
      Seq("day", "week"))
    val weeklyFromDaily = SketchRollup.rollup(daily, Seq("week"))
      .select("week", "n_distinct_est")

    val weeklyDirect = ev.groupBy("week")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12))
        .cast("long").as("n_direct"))

    val joined = weeklyFromDaily.join(weeklyDirect, "week").collect()
    joined should not be empty
    joined.foreach { r =>
      withClue(s"week ${r.get(0)}:") {
        r.getAs[Long]("n_distinct_est") shouldBe r.getAs[Long]("n_direct")
      }
    }
  }

  test("estimates stay within the HLL error band of exact counts") {
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = SketchRollup.build(ev, "user_id", Seq("day"))
    val est = SketchRollup.rollup(daily, Seq("day"))
      .select("day", "n_distinct_est")
    val exact = ev.groupBy("day")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val rows = est.join(exact, "day").collect()
    rows should not be empty
    rows.foreach { r =>
      val e = r.getAs[Long]("n_distinct_est").toDouble
      val x = r.getAs[Long]("n_exact").toDouble
      withClue(s"day ${r.get(0)} est=$e exact=$x:") {
        math.abs(e - x) / x should be <= 0.05
      }
    }
  }

  test("a global rollup merges every daily cell to one estimate") {
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = SketchRollup.build(ev, "user_id", Seq("day"))
    val all = SketchRollup.rollup(daily.withColumn("one", lit(1)),
      Seq("one"))
    val est = all.select("n_distinct_est").head().getLong(0).toDouble
    val exact = ev.select("user_id").distinct().count().toDouble
    math.abs(est - exact) / exact should be <= 0.05
  }
}
