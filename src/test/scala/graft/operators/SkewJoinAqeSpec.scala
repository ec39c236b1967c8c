package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** AQE skew-join contract: the runtime re-plan the 100 TB design
  * leans on for residual skew (SkewJoin.scala's salting handles the
  * KNOWN hot keys; AQE splits whatever is discovered at run time).
  * This pins the config actually working in this Spark version: a
  * deliberately skewed shuffle join must come out of AQE with its
  * skewed partition split (`skew=true` in the final plan) and the
  * same result rows.
  */
class SkewJoinAqeSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the synthetic skew qualifies
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a shuffle join — a broadcast join has no skew to split
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // one hot key carrying ~99% of the left side
      val left = ((1L to 60000L).map(i => (0L, i)) ++
        (1L to 500L).map(i => (i % 50 + 1, i))).toDF("k", "payload")
      val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k")

      // collect() executes THIS queryExecution (count() would build
      // its own), so the adaptive plan below is the final one
      joined.collect().length shouldBe 60500
      val finalPlan = joined.queryExecution.executedPlan.toString
      withClue(finalPlan.take(4000)) {
        finalPlan should include("skew=true")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
