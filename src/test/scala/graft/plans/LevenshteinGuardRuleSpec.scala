package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class LevenshteinGuardRuleSpec extends AnyFlatSpec with Matchers
    with SparkFixture {

  behavior of "LevenshteinGuardRule"

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ LevenshteinGuardRule
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  private def pairs = {
    val s = spark
    import s.implicits._
    Seq(("kitten", "sitting"), ("flaw", "lawn"), ("abc", "abcdefgh"),
      ("same", "same"), ("a", "ab"))
      .toDF("x", "y")
  }

  it should "add the length-difference guard to the optimized plan" in
    withRule {
      // parquet-backed source: a literal relation would be constant-
      // folded away before the plan can be inspected
      val sup = graft.Tables.supplier(spark, "/root/testdata/sf0.001")
      val q = sup.as("a")
        .join(sup.as("b"), col("a.s_suppkey") < col("b.s_suppkey"))
        .filter(levenshtein(col("a.s_name"), col("b.s_name")) <= 1)
      val opt = q.queryExecution.optimizedPlan.toString
      opt.toLowerCase should include("length")
      opt.toLowerCase should include("abs")
    }

  it should "not change results" in {
    val base = pairs.filter(levenshtein(col("x"), col("y")) <= 1)
      .collect().toSet
    val guarded = withRule {
      pairs.filter(levenshtein(col("x"), col("y")) <= 1).collect().toSet
    }
    guarded shouldBe base
    // sanity: the qualifying pairs are the distance<=1 ones
    guarded.map(r => (r.getString(0), r.getString(1))) shouldBe
      Set(("same", "same"), ("a", "ab"))
  }

  it should "guard each comparison independently" in {
    // one predicate the user already guarded + one bare predicate in
    // the SAME filter: the pre-existing guard must not suppress
    // guarding of the other comparison (the old whole-condition check
    // did exactly that).
    val s = spark
    import s.implicits._
    val df = Seq(("kitten", "sitting", "mitten"))
      .toDF("x", "y", "z")
    // Matchers inherits a `length(Long)` that shadows functions.length
    val slen = org.apache.spark.sql.functions.length _
    val preGuarded =
      (abs(slen(col("x")) - slen(col("y"))) <= 1 &&
        levenshtein(col("x"), col("y")) <= 1) &&
        levenshtein(col("x"), col("z")) <= 2
    val plan = df.filter(preGuarded).queryExecution.analyzed
    val once = LevenshteinGuardRule(plan)
    import org.apache.spark.sql.catalyst.expressions._
    def guardCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Int = {
      var n = 0
      p.foreach {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.foreach {
            case LessThanOrEqual(
                  Abs(Subtract(Length(_), Length(_), _), _), _) => n += 1
            case _ => ()
          }
        case _ => ()
      }
      n
    }
    guardCount(plan) shouldBe 1
    guardCount(once) shouldBe 2 // second comparison picked up a guard
    // and the result is still a fixed point
    LevenshteinGuardRule(once) shouldBe once
  }

  it should "recognize a guard regardless of And association" in {
    // Predicate pushdown splits and recombines conjuncts LEFT-
    // associatively: And(And(other, guard), cmp) — the guard is no
    // longer the immediate left sibling of its comparison. The rule
    // must still see the comparison as guarded (else each fixed-point
    // iteration adds another duplicate guard until the iteration cap).
    val s = spark
    import s.implicits._
    val df = Seq(("kitten", "sitting", 7)).toDF("x", "y", "n")
    val slen = org.apache.spark.sql.functions.length _
    // other AND guard AND cmp — && is left-associative in Scala, so
    // this parses as And(And(other, guard), cmp)
    val cond = (col("n") > 3) &&
      (abs(slen(col("x")) - slen(col("y"))) <= 1) &&
      (levenshtein(col("x"), col("y")) <= 1)
    val plan = df.filter(cond).queryExecution.analyzed
    val once = LevenshteinGuardRule(plan)
    // already fully guarded: the rule must be a no-op, not re-wrap
    once shouldBe plan
    // and stable under a simulated fixed-point loop
    var p = plan
    (1 to 5).foreach(_ => p = LevenshteinGuardRule(p))
    p shouldBe plan
  }

  it should "reach a fixed point when other rules reassociate" in {
    // Full optimizer batch: filter mixing a levenshtein comparison
    // with other conjuncts over a join — pushdown interleaves the
    // conjuncts; the optimize run must not hit max iterations and the
    // optimized plan must carry exactly one guard per comparison.
    withRule {
      val sup = graft.Tables.supplier(spark, "/root/testdata/sf0.001")
      val q = sup.as("a")
        .join(sup.as("b"), col("a.s_suppkey") < col("b.s_suppkey"))
        .filter(levenshtein(col("a.s_name"), col("b.s_name")) <= 1 &&
          col("a.s_acctbal") > 0 && col("b.s_acctbal") > 0)
      val opt = q.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.expressions._
      var guards = 0
      opt.foreach { node =>
        node.expressions.foreach(_.foreach {
          case LessThanOrEqual(
                Abs(Subtract(Length(_), Length(_), _), _), _) => guards += 1
          case _ => ()
        })
      }
      guards shouldBe 1 // one comparison, exactly one guard, no dupes
      q.collect() // and it still executes
    }
  }

  it should "be idempotent under repeated application" in {
    val plan = pairs.filter(levenshtein(col("x"), col("y")) <= 2)
      .queryExecution.analyzed
    val once = LevenshteinGuardRule(plan)
    val twice = LevenshteinGuardRule(once)
    twice shouldBe once
  }
}
