package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q281's truncated-lookback EWMA restatement, exercised PAST the old
  * 55-row raise_error envelope (the shipped testdata spans 30 days, so
  * the oracle gate never reaches the truncation branch): a 200-day
  * synthetic series checks
  *   (a) the Spark result is bit-equal to the scaled-integer formula
  *       computed independently with BigInt (the cross-engine
  *       contract — DuckDB evaluates the same formula in HUGEINT), and
  *   (b) the truncation bound: the 55-row window value differs from
  *       the EXACT unbounded recursion e_t = ½x_t + ½e_{t−1} over the
  *       same scaled inputs c_t/100 (computed in exact BigDecimal —
  *       every intermediate is a finite decimal) by at most 2^−49
  *       relative: the dropped tail has total weight 2^−54 and is
  *       absorbed into the head row, so its error is ≤
  *       2^−54·max|x_i − x_j| (≤ 10·2^−54 here), plus two
  *       correctly-rounded double steps for the final divide — all
  *       sub-ULP for same-magnitude series.
  */
class EwmaTruncationSpec extends AnyFunSuite with SparkFixture {

  private def q281 = Registry.all.find(_.name == "q281_ewma_daily").get

  test("200-day series: bit-equal to the BigInt formula, " +
      "within 2^-50 of the exact recursion") {
    val s = spark
    import s.implicits._
    val days = 200
    // one event per day; two-decimal values so round(100·v) is the
    // exact scaled integer dsum produces
    val xs = (0 until days).map(t => ((t * 37 + 13) % 1000) / 100.0 + 1.0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ewma").toString
    xs.zipWithIndex
      .map { case (v, t) =>
        (java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(t.toLong)
            .atStartOfDay.plusHours(6)), v)
      }
      .toDF("ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = q281.run(spark, dir)
      .select("day", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == days)

    val cs = xs.map(v => BigInt(math.round(v * 100)))
    (1 to days).foreach { t =>
      val L = math.min(t, 55)
      val eScaled = (0 until math.min(55, t)).map { j =>
        cs(t - 1 - j) * BigInt(2).pow(math.max(L - 2 - j, 0))
      }.sum
      val expected =
        eScaled.toDouble / math.pow(2, (L - 1).toDouble) / 100.0
      assert(got(t - 1L) == expected,
        s"row $t: formula mismatch ${got(t - 1L)} vs $expected")
    }

    // exact unbounded recursion over the scaled inputs c/100 — every
    // intermediate is a finite decimal, so BigDecimal arithmetic is
    // exact and the only deltas left are truncation + final rounding
    def x(i: Int) = BigDecimal(cs(i)) / 100
    var e = x(0)
    val half = BigDecimal(0.5)
    (2 to days).foreach { t =>
      e = (x(t - 1) + e) * half
      val rel = ((BigDecimal(got(t - 1L)) - e) / e).abs.toDouble
      assert(rel <= math.pow(2, -49),
        s"row $t: truncation error $rel exceeds 2^-49")
    }
  }
}
