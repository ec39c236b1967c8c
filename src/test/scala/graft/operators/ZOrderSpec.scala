package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class ZOrderSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "ZOrder"

  // driver-side reference Morton encoder (same clamp semantics)
  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    val cap = (1L << bits) - 1
    var z = 0L
    for (i <- xs.indices; b <- 0 until bits) {
      val v = math.min(math.max(xs(i), 0L), cap)
      z |= ((v >> b) & 1L) << (b * xs.length + i)
    }
    z
  }

  it should "match the reference Morton encoding on random keys " +
      "(including clamped out-of-range values)" in {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // mix in-range, negative, and overflowing values to hit the clamps
    val rows = Seq.fill(300)((
      rnd.nextInt(1 << 18).toLong - (1 << 16),
      rnd.nextInt(1 << 18).toLong - (1 << 16)))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zValue(Seq(col("x"), col("y")), bits = 16).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      withClue(s"($x, $y):") {
        got((x, y)) shouldBe mortonRef(Seq(x, y), 16)
      }
    }
  }

  it should "interleave three columns without bit collisions" in {
    val s = spark
    import s.implicits._
    val rows = for (x <- 0L to 7L; y <- 0L to 7L; w <- 0L to 7L)
      yield (x, y, w)
    val zs = rows.toDF("x", "y", "w")
      .select(ZOrder.zValue(
        Seq(col("x"), col("y"), col("w")), bits = 3).as("z"))
      .collect().map(_.getLong(0))
    // a Morton code over 3×3 bits is a bijection on the 512-cell cube
    zs.distinct.length shouldBe 512
    zs.min shouldBe 0L
    zs.max shouldBe 511L
  }

  it should "cluster a grid so every partition covers a small " +
      "rectangle in BOTH dimensions (the file-skipping property)" in {
    val s = spark
    import s.implicits._
    // 64×64 grid, one row per cell, clustered into 16 partitions:
    // a single-column range layout would give each partition the full
    // 0..63 span of the OTHER column; z-clustering bounds both.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val clustered = ZOrder.clusterByZ(grid, Seq("x", "y"), bits = 6,
      numPartitions = 16)
    val spans = clustered
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("rows"),
        (max("x") - min("x")).as("xspan"),
        (max("y") - min("y")).as("yspan"))
      .collect()
    spans.length shouldBe 16
    spans.foreach { r =>
      // ideal: 16 z-contiguous blocks of a 64×64 grid are 16×16 tiles
      // (span 15); the range sampler's boundaries are approximate, so
      // a partition may straddle up to ~3 tiles (span 47). A
      // single-column layout would put the full 63 span on one axis.
      withClue(s"partition ${r.get(0)}:") {
        r.getLong(2) should be <= 47L
        r.getLong(3) should be <= 47L
      }
    }
    // and nothing was lost or duplicated by the relayout
    clustered.count() shouldBe 64L * 64L
  }
}
