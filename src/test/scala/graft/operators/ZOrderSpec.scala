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

  it should "map NULL keys to the origin corner by default and to " +
      "nullsTo when supplied (deliberate, not greatest()-skipping)" in {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (null, 5L), (3L, null), (null, null), (3L, 5L))
      .toDF("x", "y")
    val zs = df.select(
      ZOrder.zValue(Seq(col("x"), col("y")), bits = 4).as("z0"),
      ZOrder.zValue(Seq(col("x"), col("y")), bits = 4, nullsTo = 15L)
        .as("zTop"))
      .collect()
    val ref = Seq((0L, 5L), (3L, 0L), (0L, 0L), (3L, 5L))
      .map(p => mortonRef(Seq(p._1, p._2), 4))
    val refTop = Seq((15L, 5L), (3L, 15L), (15L, 15L), (3L, 5L))
      .map(p => mortonRef(Seq(p._1, p._2), 4))
    zs.map(_.getLong(0)).toSeq shouldBe ref
    zs.map(_.getLong(1)).toSeq shouldBe refTop
    an[IllegalArgumentException] should be thrownBy
      ZOrder.zValue(Seq(col("x")), bits = 4, nullsTo = 16L)
  }

  it should "shrink per-FILE parquet footer min/max rectangles vs an " +
      "unclustered write (the actual skipping evidence)" in {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val pts = Seq.fill(20000)(
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)).toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zfiles").toString
    // unclustered: round-robin partitions — every file spans ~the full
    // key range in both dimensions
    pts.repartition(8).write.mode("overwrite").parquet(s"$base/plain")
    ZOrder.clusterByZ(pts, Seq("x", "y"), bits = 8, numPartitions = 8)
      .write.mode("overwrite").parquet(s"$base/z")

    // per-file column min/max straight from the parquet FOOTERS —
    // exactly the stats a scan's file/row-group skipping reads
    def footerRects(dir: String): Seq[(Long, Long, Long, Long)] = {
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq
      files.map { p =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
        try {
          val blocks = rd.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          def minMax(name: String): (Long, Long) = {
            val stats = blocks.asScala.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == name).map(_.getStatistics)
            (stats.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
              stats.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
          }
          val (xmin, xmax) = minMax("x"); val (ymin, ymax) = minMax("y")
          (xmin, xmax, ymin, ymax)
        } finally rd.close()
      }
    }
    def avgArea(rects: Seq[(Long, Long, Long, Long)]): Double =
      rects.map { case (x0, x1, y0, y1) =>
        (x1 - x0 + 1).toDouble * (y1 - y0 + 1).toDouble
      }.sum / rects.length

    val plain = footerRects(s"$base/plain")
    val z = footerRects(s"$base/z")
    plain.length shouldBe 8
    z.length shouldBe 8
    // random files each cover ~the whole 256×256 square; z-files cover
    // small rectangles — require at least a 4× average-area shrink
    // (measured ~8×; the bound leaves sampler slack)
    avgArea(z) should be < avgArea(plain) / 4.0
    // skipping a point predicate: only a minority of z-files can
    // contain (x=7, y=7); every unclustered file can
    val hit = (r: (Long, Long, Long, Long)) =>
      r._1 <= 7 && 7 <= r._2 && r._3 <= 7 && 7 <= r._4
    plain.count(hit) shouldBe 8
    z.count(hit) should be <= 2
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
