package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class IntervalJoinSpec extends AnyFlatSpec with Matchers
    with SparkFixture {

  behavior of "IntervalJoin"

  private def ivals(s: String, e: String,
      vs: Seq[(Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    vs.toDF(s, e)
  }

  // MULTISET of overlapping row pairs: duplicate input intervals are
  // distinct rows and must each pair up (so the parity check below
  // also proves the exactly-once emission — a double-emitted pair
  // would break multiset equality)
  private def naive(ls: Seq[(Long, Long)],
      rs: Seq[(Long, Long)]): Seq[((Long, Long), (Long, Long))] =
    (for {
      a <- ls; b <- rs
      if a._1 <= b._2 && b._1 <= a._2
    } yield (a, b)).sorted

  it should "equal the naive overlap join for random intervals and " +
      "block sizes (each pair exactly once)" in {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genIval = for {
      s <- Gen.choose(-200L, 200L)
      len <- Gen.choose(0L, 60L) // zero-length (point) intervals too
    } yield (s, s + len)
    val cases = for {
      bs <- Gen.choose(1L, 100L)
      ls <- Gen.listOfN(25, genIval)
      rs <- Gen.listOfN(25, genIval)
    } yield (bs, ls, rs)
    val prop = Prop.forAll(cases) { case (bs, ls, rs) =>
      val got = IntervalJoin
        .overlaps(ivals("ls", "le", ls), ivals("rs", "re", rs),
          "ls", "le", "rs", "re", bs)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3))))
        .toSeq.sorted
      // multiset equality: no row pair missing, none duplicated
      got == naive(ls, rs)
    }
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15),
      prop).passed shouldBe true
  }

  it should "handle intervals much longer than the block size" in {
    // one long interval spanning many blocks vs many short ones:
    // sequence() covers every block, so nothing is missed
    val long = ivals("ls", "le", Seq((0L, 1000L)))
    val shorts = ivals("rs", "re",
      (0L until 20L).map(i => (i * 100L, i * 100L + 5L)))
    val got = IntervalJoin
      .overlaps(long, shorts, "ls", "le", "rs", "re", blockSize = 7L)
      .collect()
    got.length shouldBe 11 // starts 0,100,...,1000 fall inside [0,1000]
  }

  it should "fail loudly on a degenerate interval instead of " +
      "exploding the fan-out" in {
    // one year-long outlier at a tiny block size: without the guard
    // this would silently amplify into millions of rows
    val left = ivals("ls", "le", Seq((0L, 10L), (0L, 50000000L)))
    val right = ivals("rs", "re", Seq((5L, 8L)))
    val ex = intercept[Exception] {
      IntervalJoin.overlaps(left, right, "ls", "le", "rs", "re",
        blockSize = 4L, maxBlocksPerRow = 1000L).collect()
    }
    // Spark wraps the executor-side assert in a SparkException chain
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    messages(ex).mkString("\n") should include("maxBlocksPerRow")
    // the same data passes once blockSize matches the interval scale
    IntervalJoin.overlaps(left, right, "ls", "le", "rs", "re",
      blockSize = 1 << 16, maxBlocksPerRow = 1000L)
      .count() shouldBe 2L
  }

  it should "reject inputs that already carry the reserved __blk " +
      "column" in {
    val l = ivals("ls", "le", Seq((0L, 1L)))
      .withColumn("__blk", lit(9L))
    val r = ivals("rs", "re", Seq((0L, 1L)))
    an[IllegalArgumentException] should be thrownBy
      IntervalJoin.overlaps(l, r, "ls", "le", "rs", "re", 16L)
    an[IllegalArgumentException] should be thrownBy
      IntervalJoin.overlaps(r, l, "rs", "re", "ls", "le", 16L)
  }

  it should "suggest a blockSize near the typical interval length" in {
    // lengths 10 (most rows) with a few 1000-long outliers: the 0.75
    // quantile tracks the typical length, not the tail
    val df = ivals("s", "e",
      (0L until 80L).map(i => (i * 5L, i * 5L + 9L)) ++
        (0L until 5L).map(i => (i * 7L, i * 7L + 999L)))
    val bs = IntervalJoin.suggestBlockSize(df, "s", "e")
    bs should be >= 5L
    bs should be <= 40L
    // and the suggestion actually joins correctly
    val other = ivals("rs", "re", Seq((12L, 13L)))
    IntervalJoin.overlaps(df, other, "s", "e", "rs", "re", bs)
      .count() should be > 0L
  }

  it should "plan as a hash join, not a nested loop" in {
    val dir = java.nio.file.Files.createTempDirectory("ivj").toString
    val sp = spark
    import sp.implicits._
    (1L to 500L).map(i => (i, i + 10L)).toDF("ls", "le")
      .write.mode("overwrite").parquet(dir + "/l")
    (1L to 500L).map(i => (i + 3L, i + 8L)).toDF("rs", "re")
      .write.mode("overwrite").parquet(dir + "/r")
    val plan = IntervalJoin.overlaps(
      spark.read.parquet(dir + "/l"), spark.read.parquet(dir + "/r"),
      "ls", "le", "rs", "re", blockSize = 16L)
      .queryExecution.executedPlan.toString
    plan.toLowerCase should not include "nestedloop"
    plan.toLowerCase should not include "cartesian"
    plan.toLowerCase should include("join")
  }
}
