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
