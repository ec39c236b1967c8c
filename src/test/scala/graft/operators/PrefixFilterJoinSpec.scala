package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** The exactness claim is the whole point of PrefixFilterJoin: the
  * pruned path must return EXACTLY the all-pairs result — any pair it
  * loses is a recall bug the green oracle row can't distinguish from
  * data that simply has no such pair. Random corpora with a small
  * alphabet force heavy element sharing (the regime where pruning is
  * most aggressive) plus singleton and disjoint sets.
  */
class PrefixFilterJoinSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def naive(sets: Map[Long, Set[String]], tau: Double) =
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if union > 0 && inter.toDouble / union >= tau
    } yield (a, b, inter.toLong, sets(a).size.toLong, sets(b).size.toLong))
      .toList.sortBy(t => (t._1, t._2))

  test("prefix-filtered Jaccard join equals naive all-pairs on random " +
      "corpora (recall is exact)") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 4; (tn, td) <- Seq((1, 2), (7, 10), (4, 5))) {
      val rnd = new Random(seed)
      val alphabet = ('a' to 'p').map(_.toString)
      val sets: Map[Long, Set[String]] =
        (0L until 30L).map { id =>
          val n = 1 + rnd.nextInt(8)
          id -> Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).toSet
        }.toMap
      val elems = sets.toSeq
        .flatMap { case (id, es) => es.map(id -> _) }
        .toDF("id", "elem")

      val got = PrefixFilterJoin
        .jaccardSelfJoin(elems, "id", "elem", tn, td)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toList.sortBy(t => (t._1, t._2))

      withClue(s"seed=$seed tau=$tn/$td:") {
        got shouldBe naive(sets, tn.toDouble / td)
      }
    }
  }

  test("tau = 1 reduces to exact set equality pairs") {
    val s = spark
    import s.implicits._
    val elems = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"))
      .toDF("id", "elem")
    val got = PrefixFilterJoin.jaccardSelfJoin(elems, "id", "elem", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    got shouldBe List((1L, 2L))
  }

  test("duplicate (id, elem) input rows are deduplicated, not " +
      "counted into df and set sizes") {
    val s = spark
    import s.implicits._
    val clean = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"), (2L, "w"))
      .toDF("id", "elem")
    // same sets with heavy duplication: Jaccard must not change
    // (pre-fix, duplicates inflated __df/__m while array_intersect
    // deduped, skewing the reported similarity)
    val dup = clean.unionAll(clean).unionAll(
      Seq((1L, "x"), (2L, "y")).toDF("id", "elem"))
    def run(df: org.apache.spark.sql.DataFrame) =
      PrefixFilterJoin.jaccardSelfJoin(df, "id", "elem", 1, 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, t._2)).toList
    run(dup) shouldBe run(clean)
    run(clean).nonEmpty shouldBe true
  }

  test("rejects a degenerate threshold") {
    val s = spark
    import s.implicits._
    val elems = Seq((1L, "x")).toDF("id", "elem")
    an[IllegalArgumentException] should be thrownBy
      PrefixFilterJoin.jaccardSelfJoin(elems, "id", "elem", 3, 2)
  }
}
