package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Randomized parity tests: the distributed operators must equal a
  * trivially-correct driver-side reference implementation on random
  * inputs — the class of bugs hand-picked fixtures miss (tie
  * ordering, empty groups, chains vs cliques).
  */
class ParityPropSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("AsOfJoin equals a naive per-row scan on random event sets") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      // duplicate timestamps across sides are deliberate: exercises
      // the >= tie rule; right-side times are unique per (key, t) so
      // the naive argmax is well-defined
      val left = Seq.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(50).toLong))
      val right = Random.shuffle(
        (for (k <- 0 to 2; t <- 0 to 49) yield (k.toLong, t.toLong))
          .toList).take(40)
        .map { case (k, t) => (k, t, s"v$k-$t") }

      val got = AsOfJoin.asOf(
          left.toDF("k", "t"), right.toDF("k", "t", "v"),
          "k", "t", "t", Map("v" -> "v"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2)))
        .sortBy(x => (x._1, x._2, String.valueOf(x._3)))

      val expected = left.map { case (k, t) =>
        val prior = right.filter(r => r._1 == k && r._2 <= t)
        val v = if (prior.isEmpty) null else prior.maxBy(_._2)._3
        (k, t, v)
      }.sortBy(x => (x._1, x._2, String.valueOf(x._3)))

      withClue(s"seed $seed:") { got.toList shouldBe expected.toList }
    }
  }

  test("DedupClusters.components equals driver-side union-find on " +
      "random graphs") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val pairs = Seq.fill(40) {
        val a = rnd.nextInt(30).toLong
        val b = rnd.nextInt(30).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct

      val got = graft.llm.DedupClusters
        .components(pairs.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // canonical label = min member id of the component
      val byRoot = nodes.groupBy(find)
      val expected = byRoot.values.flatMap { members =>
        val label = members.min
        members.map(_ -> label)
      }.toMap

      withClue(s"seed $seed:") { got shouldBe expected }
    }
  }

  test("DedupClusters.componentsUnrolled(rounds >= diameter) equals " +
      "the converged components on random graphs") {
    // q55's declared shape uses the fixed-round unrolled form (so a
    // SQL oracle can reproduce it); its correctness assumption is
    // rounds >= the largest component diameter. Spec-back that claim
    // instead of leaning on testdata geometry: random sparse graphs
    // PLUS a chain (the worst case per node count) must agree with the
    // convergence-checked form when rounds = node count (>= diameter).
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(100 + seed)
      val n = 12
      val chain = (0L until 7L).map(i => (i, i + 1)) // diameter-7 path
      val rand = Seq.fill(8) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      val pairs = (chain ++ rand).distinct.toDF("a_id", "b_id")

      val exact = graft.llm.DedupClusters.components(pairs, maxIters = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val unrolled = graft.llm.DedupClusters
        .componentsUnrolled(pairs, rounds = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed $seed:") { unrolled shouldBe exact }
    }

    // and the assumption is real: under-unrolling a deep chain stops
    // short of the converged labels
    val deep = (0L until 10L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val under = graft.llm.DedupClusters.componentsUnrolled(deep, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graft.llm.DedupClusters.components(deep, maxIters = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    under should not equal full
    full.values.toSet shouldBe Set(0L) // one path component, min id 0
  }

  test("GroupedTopK equals driver-side sort-take on random inputs") {
    val s = spark
    import s.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      // Few distinct values → heavy ties; the id tie-break decides.
      val rows = Seq.fill(400)((s"g${rnd.nextInt(6)}",
        rnd.nextInt(5).toDouble, rnd.nextLong()))
      val k = 1 + rnd.nextInt(5)
      val got = graft.plans.GroupedTopK.of(
          rows.toDF("g", "v", "id").repartition(7),
          Seq("g"), Seq(col("v").desc, col("id").asc), k)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(x => (x._1, -x._2, x._3))
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(x => (-x._2, x._3)).take(k)
      }.sortBy(x => (x._1, -x._2, x._3))
      withClue(s"seed $seed, k=$k:") { got.toList shouldBe expected.toList }
    }
  }
}
