package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** GraphPropagation: the shared iterative-scoring core behind q191
  * (HITS) and q192 (PageRank) — propagation parity against a
  * brute-force in-memory computation, normalization invariants, and
  * the partition-independence the scaled-long sums guarantee.
  */
class GraphPropagationSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  import spark.implicits._

  // tiny bipartite graph: hubs 1,2,3 → auths 10,20
  private def edges = Seq(
    (1L, 10L), (1L, 20L), (2L, 10L), (3L, 20L), (3L, 10L))
    .toDF("c", "sp")

  test("propagateMax matches the brute-force gather + max-normalize") {
    val hub = edges.select("c").distinct().withColumn("hub", lit(1.0))
    val auth = GraphPropagation
      .propagateMax(edges, "c", "sp", hub, "hub", "auth")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // arrivals: 10 ← {1,2,3} = 3, 20 ← {1,3} = 2; max = 3
    auth(10L) shouldBe 1.0
    auth(20L) shouldBe (2.0 / 3.0) +- 1e-9
  }

  test("propagateMax tops out at exactly 1.0 and is in (0, 1]") {
    val hub = edges.select("c").distinct()
      .withColumn("hub", (col("c") * 0.25).cast("double"))
    val auth = GraphPropagation
      .propagateMax(edges, "c", "sp", hub, "hub", "auth")
      .collect().map(_.getDouble(1))
    auth.max shouldBe 1.0
    all(auth) should be > 0.0
  }

  test("propagateMax is partition-order independent (scaled-long sums)") {
    val hub = edges.select("c").distinct()
      .withColumn("hub", (lit(1.0) / (col("c") + 1)).cast("double"))
    def run(parts: Int): Map[Long, Double] = GraphPropagation
      .propagateMax(edges.repartition(parts), "c", "sp",
        hub, "hub", "auth")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    run(1) shouldBe run(7)
  }

  test("hits equals the unfused propagateMax loop bit-exactly " +
      "(the exchange reuse is plan-only)") {
    val (hub, auth) = GraphPropagation.hits(edges, "c", "sp", iters = 3)
    val e = edges.localCheckpoint()
    var hub2 = e.select("c").distinct().withColumn("hub", lit(1.0))
    var auth2: org.apache.spark.sql.DataFrame = null
    for (_ <- 1 to 3) {
      auth2 = GraphPropagation.propagateMax(e, "c", "sp", hub2, "hub", "auth")
      hub2 = GraphPropagation.propagateMax(e, "sp", "c", auth2, "auth", "hub")
    }
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m(auth) shouldBe m(auth2)
    m(hub) shouldBe m(hub2)
  }

  test("pageRank on a symmetric pair converges to equal O(1) ranks") {
    // two nodes, one bidirected edge: perfect symmetry — both ranks
    // equal and, in the ×N convention, exactly 0.15 + 0.85·r (r = 1
    // fixed point → 1.0)
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphPropagation.pageRank(e, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(1L) shouldBe r(2L)
    r(1L) shouldBe 1.0 +- 1e-6
  }

  test("pageRank: inbound-heavy node outranks leaves; ×N scores are O(1)") {
    // star: leaves 2..5 ↔ center 1 (bidirected)
    val leaves = (2L to 5L)
    val e = (leaves.map(l => (l, 1L)) ++ leaves.map(l => (1L, l)))
      .toDF("src", "dst")
    val r = GraphPropagation.pageRank(e, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(1L) should be > r(2L)
    // leaves are symmetric
    r(2L) shouldBe r(5L)
    // ×N convention: total rank ≈ node count, no 1/N shrink
    r.values.sum shouldBe 5.0 +- 0.2
  }

  test("pageRank: node with inbound but no outbound still gets rank " +
      "(left-join floor + gathered mass)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val r = GraphPropagation.pageRank(e, "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // node 4 dangles (no outbound): it receives teleport + its share
    // of 1's mass, and its own mass leaks (documented semantics)
    r(4L) should be > 0.15
    r.keySet shouldBe Set(1L, 2L, 3L, 4L)
  }

  private def baseEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 1L)).toDF("src", "dst")
  // delta brings a NEW node (5), new edges for EXISTING srcs (so
  // their outdeg changes and their folded rows must refresh), and
  // leaves src 3 untouched (its folded rows must pass through)
  private def deltaEdges = Seq(
    (5L, 1L), (1L, 5L), (2L, 4L)).toDF("src", "dst")

  test("pageRankDelta (cold seed) is bit-exact with full recompute " +
      "on the merged edge list") {
    val full = GraphPropagation
      .pageRank(baseEdges.unionByName(deltaEdges), "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val st0 = GraphPropagation.pageRankInit(baseEdges, "src", "dst",
      iters = 1)
    val st1 = GraphPropagation.pageRankDelta(st0, deltaEdges,
      "src", "dst", iters = 3, warmStart = false)
    val inc = st1.rank
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // scaled-long sums are order-free, so the incremental structure
    // must reproduce the full rebuild EXACTLY (doubles bit-equal)
    inc shouldBe full
  }

  test("pageRankDelta with broadcastAffected=false (the huge-backlog " +
      "path) is bit-exact with the broadcast form") {
    val full = GraphPropagation
      .pageRank(baseEdges.unionByName(deltaEdges), "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val st1 = GraphPropagation.pageRankDelta(
      GraphPropagation.pageRankInit(baseEdges, "src", "dst", iters = 1),
      deltaEdges, "src", "dst", iters = 2, warmStart = false,
      broadcastAffected = false)
    val inc = st1.rank
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    inc shouldBe full
  }

  test("pageRankDelta maintains outdeg and the folded edge list " +
      "incrementally without loss (structure parity)") {
    val merged = baseEdges.unionByName(deltaEdges)
    val st1 = GraphPropagation.pageRankDelta(
      GraphPropagation.pageRankInit(baseEdges, "src", "dst", iters = 1),
      deltaEdges, "src", "dst", iters = 1)
    val gotDeg = st1.outdeg.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantDeg = merged.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotDeg shouldBe wantDeg
    val gotEdges = st1.edgesW.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wantEdges = merged
      .join(merged.groupBy("src").agg(count(lit(1)).as("__outdeg")),
        Seq("src"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    gotEdges shouldBe wantEdges
  }

  test("pageRankDelta with retractions (cold seed) is bit-exact with " +
      "full recompute on the reduced edge list") {
    // retract one of src 1's two base edges (outdeg must drop 2→1),
    // BOTH of node 4's edges (degree hits 0 → node must vanish), and
    // add edges in the same epoch — the mixed add+retract epoch
    val retract = Seq((1L, 4L), (4L, 1L)).toDF("src", "dst")
    val adds = deltaEdges.filter(col("src") =!= 4L && col("dst") =!= 4L)
    val reduced = baseEdges.exceptAll(retract).unionByName(adds)
    val full = GraphPropagation
      .pageRank(reduced, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val st0 = GraphPropagation.pageRankInit(baseEdges, "src", "dst",
      iters = 1)
    val st1 = GraphPropagation.pageRankDelta(st0, adds,
      "src", "dst", iters = 3, warmStart = false,
      retractions = Some(retract))
    val inc = st1.rank
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    inc shouldBe full
    inc.keySet should not contain 4L
    // structure parity on the retracted epoch too
    val gotDeg = st1.outdeg.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantDeg = reduced.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotDeg shouldBe wantDeg
    st1.nodes.collect().map(_.getLong(0)).toSet shouldBe
      (full.keySet)
  }

  test("pageRankDelta retractions: duplicate edges retract one " +
      "occurrence per retraction row (count-wise exceptAll)") {
    // src 7 has the edge (7,8) TWICE; retracting it once must leave
    // one occurrence (outdeg 2→1), not zero
    val base = Seq((7L, 8L), (7L, 8L), (8L, 7L)).toDF("src", "dst")
    val st0 = GraphPropagation.pageRankInit(base, "src", "dst",
      iters = 1)
    val st1 = GraphPropagation.pageRankDelta(st0,
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst",
      iters = 2, warmStart = false,
      retractions = Some(Seq((7L, 8L)).toDF("src", "dst")))
    val full = GraphPropagation.pageRank(
        Seq((7L, 8L), (8L, 7L)).toDF("src", "dst"), "src", "dst",
        iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    st1.rank.collect().map(x => x.getLong(0) -> x.getDouble(1))
      .toMap shouldBe full
    st1.outdeg.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap shouldBe Map(7L -> 1L, 8L -> 1L)
  }

  test("pageRankDelta warm start keeps the full node set and holds " +
      "the symmetric fixed point") {
    // converged symmetric pair, then a second disjoint symmetric pair
    // arrives: warm start must keep 1,2 at the 1.0 fixed point and
    // bring 3,4 to the same value (their subgraph is identical)
    val st0 = GraphPropagation.pageRankInit(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst",
      iters = 5)
    val st1 = GraphPropagation.pageRankDelta(st0,
      Seq((3L, 4L), (4L, 3L)).toDF("src", "dst"), "src", "dst",
      iters = 5)
    val r = st1.rank
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.keySet shouldBe Set(1L, 2L, 3L, 4L)
    r(1L) shouldBe 1.0 +- 1e-6
    r(3L) shouldBe 1.0 +- 1e-6
    r(2L) shouldBe r(1L)
    r(4L) shouldBe r(3L)
  }

  test("personalizedPageRank confines restart mass to the seeds and " +
      "decays with hop distance") {
    // bidirected path 1–2–3–4, seed {1}, one iteration: only the
    // seed keeps its teleport floor, only its neighbor receives mass
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val r = GraphPropagation
      .personalizedPageRank(path, "src", "dst", Seq(1L), iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(1L) shouldBe 0.15 // teleport floor only (neighbor started at 0)
    r(2L) shouldBe 0.85 // seed's full mass (outdeg(1) = 1)
    r(3L) shouldBe 0.0
    r(4L) shouldBe 0.0
  }

  test("personalizedPageRank with seeds = all nodes equals pageRank") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L),
      (2L, 1L)).toDF("src", "dst")
    val ppr = GraphPropagation
      .personalizedPageRank(g, "src", "dst", Seq(1L, 2L, 3L),
        iters = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val pr = GraphPropagation.pageRank(g, "src", "dst", iters = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    ppr shouldBe pr // bit-exact: same scaled-long gathers throughout
  }

  /** In-memory reference for synchronous label propagation with the
    * operator's exact tie rule: every node adopts the most frequent
    * PREVIOUS-round label among its neighbors, ties to the smallest
    * label.
    */
  private def bruteLabelProp(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = nbrs.map { case (n, ms) =>
        val votes = ms.map(lbl).groupBy(identity)
          .map { case (l, occ) => l -> occ.size.toLong }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def runLabelProp(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] =
    GraphPropagation
      .labelPropagation(edges.toDF("u", "v"), "u", "v", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation finds the two triangle communities across " +
      "a bridge (brute-force parity)") {
    // two triangles joined by one bridge edge: community detection
    // must NOT merge them (connected components would — the q299
    // over-merge) — each triangle converges to its own minimum label
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    for (rounds <- 1 to 4) {
      runLabelProp(g, rounds) shouldBe bruteLabelProp(g, rounds)
    }
    val converged = runLabelProp(g, 4)
    converged(1L) shouldBe converged(2L)
    converged(2L) shouldBe converged(3L)
    converged(10L) shouldBe converged(11L)
    converged(11L) shouldBe converged(12L)
    converged(1L) should not be converged(10L)
  }

  test("labelPropagation matches brute force on a random graph, " +
      "independent of partitioning") {
    val rnd = new scala.util.Random(42)
    val nodes = 30
    val g = Seq.tabulate(70) { _ =>
      val u = rnd.nextInt(nodes).toLong
      val v = rnd.nextInt(nodes).toLong
      (u, if (v == u) (v + 1) % nodes else v)
    }.distinct
    val expected = bruteLabelProp(g, 3)
    runLabelProp(g, 3) shouldBe expected
    GraphPropagation
      .labelPropagation(g.toDF("u", "v").repartition(7), "u", "v", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap shouldBe expected
  }
}
