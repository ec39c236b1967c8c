package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983; the
  * distributed fixed-round form of Montresor et al., "Distributed
  * k-core decomposition", 2013): repeatedly delete every node whose
  * CURRENT degree is below k — what survives is the maximal subgraph
  * where every node keeps ≥ k neighbors, the standard "dense
  * backbone" extraction (community seeding, spam-graph trimming,
  * visualization skeletons).
  *
  * Each round is one degree hash-agg over the live edge list plus two
  * semi-join-shaped filters — all keyed on node id, partial-agg
  * map-side, no wedge enumeration anywhere (peeling is strictly
  * cheaper than the triangle pass). The live edge list shrinks
  * monotonically and is localCheckpoint'd per round, truncating
  * lineage exactly like GraphPropagation's power iterations; state is
  * O(live edges). Fixed `rounds` keeps the plan (and the generated
  * DuckDB oracle chain, q271) engine-portable; the caller verifies
  * convergence by comparing the last two round sizes — on a graph
  * where the cascade has settled they are equal, and the result IS
  * the exact k-core.
  */
object KCore {

  /** Peel `rounds` times; returns the surviving edge list (columns
    * `u`, `v`) and the edge count after each round (length
    * `rounds`, so `counts.last == counts(rounds - 2)` witnesses
    * convergence).
    */
  def peelWithCounts(edges: DataFrame, k: Int,
      rounds: Int): (DataFrame, Seq[Long]) = {
    require(k >= 1 && rounds >= 1, s"need k/rounds >= 1: $k/$rounds")
    var e = edges.select(col("u"), col("v")).localCheckpoint(eager = false)
    val counts = Seq.newBuilder[Long]
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
      val keep = deg.filter(col("dg") >= k).select("node")
      e = e
        .join(keep.select(col("node").as("u")), "u")
        .join(keep.select(col("node").as("v")), "v")
        .select("u", "v")
        .localCheckpoint(eager = false)
      counts += e.count()
    }
    (e, counts.result())
  }
}
