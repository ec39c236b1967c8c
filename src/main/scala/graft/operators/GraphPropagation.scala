package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable keyed-propagation core for iterative graph scoring —
  * HITS (q191), PageRank (q192), and any fixed-iteration
  * score-diffusion over an edge list (reference analog: the
  * graph-shaped roll-ups of SURVEY §2.4 taken to their iterative
  * form; the pattern generalizes q55's label propagation).
  *
  * Scale contract, shared by every user:
  *  - One round = GATHER (edges ⋈ scores on the source key, then one
  *    keyed aggregate per target) — two keyed shuffles of the
  *    degree-bounded edge list, never an all-pairs product.
  *  - Per-node sums ride as SCALE-9 SCALED LONGS
  *    (`floor(x·10⁹ + 0.5)` → codegen long adds): order-free, so any
  *    partitioning produces bit-identical sums, and pure-IEEE
  *    quantization reproduces in any engine (DuckDB spelling
  *    `CAST(floor(x * 1000000000.0 + 0.5) AS BIGINT)`).
  *  - Normalization is MAX (L∞), not L1 — the 100 TB choice twice
  *    over: scores stay O(deg/max_deg) instead of shrinking as
  *    1/nodes (an L1-normalized corpus-scale graph quantizes every
  *    score to 0 at any fixed scale), and the normalizer is a MAX of
  *    longs, so nothing scaled is ever summed graph-wide (no
  *    overflow at any edge count).
  *  - Every O(nodes) iterate is `localCheckpoint`ed: without lineage
  *    truncation the plan tree doubles per round (the DedupClusters
  *    lesson) — driver-side planning blows up long before the data
  *    does.
  */
object GraphPropagation {

  /** Order-free scaled-long sum of a score column in [−1, 1]:
    * `Σ floor(c·10⁹ + 0.5)` as a long. */
  def sum9(c: Column): Column =
    sum(floor(c * 1000000000.0 + 0.5).cast("long"))

  /** One propagation round: gather `scoreCol` from `scores`
    * (keyed by `fromCol`) along `edges` into each `toCol` node,
    * MAX-normalize, checkpoint. Returns (`toCol`, `outCol`) with the
    * top node at exactly 1.0. Nodes with no inbound edge are absent
    * from the result (they received no mass), matching the join
    * semantics of the per-query forms.
    */
  def propagateMax(edges: DataFrame, fromCol: String, toCol: String,
      scores: DataFrame, scoreCol: String, outCol: String): DataFrame = {
    val gathered = edges.join(scores, Seq(fromCol))
      .groupBy(toCol).agg(sum9(col(scoreCol)).as("__s9"))
    val m = gathered.agg(max(col("__s9")).as("__m9"))
    gathered.crossJoin(broadcast(m))
      .select(col(toCol),
        (col("__s9").cast("double") / col("__m9")).as(outCol))
      .localCheckpoint()
  }

  /** PageRank in the UNNORMALIZED (×N) convention over a directed
    * edge list: r⁰ = 1 everywhere, then `iters` rounds of
    * `r' = (1−d) + d·Σ_in r/outdeg`, with the inbound sum as scaled
    * longs. The ×N convention is the 100 TB form of the same
    * argument as MAX-normalization: probabilities sum to 1, so
    * per-node values shrink as 1/nodes and quantize to 0 at corpus
    * scale, while ×N scores stay O(1) at any graph size (and the
    * ranking is identical). `teleport` and `damping` are passed as
    * independent literals — (1−0.85) in double arithmetic is NOT the
    * double 0.15, and an oracle spelling "0.15" would diverge.
    *
    * Dangling nodes (no outbound edge) leak their mass — the
    * standard simplification; feed a bidirected edge list (each edge
    * plus its reverse) when the graph is logically undirected and no
    * node should dangle. Nodes absent from `srcCol` entirely still
    * receive rank via the left join (floor value `1 − d`).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, teleport: Double = 0.15,
      damping: Double = 0.85): DataFrame = {
    require(iters > 0, s"iters must be positive: $iters")
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct().localCheckpoint()
    // fold the out-degree onto the edge list ONCE: each iteration's
    // gather is then a single edges ⋈ rank join with the per-edge
    // contribution (rank/outdeg) computed inline, instead of a
    // separate rank ⋈ outdeg plumbing join per round
    val edgesW = edges
      .join(edges.groupBy(srcCol).agg(count(lit(1)).as("__outdeg")),
        Seq(srcCol))
      .localCheckpoint()
    var rank = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val gathered = edgesW
        .join(rank, edgesW(srcCol) === rank("node"))
        .groupBy(dstCol)
        .agg(sum9(col("rank") / col("__outdeg")).as("__s9"))
      rank = nodes
        .join(gathered, nodes("node") === gathered(dstCol), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("__s9"), lit(0L)).cast("double") /
              lit(1000000000.0))).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
