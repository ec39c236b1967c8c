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
  *    longs, so nothing scaled is ever summed graph-wide. The only
  *    remaining sums are per-node inbound gathers, bounded by
  *    2⁶³/10⁹ ≈ 9.2·10⁹ of inbound mass per node — a super-node with
  *    more than ~9·10⁹ unit-score inbound edges (or an O(N)-rank hub
  *    in the ×N PageRank convention on a hub-dominated graph) would
  *    overflow its gather; callers at that extreme should pre-cap
  *    hub contributions or lower the quantizer scale.
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
    pageRankIterate(nodes, edgesW, srcCol, dstCol,
      nodes.withColumn("rank", lit(1.0)), iters, teleport, damping)
  }

  /** The PageRank iteration body from an explicit starting rank —
    * shared by [[pageRank]] (cold start, rank⁰ = 1) and
    * [[pageRankDelta]] (warm start from the previous epoch's rank).
    * `edgesW` must carry `__outdeg` folded on (the [[pageRank]] /
    * [[PageRankState]] invariant).
    */
  def pageRankIterate(nodes: DataFrame, edgesW: DataFrame,
      srcCol: String, dstCol: String, rank0: DataFrame, iters: Int,
      teleport: Double, damping: Double): DataFrame = {
    require(iters > 0, s"iters must be positive: $iters")
    var rank = rank0
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

  /** Incremental PageRank state: the folded edge list (src, dst,
    * `__outdeg`), the per-src out-degree table, the node set, and the
    * latest rank — everything the next delta epoch needs, so nothing
    * is rebuilt from the full history. Build the first epoch with
    * [[pageRankInit]], refresh with [[pageRankDelta]].
    */
  final case class PageRankState(edgesW: DataFrame, outdeg: DataFrame,
      nodes: DataFrame, rank: DataFrame)

  /** Cold-start epoch 0 of the incremental form: same math as
    * [[pageRank]], returning the state the delta epochs fold into.
    */
  def pageRankInit(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, teleport: Double = 0.15,
      damping: Double = 0.85): PageRankState = {
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct().localCheckpoint()
    val outdeg = edges.groupBy(srcCol)
      .agg(count(lit(1)).as("__outdeg")).localCheckpoint()
    val edgesW = edges.join(outdeg, Seq(srcCol)).localCheckpoint()
    val rank = pageRankIterate(nodes, edgesW, srcCol, dstCol,
      nodes.withColumn("rank", lit(1.0)), iters, teleport, damping)
    PageRankState(edgesW, outdeg, nodes, rank)
  }

  /** Delta epoch: edges arrived — refresh the scores WITHOUT
    * recomputing structure from the full history. The out-degree
    * table merges incrementally (old counts + delta counts, the
    * q175 partial-fold pattern: the full edge list is never
    * re-aggregated); only edges whose src appears in the delta have
    * their folded `__outdeg` refreshed (an |affected-srcs| semi/anti
    * split of the old folded list — untouched rows pass through
    * byte-for-byte); the node set extends by the delta's new nodes
    * only. At 100 TB the delta epoch therefore touches
    * O(|delta| · avg-degree) rows of structure, not O(|edges|).
    *
    * `warmStart = true` (the production default) seeds the iteration
    * with the previous epoch's rank — new nodes enter at the 1.0
    * cold-start value — so a converged score refreshes in 1–2
    * rounds instead of a full cold ladder. `warmStart = false` seeds
    * every node at 1.0, which makes the delta path EXACTLY
    * reproduce `pageRank(old ∪ delta, iters)` — scaled-long sums are
    * order-free, so the parity is bit-exact (the spec's contract),
    * proving the incremental structure maintenance lossless.
    */
  def pageRankDelta(state: PageRankState, edgeDelta: DataFrame,
      srcCol: String, dstCol: String, iters: Int,
      teleport: Double = 0.15, damping: Double = 0.85,
      warmStart: Boolean = true,
      broadcastAffected: Boolean = true): PageRankState = {
    val dDeg = edgeDelta.groupBy(srcCol)
      .agg(count(lit(1)).as("__ddeg"))
    val outdegNew = state.outdeg
      .join(dDeg, Seq(srcCol), "full_outer")
      .select(col(srcCol),
        (coalesce(col("__outdeg"), lit(0L)) +
          coalesce(col("__ddeg"), lit(0L))).as("__outdeg"))
      .localCheckpoint()
    // the semi/anti probe side: broadcast is right for the delta-epoch
    // norm (|affected srcs| ≪ |edges|), but the hint is a FORCE, so a
    // caller replaying a huge backlog can opt out and let the joins
    // shuffle on src instead of materializing the set per executor
    val affected0 = dDeg.select(srcCol).localCheckpoint()
    val affected =
      if (broadcastAffected) broadcast(affected0) else affected0
    val untouched = state.edgesW
      .join(affected, Seq(srcCol), "left_anti")
    val refreshed = state.edgesW.select(col(srcCol), col(dstCol))
      .join(affected, Seq(srcCol), "left_semi")
      .unionByName(edgeDelta.select(col(srcCol), col(dstCol)))
      .join(outdegNew, Seq(srcCol))
    val edgesWNew = untouched
      .unionByName(refreshed.select(untouched.columns.map(col): _*))
      .localCheckpoint()
    val newNodes = edgeDelta.select(col(srcCol).as("node"))
      .union(edgeDelta.select(col(dstCol).as("node")))
      .distinct()
      .join(state.nodes, Seq("node"), "left_anti")
    val nodesNew = state.nodes.unionByName(newNodes).localCheckpoint()
    val rank0 =
      if (warmStart)
        state.rank.unionByName(newNodes.withColumn("rank", lit(1.0)))
      else nodesNew.withColumn("rank", lit(1.0))
    val rank = pageRankIterate(nodesNew, edgesWNew, srcCol, dstCol,
      rank0, iters, teleport, damping)
    PageRankState(edgesWNew, outdegNew, nodesNew, rank)
  }
}
