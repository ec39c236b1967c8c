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
      scores: DataFrame, scoreCol: String, outCol: String,
      checkpoint: Boolean = true): DataFrame = {
    val gathered = edges.join(scores, Seq(fromCol))
      .groupBy(toCol).agg(sum9(col(scoreCol)).as("__s9"))
    val m = gathered.agg(max(col("__s9")).as("__m9"))
    val out = gathered.crossJoin(broadcast(m))
      .select(col(toCol),
        (col("__s9").cast("double") / col("__m9")).as(outCol))
    // `checkpoint = false` defers materialization so a caller can fold
    // several gathers into ONE Spark job — the plan stays shallow as
    // long as something checkpointed is at most a couple of gathers
    // upstream ([[hits]] checkpoints once per ROUND); ReuseExchange
    // dedups the gather exchange the max-normalizer branch shares
    // with the main output either way
    if (checkpoint) out.localCheckpoint() else out
  }

  /** HITS hub/authority scoring over a bipartite edge list — `iters`
    * rounds of auth = gather(hub), hub = gather(auth), both
    * MAX-normalized ([[propagateMax]] semantics; the gathers are
    * sequential WITHIN a round — auth_i needs hub_{i−1}, hub_i needs
    * auth_i — so no join fusion is possible in the math). Returns
    * (hub, auth) after the final round, both LAZY.
    *
    * What this form cuts versus checkpointing every gather is the
    * EAGER-JOB count, the dominant cost of a fixed-iteration loop
    * over a single-JVM scheduler and a real overhead (stage setup,
    * broadcast builds) on a cluster too: one materialization per
    * ROUND (the hub, whose plan folds both of the round's gathers
    * into one job, ReuseExchange deduplicating the max-normalizer's
    * shared exchange) instead of one per gather, no checkpoint at
    * all for the final round — a caller consuming only `auth` (q191)
    * never even executes the last hub gather. Plan depth stays
    * bounded at two gathers above a checkpoint, so driver-side
    * planning cannot blow up with `iters` (the DedupClusters lineage
    * lesson still holds — measured at sf0.1: per-gather checkpoints
    * 4.3 s, per-round 3.6 s, single-checkpoint-then-lazy 3.8 s —
    * per-round is the optimum of that job-count/plan-depth curve).
    *
    * Pre-partitioning edge copies per join side does NOT pay here:
    * `localCheckpoint` under AQE re-reads as `UnknownPartitioning`
    * (the partitioning is not carried into the LogicalRDD), and the
    * score side is the small side — AQE plans these joins as
    * broadcast-hash, so the edge list is never join-shuffled in the
    * first place; the per-round edge-sized work is the two gather
    * aggregations, which map-side partial aggregation bounds at
    * O(distinct keys/partition) shuffle rows.
    */
  def hits(edges: DataFrame, hubCol: String, authCol: String,
      iters: Int): (DataFrame, DataFrame) = {
    require(iters > 0, s"iters must be positive: $iters")
    val e = edges.localCheckpoint()
    var hub = e.select(hubCol).distinct().withColumn("hub", lit(1.0))
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      auth = propagateMax(e, hubCol, authCol, hub, "hub", "auth",
        checkpoint = false)
      hub = propagateMax(e, authCol, hubCol, auth, "auth", "hub",
        checkpoint = i < iters)
    }
    (hub, auth)
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over an
    * undirected edge list, made DETERMINISTIC: every node starts as
    * its own label; each round, every node adopts the most frequent
    * label among its neighbors' PREVIOUS-round labels, ties broken by
    * the SMALLEST label (the standard neighbor-only vote — a node
    * keeps its own label only by winning it back through a
    * neighbor). Fixed `rounds`, no convergence test: the oracle
    * unrolls the identical rounds, and a data-dependent stopping rule
    * would make the gate's answer depend on float-free tie cascades
    * that differ round-to-round.
    *
    * Returns (n, lbl) for every node of the edge list. One round is
    * one edge-sized join + two hash-aggs (vote count, then argmax as
    * a struct MAX — no window sort): linear, keyed shuffles only,
    * state one row per node, per-round localCheckpoint bounding plan
    * depth (the hits/pageRank lesson). Community detection over
    * near-dup/citation graphs is the corpus use — clustering at the
    * community grain rather than the connected-component grain, which
    * over-merges through chain links (q299's audit is the evidence).
    */
  def labelPropagation(edges: DataFrame, uCol: String, vCol: String,
      rounds: Int): DataFrame = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    val und = edges.select(col(uCol).as("n"), col(vCol).as("m"))
      .unionByName(edges.select(col(vCol).as("n"), col(uCol).as("m")))
      .localCheckpoint()
    var labels = und.select(col("n")).distinct()
      .withColumn("lbl", col("n"))
    for (i <- 1 to rounds) {
      val next = und
        .join(labels.select(col("n").as("m"), col("lbl")), "m")
        .groupBy("n", "lbl").agg(count(lit(1)).as("__c"))
        // argmax by (count DESC, label ASC): max over (count, −label)
        // structs — ties on count pick the largest negated label,
        // i.e. the smallest label, with no per-node sort
        .groupBy("n")
        .agg(max(struct(col("__c"), (-col("lbl")).as("__neg")))
          .as("__best"))
        .select(col("n"), (-col("__best.__neg")).as("lbl"))
      labels = if (i < rounds) next.localCheckpoint() else next
    }
    labels
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
    for (i <- 1 to iters) {
      val next = edgesW
        .join(rank, edgesW(srcCol) === rank("node"))
        .groupBy(dstCol)
        .agg(sum9(col("rank") / col("__outdeg")).as("__s9"))
      val out = nodes
        .join(next, nodes("node") === next(dstCol), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("__s9"), lit(0L)).cast("double") /
              lit(1000000000.0))).as("rank"))
      // last iterate stays LAZY: the caller's consumption (a sort, a
      // collect, the next delta epoch's rank0 — whose own first
      // iterate checkpoints one gather later) is one job fewer;
      // intermediate iterates checkpoint to truncate lineage
      rank = if (i < iters) out.localCheckpoint() else out
    }
    rank
  }

  /** Personalized PageRank (Haveliwala WWW'02): the restart mass
    * lands ONLY on the seed set, so scores measure proximity TO the
    * seeds instead of global centrality — the "related items"
    * primitive behind graph-based recommendation and seed-expansion
    * retrieval. Same iteration shape and scaled-long gather as
    * [[pageRank]] (one edges ⋈ rank join per round, order-free
    * exact sums); the only changes are the seed-indicator start
    * vector (1 on seeds, 0 elsewhere) and the seed-gated teleport
    * floor. Seeds ride as an isin literal — query-sized model
    * metadata, never a join.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: Seq[Long], iters: Int,
      teleport: Double = 0.15, damping: Double = 0.85): DataFrame = {
    require(iters > 0, s"iters must be positive: $iters")
    require(seeds.nonEmpty, "personalizedPageRank needs >= 1 seed")
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct().localCheckpoint()
    val edgesW = edges
      .join(edges.groupBy(srcCol).agg(count(lit(1)).as("__outdeg")),
        Seq(srcCol))
      .localCheckpoint()
    val isSeed = col("node").isin(seeds: _*)
    var rank = nodes.withColumn("rank",
      when(isSeed, lit(1.0)).otherwise(lit(0.0)))
    for (i <- 1 to iters) {
      val next = edgesW
        .join(rank, edgesW(srcCol) === rank("node"))
        .groupBy(dstCol)
        .agg(sum9(col("rank") / col("__outdeg")).as("__s9"))
      val out = nodes
        .join(next, nodes("node") === next(dstCol), "left")
        .select(col("node"),
          (when(isSeed, lit(teleport)).otherwise(lit(0.0)) +
            lit(damping) *
            (coalesce(col("__s9"), lit(0L)).cast("double") /
              lit(1000000000.0))).as("rank"))
      rank = if (i < iters) out.localCheckpoint() else out
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

  /** Delta epoch: edges arrived (`edgeDelta`) and/or were retracted
    * (`retractions` — crawl removals, takedowns) — refresh the scores
    * WITHOUT recomputing structure from the full history. The
    * out-degree table merges incrementally (old counts + delta counts
    * − retraction counts, the q175 partial-fold pattern: the full
    * edge list is never re-aggregated; srcs whose degree reaches 0
    * drop out); only edges whose src appears in the delta or the
    * retractions have their folded rows rebuilt (an |affected-srcs|
    * semi/anti split of the old folded list — untouched rows pass
    * through byte-for-byte; the affected slice is rebuilt as
    * old-minus-retracted-plus-added with a COUNT-WISE `exceptAll`,
    * so duplicate edges retract one occurrence per retraction row);
    * the node set extends by the delta's new nodes and sheds
    * retraction-touched nodes that no longer appear on either side
    * of any edge. At 100 TB the delta epoch therefore touches
    * O((|delta| + |retractions|) · avg-degree) rows of structure,
    * not O(|edges|) — except the degree-0 node check, one
    * broadcast-semi linear scan of the new edge list (no shuffle),
    * skipped entirely when there are no retractions.
    *
    * Each retraction row must match an existing (src, dst) edge
    * occurrence — the standard incremental-view-maintenance
    * contract; a retraction of a non-existent edge leaves the edge
    * list unchanged but corrupts the out-degree count (it asserts
    * history that never happened, which no per-delta check can
    * detect without re-reading the full list).
    *
    * `warmStart = true` (the production default) seeds the iteration
    * with the previous epoch's rank — new nodes enter at the 1.0
    * cold-start value, removed nodes are dropped — so a converged
    * score refreshes in 1–2 rounds instead of a full cold ladder.
    * `warmStart = false` seeds every node at 1.0, which makes the
    * delta path EXACTLY reproduce
    * `pageRank(old ∖ retractions ∪ delta, iters)` — scaled-long sums
    * are order-free, so the parity is bit-exact (the spec's
    * contract), proving the incremental structure maintenance
    * lossless in both directions.
    */
  def pageRankDelta(state: PageRankState, edgeDelta: DataFrame,
      srcCol: String, dstCol: String, iters: Int,
      teleport: Double = 0.15, damping: Double = 0.85,
      warmStart: Boolean = true,
      broadcastAffected: Boolean = true,
      retractions: Option[DataFrame] = None): PageRankState = {
    val dAdd = edgeDelta.groupBy(srcCol)
      .agg(count(lit(1)).as("__ddeg"))
    val dDeg = retractions match {
      case None => dAdd
      case Some(r) =>
        dAdd.join(r.groupBy(srcCol).agg(count(lit(1)).as("__rdeg")),
            Seq(srcCol), "full_outer")
          .select(col(srcCol),
            (coalesce(col("__ddeg"), lit(0L)) -
              coalesce(col("__rdeg"), lit(0L))).as("__ddeg"))
    }
    val outdegNew = state.outdeg
      .join(dDeg, Seq(srcCol), "full_outer")
      .select(col(srcCol),
        (coalesce(col("__outdeg"), lit(0L)) +
          coalesce(col("__ddeg"), lit(0L))).as("__outdeg"))
      .filter(col("__outdeg") > 0L)
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
    val refreshedBare = {
      val old = state.edgesW.select(col(srcCol), col(dstCol))
        .join(affected, Seq(srcCol), "left_semi")
      retractions match {
        case None => old
        case Some(r) => old.exceptAll(r.select(col(srcCol), col(dstCol)))
      }
    }
    val refreshed = refreshedBare
      .unionByName(edgeDelta.select(col(srcCol), col(dstCol)))
      .join(outdegNew, Seq(srcCol))
    val edgesWNew = untouched
      .unionByName(refreshed.select(untouched.columns.map(col): _*))
      .localCheckpoint()
    val newNodes = edgeDelta.select(col(srcCol).as("node"))
      .union(edgeDelta.select(col(dstCol).as("node")))
      .distinct()
      .join(state.nodes, Seq("node"), "left_anti")
    // node removal: only retraction-touched nodes can reach degree 0;
    // of those, keep the ones still on either side of some edge —
    // ONE broadcast-semi pass over the new edge list, no shuffle
    val removedNodes = retractions match {
      case None => None
      case Some(r) =>
        val touched = r.select(col(srcCol).as("node"))
          .union(r.select(col(dstCol).as("node")))
          .distinct().localCheckpoint()
        val still = edgesWNew.select(col(srcCol).as("node"))
          .union(edgesWNew.select(col(dstCol).as("node")))
          .join(broadcast(touched), Seq("node"), "left_semi")
          .distinct()
        Some(touched.join(still, Seq("node"), "left_anti")
          .localCheckpoint())
    }
    def dropRemoved(df: DataFrame): DataFrame = removedNodes match {
      case None => df
      case Some(rm) => df.join(broadcast(rm), Seq("node"), "left_anti")
    }
    val nodesNew = dropRemoved(state.nodes).unionByName(newNodes)
      .localCheckpoint()
    val rank0 =
      if (warmStart)
        dropRemoved(state.rank)
          .unionByName(newNodes.withColumn("rank", lit(1.0)))
      else nodesNew.withColumn("rank", lit(1.0))
    val rank = pageRankIterate(nodesNew, edgesWNew, srcCol, dstCol,
      rank0, iters, teleport, damping)
    PageRankState(edgesWNew, outdegNew, nodesNew, rank)
  }
}
