package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: collapse near-duplicate PAIRS (the
  * output of MinHashDedup / EmbeddingSearch.nearDuplicatePairs /
  * q31-q32-q44) into connected components and pick one survivor per
  * cluster — the step that turns pair detection into an actually
  * deduplicated corpus.
  *
  * Components are found by iterative min-label propagation over the
  * pair edges: every node starts labeled with its own id; each round
  * every node takes the minimum label across itself and its
  * neighbors; after `diameter` rounds each component carries its
  * minimum member id as the cluster id. The survivor of a cluster is
  * its minimum doc id (deterministic, engine-independent).
  *
  * 100 TB stance: each round is one shuffle keyed by node id (edges
  * are pre-grouped per round by a hash join on src); rounds are
  * driver-bounded with an early-exit convergence check, and lineage
  * is truncated per round (localCheckpoint) so plans stay flat. The
  * pair graph is orders of magnitude smaller than the corpus —
  * near-dup clusters are small and shallow (stars/cliques from LSH
  * blocking), so propagation converges in a handful of rounds.
  */
object DedupClusters {

  /** Symmetric edge set plus self-loops: label(v) next round is
    * `min(label(u) : u ∈ {v} ∪ neighbors(v))`, which a single
    * join+groupBy computes.
    */
  private def augmentedEdges(pairs: DataFrame): DataFrame = {
    val a = col("a_id"); val b = col("b_id")
    pairs.select(a.as("src"), b.as("dst"))
      .union(pairs.select(b.as("src"), a.as("dst")))
      .union(pairs.select(a.as("src"), a.as("dst")))
      .union(pairs.select(b.as("src"), b.as("dst")))
      .distinct()
  }

  /** One propagation round, shared by the bounded and the unrolled
    * (declared-query) forms.
    */
  private def propagate(labels: DataFrame, edges: DataFrame): DataFrame =
    edges.join(labels, edges("src") === labels("id"))
      .groupBy(col("dst").as("id"))
      .agg(min("label").as("label"))

  /** Connected components of the pair graph: (id, cluster_id) for
    * every doc id appearing in `pairs(a_id, b_id)`. Iterates until no
    * label changes or `maxIters` rounds (whichever first).
    */
  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = augmentedEdges(pairs).localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val next = propagate(labels, edges).localCheckpoint()
      // one small driver-side count per round — the early-exit that
      // keeps real-world (shallow) graphs at diameter+1 shuffles
      val changed = next.join(labels, "id")
        .filter(next("label") =!= labels("label")).count()
      converged = changed == 0
      labels = next
      iter += 1
    }
    // Fail loudly rather than hand back partially-propagated labels:
    // downstream deduplicate() would keep/drop the wrong documents
    // with no signal. Component diameter > maxIters is the only way
    // here (maxIters shuffles already spent, so raising it is the
    // right lever for pathological chain-shaped graphs).
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters rounds " +
          "(component diameter exceeds maxIters); raise maxIters")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Fixed-round unrolled form used by the declared query so a SQL
    * oracle can reproduce it exactly: correct whenever `rounds` ≥ the
    * largest component diameter.
    */
  def componentsUnrolled(pairs: DataFrame, rounds: Int): DataFrame = {
    // materialize the (small) edge set once — every round references
    // it, and without truncation each round would recompute the whole
    // upstream pair-detection subtree
    val edges = augmentedEdges(pairs).localCheckpoint()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
    (1 to rounds).foreach(_ => labels = propagate(labels, edges))
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** The deduplicated corpus: `docs` minus every cluster member except
    * the survivor (minimum id — which is exactly the cluster id the
    * min-label propagation produced). Docs in no pair pass through
    * untouched. Anti-join keyed on the id — one broadcast-able join
    * against the (small) non-survivor set.
    */
  def deduplicate(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", maxIters: Int = 20): DataFrame = {
    val losers = components(pairs, maxIters)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Frozen-base incremental exact-dedup judgment (the q321 delta
    * ledger's core): `baseFps` is the materialized fingerprint store
    * of already-shipped decisions (one `fp` per kept content), and
    * `batch` (doc_id, fp) is the new arrival set. Returns one row
    * per batch doc: `exact_dup_base` when the content already ships
    * (the base store wins — shipped decisions are never contradicted),
    * `exact_dup_batch` when a smaller-id batch doc has the same
    * content (keep-first within the batch), else `kept`. One fp join
    * plus one fp-window — O(|batch|), never O(corpus); the base
    * store is the only state. When batch ids all FOLLOW base ids
    * (prefix split), this equals the full keep-first rebuild
    * restricted to batch rows — the invariant DeltaLedgerSpec
    * witnesses.
    */
  def deltaExactLedger(baseFps: DataFrame,
      batch: DataFrame): DataFrame = {
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    batch
      .join(baseFps.select(col("fp"), lit(1).as("in_base")),
        Seq("fp"), "left")
      .withColumn("rnb", row_number().over(wB))
      .select(col("doc_id"),
        when(col("in_base") === 1, lit("exact_dup_base"))
          .when(col("rnb") > 1, lit("exact_dup_batch"))
          .otherwise(lit("kept")).as("removed_by"))
  }
}
