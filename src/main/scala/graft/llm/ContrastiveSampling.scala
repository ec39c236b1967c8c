package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Contrastive (anchor, positive, negative) triplet mining at corpus
  * scale — the production form of the q236 oracle gate. q236's
  * declared query mines positives by exact cosine of anchors × corpus
  * (right for a cross-engine gate, quadratic in the corpus when the
  * anchor set is a corpus fraction); this operator routes the
  * positive pass through the IVF index instead:
  *
  *  - positives: [[EmbeddingSearch.ivfTopKBatch]] with the anchors as
  *    the query set — one probe-assignment pass, ONE cell-keyed join
  *    (anchors are a corpus fraction, so `broadcastProbes = false` by
  *    default: the corpus shuffles by cell once and no executor
  *    materializes the whole anchor set), one GroupedTopK cut. Cost
  *    is ~nProbe/K of the exact pass, recall follows the measured
  *    q209 curve (nProbe = K recovers the exact answer — the spec's
  *    parity pin).
  *  - negatives: deterministic hash order over the non-positive,
  *    non-anchor corpus (reproducible ≡ uniform-without-replacement,
  *    the q73 stance against RNG) — a linear pass, GroupedTopK cut.
  *
  * Output: (anchor, role 'pos'|'neg', rank, doc_id).
  */
object ContrastiveSampling {

  /** ANN-routed positive mining: per anchor, the top `k` nearest
    * corpus vectors by IVF probe (self excluded by ivfTopKBatch's
    * q_id = vec_id convention). `anchorFilter` selects the anchor
    * rows from `emb` itself.
    */
  def minePositives(spark: SparkSession, emb: DataFrame,
      centroids: DataFrame, anchorFilter: Column, k: Int,
      nProbe: Int, broadcastProbes: Boolean = false): DataFrame =
    EmbeddingSearch.ivfTopKBatch(spark, emb, centroids,
      emb.filter(anchorFilter)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      k, nProbe, broadcastProbes)
      .select(col("q_id").as("anchor"), col("vec_id").as("doc_id"),
        col("cos_sim"))

  /** SEMI-HARD negative mining (Schroff et al., FaceNet CVPR 2015's
    * observation in batch form): negatives from cosine ranks
    * kPos+1 .. kPos+kNeg — near the anchor (informative) but past
    * the mined-positive band (less likely unlabeled positives). ONE
    * [[EmbeddingSearch.ivfTopKBatch]] probe with k = kPos + kNeg
    * serves both roles; callers typically split its output rather
    * than calling this next to [[minePositives]] twice — this
    * entry point exists for the q245 declared-band contract.
    */
  def mineSemiHardNegatives(spark: SparkSession, emb: DataFrame,
      centroids: DataFrame, anchorFilter: Column, kPos: Int = 3,
      kNeg: Int = 3, nProbe: Int = 2,
      broadcastProbes: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor")
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
    minePositives(spark, emb, centroids, anchorFilter, kPos + kNeg,
      nProbe, broadcastProbes)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank").between(kPos + 1, kPos + kNeg))
      .select(col("anchor"), col("rank"), col("doc_id"))
  }

  /** Full triplet assembly around [[minePositives]]: q236's output
    * shape (anchor, role, rank, doc_id) with the identical
    * hash-ordered negative rule, positives ANN-mined.
    *
    * Negatives: with `negBuckets = 0` (default, the q236 parity form)
    * every anchor ranks the WHOLE non-positive corpus by pair hash —
    * exact uniform-without-replacement semantics, but the eligible
    * set is |anchors| × |corpus| map-side rows, quadratic when the
    * anchor set is a corpus fraction. At scale pass `negBuckets = B`
    * (B ≲ |corpus| / (50 · kNeg)): docs and anchors are each hashed
    * into B buckets and negatives are drawn only from the anchor's
    * own bucket — an EQUI-join producing |anchors| · |corpus| / B
    * rows, still deterministic and still hash-uniform (a uniformly
    * hashed 1/B pool is itself a uniform sample of the corpus).
    */
  def triplets(spark: SparkSession, emb: DataFrame,
      centroids: DataFrame, anchorFilter: Column, kPos: Int = 3,
      kNeg: Int = 3, nProbe: Int = 2,
      broadcastProbes: Boolean = false,
      negBuckets: Int = 0): DataFrame = {
    val pos0 = minePositives(spark, emb, centroids, anchorFilter,
      kPos, nProbe, broadcastProbes)
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor")
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
    val pos = pos0
      .withColumn("rank", row_number().over(wP).cast("long"))
      .select(col("anchor"), col("rank"), col("doc_id"))
    val negKey = conv(substring(md5(concat(
      col("anchor").cast("string"), lit("#"),
      col("doc_id").cast("string"))), 1, 13), 16, 10).cast("long")
    def hb(prefix: String, c: Column) = pmod(
      conv(substring(md5(concat(lit(prefix), c.cast("string"))),
        1, 13), 16, 10).cast("long"),
      lit(math.max(negBuckets, 1).toLong))
    val anchors = emb.filter(anchorFilter).select(col("vec_id").as("anchor"))
    val candidates =
      if (negBuckets <= 0)
        emb.select(col("vec_id").as("doc_id"))
          .crossJoin(broadcast(anchors))
      else
        emb.select(col("vec_id").as("doc_id"),
            hb("neg#", col("vec_id")).as("b"))
          .join(anchors.withColumn("b", hb("nega#", col("anchor"))), "b")
          .drop("b")
    val eligible = candidates
      .filter(col("doc_id") =!= col("anchor"))
      .join(pos.select(col("anchor"), col("doc_id")),
        Seq("anchor", "doc_id"), "left_anti")
      .withColumn("k", negKey)
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor").orderBy(col("k").asc, col("doc_id").asc)
    val neg = graft.plans.GroupedTopK.of(eligible, Seq("anchor"),
      Seq(col("k").asc, col("doc_id").asc), kNeg)
      .withColumn("rank", row_number().over(wN).cast("long"))
      .select(col("anchor"), col("rank"), col("doc_id"))
    pos.withColumn("role", lit("pos"))
      .unionByName(neg.withColumn("role", lit("neg")))
      .select(col("anchor"), col("role"), col("rank"), col("doc_id"))
  }
}
