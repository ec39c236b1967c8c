package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values theta sketch (Bar-Yossef et al. RANDOM 2002; the
  * KMV estimator analysis in Beyer et al. SIGMOD 2007) — the
  * mergeable distinct-count sketch that, unlike the engine's HLL
  * rollup (q42/SketchRollup), also supports SET OPERATIONS:
  * intersection and union cardinality estimates between sketches,
  * the "audience overlap" question HLL cannot answer.
  *
  * Principle: hash every key uniformly into [0, 2^52) and keep the k
  * SMALLEST distinct hashes per group. The kth-smallest hash,
  * normalized (θ = kth / 2^52), estimates the sampled fraction of the
  * key space, so distinct ≈ (k−1)/θ (the unbiased KMV form). Two
  * sketches combine by set algebra on their hash samples below the
  * smaller θ — all deterministic: the hash is salted md5 (no RNG),
  * so estimates are reproducible bit-for-bit cross-engine and
  * gate-able in DuckDB (q247).
  *
  * 100 TB stance: build is one distinct + bounded top-k
  * ([[graft.plans.GroupedTopK]] — map-side k-bounded heaps, the
  * exchange carries ≤ k rows per group per partition); sketch state
  * is ≤ k longs per group regardless of input size; merges and set
  * estimates touch only sketch rows.
  */
object KmvSketch {

  /** Hash space size: md5-prefix hashes lie in [0, 2^52). */
  val HashSpace: Double = (1L << 52).toDouble

  /** Salted md5 key hash, engine-portable (13 hex chars < 2^52). */
  def khash(c: Column): Column =
    conv(substring(md5(concat(lit("kmv#"), c.cast("string"))),
      1, 13), 16, 10).cast("long")

  /** Per-group sketch: the k smallest DISTINCT key hashes, one row
    * per (group, hv).
    */
  def build(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KmvSketch: k must be >= 2, got $k")
    graft.plans.GroupedTopK.of(
      df.select(col(groupCol), khash(col(keyCol)).as("hv")).distinct(),
      Seq(groupCol), Seq(col("hv").asc), k)
  }

  /** Merge sketches of DISJOINT builds of the same key domain (e.g.
    * per-day shards): union the hash samples, re-cut to k — exactly
    * the sketch of the union, because the k smallest of a union are
    * among the k smallest of each side.
    */
  def merge(k: Int, sketches: DataFrame*): DataFrame =
    graft.plans.GroupedTopK.of(
      sketches.reduce(_ unionByName _).distinct(),
      sketches.head.columns.filter(_ != "hv").toSeq,
      Seq(col("hv").asc), k)

  /** Distinct-count estimate per group: (k−1)/θ with θ = kth smallest
    * normalized hash; a group holding fewer than k hashes is EXACT
    * (its sample is the whole set).
    */
  def estimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame =
    sketch.groupBy(groupCol)
      .agg(count(lit(1)).cast("long").as("n_hv"),
        max(col("hv")).as("kth"))
      .select(col(groupCol),
        when(col("n_hv") < k, col("n_hv").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("kth").cast("double") / lit(HashSpace)))
          .as("est_distinct"))

  /** Intersection cardinality estimate between two groups' sketches:
    * θ = min(θ_A, θ_B); matched hashes below θ are a uniform sample
    * of the intersection at rate θ, so est = |matches < θ| / θ. When
    * both groups hold fewer than k hashes the result is EXACT.
    */
  def intersectEstimate(sketch: DataFrame, groupCol: String, k: Int,
      groupA: Column, groupB: Column): DataFrame = {
    val a = sketch.filter(col(groupCol) === groupA).select("hv")
    val b = sketch.filter(col(groupCol) === groupB).select("hv")
    val thetas = a.agg(count(lit(1)).as("na"), max("hv").as("ka"))
      .crossJoin(b.agg(count(lit(1)).as("nb"), max("hv").as("kb")))
      .select(least(col("ka"), col("kb")).as("theta_raw"),
        (col("na") < k && col("nb") < k).as("exact"))
    // global agg (not groupBy) so zero matches still yields one row;
    // in the exact regime both samples are the whole sets, so the
    // theta cut must NOT apply (a shared hash above min(max_A, max_B)
    // is a real member, not an out-of-sample one)
    a.join(b, "hv")
      .crossJoin(broadcast(thetas))
      .filter(col("exact") || col("hv") <= col("theta_raw"))
      .agg(count(lit(1)).cast("long").as("n_match"))
      .crossJoin(broadcast(thetas))
      .select(
        when(col("exact"), col("n_match").cast("double"))
          .otherwise(col("n_match").cast("double") /
            (col("theta_raw").cast("double") / lit(HashSpace)))
          .as("est_intersection"))
  }

  /** Shape-carrying sketch (the CountMinSketch.Sketch convention):
    * [[estimate]] called with a LARGER k than the build silently
    * treats capped groups as exact (`n_hv < k'` reads a full sample
    * of k as a complete key set) — a massive undercount with no
    * error. The typed overloads below make the mismatch impossible;
    * prefer them everywhere the sample is not a streaming query
    * result.
    */
  final case class Kmv(k: Int, sample: DataFrame)

  /** [[build]] wrapped with its k — the mismatch-proof form. */
  def sketchOf(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): Kmv = Kmv(k, build(df, groupCol, keyCol, k))

  /** k-checked merge of disjoint-build samples. */
  def merge(sketches: Kmv*): Kmv = {
    require(sketches.nonEmpty, "KmvSketch.merge: no sketches")
    val k = sketches.head.k
    require(sketches.forall(_.k == k),
      s"KmvSketch.merge: k mismatch — got " +
        sketches.map(_.k).distinct.mkString(", "))
    Kmv(k, merge(k, sketches.map(_.sample): _*))
  }

  /** Distinct estimate from a shape-carrying [[Kmv]]. */
  def estimate(sketch: Kmv, groupCol: String): DataFrame =
    estimate(sketch.sample, groupCol, sketch.k)

  /** Intersection estimate from a shape-carrying [[Kmv]]. */
  def intersectEstimate(sketch: Kmv, groupCol: String,
      groupA: Column, groupB: Column): DataFrame =
    intersectEstimate(sketch.sample, groupCol, sketch.k, groupA, groupB)
}
