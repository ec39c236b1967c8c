package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile estimation by bottom-k-hash uniform sampling —
  * the quantile member of the engine's deterministic sketch family
  * (KMV distinct counts, CMS frequencies, HLL rollups). Exact
  * per-group percentiles (q61) sort every row of the group; at
  * 100 TB a full-sort quantile over a hot column is a non-starter,
  * and the usual randomized summaries (KLL, t-digest) can't be
  * oracle-gated because their compactions flip coins. This sketch
  * keeps, per group, the rows whose salted md5 row-key hash is among
  * the k SMALLEST — a uniform k-row sample of the group that is
  *
  *  - deterministic: the "randomness" is the md5 hash, so two runs,
  *    two engines, or build-then-merge all pick the SAME sample
  *    (DuckDB recomputes it bit-for-bit in q326);
  *  - mergeable: the k smallest hashes of a union are among the k
  *    smallest of each side, so shard sketches re-cut to k compose
  *    exactly — per-day shards roll up without touching row data
  *    ([[merge]] ≡ a fresh build, pinned in QuantileSampleSpec);
  *  - bounded: build is one [[graft.plans.GroupedTopK]] pass
  *    (map-side k-bounded heaps; the exchange carries ≤ k rows per
  *    group per partition) and sketch state is ≤ k (hash, value)
  *    pairs per group regardless of input size.
  *
  * Estimates use the nearest-rank (ceiling) definition on the sorted
  * sample, with the rank computed in INTEGER arithmetic
  * (`(num·n + den − 1) DIV den` for quantile num/den) — float
  * `ceil(p·n)` disagrees across engines when p·n is integral in
  * decimal but lands just above it in binary doubles.
  */
object QuantileSample {

  /** Salted md5 row-key hash in [0, 2^52), engine-portable; the salt
    * keeps the sample independent of KMV's (`kmv#`) on the same key.
    */
  def qhash(c: Column): Column =
    conv(substring(md5(concat(lit("qsk#"), c.cast("string"))),
      1, 13), 16, 10).cast("long")

  /** Per-group sketch: the k rows with smallest row-key hash, as
    * (group, hv, v) — value ties on a (vanishingly unlikely) hash
    * collision break by value, so the cut is total and
    * deterministic.
    */
  def build(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"QuantileSample: k must be >= 1, got $k")
    graft.plans.GroupedTopK.of(
      df.where(col(valueCol).isNotNull)
        .select(col(groupCol), qhash(col(keyCol)).as("hv"),
          col(valueCol).as("v")),
      Seq(groupCol), Seq(col("hv").asc, col("v").asc), k)
  }

  /** Merge sketches of DISJOINT builds (per-shard / per-day): union
    * and re-cut to k — exactly the sketch of the union.
    */
  def merge(k: Int, sketches: DataFrame*): DataFrame =
    graft.plans.GroupedTopK.of(
      sketches.reduce(_ unionByName _),
      sketches.head.columns.filterNot(Set("hv", "v")).toSeq,
      Seq(col("hv").asc, col("v").asc), k)

  /** Nearest-rank quantile estimates from a sketch: for each
    * requested (num, den, alias), the sorted sample's value at rank
    * ceil(num·n / den) = (num·n + den − 1) DIV den (1-based; n =
    * sample size, so a group smaller than k is EXACT). Output:
    * (group, alias...) with the value column's own type.
    */
  def quantiles(sketch: DataFrame, groupCol: String,
      qs: Seq[(Int, Int, String)]): DataFrame = {
    qs.foreach { case (num, den, alias) =>
      require(den >= 1 && num >= 1 && num <= den,
        s"QuantileSample.quantiles: quantile $alias = $num/$den " +
          "must satisfy 1 <= num <= den (a 0th percentile would " +
          "compute rank 0, and SQL array indices start at 1)")
    }
    val agged = sketch.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("v"))).as("vs"),
        count(lit(1)).cast("long").as("n"))
    val cols = col(groupCol) +: qs.map { case (num, den, alias) =>
      element_at(col("vs"),
        expr(s"cast(($num * n + ${den - 1}) DIV $den as int)"))
        .as(alias)
    }
    agged.select(cols: _*)
  }
}
