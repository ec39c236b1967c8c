package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the
  * SSJoin/PPJoin candidate-generation family — Chaudhuri et al. ICDE
  * 2006, Xiao et al. WWW 2008; reference analog: the dedup/near-dup
  * surface of SURVEY.md §7.5).
  *
  * The only LOSSLESS member of the near-dup ladder: a df-cap
  * (TextQueries q31) trades recall on hot elements and MinHash
  * banding (q32) is probabilistic, but prefix filtering provably
  * loses nothing. Order each record's element set by a GLOBAL total
  * order (ascending document frequency, ties by element — rarest
  * first); for Jaccard ≥ τ, |A∩B| ≥ ⌈τ·|A|⌉ (since |A∩B| ≥ τ·|A∪B| ≥
  * τ·|A|), so the intersection cannot hide entirely in the last
  * ⌈τ·|A|⌉−1 elements — a qualifying pair MUST share an element
  * within the first |A|−⌈τ·|A|⌉+1 of both sides. Candidates therefore
  * come from an equi join on PREFIX elements only; because prefixes
  * hold the rarest elements, the join fan-out is minimal exactly
  * where df² blowup would bite.
  *
  * Scale shape: df + per-record windows are two keyed shuffles of the
  * (id, element) pairs; the candidate join is an equi join on
  * low-df elements (never a cartesian product); verification joins
  * the candidate set (small by construction) back to the element
  * table. τ is a rational `tauNum/tauDen`, so every pruning and
  * acceptance threshold is INTEGER arithmetic — no double compare at
  * any cut, hence engine-exact results.
  */
object PrefixFilterJoin {

  /** All unordered pairs {a, b} with Jaccard(A, B) ≥ tauNum/tauDen
    * over distinct (`idCol`, `elemCol`) rows. Returns
    * (a_id, b_id, n_common, m_a, m_b, jaccard) with a_id < b_id.
    *
    * Two exactness-preserving prunes run before verification:
    * the PREFIX filter (above) and the SIZE filter — J ≥ τ forces
    * τ·|A| ≤ |B| ≤ |A|/τ, so wildly different-sized sets never
    * become candidates. Verification then joins each surviving pair
    * to the two per-record element ARRAYS and counts the
    * intersection map-side with `array_intersect` — one row per
    * candidate, never a re-explode of the element table (measured 3×
    * on the synthetic corpus, whose tiny vocabulary is the
    * adversarial hot-element regime for prefix filtering).
    */
  def jaccardSelfJoin(
      elems: DataFrame,
      idCol: String,
      elemCol: String,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1]: $tauNum/$tauDen")
    // enforce the distinct-(id, elem) contract rather than trusting
    // it: duplicate input rows would silently inflate __df and __m
    // while array_intersect dedups, yielding WRONG Jaccard values —
    // one extra keyed shuffle, cheap next to the candidate join
    val dElems = elems.dropDuplicates(idCol, elemCol)
    val wElem = Window.partitionBy(elemCol)
    // one (df, elem)-sorted array per record, built ONCE: prefixes
    // explode out of a slice of it (no per-record window/sort pass)
    // and verification reads the same arrays back (exchange reuse) —
    // the array is the record's distinct element set, so per-group
    // state is bounded by record size
    val sets = dElems
      .withColumn("__df", count(lit(1)).over(wElem))
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("__df"), col(elemCol))))
        .as("__pairs"))
      .select(col(idCol),
        expr(s"transform(__pairs, p -> p.$elemCol)").as("__set"),
        size(col("__pairs")).as("__m"))
    // prefix length = m − ⌈τ·m⌉ + 1, integral ceil via (a+b−1) DIV b
    val prefixLen = col("__m") -
      expr(s"(__m * $tauNum + ${tauDen - 1}) DIV $tauDen") + 1
    val prefix = sets
      .select(col(idCol), col("__m"),
        posexplode(slice(col("__set"), lit(1), prefixLen)))
      .withColumnRenamed("col", "__elem")
    val minOverlap = // ⌈τ·(m_a+m_b)/(1+τ)⌉, integral
      expr(s"((m_a + m_b) * $tauNum + ${tauNum + tauDen - 1}) " +
        s"DIV ${tauNum + tauDen}")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__elem") === col("b.__elem") &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          // size filter: τ·m_a ≤ m_b and τ·m_b ≤ m_a
          col("b.__m") * tauDen >= col("a.__m") * tauNum &&
          col("a.__m") * tauDen >= col("b.__m") * tauNum)
      .groupBy(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .agg(min(col("a.pos")).as("__pa"), min(col("b.pos")).as("__pb"),
        first(col("a.__m")).as("m_a"), first(col("b.__m")).as("m_b"))
      // positional filter: both sides sort by the same global total
      // order, so the globally-first shared element sits at ranks
      // (pa+1, pb+1) in both — overlap ≤ 1 + min(suffix sizes) there
      .filter(lit(1) +
        least(col("m_a") - (col("__pa") + 1),
          col("m_b") - (col("__pb") + 1)) >= minOverlap)
      .select("a_id", "b_id")
    val verified = cand
      .join(sets.as("sa"), col(s"sa.$idCol") === col("a_id"))
      .join(sets.as("sb"), col(s"sb.$idCol") === col("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("sa.__set"), col("sb.__set")))
          .cast("long").as("n_common"),
        col("sa.__m").cast("long").as("m_a"),
        col("sb.__m").cast("long").as("m_b"))
    verified
      .filter(col("n_common") * tauDen >=
        (col("m_a") + col("m_b") - col("n_common")) * tauNum)
      .select(col("a_id"), col("b_id"), col("n_common"),
        col("m_a"), col("m_b"),
        (col("n_common").cast("double") /
          (col("m_a") + col("m_b") - col("n_common"))).as("jaccard"))
  }
}
