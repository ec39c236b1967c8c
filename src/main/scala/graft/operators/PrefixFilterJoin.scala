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
    */
  def jaccardSelfJoin(
      elems: DataFrame,
      idCol: String,
      elemCol: String,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1]: $tauNum/$tauDen")
    val wElem = Window.partitionBy(elemCol)
    val wId = Window.partitionBy(idCol)
    val ranked = elems
      .withColumn("__df", count(lit(1)).over(wElem))
      .withColumn("__m", count(lit(1)).over(wId))
      .withColumn("__r", row_number().over(
        wId.orderBy(col("__df"), col(elemCol))))
    // prefix length = m − ⌈τ·m⌉ + 1, integral ceil via (a+b−1) DIV b
    val prefix = ranked
      .filter(col("__r") <= col("__m") -
        expr(s"(__m * $tauNum + ${tauDen - 1}) DIV $tauDen") + 1)
      .select(col(idCol), col(elemCol), col("__m"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col(s"a.$elemCol") === col(s"b.$elemCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        col("a.__m").as("m_a"), col("b.__m").as("m_b"))
      .distinct()
    val verified = cand
      .join(elems.as("ga"), col(s"ga.$idCol") === col("a_id"))
      .join(elems.as("gb"),
        col(s"gb.$idCol") === col("b_id") &&
          col(s"gb.$elemCol") === col(s"ga.$elemCol"))
      .groupBy("a_id", "b_id", "m_a", "m_b")
      .agg(count(lit(1)).as("n_common"))
    verified
      .filter(col("n_common") * tauDen >=
        (col("m_a") + col("m_b") - col("n_common")) * tauNum)
      .select(col("a_id"), col("b_id"), col("n_common"),
        col("m_a"), col("m_b"),
        (col("n_common").cast("double") /
          (col("m_a") + col("m_b") - col("n_common"))).as("jaccard"))
  }
}
