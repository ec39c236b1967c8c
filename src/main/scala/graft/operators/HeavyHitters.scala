package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate frequent-items (heavy hitters) via the Space-Saving
  * sketch (Metwally/Agrawal/El Abbadi, ICDT'05) as a mergeable typed
  * `Aggregator`.
  *
  * Why not `groupBy(item).count().orderBy(desc).limit(k)`? That exact
  * form shuffles ONE ROW PER DISTINCT ITEM — at 100 TB of tokens /
  * URLs / n-grams the distinct count is billions and the shuffle is
  * the bottleneck even though the answer is k rows. Space-Saving
  * keeps a bounded `capacity`-entry counter map per partition and
  * merges maps pairwise (Agarwal et al., "Mergeable Summaries", PODS
  * '12): the shuffle carries `capacity` counters per map partition,
  * independent of distinct cardinality.
  *
  * Guarantees (capacity m, stream length n): every estimate
  * over-counts — `true ≤ est ≤ true + err` with per-item tracked
  * `err ≤ n/m` — and any item with true frequency > n/m is present
  * in the summary. Merging preserves both bounds (errors add across
  * merged summaries but stay ≤ total n / m). Choose m ≈ k × 10 for
  * stable top-k under merge.
  *
  * The sketch is order-dependent (ties evict arbitrarily), so exact
  * output equality is not deterministic across partitionings — the
  * CORRECTNESS gate for this operator is the property spec
  * (HeavyHittersSpec): bounds hold and heavy items are always found,
  * on every partitioning.
  */
object HeavyHitters {

  /** counter map: item -> (estimated count, max over-count error) */
  type Summary = Map[String, (Long, Long)]

  final class SpaceSavingAggregator(capacity: Int)
      extends Aggregator[String, Summary, Summary] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Summary = Map.empty

    override def reduce(buf: Summary, item: String): Summary =
      buf.get(item) match {
        case Some((c, e)) => buf.updated(item, (c + 1, e))
        case None if buf.size < capacity => buf.updated(item, (1L, 0L))
        case None =>
          // evict the min-count entry (deterministic tie-break on the
          // item so a given buffer always evicts the same entry); the
          // newcomer inherits its count as over-count error
          val (evict, (mc, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
          buf.removed(evict).updated(item, (mc + 1, mc))
      }

    override def merge(a: Summary, b: Summary): Summary = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      // Mergeable-Summaries combine: sum counts/errors for shared
      // items. An item absent from a summary may still have appeared
      // up to that summary's own eviction threshold (its min count)
      // undetected — a summary that never evicted (size < capacity)
      // has threshold 0 — so the absent side contributes its min to
      // both the estimate and the error bound. Then keep the top
      // `capacity` by (count, item).
      val minA = if (a.size < capacity) 0L
        else a.valuesIterator.map(_._1).min
      val minB = if (b.size < capacity) 0L
        else b.valuesIterator.map(_._1).min
      val all = (a.keySet ++ b.keySet).iterator.map { i =>
        val (ca, ea) = a.getOrElse(i, (minA, minA))
        val (cb, eb) = b.getOrElse(i, (minB, minB))
        i -> (ca + cb, ea + eb)
      }.toSeq
      all.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity).toMap
    }

    override def finish(s: Summary): Summary = s

    override def bufferEncoder: Encoder[Summary] =
      ExpressionEncoder[Summary]()
    override def outputEncoder: Encoder[Summary] =
      ExpressionEncoder[Summary]()
  }

  /** Top-k frequent values of `col` in `df`, with estimate bounds:
    * `(item, est, err)` rows, est descending — `true` count is in
    * `[est - err, est]`. `capacity` bounds sketch memory and drives
    * the n/capacity detection threshold.
    */
  def topK(df: DataFrame, column: String, k: Int,
      capacity: Int = 1024): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val agg = new SpaceSavingAggregator(capacity).toColumn
    val summary = df.select(col(column).cast("string"))
      .as[String]
      .select(agg.name("summary"))
    summary
      .select(explode(col("summary")))
      .select(col("key").as("item"),
        col("value._1").as("est"), col("value._2").as("err"))
      .orderBy(col("est").desc, col("item").asc)
      .limit(k)
  }
}
