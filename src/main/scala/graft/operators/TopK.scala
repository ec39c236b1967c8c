package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT a per-group full sort.
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(v)) <=
  * k`, declared as q60) sorts EVERY row of every group before
  * discarding all but k — at scale that is a full shuffle + sort of
  * the fact table for a k-row-per-group answer. This operator keeps a
  * bounded k-element buffer per group in a mergeable typed
  * `Aggregator`, so Spark computes partial top-k map-side and merges
  * buffers: the shuffle carries at most k rows per group per map
  * partition, and nothing is ever fully sorted.
  *
  * Spark has no built-in bounded per-group top-k (TakeOrderedAndProject
  * is global-only; `max_by` is k = 1) — this is ladder rung (b) from
  * the design notes: a custom typed aggregate, not a custom physical
  * operator, because the grouping/shuffle machinery is exactly what
  * `groupByKey.agg` already provides.
  */
object TopK {

  /** Buffer = at most k (value, id) pairs, ordered best-first:
    * descending value, ascending id tie-break (the q60 ordering).
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[(String, Double, Long), Array[(Double, Long)],
        Array[(Double, Long)]] {

    private def trim(xs: Array[(Double, Long)]): Array[(Double, Long)] =
      xs.sortBy { case (v, id) => (-v, id) }.take(k)

    override def zero: Array[(Double, Long)] = Array.empty

    override def reduce(buf: Array[(Double, Long)],
        row: (String, Double, Long)): Array[(Double, Long)] =
      trim(buf :+ ((row._2, row._3)))

    override def merge(a: Array[(Double, Long)],
        b: Array[(Double, Long)]): Array[(Double, Long)] = trim(a ++ b)

    override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] =
      trim(buf)

    override def bufferEncoder: Encoder[Array[(Double, Long)]] =
      ExpressionEncoder[Array[(Double, Long)]]()

    override def outputEncoder: Encoder[Array[(Double, Long)]] =
      ExpressionEncoder[Array[(Double, Long)]]()
  }

  /** Top `k` rows per group of `df`, largest `orderCol` first with
    * ascending `idCol` tie-break. Output columns:
    * (groupCol, rn, orderCol, idCol).
    */
  def topKPerGroup(spark: SparkSession, df: DataFrame, groupCol: String,
      orderCol: String, idCol: String, k: Int): DataFrame = {
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(orderCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (g, arr) =>
        arr.iterator.zipWithIndex.map { case ((v, id), i) =>
          (g, i + 1, v, id)
        }
      }
      .toDF(groupCol, "rn", orderCol, idCol)
  }
}
