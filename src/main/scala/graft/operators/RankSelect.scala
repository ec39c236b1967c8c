package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed rank selection — equi-depth histogram boundaries
  * (the ANALYZE-stats / CBO-histogram primitive) WITHOUT a global
  * sort.
  *
  * A 100 TB table cannot be totally ordered to read off percentile
  * ranks, and a single-partition `ntile` window is exactly that
  * global sort. Instead: one linear hash-agg counts rows per
  * equi-width bin (an associative, mergeable partial — the q176
  * sketch); an O(bins) cumulative locates, for each target rank
  * ⌈k·n/K⌉, its bin and in-bin offset; a second linear pass then
  * ranks ONLY the boundary bins' rows (≈ K·n/bins of them) under the
  * total order and picks the offsets. Every threshold is integral,
  * so the selected rows — and hence the emitted values — are
  * partition-invariant and engine-exact.
  *
  * Contract: `value` must be non-null (null rows are excluded, both
  * here and in any oracle), `binWidth > 0`, and the bin count
  * `range(value)/binWidth` should stay modest (≤ ~10⁶) since the
  * cumulative window runs single-partition over the BINS, never the
  * rows. `tieBreakers` must make (value, tieBreakers…) a total order
  * or the selected row at a tied rank is undefined.
  */
object RankSelect {

  /** Values at global ranks ⌈k·n/K⌉ for k = 1..K−1 under the total
    * order (value, tieBreakers…). Returns (bucket, target_rank,
    * value).
    */
  def quantileValues(
      df: DataFrame,
      valueCol: String,
      tieBreakers: Seq[String],
      buckets: Int,
      binWidth: Double): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val K = buckets
    val bin = floor(col(valueCol) / binWidth)
    val rows = df.filter(col(valueCol).isNotNull)
    val binned = rows.groupBy(bin.as("__bin"))
      .agg(count(lit(1)).as("__cnt"))
    // O(bins) rows from here on — the single-partition window is on
    // the sketch, not the data
    val cum = binned
      .withColumn("__cum", sum("__cnt").over(Window.orderBy("__bin")))
      .withColumn("__before", col("__cum") - col("__cnt"))
    val targets = cum.agg(max("__cum").as("__n"))
      .select(explode(sequence(lit(1), lit(K - 1))).as("bucket"),
        col("__n"))
      // ⌈k·n/K⌉, integral
      .withColumn("__target", expr(s"(bucket * __n + ${K - 1}) DIV $K"))
      .select("bucket", "__target")
    // boundary bin per target: first bin whose cumulative crosses it
    val bound = targets
      .join(cum, col("__cum") >= col("__target"))
      .groupBy("bucket", "__target")
      .agg(min(struct(col("__bin"), col("__before"))).as("__sel"))
      .select(col("bucket"), col("__target"),
        col("__sel.__bin").as("__bin"),
        (col("__target") - col("__sel.__before")).as("__off"))
    // second linear pass: only boundary-bin rows survive the join;
    // within a bin the global order restricts to (value, ties…)
    val ordered: Seq[Column] =
      col(valueCol) +: tieBreakers.map(col)
    rows.select(ordered: _*)
      .withColumn("__bin", bin)
      .join(broadcast(bound), "__bin")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("bucket").orderBy(ordered: _*)))
      .filter(col("__rk") === col("__off"))
      .select(col("bucket"), col("__target").as("target_rank"),
        col(valueCol).as("value"))
  }
}
