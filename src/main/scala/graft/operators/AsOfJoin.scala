package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * rightTime <= leftTime within the same key — the operator behind
  * q28 as a reusable API (Spark has no built-in as-of join;
  * SURVEY.md §2.3).
  *
  * Implementation is the union + running `last(_, ignoreNulls)` window
  * rewrite, NOT a range join: one shuffle on the key, a single sort
  * per key partition, linear state — no time-banded candidate
  * explosion. This is the plan that survives 100×: cost is
  * O(|L|+|R|) shuffled once, vs a range join's O(|L|·|R| / bands).
  *
  * Ties (equal timestamps): right rows sort BEFORE left rows at the
  * same instant, so an exactly-simultaneous right row matches —
  * `>=` semantics, same as DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** @param left       left rows (keep all columns)
    * @param right      right rows; its value columns are emitted
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column name on left
    * @param rightTime  event-time column name on right
    * @param rightVals  right columns to carry (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Map[String, String]): DataFrame = {
    val lCols = left.columns
    // tag: right=0 sorts before left=1 at equal time → >= semantics
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .select((col(rightTime).as("__t") +: lit(0).as("__side") +:
        col(key).as(key) +:
        rightVals.toSeq.map { case (from, to) => col(from).as(s"__v_$to") }): _*)

    val lAligned = rightVals.keys.foldLeft(l) { case (df, _) => df }
    val lWithNulls = rightVals.values.foldLeft(lAligned)((df, to) =>
      df.withColumn(s"__v_$to", lit(null)))

    val unioned = lWithNulls
      .select((Seq(col("__t"), col("__side"), col(key)) ++
        rightVals.values.map(v => col(s"__v_$v")) ++
        lCols.filterNot(_ == key).map(col)): _*)
      .unionByName(
        r.select((Seq(col("__t"), col("__side"), col(key)) ++
          rightVals.values.map(v => col(s"__v_$v"))): _*),
        allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.values.foldLeft(unioned)((df, v) =>
      df.withColumn(v, last(col(s"__v_$v"), ignoreNulls = true).over(w)))

    carried
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++ rightVals.values.map(col)): _*)
  }

  /** Inner variant: drop left rows with no prior right row. */
  def asOfInner(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Map[String, String]): DataFrame = {
    val joined = asOf(left, right, key, leftTime, rightTime, rightVals)
    rightVals.values.foldLeft(joined)((df, v) => df.filter(col(v).isNotNull))
  }
}
