package graft.operators

import org.apache.spark.sql.DataFrame
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
  * The carried value is a STRUCT of the right row's columns, not the
  * bare columns: a right row whose value column is legitimately NULL
  * still "matches" (the struct itself is non-null), so NULL right
  * values propagate instead of being skipped for an older non-null
  * one — same semantics as DuckDB's ASOF JOIN.
  *
  * Ties (equal timestamps): right rows sort BEFORE left rows at the
  * same instant, so an exactly-simultaneous right row matches —
  * `>=` semantics, same as DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** Union + carried right-row struct, before the final projection.
    * `__rv` is non-null iff some right row at-or-before exists.
    */
  private def carriedStruct(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Map[String, String]): DataFrame = {
    require(!rightVals.values.exists(_ == "__rt"),
      "__rt is reserved for the carried right timestamp")
    val lCols = left.columns
    // tag: right=0 sorts before left=1 at equal time → >= semantics
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(rightTime).as("__t"), lit(0).as("__side"),
        col(key).as(key),
        struct(rightVals.toSeq.map { case (from, to) =>
          col(from).as(to)
        } :+ col(rightTime).as("__rt"): _*).as("__rv"))

    // left side has no __rv → unionByName fills NULL (no match yet)
    val unioned = l
      .select((Seq(col("__t"), col("__side"), col(key)) ++
        lCols.filterNot(_ == key).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

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
    carriedStruct(left, right, key, leftTime, rightTime, rightVals)
      .select((lCols.map(col) ++
        rightVals.values.map(v => col("__rv").getField(v).as(v))): _*)
  }

  /** Inner variant: drop left rows with no prior right row (struct
    * null-ness, so a matched right row with NULL values is KEPT).
    */
  def asOfInner(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Map[String, String]): DataFrame = {
    val lCols = left.columns
    carriedStruct(left, right, key, leftTime, rightTime, rightVals)
      .filter(col("__rv").isNotNull)
      .select((lCols.map(col) ++
        rightVals.values.map(v => col("__rv").getField(v).as(v))): _*)
  }

  /** Tolerance variant: the matched right row must additionally lie
    * within `tolerance` (an INTERVAL literal body, e.g. "5 minutes")
    * of the left time — a stale match degrades to no-match (NULL
    * values), like pandas merge_asof's `tolerance`. Same single
    * shuffle: the right timestamp rides in the carried struct, so
    * staleness is a per-row projection predicate, not a join.
    */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Map[String, String], tolerance: String): DataFrame = {
    val lCols = left.columns
    val fresh = col("__rv").isNotNull &&
      col("__rv").getField("__rt") >=
        col(leftTime) - expr(s"INTERVAL $tolerance")
    carriedStruct(left, right, key, leftTime, rightTime, rightVals)
      .select((lCols.map(col) ++ rightVals.values.map(v =>
        when(fresh, col("__rv").getField(v)).as(v))): _*)
  }
}
