package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** A declared, oracle-checked query: the Spark definition plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB.
  *
  * Determinism contract (SURVEY.md §7.6): every query carries a TOTAL
  * order (`ORDER BY` on a key suffix), aliases every computed column
  * identically on both sides, and avoids float-summation
  * nondeterminism via exact DECIMAL(38,12) accumulation (order
  * independent) cast back to double only at the end.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Exact-arithmetic aggregate helpers shared by queries and their
  * DuckDB oracles. A distributed double `sum()` is order-dependent;
  * summing DECIMAL(38,12) is exact and associative, so Spark (any
  * partitioning) and DuckDB produce bit-identical results after the
  * final cast to double.
  */
object Exact {
  val Dec: DecimalType = DecimalType(38, 12)

  /** Final-cast scale: with ≤2 fractional digits the scaled integer of
    * any sum we produce stays below 2^53, so BOTH engines' decimal →
    * double conversion is a single correctly-rounded step (DuckDB
    * otherwise computes int128→double / 10^12, which double-rounds).
    */
  val Dec2: DecimalType = DecimalType(38, 2)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(Dec2).cast(DoubleType)

  /** Order-independent average (exact sum / count), as double. The sum
    * is rounded at scale 6 (inputs are small-magnitude) before the
    * exact-division-free double arithmetic.
    */
  def davg(c: Column): Column =
    (sum(c.cast(Dec)).cast(DecimalType(38, 6)).cast(DoubleType) / count(c))
      .cast(DoubleType)

  /** DuckDB spelling of [[dsum]]. DuckDB's decimal→decimal scale-down
    * CAST truncates; `round()` is half-away-from-zero, which matches
    * Spark's HALF_UP cast.
    */
  def sqlDsum(e: String): String =
    s"CAST(round(SUM(CAST(($e) AS DECIMAL(38,12))), 2) AS DOUBLE)"

  /** DuckDB spelling of [[davg]]. */
  def sqlDavg(e: String): String =
    s"CAST(CAST(round(SUM(CAST(($e) AS DECIMAL(38,12))), 6) AS DOUBLE) / COUNT($e) AS DOUBLE)"
}
