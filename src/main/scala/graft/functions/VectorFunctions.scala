package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Embedding-vector primitives over `array<float>` columns, built on
  * higher-order functions (zip_with / aggregate) so the per-row math
  * needs no shuffle and no UDF.
  *
  * Determinism: float elements are widened to double (exact), each
  * pairwise product is rounded to DECIMAL(38,12) (deterministic), and
  * the decimal fold is exact and associative — so a sequential fold
  * here equals a hash-aggregate sum in DuckDB bit-for-bit, and the
  * final cosine double is reproducible across engines and partitionings.
  */
object VectorFunctions {
  /** Precision 20 keeps decimal ADDITION at scale 12 ((20,12)+(20,12)
    * → (21,12), no scale loss — at precision 38 Spark would shrink the
    * scale to 11 and the fold would round every step). Unit-norm-ish
    * embeddings keep sums far below the 8 integral digits available.
    */
  private val Dec = DecimalType(20, 12)

  /** Exact decimal dot product of two float-array columns. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(Dec)),
      lit(0).cast(Dec),
      (acc, x) => (acc + x).cast(Dec))

  /** Dot product as double. */
  def dot(a: Column, b: Column): Column = dotExact(a, b).cast(DoubleType)

  /** L2 norm as double. */
  def norm(a: Column): Column = sqrt(dotExact(a, a).cast(DoubleType))

  /** Cosine similarity as double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of the projection of `v` onto `plane`: '1' / '0'.
    * Building block for sign-random-projection LSH bucketing.
    */
  def signBit(v: Column, plane: Column): Column =
    when(dotExact(v, plane) >= 0, lit("1")).otherwise(lit("0"))
}
