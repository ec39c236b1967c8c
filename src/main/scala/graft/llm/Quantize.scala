package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Affine int8 embedding quantization (the q116 operator as a
  * reusable API): per-vector min/max scale + zero point, elements
  * mapped to 0..255, plus the inverse. Both directions are pure
  * per-row projections — no shuffle, no UDF; at 100 TB they run
  * map-side at scan speed and cut float32 vector storage 4×.
  *
  * Reconstruction error is bounded by scale/2 per element (round-off
  * of the affine map), which QuantizeSpec property-checks.
  */
object Quantize {

  /** Adds `zero_point`, `scale`, and `q_<col>` (array<int> in 0..255)
    * for the given float-array column.
    *
    * The min/max stats land in their own projection and the transform
    * lambda references them as ATTRIBUTES: an expression inlined into
    * a lambda body is re-evaluated per array element (HOFs are
    * CodegenFallback, no subexpression elimination), turning the
    * O(dim) min/max into O(dim²) per row. Catalyst's CollapseProject
    * keeps the split because each stat is referenced more than once
    * and is not collapse-cheap.
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    val q = transform(v, x =>
      when(col("scale") === 0.0, lit(0))
        .otherwise(round((x.cast("double") - col("zero_point")) /
          col("scale")).cast("int")))
    df.withColumn("zero_point", mn)
      .withColumn("scale", (mx - mn) / lit(255.0))
      .withColumn(s"q_$vecCol", q)
  }

  /** Reconstructs a double-array column from `q_<col>` + zero_point +
    * scale (the columns [[quantize]] adds).
    */
  def dequantize(vecCol: String): Column =
    transform(col(s"q_$vecCol"),
      qx => qx.cast("double") * col("scale") + col("zero_point"))
}
