package graft.llm

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class QuantizeSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "Quantize"

  private def vecs(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  it should "rely only on embeddings that are non-null, non-empty, " +
      "fixed-dim, with no null elements (fixture contract)" in {
    // q116/q117 render arrays as comma-joined strings on both engines;
    // Spark concat_ws and DuckDB array_to_string only agree when no
    // degenerate vectors exist (empty list -> '' vs NULL, null
    // elements dropped differently). Pin the contract the queries
    // assume so a testdata change breaks HERE with a message, not as
    // an opaque oracle hash mismatch.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // Matchers inherits a `size(Long)` that shadows functions.size
    val ssize = org.apache.spark.sql.functions.size _
    val row = emb.select(
      count(when(col("embedding").isNull, 1)).as("null_vecs"),
      count(when(ssize(col("embedding")) === 0, 1)).as("empty_vecs"),
      countDistinct(ssize(col("embedding"))).as("distinct_dims"),
      count(when(exists(col("embedding"), x => x.isNull), 1))
        .as("vecs_with_null_elems"))
      .head()
    withClue("null embeddings:") { row.getLong(0) shouldBe 0L }
    withClue("empty embeddings:") { row.getLong(1) shouldBe 0L }
    withClue("mixed dimensions:") { row.getLong(2) shouldBe 1L }
    withClue("null elements:") { row.getLong(3) shouldBe 0L }
  }

  it should "map every element into 0..255" in {
    val q = Quantize.quantize(
      vecs(Seq((1L, Seq(-1.5f, 0.0f, 0.25f, 2.5f)),
        (2L, Seq(0.1f, 0.2f, 0.3f, 0.4f)))),
      "embedding")
    val bad = q.select(explode(col("q_embedding")).as("qx"))
      .filter(col("qx") < 0 || col("qx") > 255)
      .count()
    bad shouldBe 0L
    // min maps to 0, max maps to 255
    val row = q.filter(col("vec_id") === 1L)
      .select(array_min(col("q_embedding")), array_max(col("q_embedding")))
      .head()
    row.getInt(0) shouldBe 0
    row.getInt(1) shouldBe 255
  }

  it should "reconstruct within scale/2 per element" in {
    val q = Quantize.quantize(
      vecs(Seq((1L, Seq(-1.5f, 0.37f, 0.25f, 2.5f, -0.004f)))),
      "embedding")
    val err = q
      .select(col("scale"),
        zip_with(col("embedding"), Quantize.dequantize("embedding"),
          (orig, recon) => abs(orig.cast("double") - recon)).as("errs"))
      .select(array_max(col("errs")).as("max_err"), col("scale"))
      .head()
    val (maxErr, scale) = (err.getDouble(0), err.getDouble(1))
    maxErr should be <= scale / 2 + 1e-12
  }

  it should "handle constant vectors (scale 0) without NaN" in {
    val q = Quantize.quantize(vecs(Seq((1L, Seq(0.5f, 0.5f, 0.5f)))),
      "embedding")
    val row = q.select(col("q_embedding"), col("scale")).head()
    row.getSeq[Int](0) shouldBe Seq(0, 0, 0)
    row.getDouble(1) shouldBe 0.0
    // dequantize of an all-zero quantization returns the zero point,
    // which IS the constant value
    val recon = q.select(Quantize.dequantize("embedding").as("r"))
      .head().getSeq[Double](0)
    recon.foreach(_ shouldBe 0.5 +- 1e-7)
  }
}
