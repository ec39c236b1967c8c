package graft.llm

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CentroidsSpec extends AnyFunSuite with SparkFixture with Matchers {

  test("typed Aggregator centroid equals the arithmetic mean") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
      (1, Array(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val cents = Centroids.byLabel(spark, df, dim = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    cents(0) shouldBe Array(2.0f, 4.0f)
    cents(1) shouldBe Array(10.0f, 0.0f)
  }

  test("k-means iterations do not degrade the clustering objective") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val init = Centroids.byLabel(spark, emb)
    val before = Centroids.objective(spark, emb, init)
    val refined = Centroids.kmeans(spark, emb, init, iterations = 2)
    val after = Centroids.objective(spark, emb, refined)
    after should be >= before - 1e-9
  }

  test("IVF assignment runs on real embeddings and is self-consistent") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Centroids.byLabel(spark, emb)
    cents.count() shouldBe emb.select("label").distinct().count()
    val assigned = Centroids.assign(spark, emb, cents)
    assigned.count() shouldBe emb.count()
    // the mean vector of each label should assign to its own label
    val centsAsVecs = cents
      .select(col("cand_label").as("label"), col("centroid").as("embedding"))
      .withColumn("vec_id", col("label").cast("long") + 100000L)
    val selfAssign = Centroids.assign(spark, centsAsVecs, cents)
    selfAssign.filter(col("true_label") =!= col("assigned_label"))
      .count() shouldBe 0
  }

  test("label-free initFirstK trains a usable IVF quantizer") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val init = Centroids.initFirstK(spark, emb, 8)
    init.count() shouldBe 8
    val before = Centroids.objective(spark, emb, init)
    val refined = Centroids.kmeans(spark, emb, init, iterations = 2)
    val after = Centroids.objective(spark, emb, refined)
    after should be >= before - 1e-9
  }
}
