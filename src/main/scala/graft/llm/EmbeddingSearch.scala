package graft.llm

import graft.functions.CosineSimilarityExpr
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search API over an embedding table
  * (vec_id, embedding array<float>) — the library form of q37/q38.
  *
  *  - [[bruteForceTopK]]: exact cosine against every vector; the
  *    scan is embarrassingly parallel, top-k plans as
  *    TakeOrderedAndProject (per-partition heaps, k rows to driver).
  *    Uses the codegen'd `cosine_fast` expression — the fast float
  *    path, not the cross-engine exact-decimal one.
  *  - [[lshTopK]]: sign-random-projection bucketing; only the query's
  *    bucket pays distance math. `planes` defaults to rows of the
  *    corpus itself (deterministic, no RNG) but any plane set works.
  *
  * 100 TB stance: both paths broadcast only the query vector/planes;
  * no all-pairs join ever forms; candidate pruning is 2^planes.
  */
object EmbeddingSearch {

  private def withQuery(spark: SparkSession, emb: DataFrame,
      queryId: Long): DataFrame = {
    CosineSimilarityExpr.register(spark)
    val qv = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    emb.crossJoin(broadcast(qv))
  }

  def bruteForceTopK(spark: SparkSession, emb: DataFrame, queryId: Long,
      k: Int): DataFrame =
    withQuery(spark, emb, queryId)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        CosineSimilarityExpr.cosineFast(col("embedding"), col("q_emb"))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)

  def lshTopK(spark: SparkSession, emb: DataFrame, queryId: Long, k: Int,
      numPlanes: Int = 4): DataFrame = {
    CosineSimilarityExpr.register(spark)
    val planes = emb.filter(col("vec_id").between(1, numPlanes))
      .select(col("vec_id").as("plane_id"), col("embedding").as("plane"))
    val buckets = emb.crossJoin(broadcast(planes))
      .select(col("vec_id"), col("plane_id"),
        signBit(col("embedding"), col("plane")).as("bit"))
      .groupBy("vec_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("plane_id"), col("bit")))),
          x => x.getField("bit")), "").as("bucket"))
    val qb = buckets.filter(col("vec_id") === queryId)
      .select(col("bucket").as("q_bucket"))
    val qv = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    buckets.join(broadcast(qb), col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= queryId)
      .join(emb, "vec_id")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        CosineSimilarityExpr.cosineFast(col("embedding"), col("q_emb"))
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }
}
