package graft.queries

import graft.Tables._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (builder prompt +
  * SURVEY.md §7.5): brute-force cosine top-k as the baseline, and a
  * sign-random-projection LSH bucketed variant as the scale path.
  *
  * Scale stance: the query vector (and the handful of LSH planes) are
  * broadcast; per-row math is higher-order-function folds (no UDF, no
  * shuffle); only the top-k selection reduces — Spark plans it as
  * TakeOrderedAndProject. At 100 TB the LSH variant prunes candidates
  * by bucket before any distance math.
  */
object VectorQueries {

  /** Shared DuckDB CTEs: element-expanded embeddings with ordinality,
    * exact-decimal dot products against the query vector (vec_id 0),
    * and per-vector norms — mirrors VectorFunctions bit-for-bit.
    */
  private val vecCtes =
    """WITH dexp AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), qexp AS (
      |  SELECT x AS y, i FROM dexp WHERE vec_id = 0
      |), dots AS (
      |  SELECT d.vec_id,
      |    CAST(SUM(CAST(d.x * q.y AS DECIMAL(38,12))) AS DOUBLE) AS dp
      |  FROM dexp d JOIN qexp q USING (i) GROUP BY d.vec_id
      |), norms AS (
      |  SELECT vec_id,
      |    sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
      |  FROM dexp GROUP BY vec_id
      |), qn AS (
      |  SELECT nrm AS qnrm FROM norms WHERE vec_id = 0
      |)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // Brute-force cosine top-20 neighbors of vec_id 0.
    QueryDef(
      "q37_ann_bruteforce",
      (s, d) => {
        val emb = embeddings(s, d)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"))
        emb.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("label"),
            cosine(col("embedding"), col("q_emb")).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
          .limit(20)
      },
      Some(s"""$vecCtes
              |SELECT e.vec_id, e.label, dots.dp / (norms.nrm * qn.qnrm) AS cos_sim
              |FROM embeddings e
              |JOIN dots ON dots.vec_id = e.vec_id
              |JOIN norms ON norms.vec_id = e.vec_id
              |CROSS JOIN qn
              |WHERE e.vec_id <> 0
              |ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 20""".stripMargin)),

    // LSH-bucketed ANN: 4 sign-projection planes (vectors 1..4) give a
    // 4-bit bucket; candidates share the query's bucket (~1/16 of the
    // corpus), then exact cosine ranks only the candidates.
    QueryDef(
      "q38_ann_lsh",
      (s, d) => {
        val emb = embeddings(s, d)
        val planes = emb.filter(col("vec_id").between(1, 4))
          .select(col("vec_id").as("plane_id"), col("embedding").as("plane"))
        val buckets = emb.crossJoin(broadcast(planes))
          .select(col("vec_id"), col("plane_id"),
            signBit(col("embedding"), col("plane")).as("bit"))
          .groupBy("vec_id")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("plane_id"), col("bit")))),
              x => x.getField("bit")), "").as("bucket"))
        val qb = buckets.filter(col("vec_id") === 0)
          .select(col("bucket").as("q_bucket"))
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"))
        buckets.join(broadcast(qb), col("bucket") === col("q_bucket"))
          .filter(col("vec_id") =!= 0)
          .join(emb, "vec_id")
          .crossJoin(broadcast(qv))
          .select(col("vec_id"),
            cosine(col("embedding"), col("q_emb")).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
          .limit(10)
      },
      Some(s"""$vecCtes, pexp AS (
              |  SELECT vec_id AS plane_id, x AS p, i FROM dexp
              |  WHERE vec_id BETWEEN 1 AND 4
              |), proj AS (
              |  SELECT d.vec_id, p.plane_id,
              |    CASE WHEN SUM(CAST(d.x * p.p AS DECIMAL(38,12))) >= 0
              |      THEN '1' ELSE '0' END AS bit
              |  FROM dexp d JOIN pexp p USING (i) GROUP BY d.vec_id, p.plane_id
              |), buckets AS (
              |  SELECT vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket
              |  FROM proj GROUP BY vec_id
              |), qb AS (
              |  SELECT bucket AS q_bucket FROM buckets WHERE vec_id = 0
              |)
              |SELECT b.vec_id, dots.dp / (norms.nrm * qn.qnrm) AS cos_sim
              |FROM buckets b
              |JOIN qb ON b.bucket = qb.q_bucket
              |JOIN dots ON dots.vec_id = b.vec_id
              |JOIN norms ON norms.vec_id = b.vec_id
              |CROSS JOIN qn
              |WHERE b.vec_id <> 0
              |ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10""".stripMargin)),

    // Embedding-cosine near-dup: candidate pairs share an LSH bucket
    // (sign projections onto planes 1..4), then exact cosine ≥ 0.35.
    // The bucket join is the blocking step — the n² pair space never
    // forms; recall/threshold trade like any SRP-LSH deployment.
    QueryDef(
      "q44_embed_neardup",
      (s, d) => {
        val emb = embeddings(s, d)
        val planes = emb.filter(col("vec_id").between(1, 4))
          .select(col("vec_id").as("plane_id"), col("embedding").as("plane"))
        val buckets = emb.crossJoin(broadcast(planes))
          .select(col("vec_id"), col("plane_id"),
            signBit(col("embedding"), col("plane")).as("bit"))
          .groupBy("vec_id")
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("plane_id"), col("bit")))),
              x => x.getField("bit")), "").as("bucket"))
        // per-vector norm computed ONCE as a column (2k folds), so each
        // candidate pair pays a single exact-decimal dot — not three.
        // Same value as cosine(): norm is the identical expression,
        // just hoisted out of the pair loop. Measured 33s → ~11s at
        // sf0.1.
        val withVec = buckets.join(emb, "vec_id")
          .withColumn("nrm", norm(col("embedding")))
        withVec.as("a")
          .join(withVec.as("b"),
            col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
            (dot(col("a.embedding"), col("b.embedding")) /
              (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
          .filter(col("cos_sim") >= 0.35)
          .orderBy("a_id", "b_id")
      },
      Some(s"""$vecCtes, pexp AS (
              |  SELECT vec_id AS plane_id, x AS p, i FROM dexp
              |  WHERE vec_id BETWEEN 1 AND 4
              |), proj AS (
              |  SELECT d.vec_id, p.plane_id,
              |    CASE WHEN SUM(CAST(d.x * p.p AS DECIMAL(38,12))) >= 0
              |      THEN '1' ELSE '0' END AS bit
              |  FROM dexp d JOIN pexp p USING (i) GROUP BY d.vec_id, p.plane_id
              |), buckets AS (
              |  SELECT vec_id, string_agg(bit, '' ORDER BY plane_id) AS bucket
              |  FROM proj GROUP BY vec_id
              |), pairs AS (
              |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
              |  FROM buckets a JOIN buckets b
              |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
              |), pairdots AS (
              |  SELECT p.a_id, p.b_id,
              |    CAST(SUM(CAST(da.x * db.x AS DECIMAL(38,12))) AS DOUBLE) AS dp
              |  FROM pairs p
              |  JOIN dexp da ON da.vec_id = p.a_id
              |  JOIN dexp db ON db.vec_id = p.b_id AND da.i = db.i
              |  GROUP BY p.a_id, p.b_id
              |)
              |SELECT pd.a_id, pd.b_id, pd.dp / (na.nrm * nb.nrm) AS cos_sim
              |FROM pairdots pd
              |JOIN norms na ON na.vec_id = pd.a_id
              |JOIN norms nb ON nb.vec_id = pd.b_id
              |WHERE pd.dp / (na.nrm * nb.nrm) >= 0.35
              |ORDER BY a_id, b_id""".stripMargin))
  )
}
