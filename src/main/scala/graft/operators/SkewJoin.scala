package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (builder prompt: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting is the deterministic fallback when one key dominates so
  * hard that even split shuffle blocks overload a task (the classic
  * null-key / celebrity-key problem at 100 TB).
  *
  * Left side gets a random-but-bounded salt [0, buckets); the (small
  * enough to replicate, too big to broadcast) right side is exploded
  * `buckets` ways. The join key becomes (key, salt) — the hot key's
  * rows spread over `buckets` tasks instead of one.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, replicated: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // deterministic salt: stable hash of the whole row spread mod buckets
    // (rand() would break retry idempotence mid-stage)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets)))
    val exploded = replicated
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted
      .join(exploded, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
