package graft.llm

import graft.functions.TextFunctions._
import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection API over a (docId, text) corpus —
  * MinHash signatures + LSH banding, with exact-Jaccard verification
  * of candidates (SURVEY.md §7.5; builder-prompt dedup inventory).
  *
  * Scale design: signatures are one groupBy over exploded shingles
  * (map-side partial min); the band join touches only colliding
  * buckets, never the n² pair space; verification re-joins grams for
  * candidate pairs only. At 100 TB the only full-data shuffle is the
  * (doc, gram) explode — linear in corpus size.
  *
  * Two implementations:
  *  - [[candidatePairs]]/[[nearDuplicates]]: engine-native, md5 as the
  *    seeded hash family (portable, what q31/q32 declare);
  *  - [[candidatePairsML]]: spark.ml MinHashLSH over a CountVectorizer
  *    shingle space — the built-in alternative (SURVEY.md §7.5).
  */
object MinHashDedup {

  /** Distinct (doc_id, gram) shingles. The token array gets its own
    * projection first: inlining split() into the trigram lambda would
    * re-evaluate it per element (HOFs are CodegenFallback — no
    * subexpression elimination), O(words²) per document.
    */
  def shingles(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"), explode(trigrams(col("__ws"))).as("gram"))
      .distinct()

  /** Shingles with stop-gram hygiene: grams in more than
    * `max(5, dfFraction × corpus)` documents are dropped before any
    * signature/pair work — they carry ~zero Jaccard discrimination
    * but d² candidate-pair rows each (the q31/q32 cap, as a library
    * default).
    */
  def shinglesCapped(docs: DataFrame, dfFraction: Double = 0.002,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cap = math.max(5L, math.ceil(dfFraction * docs.count()).toLong)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    shingles(docs, idCol, textCol)
      .withColumn("df", count(lit(1)).over(w))
      .filter(col("df") <= cap)
      .drop("df")
  }

  /** MinHash signatures: `numHashes` components per document, via the
    * sliced scheme (numHashes / 4 md5s per shingle — see
    * TextFunctions.minhashSlicedAggs).
    */
  def signatures(grams: DataFrame, numHashes: Int = 8): DataFrame = {
    val aggs = minhashSlicedAggs(col("gram"), numHashes)
    grams.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: candidate pairs sharing ≥1 of `bands` bands.
    * Signatures run over df-capped shingles; band buckets over
    * `bucketCap` docs are dropped before the pair join (a degenerate
    * bucket is an exact-dup cluster — the exact-dedup pass's job, and
    * d² candidate pairs here).
    */
  def candidatePairs(docs: DataFrame, numHashes: Int = 8,
      bands: Int = 4, dfFraction: Double = 0.002,
      bucketCap: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = signatures(shinglesCapped(docs, dfFraction), numHashes)
    val bandCols = (0 until bands).map(b =>
      concat_ws("|", (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bv")
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bv")
      .withColumn("bsz", count(lit(1)).over(wBucket))
      .filter(col("bsz") <= bucketCap)
      .drop("bsz")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Candidates verified by exact trigram Jaccard ≥ threshold (over
    * the same df-capped shingle space the signatures used).
    */
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.7,
      numHashes: Int = 8, bands: Int = 4, dfFraction: Double = 0.002,
      bucketCap: Int = 1000): DataFrame = {
    val grams = shinglesCapped(docs, dfFraction)
    val cnt = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cands = candidatePairs(docs, numHashes, bands, dfFraction, bucketCap)
    val common = cands
      .join(grams.as("ga"), col("a_id") === col("ga.doc_id"))
      .join(grams.as("gb"),
        col("b_id") === col("gb.doc_id") && col("ga.gram") === col("gb.gram"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_common"))
    common
      .join(cnt.as("ca"), col("a_id") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("b_id") === col("cb.doc_id"))
      .select(col("a_id"), col("b_id"),
        (col("n_common").cast("double") /
          (col("ca.n") + col("cb.n") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** spark.ml variant: CountVectorizer over shingles → MinHashLSH
    * approxSimilarityJoin at the given Jaccard-distance threshold.
    * Fixed seed → deterministic.
    */
  def candidatePairsML(docs: DataFrame, maxJaccardDistance: Double = 0.5,
      numHashTables: Int = 8): DataFrame = {
    val grammed = docs
      .select(col("doc_id"), words(col("text")).as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"), array_distinct(trigrams(col("__ws"))).as("grams"))
    val cv = new CountVectorizer().setInputCol("grams")
      .setOutputCol("features").setBinary(true)
    val model = cv.fit(grammed)
    val feats = model.transform(grammed)
    val lsh = new MinHashLSH().setInputCol("features")
      .setOutputCol("hashes").setNumHashTables(numHashTables).setSeed(42L)
    val lshModel = lsh.fit(feats)
    lshModel.approxSimilarityJoin(feats, feats, maxJaccardDistance, "dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"), col("dist"))
  }
}
