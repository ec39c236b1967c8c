package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** BM25 lexical retrieval (Robertson & Spärck Jones probabilistic
  * relevance framework; the Okapi BM25 form with Lucene's non-negative
  * idf). The reference corpus ships similarity search over EMBEDDINGS
  * (SRP-LSH / IVF / PQ); this is the lexical rung of the same serving
  * story — an inverted index (term → (doc, tf) postings) plus a
  * query-time scorer, the retrieval baseline every RAG / training-data
  * curation pipeline still runs next to its ANN index.
  *
  * 100 TB stance: the index build is one explode + hash-agg (linear,
  * map-side partial). Query time touches the corpus ONCE: the query
  * vocabulary broadcast-semi-joins the postings (pushed below the
  * postings aggregate, so non-query terms never reach its shuffle)
  * and the query-vocab-sized probe result is pinned — document
  * frequencies, candidate pairs, and scores all derive from it. The
  * only big shuffle left is the (query, doc) partial-score agg,
  * keyed well before top-k. Top-k
  * rides [[graft.plans.GroupedTopK]]: a bounded heap per group on the
  * map side, so the exchange carries ≤ k rows per (query, partition),
  * never the full scored candidate set.
  *
  * Two scorers share the plumbing:
  *  - [[search]] — textbook BM25, `ln(1 + (N-df+0.5)/(df+0.5))` idf in
  *    doubles. The float seam (ln) makes it unsuitable for
  *    cross-engine hash gates; it is property-tested against an
  *    in-memory reference instead.
  *  - [[searchCore]] — the transcendental-free core used by the
  *    oracle-gated queries: idf quantized to the integer `N - df + 1`
  *    (strictly monotone in the true idf, so per-term and single-term
  *    rankings are preserved exactly; multi-term sums weigh rare
  *    terms less aggressively than ln), and the tf-saturation term
  *    evaluated as ONE exact integer ratio. With k1 = 6/5 and b = 3/4,
  *      sat = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *          = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)
  *    where T = Σ dl and N = doc count (avgdl = T/N substituted and
  *    the fraction cleared). Numerator and denominator are BIGINT
  *    (bounded by ~22·tf_max·T — past 2^63 shard the corpus stats),
  *    each converted exactly to double, and the per-term score is two
  *    correctly-rounded IEEE ops — bit-identical on any engine. The
  *    (query, doc) sum accumulates in DECIMAL(38,12) and rounds to
  *    scale 2, the repo-wide `Exact.dsum` contract.
  */
object Bm25 {

  /** Inverted index: `postings` (term, doc_id, tf), `docLens`
    * (doc_id, dl). Both are plain DataFrames — materialize them with
    * any writer for the index-once/query-many shape.
    */
  final case class Bm25Index(postings: DataFrame, docLens: DataFrame)

  /** Whitespace tokenization, matching the corpus-wide convention.
    *
    * The (id, text) rows are hash-repartitioned by doc id before the
    * explode: the test corpus is one parquet split, so without it the
    * tokenize + explode + partial tf-aggregation runs in ONE scan
    * task. Partitioning by doc_id parallelizes the pass AND satisfies
    * the postings aggregate's ClusteredDistribution (doc_id ⊆ {term,
    * doc_id}), so the exploded term rows are never exchanged — the
    * one shuffle carries document rows, not terms. Both index halves
    * share the exchange (ReusedExchange). Same rows out: tf counts
    * and lengths are keyed aggregations, order-free.
    */
  def index(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Bm25Index = {
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(col("doc_id"))
    val ws = split(col("__text"), " ")
    val postings = base
      .select(col("doc_id"), explode(ws).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val docLens = base
      .select(col("doc_id"), size(ws).cast("long").as("dl"))
    Bm25Index(postings, docLens)
  }

  /** Persist an index parquet-partitioned by a term-hash bucket
    * (postings) — the index-once/query-many layout. A query-time
    * probe filters on the SAME bucket expression, so partition
    * pruning reads only the buckets the query vocabulary hashes to
    * (the WinnowIndex.probe pattern); `docLens` is small per-doc
    * metadata stored unpartitioned.
    */
  def writeIndex(idx: Bm25Index, dir: String,
      numBuckets: Int = 64): Unit = {
    idx.postings
      .withColumn("bucket", pmod(hash(col("term")), lit(numBuckets)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    idx.docLens.write.mode("overwrite").parquet(s"$dir/doclens")
  }

  def readIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Bm25Index =
    Bm25Index(
      spark.read.parquet(s"$dir/postings")
        .select("term", "doc_id", "tf"),
      spark.read.parquet(s"$dir/doclens"))

  /** Postings rows for a term set, read with partition pruning: the
    * filter is expressed on the stored bucket column, so only
    * |terms| of the `numBuckets` partitions are scanned.
    */
  def probeIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      terms: Seq[String], numBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    // bucket ids via the same Catalyst hash() the writer used (a
    // driver-side reimplementation would silently drift from
    // Murmur3-seed-42) — |terms| rows, one local job
    val buckets = terms.toDF("term")
      .select(pmod(hash(col("term")), lit(numBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .select("term", "doc_id", "tf")
  }

  /** The query vocabulary of a (query_id, terms) queries frame,
    * collected driver-side — query sets are small by the serving
    * contract, so this is a |vocab|-row pull, not a corpus action.
    */
  def queryVocab(queries: DataFrame): Seq[String] =
    queries.select(explode(col("terms")).as("term")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** A pruned [[Bm25Index]] view over a [[writeIndex]] layout for a
    * known query vocabulary: postings come from [[probeIndex]]
    * (partition-pruned to the buckets the terms hash to), doc lengths
    * from the stored doclens. Pruning keeps EVERY postings row of the
    * probed terms, so per-term document frequencies and the corpus
    * stats (n_docs, total_len — computed from the unpruned doclens)
    * are unchanged: every downstream scorer is bit-identical to the
    * inline path.
    */
  def prunedIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, terms: Seq[String],
      numBuckets: Int = 64): Bm25Index =
    Bm25Index(probeIndex(spark, dir, terms, numBuckets),
      spark.read.parquet(s"$dir/doclens"))

  /** Serve [[searchCore]] straight from a [[writeIndex]] layout with
    * partition pruning: the query vocabulary routes through
    * [[probeIndex]], so only the buckets the terms hash to are READ,
    * not just filtered after a full-index scan. Everything downstream
    * (df, saturation, top-k) is identical to the inline path.
    */
  def searchCoreStored(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, topK: Int = 10,
      numBuckets: Int = 64): DataFrame =
    searchCore(
      prunedIndex(spark, dir, queryVocab(queries), numBuckets),
      queries, topK)

  /** [[scoreCore]] (the uncut candidate scoring) from a [[writeIndex]]
    * layout, with the same partition-pruned probe as
    * [[searchCoreStored]].
    */
  def scoreCoreStored(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame,
      numBuckets: Int = 64): DataFrame =
    scoreCore(
      prunedIndex(spark, dir, queryVocab(queries), numBuckets),
      queries)

  /** Incremental index maintenance — fold a batch of NEW documents
    * into an existing index without re-tokenizing the old corpus
    * (the q175 partial-fold contract). Batch doc ids must be new;
    * re-indexing an existing id means delete-then-add (filter the
    * old index by id first). Existing postings rows pass through
    * untouched — the merge is a union, not a rewrite — so on a
    * materialized index only the delta's buckets change.
    */
  def mergeIndex(idx: Bm25Index, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Bm25Index = {
    val delta = index(newDocs, idCol, textCol)
    Bm25Index(
      idx.postings.unionByName(delta.postings),
      idx.docLens.unionByName(delta.docLens))
  }

  /** Shared query plumbing: queries (query_id, terms array<string>)
    * deduped per query, broadcast into postings, joined with doc
    * lengths and the 1-row corpus stats, scored per (query, doc) term
    * pair by `perTerm`, then summed by `total` and top-k'd.
    */
  private def scored(idx: Bm25Index,
      queries: DataFrame, topK: Int,
      perTerm: Column,
      total: Column => Column): DataFrame =
    graft.plans.GroupedTopK.of(
      scoredAll(idx, queries, perTerm, total), Seq("query_id"),
      Seq(col("score").desc, col("doc_id").asc), topK)
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))

  private def scoredAll(idx: Bm25Index,
      queries: DataFrame,
      perTerm: Column,
      total: Column => Column): DataFrame = {
    val stats = idx.docLens.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_len"))
    val qterms = queries
      .select(col("query_id"), explode(col("terms")).as("term"))
      .distinct()
    val qvocab = qterms.select("term").distinct()
    // ONE pass over the index: the left-semi on the grouping key
    // pushes below the postings aggregate (Catalyst's
    // PushDownLeftSemiAntiJoin), so non-query terms never reach the
    // postings shuffle; the surviving rows are query-vocab-sized, and
    // pinning them (lazy localCheckpoint) lets document frequencies
    // and candidate pairs both read the probe result without a second
    // corpus pass. eager = false keeps PLAN CONSTRUCTION free — no
    // Spark job runs until the caller acts on the result — so
    // building many search plans in a session costs nothing until
    // they execute. Block lifetime: the checkpointed RDD blocks live
    // until the plan is GC'd (Spark's ContextCleaner releases them
    // with the RDD reference); a long-lived session issuing thousands
    // of searches should batch its queries into one call (the
    // queries side is a DataFrame precisely so many queries amortize
    // one probe) rather than one call per query. localCheckpoint
    // trades executor-loss recoverability for not re-scanning the
    // index — the right trade for a serving path whose index is
    // re-readable from storage anyway.
    val relPost = idx.postings
      .join(broadcast(qvocab), Seq("term"), "left_semi")
      .localCheckpoint(eager = false)
    val dfreq = relPost.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"))
    val pairs = relPost
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .join(idx.docLens, "doc_id")
      .crossJoin(broadcast(stats))
    pairs
      .withColumn("__s", perTerm)
      .groupBy("query_id", "doc_id")
      .agg(total(col("__s")).as("score"))
  }

  /** Textbook BM25 (double math, ln idf) — top `topK` docs per query,
    * (query_id, doc_id, score) ordered score desc / doc_id asc.
    */
  def search(idx: Bm25Index, queries: DataFrame, topK: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("total_len").cast(DoubleType) /
      col("n_docs").cast(DoubleType)
    val sat = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) *
        col("dl").cast(DoubleType) / avgdl))
    scored(idx, queries, topK, idf * sat, sum)
  }

  /** Transcendental-free BM25 core (k1 = 6/5, b = 3/4 folded into one
    * exact integer ratio; integer idf; decimal-accumulated sum) —
    * engine-portable, the form the oracle-gated queries run.
    */
  def searchCore(idx: Bm25Index, queries: DataFrame,
      topK: Int = 10): DataFrame = {
    val partial = scoreCore(idx, queries)
    graft.plans.GroupedTopK.of(partial, Seq("query_id"),
      Seq(col("score").desc, col("doc_id").asc), topK)
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  /** [[searchCore]] without the top-k cut: every scored (query, doc)
    * candidate pair — the form ranking-quality metrics (self-retrieval
    * MRR, rank-of-known-item) need, where the item of interest may sit
    * far below any serving k.
    */
  def scoreCore(idx: Bm25Index, queries: DataFrame): DataFrame = {
    val num = (lit(22L) * col("tf") * col("total_len")).cast(DoubleType)
    val den = (lit(10L) * col("tf") * col("total_len") +
      lit(3L) * col("total_len") +
      lit(9L) * col("dl") * col("n_docs")).cast(DoubleType)
    val idf = (col("n_docs") - col("df") + lit(1L)).cast(DoubleType)
    val perTerm = idf * (num / den)
    scoredAll(idx, queries, perTerm,
      s => sum(s.cast(DecimalType(38, 12)))
        .cast(DecimalType(38, 2)).cast(DoubleType))
  }
}
