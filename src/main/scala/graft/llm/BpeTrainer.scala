package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) as a Spark job — the step a training-data
  * pipeline runs between corpus prep (q205 already reports the
  * first-merge pair counts) and sequence packing (q77).
  *
  * Scale design: BPE never needs the corpus inside its loop. One
  * linear hash-agg folds 100 TB of text into the (word, freq) table —
  * |distinct words| rows, a model-metadata-scale DataFrame — and every
  * merge iteration runs on THAT table: explode adjacent token pairs
  * weighted by word freq, hash-agg, take the global argmax, rewrite
  * the token arrays. Per iteration the cluster does two narrow jobs
  * over |vocab| rows; only the single winning pair is collected to the
  * driver (O(1) per iteration, like Centroids' k-means step). The
  * merge REWRITE is a per-row array fold (`aggregate` HOF) — no
  * shuffle at all.
  *
  * Determinism: the winning pair is argmax by (weighted count desc,
  * left asc, right asc) — a total order, so the learned merge sequence
  * is independent of partitioning. Merging is the standard
  * left-to-right non-overlapping scan (`aaa` + merge (a,a) → `[aa, a]`).
  *
  * Tokens start as single characters (no end-of-word marker — merges
  * never cross word boundaries because the fold runs within each
  * word's token array).
  */
object BpeTrainer {

  /** One learned merge: adjacent tokens (left, right) → left+right. */
  final case class Merge(left: String, right: String)

  /** The (word, freq, tokens) working table: one row per DISTINCT
    * word, `freq` its corpus count, `tokens` its current segmentation.
    */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .withColumn("tokens", split(col("word"), ""))

  /** Adjacent-pair weighted counts over a (freq, tokens) table —
    * exposed because it is also the audit view (q205's shape).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("tokens")) >= 2)
      .select(col("freq"), explode(zip_with(
        slice(col("tokens"), lit(1), size(col("tokens")) - 1),
        slice(col("tokens"), lit(2), size(col("tokens")) - 1),
        (a, b) => struct(a.as("left"), b.as("right")))).as("pair"))
      .groupBy(col("pair.left").as("left"), col("pair.right").as("right"))
      .agg(sum(col("freq")).as("weight"))

  /** Left-to-right non-overlapping merge of one adjacent pair inside a
    * token array, as a codegen-able fold: accumulator = (emitted
    * tokens, pending token); "" marks no-pending (single-char BPE
    * tokens are never empty).
    */
  def mergeExpr(tokens: Column, left: String, right: String): Column = {
    val empty = array().cast(ArrayType(StringType))
    aggregate(
      tokens,
      struct(empty.as("out"), lit("").as("pend")),
      (acc, t) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend === "", struct(out.as("out"), t.as("pend")))
          .when(pend === left && t === right,
            struct(concat(out, array(lit(left + right))).as("out"),
              lit("").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            t.as("pend")))
      },
      acc => when(acc.getField("pend") === "", acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
  }

  /** Learn `numMerges` merges. Returns the ordered merge list and the
    * final word table (its `tokens` column is the trained
    * segmentation of every corpus word). Stops early when no adjacent
    * pair remains.
    */
  def train(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): (Seq[Merge], DataFrame) = {
    var words = wordTable(docs, textCol).cache()
    words.count() // materialize before the loop re-derives from it
    val merges = Seq.newBuilder[Merge]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("weight").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(l, r)
        val next = words
          .withColumn("tokens", mergeExpr(col("tokens"), l, r))
          .cache()
        next.count()
        words.unpersist()
        words = next
      }
      i += 1
    }
    (merges.result(), words)
  }

  /** Apply a learned merge sequence (in training order) to segment the
    * words of `textCol` — the expression-only serving path. One fold
    * per merge, stacked lazily into a single projection.
    *
    * MERGE-COUNT BOUND: the projection nests one `transform(aggregate)`
    * per merge, so the expression tree grows linearly in |merges| —
    * fine for the tens of merges the oracle gates run, but a real
    * tokenizer's ~32k merges blow past codegen method limits and
    * planning time long before data size matters. Past a few hundred
    * merges use [[encodeBulk]], which applies the WHOLE ranking in one
    * imperative pass per row (parity-pinned in BpeTrainerSpec).
    */
  def encode(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    val start = docs.withColumn("__words",
      filter(split(col(textCol), " "), w => length(w) > 0))
    val tokens = merges.foldLeft(
      transform(col("__words"), w => split(w, "")): Column) {
      case (c, Merge(l, r)) => transform(c, ts => mergeExpr(ts, l, r))
    }
    start
      .withColumn("tokens", flatten(tokens))
      .drop("__words")
  }

  /** Segment one word against a merge ranking: repeatedly find the
    * LOWEST-RANK adjacent pair present and merge its occurrences
    * left-to-right non-overlapping (the [[mergeExpr]] scan), until no
    * adjacent pair is ranked. Equivalent to applying the merges in
    * training order ([[encode]]'s fold): a later merge can never
    * create an instance of an earlier pair — an earlier pair's
    * constituents are formed only by merges earlier still, and
    * merging two adjacent tokens never makes two OTHER tokens
    * adjacent — so processing present pairs in rank order equals the
    * fold with absent merges skipped.
    */
  private[llm] def segmentWord(word: String,
      rank: collection.Map[(String, String), Int]): Array[String] = {
    var toks = word.map(_.toString).toArray
    var done = toks.length < 2
    while (!done) {
      // lowest-rank pair present
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // apply it fully, left-to-right non-overlapping
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 &&
              rank.getOrElse((toks(j), toks(j + 1)), Int.MaxValue)
                == best) {
            out += toks(j) + toks(j + 1)
            j += 2
          } else {
            out += toks(j)
            j += 1
          }
        }
        toks = out.result()
        done = toks.length < 2
      }
    }
    toks
  }

  /** [[encode]] at real-tokenizer vocab scale: the WHOLE merge
    * ranking is broadcast as one map and applied per row in a single
    * `mapPartitions` pass — no per-merge expression, so 32k merges
    * cost a ~32k-entry broadcast (model metadata) instead of a 32k-
    * deep expression tree. Output schema = input columns + `tokens`
    * (array<string>), same as [[encode]]; the per-partition word
    * cache exploits the Zipf repetition of natural text (each
    * DISTINCT word per partition is segmented once).
    *
    * The one non-codegen operator in the llm package — justified
    * because the per-row rank-lowest loop is genuinely iterative
    * (data-dependent trip count) and the alternative is the
    * [[encode]] expression tower that cannot plan at vocab scale.
    */
  def encodeBulk(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val rankB = spark.sparkContext.broadcast(
      merges.iterator.zipWithIndex
        .map { case (m, i) => (m.left, m.right) -> i }.toMap)
    val inSchema = docs.schema
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields :+ org.apache.spark.sql.types.StructField(
        "tokens", ArrayType(StringType), nullable = false))
    val textIdx = inSchema.fieldIndex(textCol)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(outSchema))
    docs.mapPartitions { rows =>
      val rank = rankB.value
      val cache = collection.mutable.HashMap.empty[String, Array[String]]
      rows.map { row =>
        val toks = row.getString(textIdx).split(' ').iterator
          .filter(_.nonEmpty)
          .flatMap(w => cache.getOrElseUpdate(w, segmentWord(w, rank)))
          .toSeq
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ toks)
      }
    }(enc)
  }
}
