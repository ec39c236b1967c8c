package graft.queries

import graft.Tables._
import graft.functions.TextFunctions.words
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators beyond the per-document text stats in
  * TextQueries: paragraph(chunk)-level dedup signals (CCNet-style),
  * TF-IDF term ranking, corpus bigram statistics, and the per-source
  * mix report a 100 TB training-data pipeline runs before sampling.
  *
  * Scale stance: everything here is explode → hash-agg → (broadcast)
  * join-back — linear in corpus size, no self-joins, no windows over
  * unpartitioned data. The only corpus-wide reductions are hash
  * aggregates on high-cardinality keys (chunk/term/bigram), which
  * partial-aggregate map-side before the shuffle.
  */
object CorpusQueries {
  import Exact._

  val all: Seq[QueryDef] = Seq(
    // Chunk-level (paragraph) dedup signal, CCNet-style: split each
    // document into fixed 10-word chunks, count how many of a doc's
    // chunks also appear in at least one OTHER document, and flag docs
    // whose duplicated-chunk ratio crosses 0.3. The chunk list is a
    // per-row array comprehension (no join to build chunks); the only
    // shuffles are the chunk-frequency hash-agg and the join-back.
    QueryDef(
      "q95_chunk_dedup",
      (s, d) => {
        val ws = words(col("text"))
        val nChunks = ceil(size(ws) / lit(10.0)).cast("int")
        val chunkArr = transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(ws, i * 10 + 1, lit(10))))
        val chunks = documents(s, d)
          .select(col("doc_id"), posexplode(chunkArr))
          .select(col("doc_id"), col("pos").as("chunk_idx"),
            col("col").as("chunk"))
        val freq = chunks.groupBy("chunk")
          .agg(count_distinct(col("doc_id")).as("nd"))
        chunks.join(freq, "chunk")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
          .withColumn("dup_ratio",
            col("n_dup_chunks").cast("double") / col("n_chunks"))
          .withColumn("verdict",
            when(col("dup_ratio") > 0.3, "drop").otherwise("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |), chunks AS (
             |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
             |    array_to_string(list_slice(ws, i*10+1, i*10+10), ' ') AS chunk
             |  FROM w, LATERAL unnest(
             |    range(0, CAST(ceil(len(ws)/10.0) AS INT))) AS t(i)
             |), freq AS (
             |  SELECT chunk, COUNT(DISTINCT doc_id) AS nd
             |  FROM chunks GROUP BY chunk
             |)
             |SELECT c.doc_id, COUNT(*) AS n_chunks,
             |  CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup_chunks,
             |  CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*) AS dup_ratio,
             |  CASE WHEN CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END)
             |      AS DOUBLE) / COUNT(*) > 0.3
             |    THEN 'drop' ELSE 'keep' END AS verdict
             |FROM chunks c JOIN freq f ON c.chunk = f.chunk
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // TF-IDF term ranking: term frequency per (doc, term), document
    // frequency per term, top-3 terms per doc ordered tf desc / rarer
    // first / term asc. Integer measures only — the ln() of the idf
    // weight is monotone in (tf, -df), so the ranking needs no float
    // math that could differ across engines.
    QueryDef(
      "q96_tfidf_terms",
      (s, d) => {
        val tf = documents(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term")
          .agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)
        tf.join(df, "term")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("doc_id", "rank", "term", "tf", "df")
          .orderBy("doc_id", "rank")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, w AS term, COUNT(*) AS tf
             |  FROM documents, LATERAL unnest(string_split(text, ' ')) AS u(w)
             |  GROUP BY doc_id, w
             |), df AS (
             |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
             |)
             |SELECT doc_id, rank, term, tf, df FROM (
             |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |    CAST(row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS INTEGER)
             |      AS rank
             |  FROM tf JOIN df USING (term))
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // Corpus-wide bigram statistics: adjacent word pairs built per row
    // with zip_with over two offset slices — no positions self-join on
    // the Spark side (the oracle spells it as the textbook position
    // comprehension). Top-20 with a deterministic tie-break.
    QueryDef(
      "q97_bigrams",
      (s, d) => {
        val ws = words(col("text"))
        val bigrams = zip_with(
          slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b))
        documents(s, d)
          .filter(size(ws) >= 2)
          .select(explode(bigrams).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(20)
      },
      Some("""WITH w AS (
             |  SELECT string_split(text, ' ') AS ws FROM documents
             |  WHERE len(string_split(text, ' ')) >= 2
             |)
             |SELECT bigram, COUNT(*) AS n FROM (
             |  SELECT unnest(list_transform(range(1, len(ws)),
             |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
             |  FROM w)
             |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin)),

    // Per-source corpus mix report — the sanity dashboard a pipeline
    // emits before mixture sampling (q75 consumes these proportions):
    // document and language counts, exact mean length, total token
    // supply per source. One hash-agg pass, a 100 TB no-brainer.
    QueryDef(
      "q99_source_mix",
      (s, d) =>
        documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("lang")).as("n_langs"),
            davg(col("n_chars")).as("avg_chars"),
            sum(size(words(col("text"))).cast("long")).as("total_tokens"))
          .orderBy("source"),
      Some(s"""SELECT source, COUNT(*) AS n_docs,
              |  COUNT(DISTINCT lang) AS n_langs,
              |  ${sqlDavg("n_chars")} AS avg_chars,
              |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
              |    AS total_tokens
              |FROM documents GROUP BY source ORDER BY source""".stripMargin))
  )
}
