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

  // The q277/q288/q315 duplicate-span chain (DuckDB): every k=5 gram
  // start → corpus-wide gram frequency → duplicated positions →
  // per-doc gaps-and-islands → maximal spans sp(doc_id, island, s, e).
  // Shared verbatim so the three oracles cannot drift apart.
  private val dupSpanCtes: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    md5(array_to_string(ws[i:i+4], ' ')) AS gh
      |  FROM w, LATERAL unnest(generate_series(1, len(ws) - 4))
      |    AS t(i)
      |  WHERE len(ws) >= 5
      |), dupg AS (
      |  SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2
      |), dup AS (
      |  SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gh)
      |), lagd AS (
      |  SELECT doc_id, pos,
      |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
      |      AS lagp
      |  FROM dup
      |), isl AS (
      |  SELECT doc_id, pos,
      |    SUM(CASE WHEN lagp IS NOT NULL AND pos - lagp <= 5
      |        THEN 0 ELSE 1 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM lagd
      |), sp AS (
      |  SELECT doc_id, island, MIN(pos) AS s,
      |    MAX(pos) + 4 AS e
      |  FROM isl GROUP BY doc_id, island
      |)""".stripMargin

  /** Maximal duplicated spans (k = 5, symmetric) served from a
    * per-session parquet store: the gram-frequency + islands machinery
    * runs ONCE per dataset (q315 is the labeled build; in the bench
    * the untimed warm-up pays getOrBuild), and the report (q277) and
    * scrub (q288) rows measure what a pipeline pays per SERVING pass
    * over the sparse span table — the q216/q238 build/serve split
    * applied to substring dedup.
    */
  private def dupSpansStore(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val p = graft.StoreCache.getOrBuild("dupspans", d) { path =>
      graft.llm.DuplicateSpans.spans(documents(s, d), 5)
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(p)
  }

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
        // tokens hoisted to their own projection: slice(ws) inside the
        // chunk lambda would re-split the text per chunk (HOF lambdas
        // re-evaluate inlined arguments per element)
        val ws = col("__ws")
        val nChunks = ceil(size(ws) / lit(10.0)).cast("int")
        val chunkArr = transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(ws, i * 10 + 1, lit(10))))
        val chunks = documents(s, d)
          .select(col("doc_id"), words(col("text")).as("__ws"))
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

    // Bigram-coverage LM quality score (the CCNet idea — score each
    // document by how "in-distribution" its language is under a model
    // trained on the corpus — with the n-gram LM reduced to its
    // integer core): vocab = the corpus's top-200 bigrams, coverage =
    // the fraction of a doc's bigram tokens that land in that vocab.
    // Transcendental-free (no log-perplexity float seam) yet ranks
    // docs the same way for filtering: boilerplate/templated text
    // scores high, gibberish scores ~0. Vocab is a fixed-size top-k
    // (model metadata at any corpus scale) broadcast into the
    // join-back; docs with <2 words have no bigrams and are excluded.
    QueryDef(
      "q224_bigram_coverage",
      (s, d) => {
        val ws = words(col("text"))
        val bigrams = zip_with(
          slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b))
        val docBi = documents(s, d)
          .filter(size(ws) >= 2)
          .select(col("doc_id"), explode(bigrams).as("bigram"))
        val vocab = docBi.groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(200)
          .select(col("bigram"), lit(1L).as("in_vocab"))
        docBi
          .join(broadcast(vocab), Seq("bigram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(coalesce(col("in_vocab"), lit(0L))).as("n_in_vocab"))
          .withColumn("coverage",
            col("n_in_vocab").cast("double") / col("n_bigrams"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |  WHERE len(string_split(text, ' ')) >= 2
             |), bi AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(ws)),
             |      i -> ws[i] || ' ' || ws[i+1])) AS bigram
             |  FROM w
             |), vocab AS (
             |  SELECT bigram FROM (
             |    SELECT bigram, COUNT(*) AS n FROM bi
             |    GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 200)
             |)
             |SELECT b.doc_id, COUNT(*) AS n_bigrams,
             |  CAST(SUM(CASE WHEN v.bigram IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_in_vocab,
             |  CAST(SUM(CASE WHEN v.bigram IS NOT NULL THEN 1 ELSE 0 END)
             |    AS DOUBLE) / COUNT(*) AS coverage
             |FROM bi b LEFT JOIN vocab v USING (bigram)
             |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin)),

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
              |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // PII masking (the redaction pass a corpus runs before training):
    // digits masked to '#', long digit runs collapsed to '[ID]', plus
    // the digit count as the audit signal. Pure per-row regex
    // projection — map-side at scan speed, no shuffle. Patterns stay
    // inside RE2's subset (no lookahead) so any engine can run them.
    QueryDef(
      "q113_pii_mask",
      (s, d) =>
        customer(s, d)
          .select(col("c_custkey"),
            regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
            regexp_replace(col("c_name"), "[0-9]{4,}", "[ID]")
              .as("redacted_name"),
            (length(col("c_name")) -
              length(regexp_replace(col("c_name"), "[0-9]", "")))
              .as("n_digits"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
             |  regexp_replace(c_name, '[0-9]{4,}', '[ID]', 'g')
             |    AS redacted_name,
             |  CAST(length(c_name) -
             |    length(regexp_replace(c_name, '[0-9]', '', 'g'))
             |    AS INTEGER) AS n_digits
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Token rarity: per-document mean/min corpus document-frequency of
    // its tokens — the "is this doc made of rare words" signal that
    // complements q34/q35. The df side is vocabulary-sized;
    // deliberately NO broadcast hint: a web-scale vocabulary (10⁸+
    // tokens) must shuffle-join on tok, and when the vocab IS small
    // AQE broadcasts it at runtime anyway — the hint would only remove
    // the safe fallback.
    QueryDef(
      "q114_token_rarity",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("tok"))
        val df = toks.distinct().groupBy("tok")
          .agg(count(lit(1)).as("df"))
        toks
          .join(df, "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            davg(col("df")).as("mean_df"),
            min(col("df")).as("rarest_df"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              |  FROM documents
              |), df AS (
              |  SELECT tok, COUNT(DISTINCT doc_id) AS df
              |  FROM toks GROUP BY tok
              |)
              |SELECT doc_id, COUNT(*) AS n_tokens,
              |  ${sqlDavg("df")} AS mean_df,
              |  CAST(MIN(df) AS BIGINT) AS rarest_df
              |FROM toks JOIN df USING (tok)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Inverted-index build (the retrieval-side primitive): token →
    // document frequency + ordered postings "doc:tf". One explode →
    // (doc, tok) hash agg → per-token string fold; postings are sorted
    // by doc_id post-collection, so shuffle order never leaks into
    // the result. At scale the token key is the natural shard.
    QueryDef(
      "q136_inverted_index",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("tok"))
          .groupBy("tok", "doc_id")
          .agg(count(lit(1)).as("tf"))
          .groupBy("tok")
          .agg(count(lit(1)).as("df"),
            sum(col("tf")).as("cf"),
            concat_ws(",",
              transform(
                array_sort(collect_list(struct(col("doc_id"), col("tf")))),
                e => concat(e.getField("doc_id").cast("string"), lit(":"),
                  e.getField("tf").cast("string")))).as("postings"))
          .orderBy("tok"),
      Some("""WITH tf AS (
             |  SELECT tok, doc_id, COUNT(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  GROUP BY tok, doc_id)
             |SELECT tok, COUNT(*) AS df,
             |  CAST(SUM(tf) AS BIGINT) AS cf,
             |  string_agg(CAST(doc_id AS VARCHAR) || ':' ||
             |    CAST(tf AS VARCHAR), ',' ORDER BY doc_id) AS postings
             |FROM tf GROUP BY tok ORDER BY tok""".stripMargin)),

    // Stratified sampling: per-source keep rates (high-quality source
    // oversampled, crawl downsampled) applied via the deterministic
    // md5-prefix bucket — a document's fate never changes as the
    // corpus grows, and the rate table is a literal broadcast.
    QueryDef(
      "q137_stratified_sample",
      (s, d) => {
        val rates = s.createDataFrame(Seq(
          ("src0", "28"), ("src1", "51"), ("src2", "7a"), ("src3", "a3")))
          .toDF("source", "keep_below")
        documents(s, d)
          .join(broadcast(rates), Seq("source"), "inner")
          .filter(substring(md5(concat(lit("strat:"),
            col("doc_id").cast("string"))), 1, 2) < col("keep_below"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"))
          .orderBy("source")
      },
      Some("""SELECT source, COUNT(*) AS n_kept
             |FROM documents
             |JOIN (VALUES ('src0', '28'), ('src1', '51'),
             |  ('src2', '7a'), ('src3', 'a3')) AS r(source, keep_below)
             |  USING (source)
             |WHERE substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 2)
             |  < keep_below
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Source-profile similarity (corpus drift / provenance clustering):
    // cosine between the token-frequency profiles of every source
    // pair — the curation check that flags two crawls as near-mirrors
    // before any per-document work. One linear hash-agg collapses the
    // corpus to |sources| × |vocab| profile rows (cap the vocab to
    // top-V terms on a real corpus); the pair join runs over PROFILES,
    // so it is |sources|² × shared-vocab — model-metadata sized, never
    // corpus sized. Counts are integers: dots and norms are exact
    // 64-bit sums (< 2^53), sqrt/divide correctly-rounded IEEE — the
    // cosine is bit-identical cross-engine with no decimal machinery.
    QueryDef(
      "q155_source_similarity",
      (s, d) => {
        val prof = documents(s, d)
          .select(col("source"), explode(words(col("text"))).as("tok"))
          .groupBy("source", "tok")
          .agg(count(lit(1)).as("tf"))
        val norms = prof.groupBy("source")
          .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
        val a = prof.select(col("source").as("src_a"), col("tok"),
          col("tf").as("tf_a"))
        val b = prof.select(col("source").as("src_b"), col("tok"),
          col("tf").as("tf_b"))
        a.join(b, Seq("tok"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(sum(col("tf_a") * col("tf_b")).as("dp"))
          .join(norms.select(col("source").as("src_a"),
            col("nrm").as("nrm_a")), Seq("src_a"))
          .join(norms.select(col("source").as("src_b"),
            col("nrm").as("nrm_b")), Seq("src_b"))
          .select(col("src_a"), col("src_b"),
            (col("dp").cast("double") / (col("nrm_a") * col("nrm_b")))
              .as("cos_sim"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH prof AS (
             |  SELECT source, tok, COUNT(*) AS tf
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY source, tok
             |), norms AS (
             |  SELECT source, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS nrm
             |  FROM prof GROUP BY source
             |), dots AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    SUM(a.tf * b.tf) AS dp
             |  FROM prof a JOIN prof b ON a.tok = b.tok
             |    AND a.source < b.source
             |  GROUP BY a.source, b.source
             |)
             |SELECT d.src_a, d.src_b,
             |  CAST(d.dp AS DOUBLE) / (na.nrm * nb.nrm) AS cos_sim
             |FROM dots d
             |JOIN norms na ON na.source = d.src_a
             |JOIN norms nb ON nb.source = d.src_b
             |ORDER BY d.src_a, d.src_b""".stripMargin)),

    // Boilerplate STRIP (CCNet line dedup, removal form): q95 flags
    // documents by duplicated-chunk ratio; this operator actually
    // removes the corpus-common chunks (10-word chunks appearing in
    // ≥ 3 documents — headers, navigation, license banners) and
    // re-emits each document's cleaned text. Chunk frequency is one
    // hash-agg; the join-back is on the chunk hash; reassembly is a
    // per-document sort of its own ≤ dozens of chunks (sort_array of
    // (idx, chunk) structs — no window, no corpus sort). Linear end
    // to end.
    QueryDef(
      "q160_boilerplate_strip",
      (s, d) => {
        val ws = col("__ws")
        val nChunks = ceil(size(ws) / lit(10.0)).cast("int")
        val chunkArr = transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(ws, i * 10 + 1, lit(10))))
        val chunks = documents(s, d)
          .select(col("doc_id"), words(col("text")).as("__ws"))
          .select(col("doc_id"), posexplode(chunkArr))
          .select(col("doc_id"), col("pos").as("chunk_idx"),
            col("col").as("chunk"))
        val freq = chunks.groupBy("chunk")
          .agg(count_distinct(col("doc_id")).as("nd"))
        chunks.join(freq, "chunk")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("nd") < 3, 1L).otherwise(0L)).as("n_kept"),
            length(array_join(transform(
              sort_array(collect_list(when(col("nd") < 3,
                struct(col("chunk_idx"), col("chunk"))))),
              st => st.getField("chunk")), " ")).as("clean_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |), chunks AS (
             |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
             |    array_to_string(list_slice(ws, i*10+1, i*10+10), ' ')
             |      AS chunk
             |  FROM w, LATERAL unnest(
             |    range(0, CAST(ceil(len(ws)/10.0) AS INT))) AS t(i)
             |), freq AS (
             |  SELECT chunk, COUNT(DISTINCT doc_id) AS nd
             |  FROM chunks GROUP BY chunk
             |)
             |SELECT c.doc_id, COUNT(*) AS n_chunks,
             |  CAST(SUM(CASE WHEN f.nd < 3 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_kept,
             |  CAST(COALESCE(length(string_agg(
             |    CASE WHEN f.nd < 3 THEN c.chunk END, ' '
             |    ORDER BY c.chunk_idx)), 0) AS INTEGER) AS clean_chars
             |FROM chunks c JOIN freq f ON c.chunk = f.chunk
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // End-to-end corpus-prep pipeline — the composed shape a
    // pretraining data run actually executes, oracle-gated as ONE
    // declared operator: quality gate (length + uniq-token ratio) →
    // exact dedup (md5 fingerprint, min-doc_id survivor) → ~50%
    // deterministic hash sample (q73's md5-bucket trick, seedless and
    // reproducible) → per-source yield report. Every stage is linear
    // or a single keyed shuffle; the whole pipeline is one Spark job
    // chain with no driver round-trips, so it scales exactly as its
    // stages do (q29/q73/q99 individually green).
    QueryDef(
      "q166_corpus_prep",
      (s, d) => {
        val ws = words(col("text"))
        val sig = documents(s, d)
          .withColumn("n_tokens", size(ws))
          .withColumn("n_types", size(array_distinct(ws)))
          .filter(col("n_tokens") >= 20 &&
            col("n_types").cast("double") / col("n_tokens") >= 0.3)
        val surv = sig
          .withColumn("fp", md5(col("text")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("rn") === 1)
        surv
          .filter(substring(md5(col("doc_id").cast("string")), 1, 2)
            < "80")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            davg(col("n_chars")).as("avg_chars"))
          .orderBy("source")
      },
      Some(s"""WITH sig AS (
              |  SELECT doc_id, source, n_chars, text,
              |    len(string_split(text, ' ')) AS n_tokens,
              |    len(list_distinct(string_split(text, ' '))) AS n_types
              |  FROM documents
              |), filt AS (
              |  SELECT * FROM sig
              |  WHERE n_tokens >= 20
              |    AND CAST(n_types AS DOUBLE) / n_tokens >= 0.3
              |), surv AS (
              |  SELECT * FROM (
              |    SELECT *, row_number() OVER (PARTITION BY md5(text)
              |      ORDER BY doc_id) AS rn
              |    FROM filt) WHERE rn = 1
              |), samp AS (
              |  SELECT * FROM surv
              |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
              |)
              |SELECT source, COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              |  ${sqlDavg("n_chars")} AS avg_chars
              |FROM samp GROUP BY source ORDER BY source""".stripMargin)),

    // Overlapping chunk windows (RAG / context-window splitter):
    // width-8 stride-4 token windows per document, emitted as
    // (start, length, md5) — offsets + hash, not text, so the chunk
    // index stays a fraction of corpus size. The window starts come
    // from one `sequence()` per doc and the chunk text from `slice`
    // over the hoisted token array (q95's HOF-hoisting rule) — pure
    // map-side generate, zero shuffle, 2× fan-out at stride =
    // width/2. Complements q95 (disjoint chunks, dedup verdict):
    // this is the retrieval-side splitter with overlap.
    QueryDef(
      "q172_chunk_windows",
      (s, d) => {
        val ws = col("__ws")
        val chunk = slice(ws, col("start"), lit(8))
        documents(s, d)
          .select(col("doc_id"), words(col("text")).as("__ws"))
          .select(col("doc_id"), ws,
            explode(sequence(lit(1), size(ws), lit(4))).as("start"))
          .select(col("doc_id"),
            ((col("start") - 1) / 4).cast("int").as("chunk_idx"),
            col("start"),
            size(chunk).as("chunk_len"),
            md5(concat_ws(" ", chunk)).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |), starts AS (
             |  SELECT doc_id, ws, CAST(s AS INTEGER) AS start
             |  FROM w, LATERAL unnest(range(1, len(ws) + 1, 4)) AS u(s)
             |)
             |SELECT doc_id,
             |  CAST((start - 1) // 4 AS INTEGER) AS chunk_idx, start,
             |  CAST(len(ws[start:start+7]) AS INTEGER) AS chunk_len,
             |  md5(array_to_string(ws[start:start+7], ' ')) AS chunk_md5
             |FROM starts
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // BPE first-merge statistics (the inner step of byte-pair-encoding
    // tokenizer training, Sennrich et al. 2016): corpus-wide counts of
    // adjacent character pairs, weighted by word frequency — the pair
    // with the top count IS the first merge a BPE trainer would learn.
    // The scale shape matters more than the step: the corpus-sized
    // pass is ONE word-frequency hash-agg (map-side combinable); pair
    // generation then runs on the DISTINCT-vocabulary table, which is
    // bounded (Heaps' law) — the 100 TB corpus is touched once per
    // merge round, and rounds after the first fold merges into the
    // vocab table without rescanning the corpus. Top-20 with
    // (count desc, pair asc) total order.
    QueryDef(
      "q205_bpe_pair_counts",
      (s, d) => {
        val wf = documents(s, d)
          .select(explode(words(col("text"))).as("word"))
          .filter(length(col("word")) >= 2)
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
        wf
          .select(col("n"), explode(transform(
            sequence(lit(1), length(col("word")) - 1),
            i => col("word").substr(i, lit(2)))).as("pair"))
          .groupBy("pair")
          .agg(sum(col("n")).cast("long").as("n_occurrences"))
          .orderBy(col("n_occurrences").desc, col("pair").asc)
          .limit(20)
      },
      Some("""WITH wf AS (
             |  SELECT w AS word, COUNT(*) AS n
             |  FROM documents,
             |    LATERAL unnest(string_split(text, ' ')) AS u(w)
             |  WHERE len(w) >= 2
             |  GROUP BY w
             |), pairs AS (
             |  SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, n
             |  FROM wf, LATERAL unnest(range(1, len(word))) AS t(i)
             |)
             |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
             |FROM pairs GROUP BY pair
             |ORDER BY n_occurrences DESC, pair ASC LIMIT 20""".stripMargin)),

    // Temperature-weighted source mixing (the rebalancing step of
    // multilingual / multi-source training-data pipelines, Lample &
    // Conneau 2019 §3.1): sampling weights p_s ∝ n_s^α with α = 0.5 —
    // upweights tail sources relative to proportional sampling — then
    // an INTEGER allocation of a 10 000-document budget via
    // largest-remainder (Hamilton) rounding with (remainder desc,
    // source asc) tie-breaks. Everything after the one per-source
    // count pass is integer arithmetic on a |sources|-row table: the
    // weight is quantized to a scale-6 long (floor(√n·10⁶+0.5) — √ is
    // one correctly-rounded IEEE op in both engines), targets are
    // floor(B·qw/W) on longs, and remainders B·qw − base·W are exact
    // longs, so the allocation is bit-reproducible and sums to B by
    // construction. At 100 TB the corpus pass is the same single
    // hash-agg; the allocation table stays driver-tiny.
    QueryDef(
      "q206_temperature_mix",
      (s, d) => {
        val counts = documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("qw",
            floor(sqrt(col("n_docs").cast("double")) * lit(1e6) +
              lit(0.5)).cast("long"))
        val tot = counts.agg(sum(col("qw")).cast("long").as("w_tot"))
        val b = lit(10000L)
        val based = counts.crossJoin(broadcast(tot))
          .withColumn("base",
            expr("CAST((10000 * qw) DIV w_tot AS BIGINT)"))
          .withColumn("rem", b * col("qw") - col("base") * col("w_tot"))
        val leftover = based
          .agg((b - sum(col("base"))).cast("long").as("l_tot"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("source").asc)
        based.crossJoin(broadcast(leftover))
          .withColumn("rk", row_number().over(w))
          .select(col("source"), col("n_docs"),
            (col("qw").cast("double") / col("w_tot").cast("double"))
              .as("p_sample"),
            (col("base") + when(col("rk") <= col("l_tot"), 1L)
              .otherwise(0L)).as("alloc"))
          .orderBy("source")
      },
      Some("""WITH counts AS (
             |  SELECT source, COUNT(*) AS n_docs,
             |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5)
             |      AS BIGINT) AS qw
             |  FROM documents GROUP BY source
             |), tot AS (
             |  SELECT CAST(SUM(qw) AS BIGINT) AS w_tot FROM counts
             |), based AS (
             |  SELECT source, n_docs, qw, w_tot,
             |    CAST((10000 * qw) // w_tot AS BIGINT) AS base,
             |    10000 * qw - ((10000 * qw) // w_tot) * w_tot AS rem
             |  FROM counts, tot
             |), lo AS (
             |  SELECT CAST(10000 - SUM(base) AS BIGINT) AS l_tot FROM based
             |), ranked AS (
             |  SELECT source, n_docs, qw, w_tot, base,
             |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
             |  FROM based
             |)
             |SELECT source, n_docs,
             |  CAST(qw AS DOUBLE) / CAST(w_tot AS DOUBLE) AS p_sample,
             |  CAST(base + CASE WHEN rk <= l_tot THEN 1 ELSE 0 END
             |    AS BIGINT) AS alloc
             |FROM ranked, lo
             |ORDER BY source""".stripMargin)),

    // Length-bucketed batching report — the decision input for
    // bucketed dynamic batching (group sequences of similar length,
    // pad to the bucket top) versus q77's concat-and-chunk packing
    // (zero waste, but crosses document boundaries): per
    // power-of-two length bucket, document count, real tokens, padded
    // capacity, and the padding-waste fraction. A training run that
    // must respect document boundaries reads this to size its
    // buckets; the waste column is exactly what packing would
    // reclaim. The bucket is the TRUE next power of two (floor 16) —
    // exact integer bit math, `1 << bitlength(n−1)`, not a capped
    // CASE ladder: a capped top bucket makes total_tokens exceed
    // bucket·n_docs for any document past the cap and reports a
    // NEGATIVE waste fraction (and float log2 at exact-power
    // boundaries is engine-dependent — bin()/length is not). One
    // linear projection + an O(distinct-buckets)-row hash-agg;
    // integer until the final ratio.
    QueryDef(
      "q214_length_buckets",
      (s, d) => {
        val t = size(words(col("text"))).cast("long")
        documents(s, d)
          .select(t.as("n_tokens"))
          .withColumn("bucket", when(col("n_tokens") <= 16L, 16L)
            .otherwise(expr(
              "shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1)))")))
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tokens")).cast("long").as("total_tokens"))
          .select(col("bucket"), col("n_docs"), col("total_tokens"),
            (col("bucket") * col("n_docs")).as("capacity"),
            (lit(1.0) - col("total_tokens").cast("double") /
              (col("bucket") * col("n_docs")).cast("double"))
              .as("waste_frac"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (
             |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
             |    AS n_tokens
             |  FROM documents
             |), b AS (
             |  SELECT n_tokens,
             |    CASE WHEN n_tokens <= 16
             |      THEN CAST(16 AS BIGINT)
             |      ELSE CAST(1 AS BIGINT) << length(bin(n_tokens - 1))
             |      END AS bucket
             |  FROM t
             |)
             |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  CAST(bucket * COUNT(*) AS BIGINT) AS capacity,
             |  1.0 - CAST(SUM(n_tokens) AS DOUBLE) /
             |    CAST(bucket * COUNT(*) AS DOUBLE) AS waste_frac
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Eval-set decontamination report (the GPT-3 appendix-C rule,
    // word-4-gram granularity): a training document is contaminated
    // when any of its 4-grams also occurs in the held-out eval set
    // (here the deterministic doc_id % 20 = 0 slice stands in for the
    // benchmark suite). Per contaminated train doc: how many of its
    // DISTINCT 4-grams are eval-tainted and how many eval docs they
    // touch — the evidence a filtering decision needs, not just a
    // boolean. Scale stance: eval suites are tiny and fixed, so the
    // (gram, eval_doc) side is broadcast — the train side is one
    // linear explode + hash-agg, no corpus self-join; at 100 TB the
    // same shape holds with the eval grams as a shared build side
    // (or the q85 Bloom rung when only the boolean is needed).
    QueryDef(
      "q225_eval_decontamination",
      (s, d) => {
        // tokens hoisted (HOF lambdas re-evaluate inlined args per
        // element — see q95); per-doc gram dedup is a per-row
        // array_distinct, not a corpus-wide shuffle.
        val ws = col("__ws")
        val grams = transform(
          sequence(lit(1), size(ws) - lit(3)),
          i => concat_ws(" ", slice(ws, i, lit(4))))
        val docGrams = documents(s, d)
          .select(col("doc_id"), words(col("text")).as("__ws"))
          .filter(size(ws) >= 4)
          .select(col("doc_id"),
            explode(array_distinct(grams)).as("ng"))
        val evalGrams = docGrams
          .filter(col("doc_id") % 20 === 0)
          .select(col("ng"), col("doc_id").as("eval_doc"))
        docGrams
          .filter(col("doc_id") % 20 =!= 0)
          .join(broadcast(evalGrams), "ng")
          .groupBy("doc_id")
          .agg(count_distinct(col("ng")).as("n_tainted_grams"),
            count_distinct(col("eval_doc")).as("n_eval_docs"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |  WHERE len(string_split(text, ' ')) >= 4
             |), g AS (
             |  SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(1, len(ws) - 2),
             |      i -> array_to_string(list_slice(ws, i, i + 3), ' ')))
             |      AS ng
             |  FROM w
             |), ev AS (
             |  SELECT ng, doc_id AS eval_doc FROM g WHERE doc_id % 20 = 0
             |)
             |SELECT g.doc_id,
             |  CAST(COUNT(DISTINCT g.ng) AS BIGINT) AS n_tainted_grams,
             |  CAST(COUNT(DISTINCT ev.eval_doc) AS BIGINT) AS n_eval_docs
             |FROM g JOIN ev USING (ng)
             |WHERE g.doc_id % 20 <> 0
             |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)),

    // Leakage-safe train/val/test split: hash-assign GROUPS of
    // related documents, never individual docs, so near-identical
    // texts cannot land on both sides of the train/eval boundary
    // (the classic split-leakage bug). The group key is a content
    // fingerprint — the doc's 3 most frequent words (tf desc, word
    // asc), md5-hashed; docs sharing dominant vocabulary move
    // together. The split is the first hex nibble of the group hash:
    // 12/16 train, 2/16 val, 2/16 test — deterministic, engine-
    // independent, no RNG. Per split: group count, doc count, token
    // supply. Scale stance: one explode + two hash-aggs, all keyed
    // by doc_id or fp — linear, and the assignment needs no global
    // state at all (any executor can route a new doc from its hash).
    QueryDef(
      "q226_group_split",
      (s, d) => {
        val tf = documents(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("wd"))
          .groupBy("doc_id", "wd")
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("c").desc, col("wd").asc)
        val fp = tf
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .groupBy("doc_id")
          .agg(array_join(
            transform(sort_array(collect_list(struct(col("rk"), col("wd")))),
              e => e.getField("wd")), " ").as("fp"))
        val split = fp
          .withColumn("nib",
            expr("instr('0123456789abcdef', substring(md5(fp), 1, 1))"))
          .withColumn("split",
            when(col("nib") <= 12, "train")
              .when(col("nib") <= 14, "val")
              .otherwise("test"))
        split
          .join(documents(s, d).select(col("doc_id"),
            size(words(col("text"))).cast("long").as("n_tokens")), "doc_id")
          .groupBy("split")
          .agg(count_distinct(col("fp")).as("n_groups"),
            count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"))
          .orderBy("split")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, wd, COUNT(*) AS c
             |  FROM documents, LATERAL unnest(string_split(text, ' '))
             |    AS u(wd)
             |  GROUP BY doc_id, wd
             |), fp AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      (list(wd ORDER BY c DESC, wd ASC))[1:3], ' ') AS fp
             |  FROM tf GROUP BY doc_id
             |), sp AS (
             |  SELECT doc_id, fp,
             |    CASE WHEN instr('0123456789abcdef',
             |        substr(md5(fp), 1, 1)) <= 12 THEN 'train'
             |      WHEN instr('0123456789abcdef',
             |        substr(md5(fp), 1, 1)) <= 14 THEN 'val'
             |      ELSE 'test' END AS split
             |  FROM fp
             |), tok AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |)
             |SELECT split, CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
             |FROM sp JOIN tok USING (doc_id)
             |GROUP BY split ORDER BY split""".stripMargin)),

    // Token-budget dataset assembly: given a per-source token budget
    // (the output of a q206-style mixture plan), greedily admit each
    // source's best documents — ranked by lexical diversity (distinct
    // words desc, doc_id asc) — until the running token total would
    // exceed the budget. The admission rule is a windowed cumulative
    // sum, so the whole assembly is one shuffle by source; per source
    // the report shows docs admitted, tokens used, and budget
    // utilisation. Scale stance: ranking + cumsum are per-source
    // window functions over a source-partitioned shuffle — no global
    // sort, no driver loop; skewed sources AQE-split cleanly because
    // the window key is the shuffle key.
    QueryDef(
      "q227_token_budget",
      (s, d) => {
        val budget = 600L
        val docs = documents(s, d)
          .select(col("source"), col("doc_id"),
            size(words(col("text"))).cast("long").as("n_tokens"),
            size(array_distinct(words(col("text")))).cast("long")
              .as("n_distinct"))
        val w = Window.partitionBy("source")
          .orderBy(col("n_distinct").desc, col("doc_id").asc)
        docs
          .withColumn("running", sum(col("n_tokens")).over(w))
          .filter(col("running") <= budget)
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_admitted"),
            sum(col("n_tokens")).as("tokens_used"),
            max(col("running")).as("final_running"))
          .withColumn("budget", lit(budget))
          .withColumn("util",
            col("tokens_used").cast("double") / col("budget"))
          .orderBy("source")
      },
      Some("""WITH docs AS (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(len(list_distinct(string_split(text, ' ')))
             |      AS BIGINT) AS n_distinct
             |  FROM documents
             |), run AS (
             |  SELECT source, doc_id, n_tokens,
             |    SUM(n_tokens) OVER (PARTITION BY source
             |      ORDER BY n_distinct DESC, doc_id ASC
             |      ROWS UNBOUNDED PRECEDING) AS running
             |  FROM docs
             |)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_admitted,
             |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_used,
             |  CAST(MAX(running) AS BIGINT) AS final_running,
             |  CAST(600 AS BIGINT) AS budget,
             |  CAST(SUM(n_tokens) AS DOUBLE) / 600 AS util
             |FROM run WHERE running <= 600
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Count-min sketch term frequencies — the mergeable FREQUENCY
    // sketch next to the HLL rollup (q42/SketchRollup, cardinality)
    // and Space-Saving (q193, top-k): d×w = 4×256 integer cells
    // answer point queries for ANY term with one-sided error (never
    // under the true count). Sharded builds fold by cell-wise
    // addition (CountMinSketchSpec pins build(A∪B) ≡ merge exactly),
    // which is why a 100 TB pipeline sketches per source/day and
    // merges O(d·w) state instead of re-counting. This gate runs the
    // operator (build + estimate) against the exact counts for the
    // corpus's top-10 terms; overshoot is the collision cost at
    // w=256 against the full vocabulary.
    QueryDef(
      "q234_cms_term_counts",
      (s, d) => {
        val terms = documents(s, d)
          .select(explode(words(col("text"))).as("term"))
        val sketch = graft.operators.CountMinSketch
          .sketch(terms, "term", depth = 4, width = 256)
        val truth = terms.groupBy("term")
          .agg(count(lit(1)).cast("long").as("true_n"))
        val topk = truth
          .orderBy(col("true_n").desc, col("term").asc)
          .limit(10)
        graft.operators.CountMinSketch
          .estimate(topk.select("term"), sketch, "term")
          .join(broadcast(topk), "term")
          .select(col("term"), col("true_n"),
            col("est").as("est_n"),
            (col("est") - col("true_n")).as("overshoot"))
          .orderBy(col("true_n").desc, col("term").asc)
      },
      Some("""WITH t AS (
             |  SELECT w AS term
             |  FROM documents, LATERAL unnest(string_split(text, ' '))
             |    AS u(w)
             |), cells AS (
             |  SELECT term, r,
             |    CAST('0x' || substr(md5(term || '#' || r), 1, 13)
             |      AS BIGINT) % 256 AS bucket
             |  FROM t, LATERAL unnest([0, 1, 2, 3]) AS rr(r)
             |), sk AS (
             |  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM cells GROUP BY r, bucket
             |), truth AS (
             |  SELECT term, CAST(COUNT(*) AS BIGINT) AS true_n
             |  FROM t GROUP BY term
             |), topk AS (
             |  SELECT term, true_n FROM truth
             |  ORDER BY true_n DESC, term ASC LIMIT 10
             |), est AS (
             |  SELECT k.term, MIN(s.cnt) AS est_n
             |  FROM topk k, LATERAL unnest([0, 1, 2, 3]) AS rr(r)
             |  JOIN sk s ON s.r = rr.r
             |    AND s.bucket = CAST('0x' ||
             |      substr(md5(k.term || '#' || rr.r), 1, 13)
             |      AS BIGINT) % 256
             |  GROUP BY k.term
             |)
             |SELECT k.term, k.true_n, e.est_n,
             |  e.est_n - k.true_n AS overshoot
             |FROM topk k JOIN est e USING (term)
             |ORDER BY k.true_n DESC, k.term ASC""".stripMargin)),

    // KMV theta-sketch SET OPERATIONS (operators.KmvSketch — an API
    // gate: the declared query runs the library build/estimate/
    // intersect entry points): distinct-trigram cardinalities of two
    // sources and their INTERSECTION estimated from k=256 hash
    // samples, next to the exact truths. The set-operation support is
    // what this sketch adds over the HLL rollup (q42): "how much do
    // two crawls overlap?" from two k-row samples, no re-scan. The
    // md5 hash family makes every estimate deterministic —
    // reproducible cross-engine, so even the ESTIMATES hash-gate
    // (the error vs truth is visible in the row, tracked like q234's
    // CMS overshoot). Sketch state: <= k longs per source regardless
    // of corpus size; build is distinct + GroupedTopK bounded heaps.
    QueryDef(
      "q247_kmv_overlap",
      (s, d) => {
        val grams = documents(s, d)
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"),
            explode(graft.functions.TextFunctions.trigrams(
              words(col("text")))).as("g"))
        val sketch = graft.operators.KmvSketch
          .build(grams, "source", "g", 256)
        val est = graft.operators.KmvSketch
          .estimate(sketch, "source", 256)
        val estA = est.filter(col("source") === "src0")
          .select(col("est_distinct").as("est_a"))
        val estB = est.filter(col("source") === "src1")
          .select(col("est_distinct").as("est_b"))
        val estI = graft.operators.KmvSketch
          .intersectEstimate(sketch, "source", 256,
            lit("src0"), lit("src1"))
        val exact = grams.select("source", "g").distinct()
          .groupBy("g")
          .agg(count(lit(1)).as("ns"))
        val exactRow = exact.agg(
          sum(when(col("ns") >= 1, 1L)).cast("long").as("exact_union"),
          sum(when(col("ns") === 2, 1L)).cast("long")
            .as("exact_intersection"))
        val exactA = grams.filter(col("source") === "src0")
          .agg(countDistinct(col("g")).as("exact_a"))
        val exactB = grams.filter(col("source") === "src1")
          .agg(countDistinct(col("g")).as("exact_b"))
        estA.crossJoin(estB).crossJoin(estI)
          .crossJoin(exactA).crossJoin(exactB).crossJoin(exactRow)
          .select(col("exact_a"), col("exact_b"),
            col("exact_intersection"),
            col("est_a"), col("est_b"), col("est_intersection"))
      },
      Some("""WITH w AS (
             |  SELECT source, string_split(text, ' ') AS ws
             |  FROM documents WHERE source IN ('src0', 'src1')
             |), g AS (
             |  SELECT DISTINCT source,
             |    unnest(list_transform(generate_series(1, len(ws) - 2),
             |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             |      AS g
             |  FROM w WHERE len(ws) >= 3
             |), hv AS (
             |  SELECT source, g,
             |    CAST('0x' || substr(md5('kmv#' || g), 1, 13)
             |      AS BIGINT) AS hv
             |  FROM g
             |), sk AS (
             |  SELECT source, hv FROM (
             |    SELECT source, hv,
             |      row_number() OVER (PARTITION BY source
             |        ORDER BY hv ASC) AS r
             |    FROM (SELECT DISTINCT source, hv FROM hv))
             |  WHERE r <= 256
             |), est AS (
             |  SELECT source,
             |    CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
             |      ELSE 255.0 /
             |        (CAST(MAX(hv) AS DOUBLE) / 4503599627370496.0)
             |      END AS est_distinct
             |  FROM sk GROUP BY source
             |), th AS (
             |  SELECT least(a.ka, b.kb) AS theta_raw,
             |    (a.na < 256 AND b.nb < 256) AS exact
             |  FROM (SELECT COUNT(*) AS na, MAX(hv) AS ka FROM sk
             |        WHERE source = 'src0') a
             |  CROSS JOIN (SELECT COUNT(*) AS nb, MAX(hv) AS kb FROM sk
             |        WHERE source = 'src1') b
             |), m AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_match
             |  FROM sk a JOIN sk b ON a.hv = b.hv
             |    AND a.source = 'src0' AND b.source = 'src1'
             |  CROSS JOIN th
             |  WHERE th.exact OR a.hv <= th.theta_raw
             |), esti AS (
             |  SELECT CASE WHEN th.exact THEN CAST(n_match AS DOUBLE)
             |    ELSE CAST(n_match AS DOUBLE) /
             |      (CAST(theta_raw AS DOUBLE) / 4503599627370496.0)
             |    END AS est_intersection
             |  FROM m CROSS JOIN th
             |), ex AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS exact_a,
             |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS exact_b
             |  FROM g
             |), exi AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
             |  FROM (SELECT g FROM g WHERE source = 'src0') a
             |  JOIN (SELECT g FROM g WHERE source = 'src1') b USING (g)
             |)
             |SELECT ex.exact_a, ex.exact_b, exi.exact_intersection,
             |  (SELECT est_distinct FROM est WHERE source = 'src0')
             |    AS est_a,
             |  (SELECT est_distinct FROM est WHERE source = 'src1')
             |    AS est_b,
             |  esti.est_intersection
             |FROM ex CROSS JOIN exi CROSS JOIN esti""".stripMargin)),

    // Length-CURRICULUM staging — the ordering knob curriculum
    // training turns (short/simple samples first, long ones later):
    // each source's documents are cut into 4 equi-depth length
    // stages (ntile over token count, deterministic under the
    // (n_tokens, doc_id) total order). Per SOURCE, not global: the
    // window is keyed, so 100 TB staging parallelizes across sources
    // with no global sort — the global curriculum is then "stage 1
    // of every source, stage 2 of every source, ...", which also
    // keeps the mixture balanced within each stage. Output is the
    // stage manifest (counts + token ranges) a data loader consumes.
    QueryDef(
      "q253_length_curriculum",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(col("n_tokens").asc, col("doc_id").asc)
        documents(s, d)
          .select(col("source"), col("doc_id"),
            size(words(col("text"))).cast("long").as("n_tokens"))
          .withColumn("stage", ntile(4).over(w).cast("long"))
          .groupBy("source", "stage")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("n_tokens")).as("max_tokens"))
          .orderBy("source", "stage")
      },
      Some("""WITH t AS (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT)
             |      AS n_tokens
             |  FROM documents
             |), staged AS (
             |  SELECT source, doc_id, n_tokens,
             |    CAST(ntile(4) OVER (PARTITION BY source
             |      ORDER BY n_tokens ASC, doc_id ASC) AS BIGINT)
             |      AS stage
             |  FROM t
             |)
             |SELECT source, stage,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
             |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
             |FROM staged
             |GROUP BY source, stage
             |ORDER BY source, stage""".stripMargin)),

    // Deterministic span corruption (T5-style denoising targets,
    // Raffel et al. JMLR'20) — the AUGMENTATION rung of the corpus
    // pipeline: each token position is masked iff a salted md5 of
    // (doc_id, position) lands under the 15% rate (reproducible
    // across runs and engines — no RNG), and ADJACENT masked
    // positions collapse into one sentinel, the span-corruption
    // signature. Everything is per-row HOF array work — zero
    // shuffle until the final order-by — so at 100 TB augmentation
    // is a map-only pass over the corpus. Gated on the doc_id % 50
    // slice to keep the declared output bounded.
    QueryDef(
      "q276_span_corruption",
      (s, d) => {
        val mask =
          """(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',
            | CAST(i AS STRING))), 1, 13), 16, 10) % 100) < 15"""
            .stripMargin.replace("\n", "")
        documents(s, d)
          .filter(col("doc_id") % 50 === 1)
          .select(col("doc_id"),
            graft.functions.TextFunctions.words(col("text")).as("ws"))
          .withColumn("flags",
            expr(s"transform(sequence(1, size(ws)), i -> $mask)"))
          .select(col("doc_id"),
            size(col("ws")).cast("long").as("n_tokens"),
            size(expr("filter(flags, f -> f)")).cast("long")
              .as("n_masked"),
            // i = 1 arms guard element_at(flags, 0), which would
            // throw (Spark arrays are 1-based through element_at)
            size(expr("""filter(sequence(1, size(ws)), i ->
                element_at(flags, i) AND
                IF(i = 1, true, NOT element_at(flags, i - 1)))"""))
              .cast("long").as("n_spans"),
            array_join(expr("""filter(
                transform(sequence(1, size(ws)), i ->
                  CASE WHEN NOT element_at(flags, i)
                         THEN element_at(ws, i)
                       WHEN i = 1 THEN '<X>'
                       WHEN NOT element_at(flags, i - 1) THEN '<X>'
                       END),
                x -> x IS NOT NULL)"""), " ").as("corrupted"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws
             |  FROM documents WHERE doc_id % 50 = 1
             |), flagged AS (
             |  SELECT doc_id, ws,
             |    list_transform(range(1, len(ws) + 1), i ->
             |      (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
             |         || ':' || CAST(i AS VARCHAR)), 1, 13) AS BIGINT)
             |       % 100) < 15) AS flags
             |  FROM base
             |)
             |SELECT doc_id,
             |  CAST(len(ws) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(flags, f -> f)) AS BIGINT)
             |    AS n_masked,
             |  CAST(len(list_filter(range(1, len(ws) + 1), i ->
             |    flags[i] AND (i = 1 OR NOT flags[i - 1]))) AS BIGINT)
             |    AS n_spans,
             |  array_to_string(list_filter(
             |    list_transform(range(1, len(ws) + 1), i ->
             |      CASE WHEN NOT flags[i] THEN ws[i]
             |           WHEN i = 1 OR NOT flags[i - 1] THEN '<X>'
             |           END),
             |    x -> x IS NOT NULL), ' ') AS corrupted
             |FROM flagged
             |ORDER BY doc_id""".stripMargin)),

    // Exact duplicate-SPAN detection (Lee et al. ACL'22 ExactSubstr) —
    // the substring rung of the dedup ladder: per-document maximal
    // regions whose 5-grams all occur ≥ 2 times corpus-wide, i.e.
    // what substring dedup would CUT where document-level dedup keeps
    // or drops whole docs. gram-hash freq + join-back + keyed
    // gaps-and-islands — see llm.DuplicateSpans for the 100 TB
    // argument (no suffix arrays, no corpus-wide sort). At sf0.01
    // the report splits cleanly: coverage-1.0 rows are exact-dup
    // docs, 5-token spans are shared boilerplate phrases.
    QueryDef(
      "q277_duplicate_spans",
      (s, d) => graft.llm.DuplicateSpans
        .coverageFrom(dupSpansStore(s, d), documents(s, d))
        .orderBy("doc_id"),
      Some(s"""$dupSpanCtes, agg AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             |    CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
             |    CAST(MAX(e - s + 1) AS BIGINT) AS max_span
             |  FROM sp GROUP BY doc_id
             |)
             |SELECT a.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens,
             |  n_spans, dup_tokens, max_span,
             |  CAST(dup_tokens AS DOUBLE) / len(w.ws) AS dup_coverage
             |FROM agg a JOIN w ON a.doc_id = w.doc_id
             |ORDER BY a.doc_id""".stripMargin)),

    // Tokenizer OOV-rate audit — the fit check run before committing
    // a vocabulary: fix the vocab to the top-16 corpus tokens (by
    // frequency, token-ASC ties — a deterministic cut), then report
    // per source how many token OCCURRENCES fall outside it. The
    // vocab is model metadata (top-K of a hash-agg — broadcastable at
    // any corpus size); the audit is one explode → broadcast-join →
    // hash-agg pass, all linear. A source with an outlier oov_rate
    // is the one that needs vocab growth or its own tokenizer —
    // the per-source mix report's (q99) vocabulary counterpart.
    QueryDef(
      "q284_oov_rate",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("source"), explode(words(col("text"))).as("tok"))
        val vocab = toks
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc)
          .limit(16)
          .select(col("tok"), lit(1).as("in_vocab"))
        toks
          .join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
              .cast("long").as("n_oov"),
            (sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
              .cast("double") / count(lit(1)).cast("double"))
              .as("oov_rate"))
          .orderBy("source")
      },
      Some("""WITH toks AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS tok
             |  FROM documents
             |), vocab AS (
             |  SELECT tok FROM (
             |    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
             |  ORDER BY cnt DESC, tok ASC LIMIT 16
             |)
             |SELECT t.source,
             |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oov,
             |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
             |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
             |FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
             |GROUP BY t.source
             |ORDER BY t.source""".stripMargin)),

    // Duplicate-span SCRUB — the removal pass q277 builds toward
    // (Lee et al. cut every duplicated region; document-level dedup
    // would drop none of these partially-duplicated docs): each doc
    // with spans re-emits with the covered tokens deleted. The span
    // list arrives as a per-doc array (collect_list of (start,end)
    // structs — spans per doc are few by construction, they're
    // maximal and disjoint), and deletion is one HOF pass over token
    // positions — so after the q277 machinery the scrub itself is
    // map-only, the augmentation-pass shape of q276. Docs without
    // spans are untouched and not re-emitted (the output IS the
    // patch set).
    QueryDef(
      "q288_span_scrub",
      (s, d) => {
        val sps = dupSpansStore(s, d)
          .groupBy("doc_id")
          .agg(collect_list(struct(col("span_start").as("s"),
            col("span_end").as("e"))).as("sps"))
        documents(s, d)
          .join(sps, "doc_id")
          .select(col("doc_id"),
            graft.functions.TextFunctions.words(col("text")).as("ws"),
            col("sps"))
          .select(col("doc_id"),
            size(col("ws")).cast("long").as("n_tokens"),
            size(expr("""filter(sequence(1, size(ws)), i ->
                exists(sps, sp -> i >= sp.s AND i <= sp.e))"""))
              .cast("long").as("n_removed"),
            array_join(expr("""transform(
                filter(sequence(1, size(ws)), i ->
                  NOT exists(sps, sp -> i >= sp.s AND i <= sp.e)),
                i -> element_at(ws, i))"""), " ").as("scrubbed"))
          .orderBy("doc_id")
      },
      Some(s"""$dupSpanCtes, spl AS (
             |  SELECT doc_id, list({'s': s, 'e': e}) AS sps
             |  FROM sp GROUP BY doc_id
             |)
             |SELECT w.doc_id,
             |  CAST(len(w.ws) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(range(1, len(w.ws) + 1), i ->
             |    len(list_filter(spl.sps,
             |      x -> i >= x.s AND i <= x.e)) > 0)) AS BIGINT)
             |    AS n_removed,
             |  COALESCE(array_to_string(list_transform(
             |    list_filter(range(1, len(w.ws) + 1), i ->
             |      len(list_filter(spl.sps,
             |        x -> i >= x.s AND i <= x.e)) = 0),
             |    i -> w.ws[i]), ' '), '') AS scrubbed
             |FROM w JOIN spl ON spl.doc_id = w.doc_id
             |ORDER BY w.doc_id""".stripMargin)),

    // Feature hashing (the "hashing trick", Weinberger et al.
    // ICML'09) — fixed-dimension bag-of-words features with NO
    // vocabulary pass: token → bucket md5(tok) % 16, sign from an
    // independent salted hash (the unbiased-inner-product variant),
    // feature value = signed count. One explode + hash-agg per doc —
    // map-side partial, no vocabulary state, which is the entire
    // point at 100 TB: the feature space is fixed before the data is
    // seen, so sharded featurization needs zero coordination.
    // Gated on the doc_id % 50 slice; sparse (doc, idx, val) rows.
    QueryDef(
      "q295_feature_hash",
      (s, d) => {
        val idx = expr(
          "CAST(conv(substring(md5(tok), 1, 13), 16, 10) AS BIGINT) % 16")
        val sign = when(expr(
          "CAST(conv(substring(md5(concat('s:', tok)), 1, 13), 16, 10) AS BIGINT) % 2")
          === 0, lit(1L)).otherwise(lit(-1L))
        documents(s, d)
          .filter(col("doc_id") % 50 === 1)
          .select(col("doc_id"), explode(words(col("text"))).as("tok"))
          .select(col("doc_id"), idx.as("idx"), sign.as("sgn"))
          .groupBy("doc_id", "idx")
          .agg(sum(col("sgn")).cast("long").as("val"))
          .filter(col("val") =!= 0)
          .orderBy("doc_id", "idx")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents WHERE doc_id % 50 = 1
             |), hashed AS (
             |  SELECT doc_id,
             |    CAST('0x' || substring(md5(tok), 1, 13) AS BIGINT)
             |      % 16 AS idx,
             |    CASE WHEN CAST('0x' ||
             |        substring(md5('s:' || tok), 1, 13) AS BIGINT)
             |        % 2 = 0
             |      THEN 1 ELSE -1 END AS sgn
             |  FROM toks
             |)
             |SELECT doc_id, idx, CAST(SUM(sgn) AS BIGINT) AS val
             |FROM hashed GROUP BY doc_id, idx
             |HAVING SUM(sgn) <> 0
             |ORDER BY doc_id, idx""".stripMargin)),

    // Blocklist content filter — the keyword-rule rung of the safety
    // / policy pass (the shape NSFW and spam filters take before any
    // model-based scoring): per-category term lists ride as array
    // literals inside per-row HOF counts — a MAP-ONLY pass, no
    // explode, no shuffle before the per-source report — and a doc
    // flags when a category's hit count crosses its threshold.
    // Reported per source: the mix owner sees which slices carry the
    // policy load. Category lists here are illustrative (the corpus
    // vocabulary is synthetic); the operator is the list-driven
    // counting machinery.
    QueryDef(
      "q301_blocklist_filter",
      (s, d) => {
        val perf = expr(
          "size(filter(__ws, t -> t IN ('slow', 'fast')))")
        val sz = expr(
          "size(filter(__ws, t -> t IN ('big', 'small')))")
        documents(s, d)
          .select(col("source"), words(col("text")).as("__ws"))
          .select(col("source"), perf.as("perf_hits"),
            sz.as("size_hits"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            // a doc flags when ANY category crosses its threshold
            sum(when(col("perf_hits") >= 3 || col("size_hits") >= 3,
              1L).otherwise(0L))
              .cast("long").as("docs_flagged"),
            sum(col("perf_hits")).cast("long").as("perf_total"),
            sum(col("size_hits")).cast("long").as("size_total"))
          .orderBy("source")
      },
      Some("""WITH hits AS (
             |  SELECT source,
             |    len(list_filter(string_split(text, ' '),
             |      t -> t IN ('slow', 'fast'))) AS perf_hits,
             |    len(list_filter(string_split(text, ' '),
             |      t -> t IN ('big', 'small'))) AS size_hits
             |  FROM documents
             |)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN perf_hits >= 3 OR size_hits >= 3
             |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
             |  CAST(SUM(perf_hits) AS BIGINT) AS perf_total,
             |  CAST(SUM(size_hits) AS BIGINT) AS size_total
             |FROM hits GROUP BY source ORDER BY source""".stripMargin)),

    // LM-perplexity quality filter (the CCNet/KenLM gate), spelled
    // transcendental-free: train a Dirichlet-smoothed bigram LM on
    // the corpus itself, score every document by its MEAN in-context
    // token probability, and flag the low-probability (gibberish /
    // boilerplate-shredded) tail. Mean token probability replaces
    // log-space perplexity deliberately: each per-token probability
    //   p(cur | prev) = (c(prev,cur) + mu * c(cur)/T) / (c(prev) + mu)
    // is a short chain of IEEE double ops on exactly-representable
    // BIGINT counts (identical bit-for-bit in Spark and DuckDB, no
    // ln() seam), and the per-doc reduction is a sum of per-token
    // round(p * 1e6) SCALED LONGS — order-free integer addition, so
    // the declared numbers are exact under any partitioning. The
    // decision threshold is on the same scaled-integer axis.
    //
    // Scale stance (100 TB): token stream is explode → two hash-agg
    // count tables (bigram, unigram — map-side partial) → per-doc
    // DISTINCT-bigram aggregation (doc_id,prev,cur,m) BEFORE the
    // count-table joins, so join fan-in is distinct-bigrams-per-doc,
    // not tokens; the joins are linear shuffled equi-joins (the
    // unigram side broadcasts when the vocabulary fits). No windows,
    // no self-joins, driver state = the 1-row total only.
    //
    // The 0.0325 threshold is a low-tail gate calibrated on this
    // corpus (≈ the 10th percentile of mean token probability at
    // sf0.01) — the CCNet stance of dropping the worst decile, not a
    // universal constant; a production pipeline re-fits it per corpus
    // from the same score column.
    QueryDef(
      "q313_lm_quality_filter",
      (s, d) => {
        val ws = col("__ws")
        val docs = documents(s, d)
          .select(col("doc_id"), words(col("text")).as("__ws"))
        val toks = docs.select(col("doc_id"), explode(ws).as("w"))
        val uni = toks.groupBy("w")
          .agg(count(lit(1)).cast("long").as("cu"))
        val total = toks.agg(count(lit(1)).cast("long").as("t"))
        val pairs = docs.filter(size(ws) >= 2)
          .select(col("doc_id"), explode(zip_with(
            slice(ws, lit(1), size(ws) - 1),
            slice(ws, lit(2), size(ws) - 1),
            (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
          .select(col("doc_id"), col("bg.prev"), col("bg.cur"))
        val docBg = pairs.groupBy("doc_id", "prev", "cur")
          .agg(count(lit(1)).cast("long").as("m"))
        val big = pairs.groupBy("prev", "cur")
          .agg(count(lit(1)).cast("long").as("cb"))
        val mu = lit(20.0)
        val prob = (col("cb").cast("double") +
          mu * (col("cu2").cast("double") / col("t").cast("double"))) /
          (col("cu1").cast("double") + mu)
        docBg
          .join(big, Seq("prev", "cur"))
          .join(uni.select(col("w").as("prev"), col("cu").as("cu1")),
            "prev")
          .join(uni.select(col("w").as("cur"), col("cu").as("cu2")),
            "cur")
          .crossJoin(broadcast(total))
          .select(col("doc_id"),
            (col("m") * round(prob * lit(1000000.0)).cast("long"))
              .as("pe6"), col("m"))
          .groupBy("doc_id")
          .agg(sum(col("m")).cast("long").as("n_scored"),
            sum(col("pe6")).cast("long").as("sum_p_e6"))
          .withColumn("mean_p_e6",
            expr("sum_p_e6 DIV n_scored"))
          .withColumn("verdict",
            when(col("mean_p_e6") < 32500L, "drop").otherwise("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |), toks AS (
             |  SELECT doc_id, unnest(ws) AS w FROM w
             |), uni AS (
             |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
             |  FROM toks GROUP BY w
             |), tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM toks
             |), pairs AS (
             |  SELECT doc_id, ws[i] AS prev, ws[i+1] AS cur
             |  FROM w, LATERAL unnest(generate_series(1, len(ws)-1))
             |    AS g(i)
             |  WHERE len(ws) >= 2
             |), doc_bg AS (
             |  SELECT doc_id, prev, cur, CAST(COUNT(*) AS BIGINT) AS m
             |  FROM pairs GROUP BY doc_id, prev, cur
             |), big AS (
             |  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb
             |  FROM pairs GROUP BY prev, cur
             |), scored AS (
             |  SELECT doc_id, m, m * CAST(round(
             |    (CAST(cb AS DOUBLE)
             |       + 20.0 * (CAST(u2.cu AS DOUBLE) / CAST(t AS DOUBLE)))
             |    / (CAST(u1.cu AS DOUBLE) + 20.0) * 1000000.0)
             |    AS BIGINT) AS pe6
             |  FROM doc_bg
             |  JOIN big USING (prev, cur)
             |  JOIN uni u1 ON doc_bg.prev = u1.w
             |  JOIN uni u2 ON doc_bg.cur = u2.w
             |  CROSS JOIN tot
             |), agg AS (
             |  SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_scored,
             |    CAST(SUM(pe6) AS BIGINT) AS sum_p_e6
             |  FROM scored GROUP BY doc_id
             |)
             |SELECT doc_id, n_scored, sum_p_e6,
             |  sum_p_e6 // n_scored AS mean_p_e6,
             |  CASE WHEN sum_p_e6 // n_scored < 32500
             |    THEN 'drop' ELSE 'keep' END AS verdict
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // Labeled BUILD workload for the duplicate-span store (the
    // q239/q240 pattern): forces the gram-frequency + islands
    // machinery to rerun and rewrite the parquet span store, then
    // reports corpus-level span stats FROM THE STORE — the oracle
    // gate certifies the materialized content itself, and the q277
    // (report) / q288 (scrub) rows measure serving passes over it.
    QueryDef(
      "q315_dupspan_store_build",
      (s, d) => {
        val dir = graft.StoreCache.rebuild("dupspans", d) { p =>
          graft.llm.DuplicateSpans.spans(documents(s, d), 5)
            .write.mode("overwrite").parquet(p)
        }
        s.read.parquet(dir)
          .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
            count(lit(1)).cast("long").as("n_spans"),
            sum("span_len").cast("long").as("dup_tokens"),
            max("span_len").cast("long").as("max_span"))
      },
      Some(s"""$dupSpanCtes
              |SELECT
              |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              |  CAST(COUNT(*) AS BIGINT) AS n_spans,
              |  CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
              |  CAST(MAX(e - s + 1) AS BIGINT) AS max_span
              |FROM sp""".stripMargin))
  )
}
