package graft.llm

import graft.functions.TextFunctions.words
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN detection — the substring-level rung of the
  * dedup ladder (Lee et al. ACL'22, "Deduplicating Training Data Makes
  * Language Models Better"): find every maximal region of every
  * document whose k-word grams all occur at least twice corpus-wide
  * (within- or cross-document), i.e. the regions ExactSubstr-style
  * dedup would cut, where document-level dedup (exact q29, MinHash
  * q32, SimHash q33, SemDeDup q217) keeps or drops whole documents.
  *
  * The reference pipeline has no substring dedup (its validator stops
  * at row checks — `include/scripts/file_services/data_validator.py:
  * 14-39`); this is a §7.5 training-data extension.
  *
  * Suffix arrays (the paper's tool) don't distribute; the standard
  * scale reformulation is gram-hash frequency + gaps-and-islands:
  *
  *  1. every k-gram start position emits (doc, pos, md5(gram)) — a
  *     per-row array comprehension, no join to build grams;
  *  2. one hash-aggregate on the gram hash finds hashes with ≥ 2
  *     occurrences (partial counts map-side — the only corpus-wide
  *     shuffle, on a high-cardinality key so it spreads);
  *  3. join back on the hash keeps duplicated positions only (two
  *     linear corpus passes beat the window-over-every-gram
  *     alternative, which would SORT the full gram table);
  *  4. per-doc gaps-and-islands merges overlapping-or-adjacent
  *     duplicated gram ranges (gap > k breaks) into maximal spans —
  *     a keyed window over only the duplicated positions, which are
  *     corpus-sparse after step 3.
  *
  * Output spans are REMOVAL regions (every token inside is covered by
  * some duplicated k-gram), not a claim that the concatenated span is
  * itself duplicated as one unit — the paper's semantic for cutting.
  */
object DuplicateSpans {

  /** Every k-gram start: (doc_id, pos [1-based], gh = md5 of the
    * space-joined k words). The token array is hoisted to its own
    * projection so the HOF lambda doesn't re-split the text per gram.
    */
  def gramPositions(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"gram length must be >= 2, got $k")
    val ws = col("__ws")
    docs
      .select(col("doc_id"), words(col("text")).as("__ws"))
      .filter(size(ws) >= k)
      // Hash-repartition the (id, tokens) rows before the explode:
      // the test corpus is one parquet split, so the per-gram md5 HOF
      // (the expensive pass — and [[duplicatedPositions]] computes it
      // on BOTH sides of its join-back) otherwise runs in ONE scan
      // task. Document rows shuffle once, the gram pass runs on every
      // core; all consumers re-key by gh or doc_id downstream, so
      // rows are identical.
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(ws) - lit(k - 1)),
          i => md5(concat_ws(" ", slice(ws, i, lit(k)))))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gh"))
  }

  /** Positions whose k-gram occurs ≥ 2 times corpus-wide. Hash-agg on
    * gh + join-back (both exchanges on gh, so they line up); the
    * duplicated-hash side is usually corpus-sparse but NOT bounded,
    * so no broadcast — the sort-merge/shuffled-hash join is the
    * 100 TB-safe default and AQE may still broadcast a small build.
    */
  def duplicatedPositions(docs: DataFrame, k: Int): DataFrame = {
    val g = gramPositions(docs, k)
    val dup = g.groupBy("gh")
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select("gh")
    g.join(dup, "gh").select("doc_id", "pos")
  }

  /** Duplicated positions EXCLUDING each gram's canonical FIRST
    * occurrence (ordered by (doc_id, pos)) — the keep-one removal
    * semantic ExactSubstr dedup actually applies: symmetric
    * [[duplicatedPositions]] marks every copy (right for REPORTING,
    * q277/q288), but a removal decision built on it deletes all
    * copies of fully-duplicated content. Rank > 1 under a per-hash
    * window keeps exactly one occurrence corpus-wide; the window is
    * one shuffle+sort on the gram hash — heavier than the agg+join
    * of the symmetric form, and only the decision pass (q300) pays
    * it.
    */
  def removablePositions(docs: DataFrame, k: Int): DataFrame =
    gramPositions(docs, k)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("gh").orderBy("doc_id", "pos")))
      .filter(col("__rn") > 1)
      .select("doc_id", "pos")

  /** [[spans]] under the keep-first rule: maximal regions of
    * NON-canonical duplicated grams — what a keep-one dedup would
    * actually cut. The first copy of duplicated content gets no
    * spans; later copies get full coverage.
    */
  def spansKeepFirst(docs: DataFrame, k: Int): DataFrame =
    spansFrom(removablePositions(docs, k), k)

  /** Per-document removal report over [[spansKeepFirst]] — the
    * decision-grade counterpart of [[coverage]].
    */
  def coverageKeepFirst(docs: DataFrame, k: Int): DataFrame =
    coverageFrom(spansKeepFirst(docs, k), docs)

  /** Maximal duplicated spans: (doc_id, span_start, span_end,
    * span_len) in 1-based inclusive token coordinates. Two duplicated
    * grams at p1 < p2 merge iff p2 ≤ p1 + k (ranges overlap or
    * touch); the window is keyed by doc, so 100 TB islands-merge
    * parallelizes across documents.
    */
  def spans(docs: DataFrame, k: Int): DataFrame =
    spansFrom(duplicatedPositions(docs, k), k)

  private def spansFrom(positions: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    positions
      .withColumn("__lagp", lag("pos", 1).over(w))
      .withColumn("__brk",
        when(col("__lagp").isNotNull &&
          col("pos") - col("__lagp") <= k, lit(0)).otherwise(lit(1)))
      .withColumn("__island", sum("__brk").over(w))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k - 1)).cast("long").as("span_end"))
      .withColumn("span_len",
        (col("span_end") - col("span_start") + 1).cast("long"))
      .select("doc_id", "span_start", "span_end", "span_len")
  }

  /** Per-document removal report: token count, span count, duplicated
    * token total, longest span, and coverage ratio (exact int/int
    * double division — reproducible). Only documents with ≥ 1 span
    * appear; a doc with dup_coverage 1.0 is an exact-dup candidate,
    * small spans are boilerplate phrases.
    */
  def coverage(docs: DataFrame, k: Int): DataFrame =
    coverageFrom(spans(docs, k), docs)

  /** [[coverage]] over an ALREADY-COMPUTED span frame (doc_id,
    * span_start, span_end, span_len) — the serving form when spans are
    * materialized once per corpus (the q277/q288 store): the report is
    * then one hash-agg over the sparse span table plus a token-count
    * join, never re-running the gram-frequency machinery.
    */
  def coverageFrom(sp: DataFrame, docs: DataFrame): DataFrame = {
    val perDoc = sp
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum("span_len").cast("long").as("dup_tokens"),
        max("span_len").cast("long").as("max_span"))
    val lens = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    perDoc.join(lens, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_tokens"), col("max_span"),
        (col("dup_tokens").cast("double") / col("n_tokens"))
          .as("dup_coverage"))
  }
}
