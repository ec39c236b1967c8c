package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003), over word k-grams: from each document's sequence of k-gram
  * hashes, keep the minimum hash of every sliding window of `w`
  * consecutive positions, ties broken toward the RIGHTMOST position
  * (the paper's rule), then dedup the selected (pos, hash) set.
  *
  * Why this selection and not sampling: density is provably between
  * 1/w and 2/(w+1) of positions, and any run of ≥ w+k−1 shared words
  * between two documents is GUARANTEED to contribute at least one
  * shared selected fingerprint — the detection guarantee
  * substring-level dedup needs (mod-p or random sampling can miss an
  * arbitrarily long shared run).
  *
  * Engine-portable arg-min: (hash asc, pos desc) is encoded as ONE
  * 63-bit integer key = h·32768 + (32767 − pos) — h is the first 12
  * md5 hex chars (48 bits), pos < 2¹⁵ — so a single ROWS-window
  * `min` expresses the rule identically in Spark and any SQL oracle
  * (a struct-valued window min is not portable, and the two-pass
  * spelling — window min + rightmost-pos-where-h=own-min — is WRONG:
  * a smaller hash just before the frame shadows the frame argmin).
  * 48 hash bits are for CANDIDATE generation only — collisions cost
  * a spurious candidate the exact verify rung (q215) rejects, never
  * a missed detection, so trading 4 hash bits for 16× position range
  * is free. Documents longer than 32 767 trigrams (~32 770 words)
  * fail LOUDLY at runtime ([[fingerprintsFromHashes]] raises) rather
  * than silently corrupting the key; callers with longer documents
  * should split them into overlapping chunks upstream.
  *
  * Scale stance (100 TB): the only shuffle key is the document id;
  * the window frame is ROWS-bounded (`w`), state per task is O(w);
  * output is the (doc, pos, hash) fingerprint index downstream
  * candidate joins (q208) and alignment voting (q213) build on.
  */
object Winnowing {

  /** Positions-per-document bound: the pos field of the packed key is
    * 15 bits, so any trigram position must be < 32 768. Enforced at
    * runtime with `raise_error` — exceeding it would otherwise borrow
    * bits from the hash field and silently corrupt the selection.
    */
  val MaxPos = 32768L

  /** md5 hex chars kept as the fingerprint hash (48 bits): 63-bit
    * key budget minus the 15-bit position field.
    */
  val HashHexChars = 12

  /** Per-position trigram hashes (idCol, pos, h): the first 12 md5
    * hex chars of each word trigram as a 48-bit long — the raw
    * sequence [[fingerprints]] selects from, exposed for the exact
    * verify stage (q215: positional re-join of candidate pairs).
    */
  def trigramHashes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.TextFunctions.words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 3)
      // Hash-repartition the (id, tokens) rows BEFORE the explode:
      // the test corpus arrives as one parquet split, so without this
      // the tokenize + per-trigram md5 — the expensive pass — runs in
      // ONE scan task, and the window exchange then shuffles the
      // EXPLODED trigram rows (~40× the bytes of the document rows).
      // Partitioning by the document id up front parallelizes the
      // hash pass across the session's cores AND already satisfies
      // the selection window's ClusteredDistribution(id) (and the
      // final distinct's, id ⊆ its keys), so the exploded rows are
      // never exchanged at all — strictly fewer shuffled bytes, same
      // rows (everything downstream is keyed agg/window/distinct).
      .repartition(col(idCol))
      .select(col(idCol), posexplode(
        graft.functions.TextFunctions.trigrams(col("__ws"))))
      .select(col(idCol), col("pos"),
        conv(substring(md5(col("col")), 1, HashHexChars), 16, 10)
          .cast("long").as("h"))

  /** Selected fingerprints (idCol, pos, fph) over word trigrams of
    * `textCol`, window size `w`. Documents shorter than 3 words have
    * no trigram and select nothing.
    */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", w: Int = 4): DataFrame =
    fingerprintsFromHashes(trigramHashes(docs, idCol, textCol),
      idCol, w)

  /** [[fingerprints]] from an already-computed [[trigramHashes]]
    * frame — lets a caller that needs BOTH the raw hash sequence and
    * the selection (q215's verify re-join) materialize the hash pass
    * once instead of paying the tokenize+md5 scan twice.
    */
  def fingerprintsFromHashes(hashed: DataFrame,
      idCol: String = "doc_id", w: Int = 4): DataFrame = {
    require(w >= 1, s"window must be positive: $w")
    // Loud bound check: a pos >= MaxPos would underflow the packed
    // (32767 - pos) field into the hash bits and corrupt the argmin
    // with no error — fail the job instead, at the row that breaks.
    val posChecked = when(col("pos") < lit(MaxPos), col("pos"))
      .otherwise(raise_error(format_string(
        "graft.Winnowing: trigram position %s >= MaxPos=" + MaxPos +
          " — document too long for the 15-bit pos field; split " +
          "documents into overlapping chunks upstream", col("pos"))))
    val keyed = hashed
      .select(col(idCol), col("pos"),
        (col("h") * lit(MaxPos) +
          (lit(MaxPos - 1) - posChecked)).as("key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    keyed
      .withColumn("wkey", min(col("key")).over(win))
      .filter(col("pos") >= w - 1)
      .select(col(idCol),
        (lit(MaxPos - 1) - pmod(col("wkey"), lit(MaxPos))).as("pos"),
        // integer DIV: Column./ is double division and a 63-bit key
        // exceeds double's 2^53 exact-integer range
        expr(s"CAST(wkey DIV $MaxPos AS BIGINT)").as("fph"))
      .distinct()
  }
}
