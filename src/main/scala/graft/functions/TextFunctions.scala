package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Column-level text-pipeline primitives (tokenize, shingle, MinHash,
  * SimHash, fingerprint) used by both the declared queries and the
  * graft.llm dedup operators.
  *
  * Everything here is built from codegen'd Spark built-ins (split /
  * transform / aggregate / md5 …) — no Scala UDFs — so the expressions
  * stay inside whole-stage codegen and are reproducible in any SQL
  * engine with md5 (which is how the DuckDB oracles check them).
  */
object TextFunctions {

  /** Whitespace tokens (documents.text is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles (1-based slice; empty when < 3 words). */
  def trigrams(ws: Column): Column =
    when(size(ws) < 3, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(ws) - lit(2)),
        i => array_join(slice(ws, i, lit(3)), " ")))

  /** Normalized-text fingerprint: lowercase, collapse whitespace, md5.
    * The "document fingerprinting" primitive for exact/near-exact
    * dedup at scale — grouping on a 32-char key instead of the full
    * document body.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** One MinHash signature component: the lexicographic minimum of
    * md5("<seed>:" + shingle) over the document's shingles. md5 acts
    * as the member of the hash family selected by `seed` — fully
    * deterministic and engine-portable (strings compare bytewise).
    * Computed as a plain `min` aggregate over exploded shingles: one
    * shuffle of (doc, gram) pairs, partial min map-side.
    */
  def minhashAgg(gram: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed:"), gram)))

  /** Sliced MinHash signature: one md5 yields FOUR independent 32-bit
    * components (8 hex chars each, bytewise min ≡ numeric min on
    * fixed-width lowercase hex), so `numHashes` components cost
    * `numHashes / 4` md5 evaluations per shingle instead of
    * `numHashes` — the scale path (4× less hash CPU on the corpus
    * scan, and a 4× smaller codegen'd aggregate). Component i reads
    * chars [8·(i mod 4), 8·(i mod 4)+8) of md5 number i / 4 (salted
    * by its index past the first).
    */
  def minhashSlicedAggs(gram: Column, numHashes: Int = 8): Seq[Column] = {
    require(numHashes % 4 == 0, s"numHashes ($numHashes) must be a multiple of 4")
    (0 until numHashes).map { i =>
      val k = i / 4
      val h = if (k == 0) md5(gram) else md5(concat(lit(s"$k:"), gram))
      min(substring(h, (i % 4) * 8 + 1, 8)).as(s"h$i")
    }
  }

  /** SimHash bit weight for hex position `j` (1-based, 1..16) of
    * md5(token): +1 if the hex digit's high bit is set (chars '8'..'f'
    * sort after '8'), else -1. Summed over tokens, bit j of the
    * fingerprint is 1 iff the sum is positive.
    */
  def simhashBitWeight(token: Column, j: Int): Column =
    when(substring(md5(token), j, 1) >= "8", 1L).otherwise(-1L)

  /** 16-bit SimHash fingerprint aggregate columns: apply over a
    * groupBy(doc) of exploded distinct tokens, then combine with
    * [[simhashCombine]].
    */
  def simhashBitAggs(token: Column): Seq[Column] =
    (1 to 16).map(j => sum(simhashBitWeight(token, j)).as(s"b$j"))

  /** Fold the bit-sums (16 or 60 of them) into the integer fingerprint. */
  def simhashCombine(bitSums: Seq[Column]): Column =
    bitSums.zipWithIndex
      .map { case (b, i) => when(b > 0, lit(1L << i)).otherwise(0L) }
      .reduce(_ + _)

  /** 60-bit SimHash bit weight: bits 1..32 read md5(token), bits
    * 33..60 read md5("x:" + token) (one md5 yields 32 hex chars = 32
    * sign bits; a salted second md5 supplies the rest). 60 bits keep
    * the fingerprint positive in a signed 64-bit long on both engines.
    * The 16-bit form is the cheap profile fingerprint (q33); the
    * 60-bit form is what near-dup PAIRING needs — at 16 bits random
    * docs collide constantly, at 60 bits random docs sit ~30 bits
    * apart and only true near-dups fall within a small Hamming ball.
    */
  def simhashBitWeight60(token: Column, j: Int): Column = {
    require(j >= 1 && j <= 60, s"bit position $j outside 1..60")
    val h = if (j <= 32) md5(token) else md5(concat(lit("x:"), token))
    val pos = if (j <= 32) j else j - 32
    when(substring(h, pos, 1) >= "8", 1L).otherwise(-1L)
  }

  /** 60-bit SimHash aggregate columns; combine with [[simhashCombine]]. */
  def simhashBitAggs60(token: Column): Seq[Column] =
    (1 to 60).map(j => sum(simhashBitWeight60(token, j)).as(s"b$j"))

  /** 60-bit SimHash aggregates over PRE-HASHED columns: callers
    * project `m1 = md5(token)` / `m2 = md5("x:" + token)` once per
    * row, and the 60 bit-sums only read substrings — guaranteeing two
    * md5 evaluations per row instead of relying on subexpression
    * elimination across 60 aggregate buffers.
    */
  def simhashBitAggs60Pre(m1: Column, m2: Column): Seq[Column] =
    (1 to 60).map { j =>
      val (h, pos) = if (j <= 32) (m1, j) else (m2, j - 32)
      sum(when(substring(h, pos, 1) >= "8", 1L).otherwise(-1L)).as(s"b$j")
    }

  /** Polynomial (Rabin-Karp) hash of the whole text: fold
    * `acc = (acc * 31 + byte) mod 1e9+7` over the characters — the
    * rolling-hash fingerprint primitive, engine-portable (DuckDB
    * spells it list_reduce over ascii codes). Unlike md5 it supports
    * incremental/windowed computation, which is what content-defined
    * chunking builds on.
    */
  def polyHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Per-position window hashes: polyHash of every `w`-char window —
    * the rolling form used for shared-substring blocking. This HOF
    * spelling recomputes each window (O(n·w), fine for profile-sized
    * w); the O(n) rolling recurrence (subtract the outgoing char's
    * B^(w-1) term) belongs in a custom Expression if windows get
    * long.
    */
  def rollingHashes(text: Column, w: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (w - 1), lit(0))),
      i => aggregate(
        transform(split(text.substr(i, lit(w)), ""),
          c => ascii(c).cast("long")),
        lit(0L),
        (acc, x) => (acc * 31 + x) % 1000000007L))

  /** PII redaction: email addresses → [EMAIL], phone-number-shaped
    * digit runs → [PHONE]. Pure regexp_replace (codegen'd, no UDF) —
    * the pre-training scrub pass. Patterns are deliberately
    * recall-leaning (a redacted non-phone costs little; a leaked
    * phone costs a lot).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]", "[PHONE]")
}
