package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
  * operator — the mergeable FREQUENCY sketch next to the engine's
  * mergeable-cardinality rollup (SketchRollup's HLL) and Space-Saving
  * heavy hitters: d×w integer cells answer "how often did key k
  * occur?" within ε = e/w of the true count (overestimate only,
  * never under), for any key, from O(d·w) state.
  *
  * 100 TB stance: the build is ONE explode (d rows per input row) +
  * hash-agg on (row, bucket) — linear, map-side partial, output is
  * d·w rows of model-metadata scale regardless of input size. Merge
  * of two sketches (per-partition, per-day, per-source builds) is
  * cell-wise addition — a union + hash-agg on the same tiny key
  * space, which is WHY a pipeline sketches shards independently and
  * folds; the spec pins build(A ∪ B) ≡ merge(build(A), build(B))
  * exactly. Point queries join the query keys' d cells and take the
  * min.
  *
  * Hash family: the md5-prefix trick (row-salted md5, first 13 hex
  * chars → BIGINT < 2^52, mod width) — deterministic, partition-
  * independent, and reproducible bit-for-bit in DuckDB for the
  * oracle gate (q234).
  *
  * Mode-agnostic: [[build]] is explode + hash-agg, so it runs
  * unchanged on a STREAMING DataFrame (complete mode) as the online
  * frequency monitor — StreamingCmsSpec pins the streamed cells
  * bit-equal to the batch sketch.
  */
object CountMinSketch {

  /** A sketch WITH its shape. The cells DataFrame alone cannot tell a
    * caller what (d, w) built it, and [[estimate]] called with a
    * LARGER depth than the build silently returns 0 for every key
    * (the missing rows coalesce to 0 and win the min) — violating the
    * one-sided never-undershoot guarantee with no error. Carrying the
    * shape makes the typed estimate/merge overloads mismatch-proof;
    * prefer them over the raw-DataFrame forms everywhere the sketch
    * is not a streaming query result.
    */
  final case class Sketch(depth: Int, width: Int, cells: DataFrame)

  /** Bucket of `key` under hash row `row`: pairwise-independent-ish
    * salted md5, engine-portable.
    */
  def bucket(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit("#" + row))),
      1, 13), 16, 10).cast("long") % width

  /** [[build]] wrapped with its shape — the mismatch-proof form. */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): Sketch =
    Sketch(depth, width, build(df, keyCol, depth, width))

  /** Cell-wise fold of same-shape sketches; shape mismatch is an
    * immediate error rather than silently-wrong estimates.
    */
  def merge(sketches: Sketch*): Sketch = {
    require(sketches.nonEmpty, "CountMinSketch.merge: no sketches")
    val Sketch(d, w, _) = sketches.head
    require(sketches.forall(s => s.depth == d && s.width == w),
      s"CountMinSketch.merge: shape mismatch — got " +
        sketches.map(s => s"${s.depth}x${s.width}").distinct.mkString(", "))
    Sketch(d, w, merge(sketches.map(_.cells): _*))
  }

  /** Point estimates against a shape-carrying [[Sketch]] — depth and
    * width always match the build by construction.
    */
  def estimate(keys: DataFrame, sk: Sketch, keyCol: String): DataFrame =
    estimate(keys, sk.cells, keyCol, sk.depth, sk.width)

  /** Build a d×w sketch over `df`'s `keyCol`: one row per non-empty
    * cell, (row, bucket, cnt). Empty cells are implicit zeros.
    */
  def build(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"CountMinSketch: need depth >= 1 and width >= 2, got d=$depth w=$width")
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("row"),
        bucket(col(keyCol), r, width).as("bucket"))
    }: _*)
    df.select(explode(cells).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Two same-shape sketches over ONE pass: cells (row, bucket, cnt,
    * cnt_tag) where `cnt` counts every key and `cnt_tag` only keys
    * whose boolean `tagCol` holds. Cell-equivalent to building
    * `build(df)` and `build(df.filter(tagCol))` separately — the spec
    * pins that — but with one scan of the input and one salted-md5
    * evaluation per (key, row) instead of two of each. This is the
    * join-size-estimation shape (q287): sketch the full key stream
    * and a predicate-filtered sub-stream together, then the AMS inner
    * product Σ cnt·cnt_tag never touches the input again. Cells where
    * cnt_tag = 0 contribute 0 to any product, exactly as their absence
    * from a separately built filtered sketch drops them from the
    * inner join.
    */
  def buildPair(df: DataFrame, keyCol: String, tagCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"CountMinSketch: need depth >= 1 and width >= 2, got d=$depth w=$width")
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("row"),
        bucket(col(keyCol), r, width).as("bucket"))
    }: _*)
    df.select(explode(cells).as("c"),
        col(tagCol).cast("boolean").as("_tag"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        count_if(col("_tag")).cast("long").as("cnt_tag"))
  }

  /** Cell-wise sum of independently built sketches (same d, w). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket")
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point estimates for `keys` (a DataFrame with `keyCol`): min over
    * the key's d cells. Keys whose every cell is empty estimate 0;
    * estimates never undershoot the true count. The keys side is
    * assumed query-sized and broadcast; the sketch side is d·w rows.
    *
    * HAZARD (raw-DataFrame form): `depth`/`width` must equal the
    * build's. A sketch DEEPER than `depth` fails loudly (the guard
    * below trips on its out-of-range rows); a sketch SHALLOWER than
    * `depth` is undetectable from the cells alone — the missing rows
    * coalesce to 0 and the min silently returns 0, breaking the
    * one-sided guarantee. Use the [[Sketch]]-typed overload unless the
    * cells come from a streaming query.
    */
  def estimate(keys: DataFrame, sketch: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("row"),
        bucket(col(keyCol), r, width).as("bucket"))
    }: _*)
    val guarded = sketch.withColumn("cnt",
      when(col("row") >= depth || col("bucket") >= width,
        raise_error(concat(
          lit(s"CountMinSketch.estimate: cell outside ${depth}x$width"
            + " — sketch built with a different shape (row="),
          col("row"), lit(", bucket="), col("bucket"), lit(")")))
          .cast("long"))
        .otherwise(col("cnt")))
    keys
      .select(col(keyCol), explode(cells).as("c"))
      .select(col(keyCol), col("c.row").as("row"),
        col("c.bucket").as("bucket"))
      .join(guarded, Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
