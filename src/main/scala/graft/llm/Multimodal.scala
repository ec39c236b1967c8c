package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column convention + decode plumbing (builder prompt:
  * image/audio/video as opaque binary with typed metadata; decode /
  * feature-extract stubbed because no media libraries ship in this
  * environment — the Spark-side schema, partitioning, and batch shape
  * are real).
  *
  * Layout: one row per asset —
  *   (asset_id long, modality string, payload binary,
  *    meta struct<source:string, n_bytes:int>)
  * Payloads stay opaque bytes end-to-end; only [[decodeFeatures]]
  * interprets them, per-partition, in fixed-size batches — exactly
  * where a JNI/FFI decoder (libjpeg, ffmpeg) would sit in production.
  */
object Multimodal {

  final case class Asset(asset_id: Long, modality: String,
      payload: Array[Byte], source: String)

  final case class AssetFeatures(asset_id: Long, modality: String,
      n_bytes: Int, feature: Array[Float])

  /** Read real media files as assets via Spark's `binaryFile` source:
    * one row per file with the payload as opaque bytes plus path/size
    * metadata — the production ingestion path (`pathGlobFilter` keeps
    * the scan to the wanted extension; file-level pruning happens at
    * the source). asset_id is the stable hash of the path:
    * deterministic across re-reads, no driver-side numbering.
    */
  def fromBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*", modality: String = "image"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        xxhash64(col("path")).as("asset_id"),
        lit(modality).as("modality"),
        col("content").as("payload"),
        struct(col("path").as("source"),
          col("length").cast("int").as("n_bytes")).as("meta"))

  /** Wrap a (id, text, source) table as binary assets — the testdata
    * stand-in for reading real media files as `binaryFile` sources.
    */
  def fromDocuments(docs: DataFrame, modality: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit(modality).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))

  /** STUB DECODER — stands in for a real image/audio decode.
    *
    * Real implementation would decode `payload` (JPEG/WAV/...) and
    * emit a feature vector; this deterministic fake emits an 8-bin
    * byte histogram, normalized — same signature, same batch shape,
    * same per-partition execution, zero media dependencies. Swap the
    * body for the real decoder; nothing else changes.
    */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    payload.foreach(b => hist((b & 0xff) >> 5) += 1f)
    val n = math.max(payload.length, 1)
    hist.map(_ / n)
  }

  /** Per-partition batched decode: rows stream through in partition
    * order, the decoder touches each payload once, output is a typed
    * Dataset. mapPartitions (not a per-row UDF) so a real decoder can
    * amortize init (codec contexts, model weights) across the
    * partition — the Scala analog of mapInPandas batches.
    */
  def decodeFeatures(spark: SparkSession, assets: DataFrame)
      : Dataset[AssetFeatures] = {
    import spark.implicits._
    assets
      .select(col("asset_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, modality, payload) =>
        AssetFeatures(id, modality, payload.length, stubDecode(payload))
      })
  }

  final case class ResizedAsset(asset_id: Long, modality: String,
      payload: Array[Byte])

  final case class Frame(asset_id: Long, frame_no: Int,
      frame: Array[Byte])

  /** STUB RESIZE — image-resize analog: deterministic strided
    * down-sampling of the payload to ≤ `targetBytes`. Same
    * mapPartitions shape as [[decodeFeatures]]; a real implementation
    * swaps the stride loop for libvips/PIL-style scaling and nothing
    * else changes.
    */
  def resize(spark: SparkSession, assets: DataFrame,
      targetBytes: Int = 64): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, modality, payload) =>
        val stride = math.max(1, payload.length / targetBytes)
        val out = payload.indices.by(stride).take(targetBytes)
          .map(payload).toArray
        ResizedAsset(id, modality, out)
      })
  }

  /** Frame sampling — video analog: the payload is a sequence of
    * `frameSize`-byte frames; every `every`-th frame becomes its own
    * row (a flatMap generator: one asset → many frames, the shape a
    * video pipeline fans out with before per-frame featurization).
    */
  def frameSample(spark: SparkSession, assets: DataFrame,
      frameSize: Int = 16, every: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(frameSize).zipWithIndex.collect {
          case (f, i) if i % every == 0 => Frame(id, i, f)
        }
      }
  }

  /** Time-based frame-extraction MANIFEST from asset metadata alone —
    * the scheduling half of a video decode, planned WITHOUT touching
    * a single payload byte: one frame every `intervalMs` over each
    * asset's duration, grouped into `batchSize`-frame decode batches
    * (the unit a GPU/codec worker pulls). Emits (asset_id, frame_idx,
    * ts_ms, batch_id) via a declarative `sequence` explode — pure
    * map-side, zero shuffle, so at 100 TB the manifest generation is
    * a metadata scan even when the payloads are petabytes. Assets
    * shorter than 1 ms produce no frames (filtered up front —
    * `sequence(0, negative)` would DESCEND and fabricate rows).
    */
  def frameManifest(assets: DataFrame, idCol: String,
      durationMsCol: String, intervalMs: Long,
      batchSize: Int): DataFrame = {
    require(intervalMs > 0 && batchSize > 0,
      s"intervalMs/batchSize must be positive: $intervalMs/$batchSize")
    assets
      .filter(col(durationMsCol) >= 1)
      .select(col(idCol).as("asset_id"),
        explode(sequence(lit(0L),
          expr(s"($durationMsCol - 1) div $intervalMs")))
          .as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        (col("frame_idx") * intervalMs).as("ts_ms"),
        expr(s"frame_idx div $batchSize").as("batch_id"))
  }

  /** Typed-metadata extraction stays in pure column land (no decode):
    * pruning + predicate pushdown keep this metadata-only at scan.
    */
  def metadataProfile(assets: DataFrame): DataFrame =
    assets.groupBy("modality")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
}
