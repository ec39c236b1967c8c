package graft.streaming

import graft.operators.VersionedStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once streaming ingestion into a [[VersionedStore]] — the
  * production form of the reference's file-sensor → copy-into-dated-
  * partition ingest (`dags/ingest_bundesliga_match_scores.py`), with
  * the at-least-once caveat removed: Structured Streaming replays a
  * micro-batch under the SAME batch id after a crash between the sink
  * write and the checkpoint commit, and
  * [[VersionedStore.appendIdempotent]] turns that replay into a
  * no-op (the txn-tagged commit already exists), so the store holds
  * each batch exactly once — no consumer-side dedup convention needed
  * (contrast [[DeltaLedgerStream]], which is idempotent only at the
  * content level and asks ledger readers to keep the first verdict).
  *
  * Each micro-batch is one atomic commit: downstream readers see
  * whole batches or nothing, time travel reproduces the store as of
  * any batch, and [[VersionedStore.changes]] is the incremental feed
  * a downstream pipeline tails.
  *
  * Single-writer per store path, as everywhere in VersionedStore: one
  * stream owns a store (batch ids from two checkpoints would collide
  * on txn). `statsCol` stats every arriving group on the given
  * column, keeping key-range pruning armed as the store grows.
  */
object VersionedStoreSink {

  /** Drain everything currently in the source as micro-batches and
    * commit each exactly once. Re-running over the same checkpoint
    * processes only NEW files — the incremental ingest loop.
    */
  def runAvailableNow(streamed: DataFrame, storePath: String,
      checkpoint: String,
      statsCol: Option[String] = None): StreamingQuery =
    streamed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VersionedStore.appendIdempotent(batch, storePath, batchId,
          statsCol)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
