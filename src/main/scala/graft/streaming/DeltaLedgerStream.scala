package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming form of the q321 delta exact-dedup ledger — the shape a
  * production ingest actually runs: document batches ARRIVE (file
  * stream, Kafka, ...), and each micro-batch is judged against the
  * fingerprint store of everything shipped so far
  * ([[graft.llm.DedupClusters.deltaExactLedger]] — frozen-base
  * keep-first), its ledger rows appended, and its kept fingerprints
  * folded INTO the store so later batches defer to earlier ones.
  * Arrival order IS the keep-first order across batches (within a
  * batch, doc_id ties it as in the batch form), so the accumulated
  * ledger equals the sequential batch application —
  * StreamingDeltaLedgerSpec witnesses stream ≡ batch across
  * micro-batch splits.
  *
  * Scale contract per micro-batch: one store read (fp column only —
  * at 100 TB a parquet scan of one string column, prunable further by
  * an fp-prefix partition key exactly like WinnowIndex's fbucket
  * layout), one fp join, one fp-window over the batch — O(|batch|)
  * work against O(distinct shipped contents) state, never a corpus
  * re-scan.
  *
  * Replay semantics: foreachBatch gives at-least-once side effects —
  * a crash between the ledger append and the checkpoint commit
  * replays the batch. Both writes are idempotent at the CONTENT
  * level (a replayed batch re-judges against a store that may
  * already hold its fps, turning its kept rows into exact_dup_base —
  * consumers dedup the ledger by doc_id keeping the FIRST verdict,
  * the standard at-least-once reading; the store only ever gains
  * fps it already had, which changes no later judgment).
  */
object DeltaLedgerStream {

  /** One micro-batch judgment: read the store (empty on first batch),
    * judge, append ledger rows, fold kept fps into the store.
    * Factored out of the stream so the spec can also drive it
    * directly.
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
      storePath: String, ledgerPath: String): Unit = {
    import spark.implicits._
    val fps = batch
      .select(col("doc_id").cast("long").as("doc_id"),
        md5(col("text")).as("fp"))
      .localCheckpoint() // judged AND folded below — one tokenize
    // existence via the Hadoop FileSystem like every other store
    // component — java.io.File would judge an HDFS/S3 store path
    // "absent" on every batch and silently mark duplicates "kept"
    val storeFs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val base =
      if (storeFs.exists(new org.apache.hadoop.fs.Path(storePath)))
        spark.read.parquet(storePath).select("fp")
      else Seq.empty[String].toDF("fp")
    val ledger = graft.llm.DedupClusters.deltaExactLedger(base, fps)
      .localCheckpoint() // written twice (ledger + kept-fold)
    ledger.write.mode("append").parquet(ledgerPath)
    ledger.filter(col("removed_by") === "kept")
      .join(fps, "doc_id").select("fp")
      .write.mode("append").parquet(storePath)
  }

  /** Drain everything currently in the source directory as
    * micro-batches (AvailableNow), judging each against the store as
    * of its turn. Re-running over the same checkpoint processes only
    * NEW files — the incremental ingest loop.
    */
  def runAvailableNow(spark: SparkSession, docs: DataFrame,
      storePath: String, ledgerPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, storePath, ledgerPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
