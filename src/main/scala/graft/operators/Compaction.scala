package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-layout hygiene pass every
  * long-running ingest needs. Streaming micro-batches, per-task
  * writers, and incremental upserts each leave directories of
  * kilobyte parquet files; at 100 TB that means scan tasks dominated
  * by open/footer overhead, NameNode/listing pressure, and one
  * scheduler task per tiny file. Compaction rewrites a directory
  * into ~`targetFileBytes` files:
  *
  *  - file count = ceil(input bytes / target), computed from the
  *    target filesystem's listing (bytes on disk ≈ bytes after
  *    rewrite: same codec, same format);
  *  - with `sortCols`, `repartitionByRange` + in-partition sort, so
  *    the rewrite ALSO tightens per-file min/max footer stats on the
  *    sort key (the cheap 1-D cousin of ZOrder.clusterByZ — combine
  *    with zValue for multi-column skipping);
  *  - without, round-robin `repartition` for even file sizes.
  *
  * The rewrite goes to a fresh directory and is swapped in by the
  * caller (or written directly to `outDir` for append-only layouts)
  * — same publish discipline as IncrementalSink. Nothing here is
  * driver-sided: listing is O(files) metadata, the data moves in one
  * shuffle.
  */
object Compaction {

  /** Bytes of all data files under `dir` on its own filesystem. */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        total += f.getLen
    }
    total
  }

  /** Rewrite parquet `inDir` into `outDir` as ~`targetFileBytes`
    * files; returns the file count written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, sortCols: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val nFiles = math.max(1,
      math.ceil(dataBytes(spark, inDir).toDouble / targetFileBytes).toInt)
    val in = spark.read.parquet(inDir)
    val shaped: DataFrame =
      if (sortCols.nonEmpty)
        in.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else in.repartition(nFiles)
    shaped.write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }
}
