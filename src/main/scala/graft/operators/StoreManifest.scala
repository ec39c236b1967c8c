package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Multi-store snapshot pinning — the reproducibility artifact for a
  * training run. A run reads several versioned stores (documents,
  * embeddings, rollups); "which data trained this model" is only
  * answerable if the EXACT version of every input is recorded at
  * launch, atomically, in one place. A manifest is a KB-scale parquet
  * of (store_path, version) rows published with the same tmp+rename
  * commit as a store version: readers see the whole pin set or
  * nothing.
  *
  * Reading THROUGH the manifest ([[readAll]]) serves each store at
  * its pinned version regardless of any appends, merges, deletes, or
  * compactions since — snapshot isolation across stores — and fails
  * loudly (the [[VersionedStore.readAt]] existence check) if a
  * vacuum has passed a pinned version, rather than silently serving
  * a different corpus. Keep vacuum horizons behind your oldest live
  * manifest.
  */
object StoreManifest {

  /** Pin each store's CURRENT latest version into a manifest at
    * `manifestPath`. Returns the pinned (store → version) map.
    */
  private val cols = Seq(
    MetaParquet.Col("store_path", "string"),
    MetaParquet.Col("version", "long"))
  private val schema = MetaParquet.schemaOf("graft_manifest", cols)

  def pin(spark: SparkSession, stores: Seq[String],
      manifestPath: String): Map[String, Long] = {
    val pinned = stores.map(p =>
      p -> VersionedStore.latestVersion(spark, p))
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$manifestPath.tmp")
    val dest = new Path(manifestPath)
    if (f.exists(tmp) && !f.delete(tmp, true))
      sys.error(s"StoreManifest.pin: cannot clear $tmp")
    // KB-scale metadata: driver-side parquet write (same layout the
    // previous coalesce(1) Spark write produced), no Spark job
    MetaParquet.write(spark.sparkContext.hadoopConfiguration, tmp,
      schema, cols, pinned.map { case (p, v) =>
        Map[String, Any]("store_path" -> p, "version" -> v) })
    if (f.exists(dest) && !f.delete(dest, true))
      sys.error(s"StoreManifest.pin: cannot replace $dest")
    if (!f.rename(tmp, dest))
      sys.error(s"StoreManifest.pin: cannot publish $dest")
    pinned.toMap
  }

  /** The pinned versions recorded in a manifest. */
  def versions(spark: SparkSession,
      manifestPath: String): Map[String, Long] = {
    val f = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    MetaParquet.read(f, spark.sparkContext.hadoopConfiguration,
        new Path(manifestPath))
      .map(m => m("store_path").asInstanceOf[String] ->
        m("version").asInstanceOf[Long]).toMap
  }

  /** Each pinned store's content AT its pinned version — unaffected
    * by anything committed since the pin.
    */
  def readAll(spark: SparkSession,
      manifestPath: String): Map[String, DataFrame] =
    versions(spark, manifestPath).map { case (p, v) =>
      p -> VersionedStore.readAt(spark, p, v)
    }
}
