package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Commit-log versioned parquet store — the minimal table format the
  * delta-maintenance family (q305 IVF add-batch, q310 winnow delta,
  * q321 dedup ledger) has been converging on, made explicit. The
  * reference pipeline rewrites its lake paths in place (copy into a
  * dated partition, `mode("overwrite")` dbt materializations); at
  * 100 TB in-place rewrite is unusable — a reader mid-scan observes
  * a half-deleted directory, a crashed writer leaves a truncated
  * table, and yesterday's rows are simply gone. The industry answer
  * (Delta Lake / Iceberg, both public designs) is a commit log:
  * immutable data file-groups plus an append-only log of
  * add/remove actions, where publishing one new log entry IS the
  * atomic commit. This is that answer built from parquet primitives:
  *
  *   <path>/data/f<fid>/       one immutable parquet file-group per
  *                             committed add (never rewritten)
  *   <path>/log/v%09d/         one parquet commit record per version;
  *                             the single directory RENAME that puts
  *                             a record at its final name is the
  *                             commit point
  *
  * Log record rows: (action "add"|"remove", fid, rows). Version v's
  * visible content = parquet union of fids added minus removed by
  * records ≤ v. Readers resolve the file list from the log only —
  * NEVER by listing `data/` — so a half-written file-group from a
  * crashed append is invisible (no log record names it) and an
  * eventually-consistent object listing cannot corrupt a read.
  *
  * What this buys over the rename-swap stores ([[WinnowIndex.compact]]):
  *  - atomic append: data lands fully before the log rename; a crash
  *    at ANY point leaves the previous version intact and visible;
  *  - crash-safe compaction: remove-all + add-one in ONE commit
  *    record — old and new content never coexist, no rollback dance;
  *  - time travel: `readAt(v)` reproduces any retained version —
  *    the "which corpus snapshot trained this model" audit question;
  *  - snapshot isolation: a reader that resolved its file list at
  *    version v scans immutable file-groups, unaffected by
  *    concurrent appends/compactions until `vacuum` passes its
  *    retention horizon;
  *  - targeted delete: `deleteWhere` rewrites ONLY the file-groups
  *    that contain matching rows (removal-request compliance at
  *    O(affected files), not O(table)).
  *
  * Scale shape: the log is O(commits) KB-scale parquet read once per
  * query plan on the driver; data stays distributed and is read by
  * one multi-path parquet scan, so pushdown/pruning work unchanged.
  * Single-writer per store (the reference's Airflow model — one DAG
  * owns a path); a racing second writer loses the commit rename and
  * fails loudly rather than corrupting (pinned in the spec).
  */
object VersionedStore {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = new Path(s"$path/log")
  private def dataDir(path: String, fid: Long) =
    new Path(s"$path/data/f$fid")
  private def versionName(v: Long) = f"v$v%09d"

  /** Start an empty store at `path`, clearing any prior content. */
  def create(spark: SparkSession, path: String): Unit = {
    val f = fs(spark)
    val p = new Path(path)
    if (f.exists(p) && !f.delete(p, true))
      sys.error(s"VersionedStore.create: cannot clear $path")
    if (!f.mkdirs(logDir(path)))
      sys.error(s"VersionedStore.create: cannot create log at $path")
    // a re-created store restarts version numbering at the same
    // path — cached records from the previous incarnation must not
    // survive (the listing alone could not distinguish them)
    logCache.synchronized { logCache.remove(path) }
    ()
  }

  /** Committed versions at `path`, ascending. Tmp dirs from crashed
    * commits (`.tmp-*`) never match the `v%09d` name and are
    * invisible here — ignoring them IS the crash recovery.
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark)
    val ld = logDir(path)
    if (!f.exists(ld)) sys.error(
      s"VersionedStore: no store at $path (missing log dir)")
    f.listStatus(ld).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{9}")).map(_.drop(1).toLong).sorted
  }

  def latestVersion(spark: SparkSession, path: String): Long =
    versions(spark, path).lastOption.getOrElse(0L)

  /** Per-file-group zone stats carried in the commit record: min/max
    * of one numeric column, computed from the group's written parquet
    * (footer-cheap) at commit time. `None` = unstatted group (always
    * a candidate for any key range).
    */
  final case class GroupAdd(fid: Long, n: Long,
      stats: Option[(String, Long, Long)] = None,
      schemaJson: Option[String] = None)

  private def commit(spark: SparkSession, path: String,
      adds: Seq[GroupAdd], removes: Seq[Long]): Long =
    commitAt(spark, path, latestVersion(spark, path) + 1, adds,
      removes)

  /** The commit body at an EXPLICIT version — separated so the spec
    * can reproduce the two-writers race (both computed the same next
    * version; the loser's rename must fail, not clobber). `txn` tags
    * the record for [[appendIdempotent]]; -1 = untagged. The
    * tmp-write + rename makes the log record appear atomically;
    * rename-into-existing would NEST (the WinnowIndex lesson), so an
    * existing destination — a concurrent writer won the version —
    * fails the commit loudly and the loser's orphan data stays
    * invisible.
    */
  private[operators] def commitAt(spark: SparkSession, path: String,
      v: Long, adds: Seq[GroupAdd], removes: Seq[Long],
      txn: Long = -1L): Long = {
    import spark.implicits._
    val f = fs(spark)
    val tmp = new Path(s"$path/log/.tmp-${versionName(v)}")
    if (f.exists(tmp) && !f.delete(tmp, true))
      sys.error(s"VersionedStore.commit: cannot clear stale $tmp")
    (adds.map { a =>
      val (sc, lo, hi) = a.stats
        .map { case (c, l, h) => (c, Some(l), Some(h)) }
        .getOrElse((null: String, None, None))
      ("add", a.fid, a.n, txn, sc, lo, hi, a.schemaJson.orNull)
    } ++ removes.map(fid =>
      ("remove", fid, 0L, txn, null: String,
        None: Option[Long], None: Option[Long], null: String)))
      .toDF("action", "fid", "rows", "txn",
        "stat_col", "stat_min", "stat_max", "schema_json")
      .coalesce(1).write.parquet(tmp.toString)
    val dest = new Path(s"$path/log/${versionName(v)}")
    if (f.exists(dest))
      sys.error(s"VersionedStore.commit: version $v already " +
        s"committed at $path — concurrent writer conflict")
    if (!f.rename(tmp, dest))
      sys.error(s"VersionedStore.commit: cannot publish $dest")
    v
  }

  /** One parsed commit-record row. `txn` -1, `stats` None, and
    * `schemaJson` None for records written before those columns
    * existed.
    */
  private final case class LogRec(v: Long, action: String, fid: Long,
      rows: Long, txn: Long, stats: Option[(String, Long, Long)],
      schemaJson: Option[String])

  /** Driver-side incremental log cache, per JVM: the log is
    * O(commits) of KB-scale parquet, but re-reading it through a
    * Spark job on EVERY latestVersion/liveFids/stats lookup made each
    * store operation pay several round-trips. The cache is keyed by
    * the ACTUAL log listing (an FS call, the commit source of truth),
    * so it can never serve stale state: a version set that differs
    * from the cached one triggers a read of exactly the missing
    * version files, and [[create]] drops the entry (same path, new
    * store). External writers are still seen — their new version
    * appears in the listing and is read on next access.
    */
  private val logCache =
    scala.collection.mutable.Map.empty[String, (Set[Long], Seq[LogRec])]

  private def logRecords(spark: SparkSession,
      path: String): Seq[LogRec] = logCache.synchronized {
    val vs = versions(spark, path).toSet
    val (cachedVs, cachedRecs) =
      logCache.getOrElse(path, (Set.empty[Long], Seq.empty[LogRec]))
    if (cachedVs == vs) return cachedRecs
    val keep = cachedRecs.filter(r => vs.contains(r.v))
    val missing = (vs -- keep.map(_.v)).toSeq.sorted
    val fresh =
      if (missing.isEmpty) Seq.empty[LogRec]
      else {
        val log = spark.read.option("mergeSchema", "true")
          .parquet(missing.map(x => s"$path/log/${versionName(x)}"): _*)
        def optCol(name: String, tpe: String) =
          if (log.columns.contains(name)) col(name)
          else lit(null).cast(tpe)
        log.select(
          regexp_extract(input_file_name(), "v(\\d{9})", 1)
            .cast("long").as("v"),
          col("action"), col("fid"), col("rows"),
          coalesce(optCol("txn", "long"), lit(-1L)).as("txn"),
          optCol("stat_col", "string").as("stat_col"),
          optCol("stat_min", "long").as("stat_min"),
          optCol("stat_max", "long").as("stat_max"),
          optCol("schema_json", "string").as("schema_json"))
          .collect()
          .map { r =>
            val stats =
              if (r.isNullAt(5)) None
              else Some((r.getString(5), r.getLong(6), r.getLong(7)))
            val sj = if (r.isNullAt(8)) None else Some(r.getString(8))
            LogRec(r.getLong(0), r.getString(1), r.getLong(2),
              r.getLong(3), r.getLong(4), stats, sj)
          }.toSeq
      }
    val recs = (keep ++ fresh).sortBy(r => (r.v, r.action, r.fid))
    logCache(path) = (vs, recs)
    recs
  }

  /** All log actions up to and including `v` (O(commits) metadata
    * rows, independent of data size; cache-served).
    */
  private def actions(spark: SparkSession, path: String,
      v: Long): Seq[(Long, String, Long, Long)] =
    logRecords(spark, path).filter(_.v <= v)
      .map(r => (r.v, r.action, r.fid, r.rows))

  /** File-groups visible at version `v`. */
  private def liveFids(spark: SparkSession, path: String,
      v: Long): Seq[Long] = {
    val as = actions(spark, path, v)
    val removed = as.collect { case (_, "remove", fid, _) => fid }.toSet
    as.collect { case (_, "add", fid, _) if !removed(fid) => fid }
      .sorted
  }

  /** Zone stats of every statted file-group (fids are never reused
    * once committed, so at most one add record per fid). Records
    * written before the stats columns existed read as NULL under
    * mergeSchema → simply absent here.
    */
  private def groupStats(spark: SparkSession, path: String)
      : Map[Long, (String, Long, Long)] =
    logRecords(spark, path)
      .collect { case LogRec(_, "add", fid, _, _, Some(st), _) =>
        fid -> st }
      .toMap

  /** The store's maintained stats column, if EVERY live file-group
    * carries stats on the same column — mutators use this to keep
    * the discipline self-propagating (their new groups get stats on
    * the same column), and key-range pruning is only sound when no
    * live group is a stats blind spot.
    */
  def storeStatsCol(spark: SparkSession,
      path: String): Option[String] = {
    val live = liveFids(spark, path, latestVersion(spark, path))
    val stats = groupStats(spark, path)
    val cols = live.map(stats.get(_).map(_._1))
    if (live.nonEmpty && cols.forall(_ == cols.head)) cols.head
    else None
  }

  /** Live file-groups whose `keyCol` zone [min,max] overlaps
    * [lo,hi]; unstatted groups are always candidates. This is the
    * 100 TB lever for [[merge]]/[[deleteWhere]]: a keyed mutation
    * against a range-clustered store touches O(overlapping groups),
    * never O(table).
    */
  private[operators] def candidateFids(spark: SparkSession,
      path: String, v: Long, keyCol: String, lo: Long,
      hi: Long): Seq[Long] = {
    val stats = groupStats(spark, path)
    liveFids(spark, path, v).filter { fid =>
      stats.get(fid) match {
        case Some((c, mn, mx)) if c == keyCol => mx >= lo && mn <= hi
        case _ => true
      }
    }
  }

  /** Write `df` as file-group `fid` and return its commit entry —
    * count and (when `statsCol` set) min/max are computed from the
    * WRITTEN parquet, so `df` is evaluated exactly once and the
    * count is footer-cheap. An empty or all-NULL stat column commits
    * the group unstatted (always a candidate), never a bogus zone.
    */
  private def writeGroup(df: DataFrame, path: String, fid: Long,
      statsCol: Option[String]): GroupAdd = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(dataDir(path, fid).toString)
    val written = spark.read.parquet(dataDir(path, fid).toString)
    val sj = Some(df.schema.json)
    statsCol match {
      case Some(c) =>
        val r = written.agg(count(lit(1)).as("n"),
          min(col(c)).cast("long").as("lo"),
          max(col(c)).cast("long").as("hi")).head
        if (r.getLong(0) == 0 || r.isNullAt(1))
          GroupAdd(fid, r.getLong(0), None, sj)
        else GroupAdd(fid, r.getLong(0),
          Some((c, r.getLong(1), r.getLong(2))), sj)
      case None => GroupAdd(fid, written.count(), None, sj)
    }
  }

  /** The table schema as of version `v`: the newest add record ≤ v
    * that carries one (commits never shrink the schema — enforced in
    * [[append]]). None for stores whose records predate schema
    * tracking.
    */
  private def schemaAt(spark: SparkSession, path: String,
      v: Long): Option[org.apache.spark.sql.types.StructType] =
    logRecords(spark, path)
      .filter(r => r.action == "add" && r.v <= v &&
        r.schemaJson.isDefined)
      .sortBy(_.v).lastOption
      .map(r => org.apache.spark.sql.types.DataType
        .fromJson(r.schemaJson.get)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Read file-groups under the table schema of version `v`: groups
    * written before an additive schema evolution simply yield NULL
    * for the columns they predate (the parquet reader fills missing
    * columns when the scan schema is explicit — no footer-merging
    * pass over every file, the Delta/Iceberg schema-in-log design).
    */
  private def readFids(spark: SparkSession, path: String,
      fids: Seq[Long], v: Long): DataFrame = {
    val paths = fids.map(dataDir(path, _).toString)
    schemaAt(spark, path, v) match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  private def nextFid(spark: SparkSession, path: String): Long = {
    val as = actions(spark, path, Long.MaxValue)
    (0L +: as.map(_._3)).max + 1
  }

  /** Append `df` as one new immutable file-group; returns the new
    * version. A crash before the final log rename leaves an orphan
    * data dir that no reader can see (vacuum reclaims it); the
    * overwrite mode reclaims a previous crash's orphan at this fid.
    * `statsCol` commits the group with min/max zone stats on that
    * numeric column — feed every append the same column to arm
    * key-range pruning in [[merge]]/[[deleteWhere]].
    *
    * Schema evolution is additive and explicit: an append whose
    * schema adds columns to the table schema requires
    * `evolve = true` (old file-groups then read as NULL in the new
    * columns — the scan schema is explicit, so no footer pass);
    * dropping a column or changing a column's type is rejected
    * outright, because existing groups could not be read under the
    * new schema without silent data loss.
    */
  def append(df: DataFrame, path: String,
      statsCol: Option[String] = None,
      evolve: Boolean = false): Long = {
    val spark = df.sparkSession
    schemaAt(spark, path, Long.MaxValue).foreach { cur =>
      val newFields = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cur.fields.filterNot(f =>
        newFields.get(f.name).contains(f.dataType))
      if (missing.nonEmpty) sys.error(
        "VersionedStore.append: batch schema drops or retypes " +
          s"table columns ${missing.map(_.name).mkString(", ")} — " +
          "existing file-groups could not be read under it")
      val added = df.schema.fieldNames.toSet -- cur.fieldNames.toSet
      if (added.nonEmpty && !evolve) sys.error(
        "VersionedStore.append: batch adds columns " +
          s"${added.mkString(", ")} — pass evolve=true to evolve " +
          "the table schema")
    }
    validate(df, path)
    val fid = nextFid(spark, path)
    commit(spark, path,
      Seq(writeGroup(df, path, fid, statsCol)), Seq.empty)
  }

  /** Content at version `v` (error if nothing is visible — an empty
    * store has no schema to return).
    */
  def readAt(spark: SparkSession, path: String, v: Long): DataFrame = {
    val fids = liveFids(spark, path, v)
    if (fids.isEmpty) sys.error(
      s"VersionedStore.readAt: version $v of $path is empty " +
        "(or vacuumed past)")
    val f = fs(spark)
    fids.foreach { fid =>
      if (!f.exists(dataDir(path, fid))) sys.error(
        s"VersionedStore.readAt: file-group f$fid of version $v " +
          s"was vacuumed — raise the vacuum retention horizon")
    }
    readFids(spark, path, fids, v)
  }

  /** Latest content. */
  def read(spark: SparkSession, path: String): DataFrame =
    readAt(spark, path, latestVersion(spark, path))

  /** Latest rows with `keyCol` in [lo, hi] — the serve-path
    * complement of the mutation-path pruning: when the store
    * maintains zone stats on `keyCol`, only the file-groups whose
    * zone overlaps the range are scanned at all (plus the residual
    * filter, which parquet min/max pushdown sharpens further inside
    * each group); otherwise a plain filtered read. On a
    * range-clustered store a narrow range touches O(1) groups
    * regardless of table size.
    */
  def readRange(spark: SparkSession, path: String, keyCol: String,
      lo: Long, hi: Long): DataFrame = {
    val v = latestVersion(spark, path)
    val resid = col(keyCol).cast("long").between(lo, hi)
    if (storeStatsCol(spark, path).contains(keyCol)) {
      val fids = candidateFids(spark, path, v, keyCol, lo, hi)
      if (fids.isEmpty) readAt(spark, path, v).filter(lit(false))
      else readFids(spark, path, fids, v).filter(resid)
    } else readAt(spark, path, v).filter(resid)
  }

  /** Fold every live file-group into one — remove-all + add-one in a
    * single commit record, so readers see the old file set or the
    * new one, never a mixture and never an empty gap (contrast the
    * rename-swap compaction, which has to restore the live dir by
    * hand if its second rename fails). Pre-compaction versions stay
    * readable until vacuum.
    */
  def compact(spark: SparkSession, path: String,
      clusterBy: Seq[String] = Nil): Long = {
    val v = latestVersion(spark, path)
    val old = liveFids(spark, path, v)
    val cur = readAt(spark, path, v)
    // range-cluster the rewrite when asked: each part file of the
    // folded group gets a disjoint key range, so parquet min/max
    // pushdown (and the store's own zone stats) prune sharply after
    // compaction — the Z-order/OPTIMIZE idea at its simplest
    val out =
      if (clusterBy.isEmpty) cur
      else cur.repartitionByRange(clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    val fid = nextFid(spark, path)
    commit(spark, path,
      Seq(writeGroup(out, path, fid, storeStatsCol(spark, path))), old)
  }

  /** The live content with each row's file-group id attached, read
    * under the current table schema.
    */
  private def withFidOf(spark: SparkSession, path: String,
      fids: Seq[Long]): DataFrame =
    readFids(spark, path, fids, Long.MaxValue)
      .withColumn("_vs_fid",
        regexp_extract(input_file_name(), "/f(\\d+)/", 1)
          .cast("long"))

  /** Rewrite every affected file-group in ONE distributed pass: the
    * kept rows (carrying `_vs_fid`) are written partitioned by their
    * group, per-group counts/zone-stats come from one aggregation,
    * and each partition directory is renamed into place as the new
    * group. A mutation touching N groups costs two Spark jobs, not N
    * sequential ones — the difference between minutes and hours when
    * a removal request spans hundreds of groups of a 100 TB table.
    * A deterministic content-hash salt spreads each group over up to
    * 8 writer tasks (within-group parallelism) while bounding the
    * file count per group.
    */
  private def rewriteGroups(spark: SparkSession, path: String,
      kept: DataFrame, fidOf: Seq[(Long, Long)],
      statsCol: Option[String]): Seq[GroupAdd] = {
    val f = fs(spark)
    val tmp = new Path(s"$path/data/.rewrite-tmp")
    if (f.exists(tmp) && !f.delete(tmp, true))
      sys.error(s"VersionedStore.rewriteGroups: cannot clear $tmp")
    val dataCols = kept.columns.filter(_ != "_vs_fid")
    val salt = pmod(xxhash64(struct(dataCols.map(col): _*)), lit(8))
    val spread = kept.repartition(col("_vs_fid"), salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      spread.write.partitionBy("_vs_fid").parquet(tmp.toString)
      val statRows = (statsCol match {
        case Some(c) => spread.groupBy(col("_vs_fid"))
          .agg(count(lit(1)).as("n"),
            min(col(c)).cast("long").as("lo"),
            max(col(c)).cast("long").as("hi"))
        case None => spread.groupBy(col("_vs_fid"))
          .agg(count(lit(1)).as("n"),
            lit(null).cast("long").as("lo"),
            lit(null).cast("long").as("hi"))
      }).collect().map { r =>
        r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) None
          else Some((statsCol.get, r.getLong(2), r.getLong(3))))
      }.toMap
      val schemaJson = Some(kept.drop("_vs_fid").schema.json)
      fidOf.map { case (oldFid, newFid) =>
        val src = new Path(s"$tmp/_vs_fid=$oldFid")
        val dst = dataDir(path, newFid)
        if (f.exists(dst) && !f.delete(dst, true)) sys.error(
          s"VersionedStore.rewriteGroups: cannot clear orphan $dst")
        if (f.exists(src)) {
          if (!f.rename(src, dst)) sys.error(
            s"VersionedStore.rewriteGroups: cannot place $dst")
        } else
          // every kept row of this group was removed: a REAL empty
          // parquet dir keeps multi-path reads working
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            kept.drop("_vs_fid").schema)
            .write.parquet(dst.toString)
        val (n, st) = statRows.getOrElse(oldFid, (0L, None))
        GroupAdd(newFid, n, st, schemaJson)
      }
    } finally {
      spread.unpersist()
      f.delete(tmp, true)
      ()
    }
  }

  /** Remove the rows matching `pred`, rewriting ONLY the file-groups
    * that contain matches (one scan finds them via the file path of
    * each matching row); untouched groups are carried over by
    * reference. One commit record publishes the whole delete.
    * `keyRange` is a caller-asserted pruning hint — "`pred` can only
    * match rows whose store stats column lies in [lo,hi]" — that
    * bounds even the FIND scan to the overlapping file-groups when
    * the store maintains zone stats.
    */
  def deleteWhere(spark: SparkSession, path: String, pred: Column,
      keyRange: Option[(Long, Long)] = None): Long = {
    val v = latestVersion(spark, path)
    val scanFids = (keyRange, storeStatsCol(spark, path)) match {
      case (Some((lo, hi)), Some(c)) =>
        candidateFids(spark, path, v, c, lo, hi)
      case _ => liveFids(spark, path, v)
    }
    if (scanFids.isEmpty) return v
    val withFid = withFidOf(spark, path, scanFids)
    val affected = withFid.filter(pred).select("_vs_fid")
      .distinct().collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return v
    val statsCol = storeStatsCol(spark, path)
    val first = nextFid(spark, path)
    val fidOf = affected.toSeq.zipWithIndex
      .map { case (o, i) => o -> (first + i) }
    // groups rewritten to zero rows still commit (an empty parquet
    // dir reads fine inside a multi-path union)
    val kept = withFid
      .filter(col("_vs_fid").isin(affected.map(Long.box): _*))
      .filter(!coalesce(pred, lit(false)))
    val adds = rewriteGroups(spark, path, kept, fidOf, statsCol)
    commit(spark, path, adds, affected.toSeq)
  }

  /** Remove every row whose key tuple appears in `keys` — the form a
    * real removal request takes at scale: a TABLE of millions of ids,
    * not a predicate you could spell inline ([[deleteWhere]]'s
    * `isin` would need the whole list collected to the driver).
    * Detection and rewrite both join against the key frame (AQE
    * broadcasts it when small, shuffles when not); only file-groups
    * containing matches rewrite, in one partitioned pass.
    */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
      keyCols: Seq[String]): Long = {
    val v = latestVersion(spark, path)
    val fids = liveFids(spark, path, v)
    if (fids.isEmpty) return v
    val k = keys.select(keyCols.map(col): _*).distinct()
    val withFid = withFidOf(spark, path, fids)
    val affected = withFid.join(k, keyCols, "left_semi")
      .select("_vs_fid").distinct().collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return v
    val statsCol = storeStatsCol(spark, path)
    val first = nextFid(spark, path)
    val fidOf = affected.toSeq.zipWithIndex
      .map { case (o, i) => o -> (first + i) }
    val kept = withFid
      .filter(col("_vs_fid").isin(affected.map(Long.box): _*))
      .join(k, keyCols, "left_anti")
    val adds = rewriteGroups(spark, path, kept, fidOf, statsCol)
    commit(spark, path, adds, affected.toSeq)
  }

  /** Keyed upsert (the MERGE of SQL lakehouses): every store row
    * whose `keyCols` tuple matches a row of `updates` is REPLACED by
    * that update row; update rows matching nothing are INSERTED.
    * `updates` must carry the store schema and at most one row per
    * key (enforced — a duplicate-key source would make the result
    * order-dependent).
    *
    * Scale shape: one store scan finds the affected file-groups via
    * a broadcast semi-join against the update keys (updates are the
    * small side of a merge by construction — removal lists, metadata
    * corrections, re-scored batches); only those groups are
    * rewritten (matched rows anti-joined away), untouched groups are
    * carried by reference, and ALL update rows land as one new
    * file-group. One commit record publishes the whole merge.
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], txn: Long = -1L): Long = {
    if (txn >= 0) committedTxn(spark, path, txn) match {
      case Some(v) => return v // replayed merge: already committed
      case None => ()
    }
    val dupKeys = updates.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    if (dupKeys > 0) sys.error(
      "VersionedStore.merge: updates carry duplicate keys — " +
        "the merge result would be order-dependent")
    validate(updates, path)
    val v = latestVersion(spark, path)
    val statsCol = storeStatsCol(spark, path)
    // when the store maintains zone stats ON the merge key, the
    // update-key span (two scalars off the small side) prunes both
    // the affected-group detection scan and the rewrites to the
    // overlapping file-groups — O(touched groups), not O(table)
    val scanFids = statsCol match {
      case Some(c) if keyCols == Seq(c) =>
        val r = updates.agg(min(col(c)).cast("long"),
          max(col(c)).cast("long")).head
        if (r.isNullAt(0)) Seq.empty
        else candidateFids(spark, path, v, c, r.getLong(0),
          r.getLong(1))
      case _ => liveFids(spark, path, v)
    }
    val keys = broadcast(updates.select(keyCols.map(col): _*))
    val withFid =
      if (scanFids.isEmpty) None
      else Some(withFidOf(spark, path, scanFids))
    val affected = withFid.map { w =>
      w.join(keys, keyCols, "left_semi").select("_vs_fid")
        .distinct().collect().map(_.getLong(0)).sorted
    }.getOrElse(Array.empty[Long])
    val first = nextFid(spark, path)
    val fidOf = affected.toSeq.zipWithIndex
      .map { case (o, i) => o -> (first + i) }
    val rewrites =
      if (affected.isEmpty) Seq.empty
      else rewriteGroups(spark, path,
        withFid.get
          .filter(col("_vs_fid").isin(affected.map(Long.box): _*))
          .join(keys, keyCols, "left_anti"),
        fidOf, statsCol)
    val insFid = first + affected.length
    val live = liveFids(spark, path, v)
    val cols =
      if (live.isEmpty) updates.columns
      else readAt(spark, path, v).columns
    val ins = updates.select(cols.map(col): _*)
    commitAt(spark, path, latestVersion(spark, path) + 1,
      rewrites :+ writeGroup(ins, path, insFid, statsCol),
      affected.toSeq, txn)
  }

  /** Row-level change feed between two committed versions: what a
    * downstream consumer must apply to move a copy from `fromV` to
    * `toV`. Returns the store schema plus a `_change` column
    * ("insert" | "delete"); a row replaced by [[merge]] appears as a
    * delete of the old row and an insert of the new one.
    *
    * Scale shape: the group-level log diff bounds the work — only
    * file-groups added or removed in the window are read (a
    * compaction's add cancels against its removes row-for-row, so
    * pure rewrites net out), then one `exceptAll` each way turns the
    * group diff into a row diff. Cost is O(changed groups), never
    * O(table); both versions must still be within the vacuum horizon.
    *
    * A window that spans an [[erase]] fails loudly: erasure
    * deliberately destroys exactly the data a row-level delete feed
    * would need to carry, so downstream consumers (replicas,
    * rollups) must replay the removal REQUEST itself and re-anchor —
    * never receive the erased rows through the feed.
    */
  def changes(spark: SparkSession, path: String, fromV: Long,
      toV: Long): DataFrame = {
    require(fromV <= toV,
      s"VersionedStore.changes: fromV $fromV > toV $toV")
    val before = liveFids(spark, path, fromV).toSet
    val after = liveFids(spark, path, toV).toSet
    val gained = (after -- before).toSeq.sorted
    val lost = (before -- after).toSeq.sorted
    val f = fs(spark)
    (gained ++ lost).foreach { fid =>
      if (!f.exists(dataDir(path, fid))) sys.error(
        s"VersionedStore.changes: file-group f$fid was vacuumed — " +
          "raise the vacuum retention horizon")
    }
    // both sides read under toV's table schema, so a feed spanning
    // an additive evolution compares like with like (pre-evolution
    // rows carry NULL in the new columns on both sides)
    def content(fids: Seq[Long]): Option[DataFrame] =
      if (fids.isEmpty) None
      else Some(readFids(spark, path, fids, toV))
    (content(gained), content(lost)) match {
      case (None, None) =>
        // no group churn in the window → empty feed in store schema
        val schema = read(spark, path).schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .withColumn("_change", lit("insert")).limit(0)
      case (g, l) =>
        val empty = (g orElse l).get.limit(0)
        // pure-append / pure-drop windows (the common case) skip the
        // exceptAll entirely — no shuffle, the group read IS the feed
        val ins = (g, l) match {
          case (Some(gd), Some(ld)) => gd.exceptAll(ld)
          case (Some(gd), None) => gd
          case _ => empty
        }
        val del = (l, g) match {
          case (Some(ld), Some(gd)) => ld.exceptAll(gd)
          case (Some(ld), None) => ld
          case _ => empty
        }
        ins.withColumn("_change", lit("insert"))
          .unionAll(del.withColumn("_change", lit("delete")))
    }
  }

  /** Apply a change feed (the output of [[changes]], or any frame
    * with the store schema plus a `_change` column) to ANOTHER
    * keyed store — CDC replication: after applying source windows in
    * order, the replica's content equals the source's at the
    * window's end version. Deletes (including the delete half of a
    * replaced key) land first as one keyed-delete commit, then the
    * inserts append — so a replace never collides on its key. Two
    * commits per window; readers of the replica see it atomically
    * per commit as always.
    */
  def applyChanges(spark: SparkSession, feed: DataFrame,
      targetPath: String, keyCols: Seq[String]): Long = {
    val dels = feed.filter(col("_change") === "delete")
      .select(keyCols.map(col): _*)
    val ins = feed.filter(col("_change") === "insert").drop("_change")
    if (!dels.isEmpty) deleteKeys(spark, targetPath, dels, keyCols)
    if (!ins.isEmpty) append(ins, targetPath)
    latestVersion(spark, targetPath)
  }

  /** [[append]] with an exactly-once transaction tag for streaming
    * sinks: a `foreachBatch` that crashed between writing and
    * checkpointing replays its batch; tagging each commit with the
    * batch id makes the replay a no-op instead of a duplicate
    * file-group. Returns the (existing or new) version that carries
    * `txn`.
    */
  def appendIdempotent(df: DataFrame, path: String, txn: Long,
      statsCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    require(txn >= 0, "VersionedStore.appendIdempotent: txn must be >= 0")
    committedTxn(spark, path, txn) match {
      case Some(v) => v
      case None =>
        validate(df, path)
        val fid = nextFid(spark, path)
        val add = writeGroup(df, path, fid, statsCol)
        commitAt(spark, path, latestVersion(spark, path) + 1,
          Seq(add), Seq.empty, txn)
    }
  }

  /** The version that committed transaction `txn`, if any. Old
    * commit records (pre-txn schema) read as txn NULL → -1, never
    * colliding with the `txn >= 0` contract.
    */
  private def committedTxn(spark: SparkSession, path: String,
      txn: Long): Option[Long] =
    logRecords(spark, path).find(_.txn == txn).map(_.v)

  /** True when a store exists at `path` (its log dir is present). */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark).exists(logDir(path))

  /** Persist table constraints (the Delta CHECK-constraint idea,
    * expressed in the Check algebra): every subsequent [[append]] /
    * [[appendIdempotent]] / [[merge]] validates the INCOMING batch in
    * one fused aggregation pass and fails loudly before writing
    * anything — a rejected batch leaves no trace in the log or under
    * data/. Enforcement at the write boundary is what keeps a 100 TB
    * table clean: validating after the fact means a full-table scan
    * and a mess to unwind.
    */
  def setConstraints(spark: SparkSession, path: String,
      checks: Seq[graft.check.Check]): Unit = {
    import spark.implicits._
    val f = fs(spark)
    val tmp = new Path(s"$path/.constraints-tmp")
    val dest = new Path(s"$path/constraints")
    if (f.exists(tmp) && !f.delete(tmp, true))
      sys.error(s"VersionedStore.setConstraints: cannot clear $tmp")
    checks.map(graft.check.CheckCodec.encode)
      .toDF("kind", "column", "args")
      .coalesce(1).write.parquet(tmp.toString)
    if (f.exists(dest) && !f.delete(dest, true))
      sys.error(s"VersionedStore.setConstraints: cannot replace $dest")
    if (!f.rename(tmp, dest))
      sys.error(s"VersionedStore.setConstraints: cannot publish $dest")
  }

  /** The table's persisted constraints (empty if none were set). */
  def constraintsOf(spark: SparkSession,
      path: String): Seq[graft.check.Check] = {
    val dest = new Path(s"$path/constraints")
    if (!fs(spark).exists(dest)) Seq.empty
    else spark.read.parquet(dest.toString)
      .collect()
      .map(r => graft.check.CheckCodec.decode(r.getString(0),
        r.getString(1), r.getSeq[String](2)))
      .toSeq
  }

  /** Validate an incoming batch against the table constraints; one
    * aggregation pass over the batch, loud failure listing every
    * violated check.
    */
  private def validate(df: DataFrame, path: String): Unit = {
    val checks = constraintsOf(df.sparkSession, path)
    if (checks.isEmpty) return
    val failed = graft.check.CheckRunner.run(df, checks)
      .filterNot(_.passed)
    if (failed.nonEmpty) sys.error(
      "VersionedStore: batch rejected by table constraints — " +
        failed.map(r => s"${r.check}: ${r.violations} violations")
          .mkString("; "))
  }

  /** True when no file-group is visible at the latest version (a
    * just-created store, or one whose every group was removed).
    */
  def isEmpty(spark: SparkSession, path: String): Boolean =
    liveFids(spark, path, latestVersion(spark, path)).isEmpty

  /** Right-to-erasure: remove matching rows AND reclaim every
    * file-group that still carries them. [[deleteWhere]] alone keeps
    * pre-delete versions readable — for time travel that is the
    * feature, for a removal request it is the bug: the forgotten
    * rows would still be served by `readAt`. One delete commit
    * followed by a vacuum at that commit's horizon makes the rows
    * unrecoverable from this store; time travel is intentionally
    * truncated to the erasure point, and a read below it fails
    * loudly rather than serving forgotten data. Returns the erasure
    * version and the reclaimed file-group ids.
    */
  def erase(spark: SparkSession, path: String, pred: Column,
      keyRange: Option[(Long, Long)] = None): (Long, Seq[Long]) = {
    val v = deleteWhere(spark, path, pred, keyRange)
    (v, vacuum(spark, path, retainFrom = v))
  }

  /** One-row operational summary (the DESCRIBE DETAIL of SQL
    * lakehouses), computed ENTIRELY from the cached commit log — no
    * data scan at any table size: committed version count, live
    * file-group count, live row count (the per-group counts every
    * commit records), schema width, stats discipline, constraint
    * count.
    */
  def describe(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val recs = logRecords(spark, path)
    val latest = latestVersion(spark, path)
    val live = liveFids(spark, path, latest).toSet
    val nRows = recs.filter(r => r.action == "add" && live(r.fid))
      .map(_.rows).sum
    val nCols = schemaAt(spark, path, latest)
      .map(_.fields.length.toLong).getOrElse(0L)
    Seq((latest, recs.map(_.v).distinct.size.toLong,
      live.size.toLong, nRows, nCols,
      storeStatsCol(spark, path).getOrElse(""),
      constraintsOf(spark, path).size.toLong))
      .toDF("latest_version", "n_versions", "n_live_groups",
        "n_rows", "n_columns", "stats_col", "n_constraints")
  }

  /** Threshold-triggered compaction — the OPTIMIZE policy a
    * maintenance job runs after ingest: fold when fragmentation
    * passes `maxLiveGroups` (reads degrade with file-group count;
    * stats prune best over few well-clustered groups). Returns true
    * when a compaction ran.
    */
  def maintain(spark: SparkSession, path: String, maxLiveGroups: Int,
      clusterBy: Seq[String] = Nil): Boolean = {
    val frag =
      liveFids(spark, path, latestVersion(spark, path)).size
    if (frag > maxLiveGroups) { compact(spark, path, clusterBy); true }
    else false
  }

  /** Register the store (latest, or a pinned version) as a temp view
    * so plain `spark.sql` works over the lakehouse table — the SQL
    * executor surface (SURVEY §2.1 S7) over versioned storage. The
    * view captures the version resolved AT registration (snapshot
    * semantics, consistent with every other reader); re-register to
    * follow new commits.
    */
  def registerView(spark: SparkSession, path: String, name: String,
      version: Option[Long] = None): Unit =
    version.map(readAt(spark, path, _)).getOrElse(read(spark, path))
      .createOrReplaceTempView(name)

  /** Commit history as a DataFrame: (version, action, fid, n_rows)
    * — `n_rows`, not `rows`, because ROWS is a reserved word in the
    * oracle engine's SQL.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    actions(spark, path, Long.MaxValue)
      .toDF("version", "action", "fid", "n_rows")
      .orderBy("version", "action", "fid")
  }

  /** Reclaim file-groups not visible at any version ≥ `retainFrom`
    * — both groups removed before the horizon and orphans from
    * crashed appends. After vacuum, `readAt` below the horizon fails
    * loudly (the existence check above), never returns partial data.
    */
  def vacuum(spark: SparkSession, path: String,
      retainFrom: Long): Seq[Long] = {
    val f = fs(spark)
    val vs = versions(spark, path)
    val keep = vs.filter(_ >= retainFrom)
      .flatMap(liveFids(spark, path, _)).toSet
    val dd = new Path(s"$path/data")
    val onDisk =
      if (!f.exists(dd)) Seq.empty[Long]
      else f.listStatus(dd).toSeq.map(_.getPath.getName)
        .filter(_.matches("f\\d+")).map(_.drop(1).toLong)
    val victims = onDisk.filterNot(keep).sorted
    victims.foreach { fid =>
      if (!f.delete(dataDir(path, fid), true))
        sys.error(s"VersionedStore.vacuum: cannot delete f$fid")
    }
    victims
  }
}
