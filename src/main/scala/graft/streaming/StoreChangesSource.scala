package graft.streaming

import graft.operators.VersionedStore
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData,
  GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** The [[VersionedStore]] change feed as a REAL Data Source V2
  * streaming source — `spark.readStream.format("graft-store-changes")
  * .option("path", storePath).load()` — with offsets = store commit
  * versions, so `StreamingQueryProgress.sources` reports exactly
  * which version range each micro-batch covered and the streaming
  * checkpoint's offset log carries resumable store positions.
  *
  * Feed rows are the store schema plus a `_change` string column
  * ([[VersionedStore.changes]]'s vocabulary). Two execution paths,
  * picked per window:
  *
  *  - PURE-APPEND windows (the common streaming shape) are ZERO-COPY:
  *    the planner ([[VersionedStore.appendOnlyWindow]]) proves every
  *    record in the window is a plain add under the current schema,
  *    plans one input partition per group parquet file, and
  *    executors read the store's own files in place, tagging
  *    `insert` — no derivation job, no staging write;
  *  - windows containing a rewrite/delete/DV/restore/schema change
  *    derive the NETTED row feed ([[VersionedStore.changes]] — a
  *    compaction nets to nothing, an update to delete + insert) with
  *    one distributed job at planning time, staged as parquet under
  *    the stream's checkpoint dir; partitions then read the staged
  *    files. The staging copy is O(window's changed rows) — the same
  *    one-extra-copy cost the public CDF design pays at write time,
  *    paid here at read time only for the windows that need it, and
  *    reclaimed at commit.
  *
  *  `option("feed", "versions")` swaps the row feed for a
  *  one-row-per-version metadata tick `(version LONG)` — the
  *  scheduling-only shape [[StoreChangeFeed.stream]] drives its
  *  replicate-protocol wrapper with (real offsets in progress, no
  *  data planned or read).
  *
  * Exactly-once: standard DSv2 micro-batch semantics — the offset
  * log pins each batch's (start, end] version window, a post-crash
  * replay re-plans the identical window (deterministic: the log is
  * immutable history), and the sink's own idempotence completes the
  * contract, exactly as with any Spark source. The
  * fresh-checkpoint-restart story (resume from a STORE-side cursor
  * with no checkpoint at all) is [[StoreChangeFeed]]'s replicate
  * protocol, layered above this source.
  *
  * Executor-side reading uses parquet-hadoop's Group API (no
  * SparkSession on executors): primitives, strings, binary, dates,
  * MILLIS/MICROS/INT96 timestamps, decimals (all three parquet
  * encodings), structs, and arrays of any of these — the store's
  * supported column shapes; anything else fails loudly at read,
  * never a silent null.
  */
final class StoreChangesSource extends TableProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-store-changes"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val name = Option(options.get("table"))
      .map(t => VersionedStore.registeredPath(t)
        .orElse(graft.sources.GraftStoreCatalog.resolvePath(
          SparkSession.active, t.split('.').toSeq))
        .getOrElse(sys.error(
          s"graft-store-changes: `$t` is neither a registered " +
            "table nor a catalog table")))
    name.orElse(Option(options.get("path"))).getOrElse(
      sys.error("graft-store-changes: set option `path` (store " +
        "path) or `table` (registered or catalog name)"))
  }

  override def inferSchema(
      options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    if ("versions".equalsIgnoreCase(options.getOrDefault("feed",
        "rows")))
      StructType(Seq(StructField("version", LongType,
        nullable = false)))
    else VersionedStore.read(spark, pathOf(options)).schema
      .add(StructField("_change", StringType, nullable = false))
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new StoreChangesTable(pathOf(options), schema,
      "versions".equalsIgnoreCase(
        options.getOrDefault("feed", "rows")),
      Option(options.get("startingVersion")).map(_.toLong))
  }
}

private[streaming] final class StoreChangesTable(path: String,
    tableSchema: StructType, versionsOnly: Boolean,
    startingVersion: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"graft-store-changes($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new StoreChangesMicroBatchStream(path, tableSchema,
            versionsOnly, startingVersion, checkpointLocation)
      }
    }
}

/** Offset = store commit version (monotone long). */
private[graft] final case class StoreVersionOffset(v: Long)
    extends Offset {
  override def json(): String = v.toString
}

private[streaming] final class StoreChangesMicroBatchStream(
    path: String, schema: StructType, versionsOnly: Boolean,
    startingVersion: Option[Long], checkpointLocation: String)
    extends MicroBatchStream {

  private def spark = SparkSession.active
  private val confSer = new SerializableConfiguration(
    spark.sparkContext.hadoopConfiguration)

  override def initialOffset(): Offset =
    StoreVersionOffset(startingVersion.getOrElse(0L))
  override def latestOffset(): Offset =
    StoreVersionOffset(VersionedStore.latestVersion(spark, path))
  override def deserializeOffset(json: String): Offset =
    StoreVersionOffset(json.trim.toLong)

  private def stagingDir(from: Long, to: Long): String =
    s"$checkpointLocation/graft-feed/w$from-$to"

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[StoreVersionOffset].v
    val to = end.asInstanceOf[StoreVersionOffset].v
    if (to <= from) return Array.empty
    if (versionsOnly)
      return Array(VersionTickPartition(from, to))
    def filesUnder(dir: String): Seq[String] = {
      val f = FileSystem.get(new Path(dir).toUri,
        spark.sparkContext.hadoopConfiguration)
      val d = new Path(dir)
      if (!f.exists(d)) Seq.empty
      else f.listStatus(d).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
    }
    VersionedStore.appendOnlyWindow(spark, path, from, to) match {
      case Some(groupDirs) =>
        // zero-copy: executors read the store's own files in place
        groupDirs.flatMap(filesUnder)
          .map(f => ChangeFilePartition(f, insertTag = true))
          .toArray
      case None =>
        // derivation window: stage the netted feed (one distributed
        // job), serve the staged files. Staging is STAGE-ONCE
        // (tmp + rename, reuse if present): Spark may plan the same
        // window more than once per batch, and an overwrite-in-place
        // would delete the files an earlier plan's readers hold —
        // deterministic content makes reuse correct, and a replayed
        // batch after commit's GC simply re-stages.
        val dir = stagingDir(from, to)
        val f = FileSystem.get(new Path(dir).toUri,
          spark.sparkContext.hadoopConfiguration)
        val d = new Path(dir)
        if (!f.exists(d)) {
          val tmp = new Path(
            dir + s".tmp-${java.util.UUID.randomUUID}")
          VersionedStore.changes(spark, path, from, to)
            .select(schema.fieldNames.map(
              org.apache.spark.sql.functions.col).toIndexedSeq: _*)
            .write.mode("overwrite").parquet(tmp.toString)
          if (!f.rename(tmp, d)) {
            f.delete(tmp, true) // a concurrent plan won — reuse its dir
            if (!f.exists(d)) sys.error(
              s"graft-store-changes: cannot stage window $dir")
          }
        }
        filesUnder(dir)
          .map(f => ChangeFilePartition(f, insertTag = false))
          .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StoreChangesReaderFactory(schema, confSer)

  /** Reclaim staged windows at or below the committed offset. */
  override def commit(end: Offset): Unit = {
    val to = end.asInstanceOf[StoreVersionOffset].v
    val root = new Path(s"$checkpointLocation/graft-feed")
    val f = FileSystem.get(root.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (f.exists(root)) f.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case s if s.matches("w\\d+-\\d+") &&
            s.split("-")(1).toLong <= to =>
          f.delete(st.getPath, true); ()
        case _ => ()
      }
    }
  }

  override def stop(): Unit = ()
}

private[streaming] final case class VersionTickPartition(from: Long,
  to: Long) extends InputPartition

/** One parquet file of a window — a store group file (pure-append
  * window, reader synthesizes `_change = insert`) or a staged feed
  * file (carries its own `_change`).
  */
private[graft] final case class ChangeFilePartition(file: String,
  insertTag: Boolean) extends InputPartition

private[graft] final class StoreChangesReaderFactory(
    schema: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case VersionTickPartition(from, to) =>
        new PartitionReader[InternalRow] {
          private var v = from
          override def next(): Boolean = { v += 1; v <= to }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](v))
          override def close(): Unit = ()
        }
      case ChangeFilePartition(file, insertTag) =>
        new GroupParquetReader(file, schema, insertTag, conf.value)
    }
}

/** Executor-side parquet → InternalRow via parquet-hadoop's Group
  * API (no SparkSession on executors). Supports the store's column
  * shapes — primitives, strings/binary, dates, MILLIS/MICROS/INT96
  * timestamps, decimals in all three parquet encodings, structs,
  * arrays, and maps of any of these — and fails loudly on anything
  * else.
  */
private[streaming] final class GroupParquetReader(file: String,
    schema: StructType, insertTag: Boolean, conf: Configuration)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(),
      new Path(file)).withConf(conf).build()
  private var cur: Group = _

  override def next(): Boolean = { cur = reader.read(); cur != null }

  override def get(): InternalRow = {
    val g = cur
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      vals(i) =
        if (insertTag && f.name == "_change")
          UTF8String.fromString("insert")
        else if (!g.getType.containsField(f.name))
          // snapshot-first windows serve live group files of mixed
          // vintages: a group written before an ADD COLUMN evolution
          // has no such field — the column is NULL for those rows,
          // exactly as the batch reader serves it
          null
        else {
          val gi = g.getType.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(gi) == 0) null
          else convert(g, gi, f.dataType)
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** Spark's INT96 legacy timestamp: 8-byte little-endian
    * nanos-of-day + 4-byte little-endian julian day → micros since
    * epoch.
    */
  private def int96Micros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    val epochDays = julianDay - 2440588L
    epochDays * 86400000000L + nanosOfDay / 1000L
  }

  private def convert(g: Group, gi: Int, dt: DataType): Any =
    dt match {
      // widening promotions mirror the batch reader's (retypeColumn:
      // groups written before a widening retype keep their narrow
      // physical encoding and read under the wide requested type)
      case LongType =>
        val pt = g.getType.getType(gi).asPrimitiveType()
          .getPrimitiveTypeName.toString
        if (pt == "INT32") g.getInteger(gi, 0).toLong
        else g.getLong(gi, 0)
      case IntegerType => g.getInteger(gi, 0)
      case DoubleType =>
        val pt = g.getType.getType(gi).asPrimitiveType()
          .getPrimitiveTypeName.toString
        if (pt == "FLOAT") g.getFloat(gi, 0).toDouble
        else g.getDouble(gi, 0)
      case FloatType => g.getFloat(gi, 0)
      case BooleanType => g.getBoolean(gi, 0)
      case StringType =>
        UTF8String.fromBytes(g.getBinary(gi, 0).getBytes)
      case BinaryType => g.getBinary(gi, 0).getBytes
      case DateType => g.getInteger(gi, 0)
      case TimestampType =>
        val pt = g.getType.getType(gi).asPrimitiveType()
        if (pt.getPrimitiveTypeName.toString == "INT96")
          int96Micros(g.getInt96(gi, 0).getBytes)
        else {
          // the INT64 unit comes from the column's logical type —
          // a file written under outputTimestampType=TIMESTAMP_MILLIS
          // decoded as micros would be silently 1000x off
          import org.apache.parquet.schema.LogicalTypeAnnotation
          val raw = g.getLong(gi, 0)
          pt.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation
                .TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                  raw * 1000L
                case LogicalTypeAnnotation.TimeUnit.MICROS => raw
                case other => sys.error(
                  s"graft-store-changes: unsupported timestamp " +
                    s"unit $other")
              }
            case null => raw // plain INT64: Spark's default micros
            case other => sys.error(
              s"graft-store-changes: unexpected logical type " +
                s"$other on a timestamp column")
          }
        }
      case d: DecimalType =>
        // Spark's three decimal encodings by precision: INT32
        // (p<=9), INT64 (p<=18), fixed/binary big-endian unscaled.
        // The unscaled value is at the FILE's declared scale (which
        // a widening retype can leave below the requested scale) —
        // rescaling to the requested type is exact, scale only grows
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val prim = g.getType.getType(gi).asPrimitiveType()
        val fileScale = prim.getLogicalTypeAnnotation match {
          case a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            a.getScale
          case _ => d.scale
        }
        def mk(unscaled: java.math.BigInteger): Decimal =
          Decimal(new java.math.BigDecimal(unscaled, fileScale)
            .setScale(d.scale), d.precision, d.scale)
        prim.getPrimitiveTypeName.toString match {
          case "INT32" => mk(java.math.BigInteger
            .valueOf(g.getInteger(gi, 0).toLong))
          case "INT64" => mk(java.math.BigInteger
            .valueOf(g.getLong(gi, 0)))
          case "FIXED_LEN_BYTE_ARRAY" | "BINARY" =>
            mk(new java.math.BigInteger(g.getBinary(gi, 0).getBytes))
          case other => sys.error(
            s"graft-store-changes: unsupported decimal encoding " +
              s"$other")
        }
      case st: StructType =>
        // nested group, converted field-recursively (structs of
        // structs/arrays/decimals come free through convert)
        val sub = g.getGroup(gi, 0)
        val out = new Array[Any](st.length)
        var j = 0
        while (j < st.length) {
          val sf = st(j)
          out(j) =
            if (!sub.getType.containsField(sf.name)) null
            else {
              val sgi = sub.getType.getFieldIndex(sf.name)
              if (sub.getFieldRepetitionCount(sgi) == 0) null
              else convert(sub, sgi, sf.dataType)
            }
          j += 1
        }
        new GenericInternalRow(out)
      case ArrayType(elem, _) =>
        // Spark's 3-level list layout: group (LIST) { repeated
        // group list { element } }
        val lst = g.getGroup(gi, 0)
        val n = lst.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var j = 0
        while (j < n) {
          val el = lst.getGroup(0, j)
          out(j) =
            if (el.getFieldRepetitionCount(0) == 0) null
            else convert(el, 0, elem) // any supported element type
          j += 1
        }
        new GenericArrayData(out)
      case MapType(kt, vt, _) =>
        // Spark's map layout: group (MAP) { repeated group key_value
        // { required key; optional value } } — accessed by POSITION
        // (field 0 = key, 1 = value) so legacy `map`-named inner
        // groups read identically
        val m = g.getGroup(gi, 0)
        val n = m.getFieldRepetitionCount(0)
        val keys = new Array[Any](n)
        val vals = new Array[Any](n)
        var j = 0
        while (j < n) {
          val kv = m.getGroup(0, j)
          keys(j) = convert(kv, 0, kt) // keys are required, non-null
          vals(j) =
            if (kv.getFieldRepetitionCount(1) == 0) null
            else convert(kv, 1, vt)
          j += 1
        }
        new ArrayBasedMapData(
          new GenericArrayData(keys), new GenericArrayData(vals))
      case other => sys.error(
        s"graft-store-changes: unsupported column type $other — " +
          "the store feed reader handles primitives, strings, " +
          "binary, dates, timestamps, decimals, structs, arrays, " +
          "and maps")
    }

  override def close(): Unit = reader.close()
}

/** The ROW feed of a store/catalog table as a streaming source —
  * `spark.readStream.table("lake.t")` (the Delta-style shape): the
  * FIRST micro-batch serves the table's CURRENT snapshot (the live
  * group files at the version where the stream starts — vacuum-safe,
  * where replaying the original append history would read
  * pre-compaction files the next vacuum deletes), then each
  * micro-batch serves the rows of the APPEND commits in its version
  * window, ZERO-COPY over the store's own group files, with offsets
  * = store versions. A rewrite/delete/DV/schema commit is not
  * expressible as bare rows: the stream FAILS loudly on it unless
  * `skipChangeCommits=true` (skip those commits entirely — the
  * public CDF vocabulary's escape hatch), and the full
  * delete+insert feed remains `format("graft-store-changes")`.
  * `startingVersion` opts out of the snapshot into explicit history
  * replay (0 = from the beginning). No staging, no derivation jobs:
  * every planned window is either in-place group files or skipped.
  */
private[graft] final class StoreTableRowStream(path: String,
    schema: StructType, skipChangeCommits: Boolean,
    startingVersion: Option[Long]) extends MicroBatchStream {

  private def spark = SparkSession.active
  private val confSer = new SerializableConfiguration(
    spark.sparkContext.hadoopConfiguration)

  /** -1 = "initial snapshot pending": the first planned window
    * (-1, v] serves the live files AT v instead of a version range.
    * Persisted through the checkpoint like any offset, so a crash
    * before the first commit replans the same snapshot.
    */
  override def initialOffset(): Offset =
    StoreVersionOffset(startingVersion.getOrElse(-1L))
  override def latestOffset(): Offset =
    StoreVersionOffset(VersionedStore.latestVersion(spark, path))
  override def deserializeOffset(json: String): Offset =
    StoreVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[StoreVersionOffset].v
    val to = end.asInstanceOf[StoreVersionOffset].v
    if (to <= from) return Array.empty
    def filesUnder(dir: String): Seq[String] = {
      val f = FileSystem.get(new Path(dir).toUri,
        spark.sparkContext.hadoopConfiguration)
      val d = new Path(dir)
      if (!f.exists(d)) Seq.empty
      else f.listStatus(d).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
    }
    if (from < 0)
      return VersionedStore.snapshotFiles(spark, path, to) match {
        case Some(dirs) => dirs.flatMap(filesUnder)
          .map(f => ChangeFilePartition(f, insertTag = true)).toArray
        case None => sys.error(
          s"readStream.table over store at $path: the initial " +
            "snapshot carries live deletion vectors or renamed " +
            "columns, which a bare row feed cannot serve zero-copy " +
            "— OPTIMIZE the table first (folds DVs), or stream " +
            "format(\"graft-store-changes\") for the full change " +
            "feed, or set startingVersion for explicit history " +
            "replay")
      }
    // A rename-mapped table's group files carry PHYSICAL column
    // names: replayed pre-rename appends would bind the renamed
    // column to nothing and the missing-field guard would serve
    // silent NULLs — refuse loudly instead (the same contract as the
    // snapshot path's snapshotFiles refusal; the mapping-aware
    // change feed remains the escape hatch)
    if (VersionedStore.columnMapping(spark, path).nonEmpty)
      sys.error(
        s"readStream.table over store at $path: the table has " +
          "renamed columns, which history replay over a bare row " +
          "feed cannot bind — stream " +
          "format(\"graft-store-changes\") for the mapping-aware " +
          "change feed, or drop startingVersion for the current-" +
          "snapshot default")
    // per-VERSION decomposition (not per-window): a window mixing
    // an append and a rewrite must still serve the append and skip
    // only the rewrite
    (from + 1 to to).flatMap { v =>
      VersionedStore.appendOnlyWindow(spark, path, v - 1, v) match {
        case Some(groupDirs) =>
          groupDirs.flatMap(filesUnder)
            .map(f => ChangeFilePartition(f, insertTag = true))
        // a pure schema ANCHOR of the stream's own schema (the
        // CREATE TABLE commit) contributes no rows and changes
        // nothing — a no-op version, not a change commit
        case None if {
          val recs = VersionedStore.versionActions(spark, path, v)
          recs.forall(_._1 == "schema") &&
            recs.flatMap(_._2).forall(_ == schema.json)
        } => Seq.empty
        case None if skipChangeCommits => Seq.empty
        case None => sys.error(
          s"readStream.table over store at $path: commit v$v is a " +
            "rewrite/delete/DV/restore/schema change, which a bare " +
            "row feed cannot express — set " +
            "option(\"skipChangeCommits\", \"true\") to skip such " +
            "commits, or stream format(\"graft-store-changes\") " +
            "for the full delete+insert change feed")
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StoreChangesReaderFactory(schema, confSer)

  override def commit(end: Offset): Unit = () // nothing staged
  override def stop(): Unit = ()
}
