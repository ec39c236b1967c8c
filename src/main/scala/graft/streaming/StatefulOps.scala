package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Custom stateful streaming operators via KeyValueGroupedDataset
  * state APIs (SURVEY.md §2.10: `mapGroupsWithState` /
  * `flatMapGroupsWithState` as the custom-state forms).
  *
  * `stateTtl` + `Trigger.AvailableNow` caveat (probed, Spark 4.1):
  * with `ProcessingTimeTimeout` configured, an AvailableNow query
  * runs a trailing timeout-only micro-batch after the data drains
  * (so due evictions DO fire within the run) but then never
  * self-terminates — `awaitTermination` blocks indefinitely. Batch
  * drains that set a TTL must stop the query explicitly
  * (`processAllAvailable()` + a settle wait + `stop()`, the
  * StatefulTtlSpec harness); continuous deployments are unaffected.
  */
object StatefulOps {

  final case class UserStats(user_id: Long, n_events: Long,
      sum_value: Double)

  /** Per-user running event count + value sum maintained in keyed
    * state across micro-batches (Update output mode). State is one
    * (long, double) pair per user — bounded by key cardinality, but
    * user cardinality is unbounded over an unbounded stream: for
    * long-running deployments pass a processing-time `stateTtl`
    * (e.g. `Some("24 hours")`). A user idle longer than the TTL has
    * their pair evicted; the eviction invocation re-emits the FINAL
    * snapshot (idempotent for the Update-mode upsert sink this op
    * feeds — the same row it last emitted), and the user's next event
    * restarts the running totals from zero, indistinguishable from a
    * new user. Size the TTL to the retention the totals are FOR —
    * the batch groupBy is the reconciled truth past it.
    */
  def runningUserStats(spark: SparkSession, events: DataFrame,
      stateTtl: Option[String] = None): Dataset[UserStats] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserStats](timeoutConf) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            val (n, s) = state.get
            state.remove()
            UserStats(uid, n, s) // final snapshot — idempotent re-emit
          } else {
            var (n, s) = state.getOption.getOrElse((0L, 0.0))
            rows.foreach { case (_, v) => n += 1; s += v }
            state.update((n, s))
            stateTtl.foreach(state.setTimeoutDuration)
            UserStats(uid, n, s)
          }
      }
  }

  final case class SessionSummary(user_id: Long, n_events: Long,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

  /** Event-time sessionization via `flatMapGroupsWithState` — the
    * 0..n-outputs-per-invocation custom-state form (mapGroups is
    * exactly-1). Each invocation merges the batch's events with the
    * carried OPEN session, emits every session that CLOSED (an
    * event-time gap > `gapMinutes` separates it from the next), and
    * keeps the still-open trailing session in state. State is one
    * (count, first, last) triple per user — bounded by key
    * cardinality, but user cardinality is unbounded over an unbounded
    * stream: for long-running deployments pass a processing-time
    * `stateTtl` (e.g. `Some("24 hours")`). A user idle past the TTL
    * has their open session FLUSHED — emitted as closed, exactly as a
    * gap would close it — and the state evicted; size the TTL above
    * `gapMinutes` and the flush is semantically the gap rule firing
    * on the processing clock instead of the (never-arriving) next
    * event. This also fixes the open-ended tail: without a TTL the
    * last session of a user who never returns is never emitted.
    */
  def sessionizeFlat(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 5,
      stateTtl: Option[String] = None): Dataset[SessionSummary] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val gapUs = gapMinutes * 60000000L
    // microsecond longs end-to-end: java.sql.Timestamp.getTime is
    // millis and silently truncates parquet's microsecond timestamps
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), SessionSummary](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeoutConf) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            // flush the abandoned open session as closed, then evict
            val (n, f, l) = state.get
            state.remove()
            Iterator.single(SessionSummary(uid, n, toTs(f), toTs(l)))
          } else {
            val newTs = rows.map(_._2).toArray.sorted
            // seed with the carried open session, if any
            var sessions = List.empty[(Long, Long, Long)] // (n, first, last)
            var open = state.getOption
            newTs.foreach { t =>
              open match {
                case Some((n, f, l)) if t - l < gapUs =>
                  open = Some((n + 1, f, math.max(l, t)))
                case Some(closed) =>
                  sessions ::= closed
                  open = Some((1L, t, t))
                case None =>
                  open = Some((1L, t, t))
              }
            }
            open.foreach(state.update)
            stateTtl.foreach(state.setTimeoutDuration)
            sessions.reverseIterator.map { case (n, f, l) =>
              SessionSummary(uid, n, toTs(f), toTs(l))
            }
          }
      }
  }

  /** Streaming dedup on a key column within a watermark window —
    * the built-in stateful form (state pruned by the watermark).
    *
    * Late-data caveat (observed in verification): rows older than
    * `watermark` behind the stream's max event time are DROPPED, so a
    * key-based backfill whose event times lag the live stream loses
    * rows silently — widen the watermark (or run backfills as batch
    * dropDuplicates) when arrival order diverges from event order.
    */
  def dedupByKey(events: DataFrame, watermark: String = "10 minutes",
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class CdcState(user_id: Long, state: String,
      last_value: Double, updated_at: java.sql.Timestamp,
      n_changes: Long, deleted: Boolean)

  /** Streaming CDC compaction — the continuous form of q167: per key,
    * maintain the HIGHEST-versioned change across micro-batches
    * (version = the same total-ordered fixed-width (epoch_us,
    * event_id) key, so out-of-order and cross-batch arrivals resolve
    * identically to the batch max_by) and emit the current state on
    * every update; a winning 'error' op marks the key deleted
    * (tombstone) rather than vanishing, so a downstream upsert sink
    * can propagate the delete. State is one (version, op, value,
    * max_ts, count) record per key — bounded by key cardinality, but
    * key cardinality is unbounded over an unbounded changelog: for
    * long-running deployments pass a processing-time `stateTtl`
    * (e.g. `Some("7 days")`). A key idle past the TTL re-emits its
    * FINAL state (idempotent for the upsert sink) and is evicted;
    * the next change for that key restarts `n_changes` at 1 and the
    * version comparison from scratch — so a change OLDER than the
    * pre-eviction winner can win post-eviction. Size the TTL above
    * the changelog's maximum out-of-orderness and that cannot occur;
    * the q167 batch compaction is the reconciled truth regardless.
    *
    * Parity contract (StatefulOpsSpec): after any micro-batch split
    * of the changelog, the last emitted row per key with
    * `deleted = false` equals the q167 batch compaction exactly.
    */
  def cdcLatestState(spark: SparkSession, events: DataFrame,
      stateTtl: Option[String] = None): Dataset[CdcState] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Double, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(String, String, Double, Long, Long), CdcState](
        timeoutConf) {
        case (uid, rows, st) =>
          if (st.hasTimedOut) {
            val (_, op, v, maxUs, n) = st.get
            st.remove()
            // final snapshot — idempotent re-emit for the upsert sink
            CdcState(uid, op, v, toTs(maxUs), n, deleted = op == "error")
          } else {
            var (ver, op, v, maxUs, n) =
              st.getOption.getOrElse(("", "", 0.0, Long.MinValue, 0L))
            rows.foreach { case (_, op2, v2, us2, id2) =>
              n += 1
              if (us2 > maxUs) maxUs = us2
              val ver2 = f"$us2%020d$id2%010d"
              if (ver2 > ver) { ver = ver2; op = op2; v = v2 }
            }
            st.update((ver, op, v, maxUs, n))
            stateTtl.foreach(st.setTimeoutDuration)
            CdcState(uid, op, v, toTs(maxUs), n, deleted = op == "error")
          }
      }
  }

  final case class NearDupFlag(doc_id: Long, band: Int,
      first_seen: Long)

  /** Streaming LSH near-dup GATE — online dedup at ingestion: the
    * input stream carries banded MinHash rows (doc_id, band, bv),
    * one per document per band (per-document signatures and band
    * values are PER-ROW map-side computations upstream — a MinHash
    * over a document's own shingles needs no aggregation — or come
    * precomputed, as in batch `MinHashDedup`'s banding). Keyed state
    * holds, per (band, bv) bucket, only the MINIMUM doc id ever
    * seen — O(buckets) state, independent of corpus size per bucket
    * — and each arriving row is flagged when its bucket already
    * holds an earlier document: the same shares-a-band candidate
    * rule as the batch LSH join, evaluated incrementally. A flagged
    * (doc_id, band, first_seen) row is a candidate near-dup of
    * first_seen, to be exact-verified downstream exactly like batch
    * candidates.
    *
    * Ordering semantics: "earlier" is by doc id, with rows inside a
    * micro-batch processed in id order — so when arrival order is id
    * order (ingestion with monotonic ids), the flagged set equals
    * the batch rule "shares a bucket with a lower-id document"
    * (parity pinned in StreamingNearDupSpec). Out-of-order arrival
    * degrades only which side of a pair is flagged, never whether
    * the PAIR is detectable — the lower id silently becomes the
    * bucket representative either way.
    *
    * State growth: buckets grow with the corpus, so an UNBOUNDED
    * ingestion stream grows state without bound under the default
    * `stateTtl = None`. For long-running deployments pass a
    * processing-time TTL (e.g. `Some("24 hours")`): a bucket idle
    * longer than the TTL is evicted, bounding state to the active
    * working set at the cost of a bounded dedup horizon — a
    * duplicate arriving after its bucket expired re-opens the bucket
    * as the new representative and is not flagged against pre-expiry
    * documents (re-run the batch dedup periodically to catch those).
    * [[streamingHeavyHitters]] needs no TTL: its state is
    * shards × capacity by construction.
    */
  def streamingNearDupFlags(spark: SparkSession,
      banded: DataFrame,
      stateTtl: Option[String] = None): Dataset[NearDupFlag] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .select(col("doc_id").cast("long"), col("band").cast("int"),
        col("bv").cast("string"))
      .as[(Long, Int, String)]
      .groupByKey { case (_, band, bv) => s"$band|$bv" }
      .flatMapGroupsWithState[Long, NearDupFlag](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeoutConf) {
        case (_, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_._1)
            var minSeen = state.getOption.getOrElse(Long.MaxValue)
            val out = scala.collection.mutable.ListBuffer[NearDupFlag]()
            sorted.foreach { case (id, band, _) =>
              if (minSeen < id) out += NearDupFlag(id, band, minSeen)
              else minSeen = id
            }
            state.update(minSeen)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  final case class ShardSummary(shard: Int,
      items: Map[String, (Long, Long)])

  /** Streaming Space-Saving heavy hitters — the continuous form of
    * [[graft.operators.HeavyHitters]]: items are sharded by a
    * deterministic hash so each shard's keyed state holds ONE bounded
    * Space-Saving summary over exactly its substream (state is
    * shards × capacity counters, independent of stream length or
    * distinct count — the mergeable-summaries property carried into
    * `mapGroupsWithState`). Every micro-batch folds its rows into the
    * shard sketch with the SAME reduce the batch Aggregator uses, and
    * emits the shard's current summary (Update mode); because shards
    * partition the item space, the union of the latest per-shard
    * summaries is a valid global summary, and global top-k = top-k of
    * the union with the same (est, err) bounds. In the exact regime
    * (per-shard distincts ≤ capacity) the streamed result equals the
    * batch exact counts — the parity the spec pins.
    */
  def streamingHeavyHitters(spark: SparkSession, events: DataFrame,
      itemCol: String, shards: Int = 8,
      capacity: Int = 1024): Dataset[ShardSummary] = {
    import spark.implicits._
    require(shards > 0, "shards must be positive")
    val agg = new graft.operators.HeavyHitters
      .SpaceSavingAggregator(capacity)
    events
      .select(col(itemCol).cast("string").as("item"))
      .selectExpr(s"pmod(hash(item), $shards) AS shard", "item")
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[graft.operators.HeavyHitters.Summary,
        ShardSummary](GroupStateTimeout.NoTimeout) {
        case (shard, rows, state) =>
          val folded = rows.foldLeft(
            state.getOption.getOrElse(agg.zero)) {
            case (buf, (_, item)) => agg.reduce(buf, item)
          }
          state.update(folded)
          ShardSummary(shard, folded)
      }
  }

  final case class SessionAssign(user_id: Long, event_id: Long,
      session_seq: Long)

  /** Streaming gap + MAX-DURATION sessionization — the online form of
    * [[graft.operators.Sessionize]] (q202's batch operator): assigns
    * each arriving event its 0-based session number per user, where a
    * session breaks on an inactivity gap > `gapMicros` OR when the
    * event would stretch the session past `maxLenMicros` from its
    * START (the start-dependent recursion no window cumsum
    * expresses — carried here as three longs of keyed state:
    * (seq, session_start, last_ts)). Events are processed in
    * (ts, event_id) order within each micro-batch; the assignment
    * equals the batch operator's whenever each user's events arrive
    * in event-time order across batches (the spec's parity contract —
    * the same in-order premise [[streamingNearDupFlags]] documents
    * for ids). A late event sorts only within its own batch: its
    * session numbering reflects arrival, which is the honest online
    * semantics — replay the batch form for the reconciled truth.
    * State is O(1) per user but user cardinality is unbounded over an
    * unbounded stream: for long-running deployments pass a
    * processing-time `stateTtl` (e.g. `Some("24 hours")`) — a user
    * idle longer than the TTL has their three longs evicted, bounding
    * state to the active user set. Eviction emits nothing (session
    * numbering is per-user-local; there is no pending output to
    * flush); the only semantic cost is that an evicted user's next
    * event restarts numbering at session 0 — indistinguishable from a
    * new user, and harmless when the TTL exceeds the session gap
    * (the restart would have broken the session anyway).
    */
  def sessionizeGapCap(spark: SparkSession, events: DataFrame,
      gapMicros: Long, maxLenMicros: Long,
      stateTtl: Option[String] = None): Dataset[SessionAssign] = {
    import spark.implicits._
    require(gapMicros > 0 && maxLenMicros > 0,
      s"gap/maxLen must be positive: $gapMicros/$maxLenMicros")
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), SessionAssign](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeoutConf) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // (seq, sessionStart, lastTs); seq = -1 marks "no session
            // yet" so the first event opens session 0 via the gap rule
            var (seq, start, last) = state.getOption
              .getOrElse((-1L, Long.MinValue, Long.MinValue))
            val out = rows.toSeq.sortBy(r => (r._2, r._3)).map {
              case (_, ts, eid) =>
                if (seq < 0 || ts - last > gapMicros ||
                    ts - start > maxLenMicros) {
                  seq += 1L
                  start = ts
                }
                last = ts
                SessionAssign(uid, eid, seq)
            }
            state.update((seq, start, last))
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  final case class SequenceMatch(user_id: Long, a_event_id: Long,
      b_event_id: Long, a_ts_us: Long, b_ts_us: Long)

  /** CEP-lite sequence detection: per user, emit every B event that
    * follows an A event within `maxGapMicros` event time — each B
    * matched to the MOST RECENT qualifying A (the last-touch rule,
    * q251's streaming form). State per user is ONE (ts, event_id)
    * pair — the latest A seen — so state is O(users) regardless of
    * stream length; the same `stateTtl` contract as the other keyed
    * ops bounds the user set (an evicted user's next B simply finds
    * no pending A, exactly as if the gap had expired — safe whenever
    * TTL ≥ maxGap).
    *
    * Ordering contract: events WITHIN a micro-batch are sorted by
    * (ts, event_id) before the scan, and the carried state is the
    * latest-(ts, event_id) A across batches, so any micro-batch
    * split of an in-order stream yields the same matches
    * (StreamingSequenceSpec's batch-parity witness). Late A's that
    * cross batch boundaries out of order resolve to the
    * max-(ts, event_id) A, matching the batch as-of rule; a B with
    * NO prior A in-range emits nothing.
    */
  def detectSequence(spark: SparkSession, events: DataFrame,
      aType: String, bType: String, maxGapMicros: Long,
      stateTtl: Option[String] = None): Dataset[SequenceMatch] = {
    import spark.implicits._
    require(maxGapMicros > 0, s"maxGapMicros must be positive")
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .filter(col("event_type").isin(aType, bType))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"),
        (col("event_type") === aType).as("is_a"))
      .as[(Long, Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), SequenceMatch](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeoutConf) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var lastA = state.getOption // (ts_us, event_id) of latest A
            val out = rows.toSeq.sortBy(r => (r._2, r._3)).flatMap {
              case (_, ts, eid, isA) =>
                if (isA) {
                  if (lastA.forall(p =>
                      ts > p._1 || (ts == p._1 && eid > p._2)))
                    lastA = Some((ts, eid))
                  None
                } else lastA.collect {
                  case (ats, aid) if ts - ats <= maxGapMicros && ts >= ats =>
                    SequenceMatch(uid, aid, eid, ats, ts)
                }
            }
            lastA match {
              case Some(p) => state.update(p)
              case None    => // no A yet — nothing to carry
            }
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  final case class FunnelCompletion(user_id: Long, s1_event_id: Long,
      s2_event_id: Long, s3_event_id: Long, s1_ts_us: Long,
      s3_ts_us: Long)

  /** Three-stage funnel state machine — the CEP rung above
    * [[detectSequence]]'s A→B pairs: emit one row per completed
    * stage1 → stage2 → stage3 progression (each stage STRICTLY after
    * the previous in event time — same-microsecond ties are not
    * progressions — total span ≤ `maxSpanMicros`), tracking per user
    * the EARLIEST viable partial progress (first-touch semantics,
    * the complement of q251's last-touch). State per user is at most
    * one (stage, s1_ts, s1_id, s2_id, s2_ts) tuple — O(users) regardless of
    * stream length, same `stateTtl` contract as the other keyed ops
    * (eviction ≡ expired progress; safe whenever TTL ≥ maxSpan).
    * After a completion the machine resets, so completions never
    * overlap — "how many full journeys", not "how many pair
    * matches".
    *
    * Ordering contract (as [[detectSequence]]): rows within a batch
    * fold in (ts, event_id) order; the carried state makes any
    * micro-batch split of an in-order stream emit identical
    * completions (StreamingFunnelSpec's parity witness).
    */
  def funnelProgress(spark: SparkSession, events: DataFrame,
      s1: String, s2: String, s3: String, maxSpanMicros: Long,
      stateTtl: Option[String] = None): Dataset[FunnelCompletion] = {
    import spark.implicits._
    require(maxSpanMicros > 0, "maxSpanMicros must be positive")
    require(Set(s1, s2, s3).size == 3,
      s"funnel stages must be distinct, got ($s1, $s2, $s3)")
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .filter(col("event_type").isin(s1, s2, s3))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long, Long, Long, Long),
        FunnelCompletion](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeoutConf) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // (stage reached, s1_ts, s1_id, s2_id, s2_ts)
            var st = state.getOption.getOrElse((0, 0L, 0L, 0L, 0L))
            val out = rows.toSeq.sortBy(r => (r._2, r._3)).flatMap {
              case (_, ts, eid, tpe) =>
                // expire stale progress before considering the event
                if (st._1 > 0 && ts - st._2 > maxSpanMicros)
                  st = (0, 0L, 0L, 0L, 0L)
                tpe match {
                  case `s1` =>
                    if (st._1 == 0) st = (1, ts, eid, 0L, 0L)
                    None // first-touch: later s1's don't reset
                  case `s2` =>
                    // STRICTLY after s1 — a same-microsecond tie is
                    // not a progression
                    if (st._1 == 1 && ts > st._2)
                      st = (2, st._2, st._3, eid, ts)
                    None
                  case _ =>
                    if (st._1 == 2 && ts > st._5 &&
                        ts - st._2 <= maxSpanMicros) {
                      val done = FunnelCompletion(uid, st._3, st._4,
                        eid, st._2, ts)
                      st = (0, 0L, 0L, 0L, 0L) // reset on completion
                      Some(done)
                    } else None
                }
            }
            if (st._1 == 0) {
              if (state.exists) state.remove()
            } else {
              state.update(st)
              stateTtl.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }

  final case class EwmaSnapshot(user_id: Long, n_events: Long,
      last_ts_us: Long, ewma: Double)

  /** Streaming per-key EWMA — online feature smoothing (the
    * feature-store counterpart of the corpus-level q281 series form):
    * per user, e ← α·x + (1−α)·e over event values in event-time
    * order, state = ONE (n, last_ts, e) triple per user regardless
    * of stream length. Emits the updated snapshot every micro-batch
    * (Update-mode sink upserts by user).
    *
    * Ordering contract (same as [[detectSequence]]): rows WITHIN a
    * micro-batch fold in (ts, event_id) order, so any micro-batch
    * split of an in-order stream produces the same final state as
    * one batch (StreamingEwmaSpec's parity witness); cross-batch
    * late rows fold at arrival — the recursion is order-sensitive
    * by definition, so exact event-time replay needs a watermarked
    * re-sort upstream. `stateTtl` evicts idle users (the snapshot
    * re-emitted on eviction is final — idempotent for the sink).
    */
  def ewmaPerKey(spark: SparkSession, events: DataFrame, alpha: Double,
      stateTtl: Option[String] = None): Dataset[EwmaSnapshot] = {
    import spark.implicits._
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Double), EwmaSnapshot](
        timeoutConf) {
        case (uid, it, state) =>
          if (state.hasTimedOut) {
            val (n, ts, e) = state.get
            state.remove()
            EwmaSnapshot(uid, n, ts, e) // final snapshot — idempotent
          } else {
            var (n, lastTs, e) =
              state.getOption.getOrElse((0L, Long.MinValue, 0.0))
            it.toSeq.sortBy(r => (r._2, r._3)).foreach {
              case (_, ts, _, x) =>
                e = if (n == 0L) x else alpha * x + (1.0 - alpha) * e
                n += 1
                lastTs = math.max(lastTs, ts)
            }
            state.update((n, lastTs, e))
            stateTtl.foreach(state.setTimeoutDuration)
            EwmaSnapshot(uid, n, lastTs, e)
          }
      }
  }

  final case class KmvGroupSketch(group: String, hashes: Array[Long])

  /** Parallel-array snapshot of a group's bottom-k-hash quantile
    * sample (hv(i), v(i) pairs sorted by (hv, v)).
    */
  final case class QuantileGroupSketch(group: String,
      hv: Array[Long], v: Array[Long])

  /** Streaming quantile sample: per-group bottom-k-hash uniform
    * sample maintained in keyed state — the online counterpart of
    * [[graft.operators.QuantileSample.build]], the way streamingKmv
    * mirrors the batch KMV. Each invocation folds the batch's
    * (rowKeyHash, value) pairs into the group's ≤ k smallest-hash
    * sample; "k smallest of a union" is associative and
    * order-insensitive, so the final state is bit-equal to the batch
    * sketch over the same rows (StreamingQuantileSpec). State is
    * ≤ k (long, long) pairs per group at any stream length; the
    * usual `stateTtl` contract bounds the group set (eviction
    * re-emits the final sketch, idempotent for an Update-mode sink).
    */
  def streamingQuantileSample(spark: SparkSession, rows: DataFrame,
      groupCol: String, keyCol: String, valueCol: String, k: Int,
      stateTtl: Option[String] = None): Dataset[QuantileGroupSketch] = {
    import spark.implicits._
    require(k >= 1, s"streamingQuantileSample: k must be >= 1, got $k")
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows
      .where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string"),
        graft.operators.QuantileSample.qhash(col(keyCol)),
        col(valueCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[(Long, Long)], QuantileGroupSketch](
        timeoutConf) {
        case (g, it, state) =>
          def snap(s: Array[(Long, Long)]) =
            QuantileGroupSketch(g, s.map(_._1), s.map(_._2))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            snap(s) // final snapshot — idempotent
          } else {
            val cur = state.getOption.getOrElse(Array.empty[(Long, Long)])
            val merged = (cur.iterator ++ it.map(r => (r._2, r._3)))
              .toArray.sorted.take(k)
            state.update(merged)
            stateTtl.foreach(state.setTimeoutDuration)
            snap(merged)
          }
      }
  }

  /** Streaming KMV theta sketch: per-group k-minimum-values distinct
    * monitor maintained in keyed state (the online counterpart of
    * [[graft.operators.KmvSketch.build]], the way the streaming CMS
    * witnesses q234's batch build). Each invocation folds the
    * batch's key hashes into the group's sorted ≤ k smallest-hash
    * sample and re-emits the sketch; because "k smallest distinct
    * of a union" is associative and order-insensitive, the final
    * state is bit-equal to the batch sketch over the same rows —
    * StreamingKmvSpec asserts exactly that.
    *
    * 100 TB stance: state is ≤ k longs per group NO MATTER how many
    * events stream through — the entire point of the sketch; the
    * same `stateTtl` contract as the other keyed ops bounds the
    * group set itself (eviction re-emits the final sketch, an
    * idempotent upsert for an Update-mode sink).
    */
  def streamingKmv(spark: SparkSession, rows: DataFrame,
      groupCol: String, keyCol: String, k: Int,
      stateTtl: Option[String] = None): Dataset[KmvGroupSketch] = {
    import spark.implicits._
    require(k >= 2, s"streamingKmv: k must be >= 2, got $k")
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows
      .select(col(groupCol).cast("string"),
        graft.operators.KmvSketch.khash(col(keyCol)))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvGroupSketch](timeoutConf) {
        case (g, it, state) =>
          if (state.hasTimedOut) {
            val h = state.get
            state.remove()
            KmvGroupSketch(g, h) // final snapshot — idempotent
          } else {
            val cur = state.getOption.getOrElse(Array.empty[Long])
            val merged = (cur.iterator ++ it.map(_._2))
              .toArray.distinct.sorted.take(k)
            state.update(merged)
            stateTtl.foreach(state.setTimeoutDuration)
            KmvGroupSketch(g, merged)
          }
      }
  }
}
