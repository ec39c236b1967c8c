package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, explode, expr, lit}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom-filter skipping as an automatic optimizer rule —
  * the point-lookup complement to [[ZoneMapPruneRule]]. Zone maps
  * prune range predicates on CLUSTERED columns; on an unclustered
  * high-cardinality column (doc_id, url, content hash) every file's
  * [min, max] spans the whole domain and zones prune nothing. A
  * per-file Bloom filter answers the question zones can't: "can this
  * file possibly contain THIS value?" — the file-skipping index
  * Parquet column bloom filters / lakehouse formats keep, here
  * surfaced as a planner rule so `WHERE doc_id IN (…)` point lookups
  * open only the files whose filters hit. At 100 TB the index is
  * O(files × m bits) manifest metadata, same contract as zone-map
  * stats; the data files are never touched at register or plan time
  * beyond the one build aggregate.
  *
  * Determinism contract: bit positions are md5-derived
  * (`conv(substring(md5(value || ':' || i), 1, 13), 16, 10) % m` for
  * probe i < k), the repo's standard cross-engine hash — the DuckDB
  * oracle recomputes the exact same filter and the exact same
  * survivor set (q325), so the declared files-read receipt IS the
  * rule's own pruning decision, bit for bit.
  *
  * Soundness (no false negatives, the only direction that loses
  * rows): the store holds the EXACT distinct bit positions of each
  * file's non-null values, so a present value always has all k bits
  * set; collisions only ADD survivors. Only equality and IN
  * conjuncts on registered columns prune (a NULL row can never
  * satisfy them, so a file whose filter misses every literal truly
  * has no matching row — including all-NULL files, which prune
  * tighter than a zone would); every unrecognized conjunct is
  * ignored; an OR conjunct prunes to the union of its disjuncts'
  * survivors only when EVERY disjunct is recognized.
  */
object BloomSkipRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Per-file filters: fileId → (col → set bit positions). `files`
    * is every observed non-null fileId (a file absent from `bits`
    * for a column had no non-null values there). `hasNullFile` marks
    * rows with a NULL file column — they belong to no filter and the
    * injected `fileCol IN (...)` must keep them explicitly.
    */
  final case class Entry(tablePlan: LogicalPlan, fileCol: String,
      cols: Seq[String], m: Int, k: Int, files: Seq[Long],
      bits: Map[Long, Map[String, scala.collection.immutable.BitSet]],
      hasNullFile: Boolean)

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[Entry]()

  /** Driver-side bit positions of a value — must match the Spark-SQL
    * build expression and the DuckDB oracle spelling exactly:
    * md5 of the UTF-8 bytes of s"$v:$i", first 13 lowercase hex
    * chars as a base-16 long (52 bits, never negative), mod m.
    */
  def bitPositions(v: String, m: Int, k: Int): Seq[Int] =
    (0 until k).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$v:$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 13), 16) % m).toInt
    }

  /** Register `table` as file-bucketed by integral `fileCol` with
    * per-file Bloom filters over `cols` (values hashed through their
    * string cast, so integral and string columns share one code
    * path). One distinct-projection pass per column, unioned into a
    * single O(files × m)-row collect — the manifest a table format
    * keeps. Re-registering the same table plan REPLACES the previous
    * entry (the freshness hook after a store delta/rewrite, same as
    * ZoneMapPruneRule).
    */
  def register(table: DataFrame, fileCol: String, cols: Seq[String],
      m: Int = 4096, k: Int = 3): Entry = {
    val probes = explode(expr(s"sequence(0, ${k - 1})")).as("__i")
    val perCol = cols.map { c =>
      table
        .select(col(fileCol).cast("long").as("__f"),
          col(c).cast("string").as("__v"))
        .where(col("__v").isNotNull)
        .distinct()
        .select(col("__f"), lit(c).as("__c"), col("__v"), probes)
        .select(col("__f"), col("__c"),
          expr(("cast(conv(substring(md5(concat(__v, ':', " +
            s"cast(__i as string))),1,13),16,10) as bigint) % $m"))
            .cast("int").as("__b"))
        .distinct()
    }
    val bitRows = perCol.reduce(_ unionAll _).collect()
    val fileRows = table.select(col(fileCol).cast("long").as("__f"))
      .distinct().collect()
    val hasNullFile = fileRows.exists(_.isNullAt(0))
    val files = fileRows.filterNot(_.isNullAt(0))
      .map(_.getLong(0)).toSeq.sorted
    val bits = bitRows.filterNot(_.isNullAt(0))
      .groupBy(_.getLong(0))
      .map { case (f, rs) =>
        f -> rs.groupBy(_.getString(1)).map { case (c, cr) =>
          c -> scala.collection.immutable.BitSet(
            cr.map(_.getInt(2)): _*)
        }
      }
    val analyzed = table.queryExecution.analyzed
    val e = Entry(analyzed, fileCol, cols, m, k, files, bits,
      hasNullFile)
    entries.removeIf(
      (prev: Entry) => prev.tablePlan.sameResult(analyzed))
    entries.add(e)
    e
  }

  def clear(): Unit = entries.clear()

  /** Incremental freshness: fold ONLY the appended rows' filter bits
    * into a previous registration — one O(delta)-row aggregate
    * instead of a full-table re-register (the manifest-update a
    * table format performs on commit). Bits union per (file, col):
    * an appended value can only SET bits, so the merged filters are
    * exactly a full rebuild's (BloomSkipRuleSpec pins the
    * equivalence). `newTable` is the post-append read; its analyzed
    * plan replaces the stale match key.
    */
  def addDelta(prev: Entry, newTable: DataFrame,
      delta: DataFrame): Entry = {
    val d = register(delta, prev.fileCol, prev.cols, prev.m, prev.k)
    entries.remove(d) // register() added the delta-only entry
    val files = (prev.files ++ d.files).distinct.sorted
    val bits = files.map { f =>
      val p = prev.bits.getOrElse(f, Map.empty)
      val q = d.bits.getOrElse(f, Map.empty)
      f -> (p.keySet ++ q.keySet).map { c =>
        c -> (p.getOrElse(c, scala.collection.immutable.BitSet.empty) |
          q.getOrElse(c, scala.collection.immutable.BitSet.empty))
      }.toMap
    }.filter(_._2.nonEmpty).toMap
    val analyzed = newTable.queryExecution.analyzed
    val e = Entry(analyzed, prev.fileCol, prev.cols, prev.m, prev.k,
      files, bits, prev.hasNullFile || d.hasNullFile)
    entries.removeIf(
      (p: Entry) => p.tablePlan.sameResult(analyzed))
    entries.add(e)
    e
  }

  /** Persist a registration's filters as a parquet manifest — the
    * durable half of the table-format contract (same as
    * ZoneMapPruneRule.saveManifest): a new session re-arms pruning
    * from the manifest alone, never re-scanning the table. Row
    * kinds: "bit" carries one set bit position for one (file, col);
    * "file" marks file presence; one "meta" row carries fileCol,
    * the column list, m, k, and the null-file flag.
    */
  def saveManifest(e: Entry,
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    val bitRows = e.bits.toSeq.flatMap { case (f, perCol) =>
      perCol.toSeq.flatMap { case (c, set) =>
        set.toSeq.map(b => ("bit", f, c, b.toLong))
      }
    }
    val files = e.files.map(f => ("file", f, "", 0L))
    val meta = Seq(("meta", if (e.hasNullFile) 1L else 0L,
      s"${e.fileCol},${e.cols.mkString(",")}",
      e.m.toLong * 1000000L + e.k.toLong))
    (bitRows ++ files ++ meta)
      .toDF("kind", "f", "c", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Re-arm pruning for `table` from a saved manifest: registers an
    * entry identical to the one [[saveManifest]] captured (pinned in
    * BloomSkipRuleSpec) without touching the table's data files.
    */
  def loadManifest(table: DataFrame, path: String): Entry = {
    val rows = table.sparkSession.read.parquet(path).collect()
    val meta = rows.find(_.getString(0) == "meta").getOrElse(
      throw new IllegalArgumentException(
        s"BloomSkipRule.loadManifest: no meta row in $path"))
    val names = meta.getString(2).split(",").toSeq
    val fileCol = names.head
    val cols = names.tail
    val hasNullFile = meta.getLong(1) == 1L
    val mk = meta.getLong(3)
    val m = (mk / 1000000L).toInt
    val k = (mk % 1000000L).toInt
    val files = rows.filter(_.getString(0) == "file")
      .map(_.getLong(1)).toSeq.sorted
    val bits = rows.filter(_.getString(0) == "bit")
      .groupBy(_.getLong(1))
      .map { case (f, rs) =>
        f -> rs.groupBy(_.getString(2)).map { case (c, cr) =>
          c -> scala.collection.immutable.BitSet(
            cr.map(_.getLong(3).toInt): _*)
        }
      }
    val analyzed = table.queryExecution.analyzed
    val e = Entry(analyzed, fileCol, cols, m, k, files, bits,
      hasNullFile)
    entries.removeIf(
      (prev: Entry) => prev.tablePlan.sameResult(analyzed))
    entries.add(e)
    e
  }

  /** Literal → the string Spark's `cast(col as string)` produces for
    * the same value; None for literal shapes we don't recognize
    * (that conjunct is then ignored — sound).
    */
  private def litString(e: Expression): Option[String] = e match {
    case Literal(v: Int, _) => Some(v.toString)
    case Literal(v: Long, _) => Some(v.toString)
    case Literal(v: Short, _) => Some(v.toString)
    case Literal(v: Byte, _) => Some(v.toString)
    case Literal(v: UTF8String, _) => Some(v.toString)
    case _ => None
  }

  /** Does file `f`'s filter for `c` claim the value might be
    * present? All k bit positions set (the set holds exact positions
    * of present values, so a miss is definitive).
    */
  private def mightContain(e: Entry, f: Long, c: String,
      v: String): Boolean = {
    val set = e.bits.getOrElse(f, Map.empty)
      .getOrElse(c, scala.collection.immutable.BitSet.empty)
    bitPositions(v, e.m, e.k).forall(set.contains)
  }

  /** Survivor set of one conjunction: intersect, over every
    * recognized equality/IN conjunct, the files whose filter hits
    * SOME of the conjunct's literals. None when nothing is
    * recognized.
    */
  private def conjunctionSurvivors(e: Entry,
      cond: Expression): Option[Set[Long]] = {
    val colSet = e.cols.toSet
    def attr(x: Expression): Option[String] = x match {
      case a: AttributeReference if colSet.contains(a.name) =>
        Some(a.name)
      case _ => None
    }
    var surv: Option[Set[Long]] = None
    def add(c: String, lits: Seq[String]): Unit = {
      val s = e.files
        .filter(f => lits.exists(v => mightContain(e, f, c, v)))
        .toSet
      surv = Some(surv.fold(s)(_ intersect s))
    }
    splitConjunctivePredicates(cond).foreach {
      case EqualTo(a, l) if attr(a).isDefined =>
        for (c <- attr(a); v <- litString(l)) add(c, Seq(v))
      case EqualTo(l, a) if litString(l).isDefined =>
        for (c <- attr(a); v <- litString(l)) add(c, Seq(v))
      case In(a, vs) if attr(a).isDefined && vs.nonEmpty =>
        val ss = vs.map(litString)
        if (ss.forall(_.isDefined))
          attr(a).foreach(add(_, ss.flatten))
      case _ => ()
    }
    surv
  }

  /** The full per-condition decision (same shape as
    * ZoneMapPruneRule.survivorsForCond): the conjunction's combined
    * survivors, intersected with the per-disjunct survivor UNION of
    * every top-level OR whose disjuncts are all recognized.
    */
  def survivorsForCond(e: Entry,
      cond: Expression): Option[Seq[Long]] = {
    var surv = conjunctionSurvivors(e, cond)
    splitConjunctivePredicates(cond).foreach {
      case o: Or =>
        val ds = splitDisjunctivePredicates(o)
          .map(conjunctionSurvivors(e, _))
        if (ds.forall(_.isDefined)) {
          val u = ds.flatMap(_.get).toSet
          surv = Some(surv.fold(u)(_ intersect u))
        }
      case _ => ()
    }
    surv.map(_.toSeq.sorted)
  }

  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // cheap rejects, because this rule now runs GLOBALLY (the
    // extensions path) inside the main optimizer: no registrations
    // means no work at all, and a registered table is an analyzed
    // raw relation (a LEAF after project-stripping) — paying
    // sameResult's full canonicalization of an arbitrary query
    // subtree under every Filter measurably taxed the big
    // vector/retrieval plans (q250 1.7x) for matches that could
    // never succeed.
    if (entries.isEmpty) return plan
    plan.transformUp {
    case f @ Filter(cond, child)
        if stripProjects(child)
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical
            .LeafNode] =>
      val stripped = stripProjects(child)
      val it = entries.iterator()
      var done: Option[Filter] = None
      while (done.isEmpty && it.hasNext) {
        val e = it.next()
        if (stripped.sameResult(e.tablePlan)) {
          survivorsForCond(e, cond).foreach { surv =>
            if (surv.length < e.files.length) {
              stripped.output.find(_.name == e.fileCol).foreach { fa =>
                val lits: Seq[Expression] = fa.dataType match {
                  case IntegerType => surv.map(v => Literal(v.toInt))
                  case _ => surv.map(v => Literal(v))
                }
                val keep: Expression =
                  if (e.hasNullFile) Or(In(fa, lits), IsNull(fa))
                  else In(fa, lits)
                val pruned = Filter(keep, stripped)
                val newChild = child.transformUp {
                  case p if p eq stripped => pruned
                }
                done = Some(Filter(cond, newChild))
              }
            }
          }
        }
      }
      done.getOrElse(f)
    }
  }
}
