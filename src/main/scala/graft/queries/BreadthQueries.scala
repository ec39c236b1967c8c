package graft.queries

import graft.Tables._
import graft.queries.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-surface breadth beyond the TPC-H shapes: distribution
  * window functions, ordered string aggregation, bitwise aggregates,
  * inline VALUES dimensions, and calendar date parts. Each is a thin
  * declarative plan — Catalyst keeps the single shuffle (group/window
  * key) and broadcasts literal dimensions.
  */
object BreadthQueries {

  val all: Seq[QueryDef] = Seq(
    // Distribution window functions: ntile / percent_rank / cume_dist
    // over a unique ordering (totalprice, orderkey) so rank ties — and
    // therefore both engines' outputs — are fully determined. One
    // window sort per partition key, same shuffle as q12.
    QueryDef(
      "q108_window_dist",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        orders(s, d)
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice ASC, o_orderkey ASC)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Ordered string aggregation (LISTAGG/string_agg): suppliers per
    // nation as one sorted comma-joined string. Spark spelling is
    // sort-then-join over collect_list — order-independent because the
    // sort happens after collection, so any shuffle order hashes the
    // same.
    QueryDef(
      "q109_string_agg",
      (s, d) =>
        supplier(s, d)
          .join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_suppliers"),
            concat_ws(",", array_sort(collect_list(col("s_name"))))
              .as("supplier_csv"))
          .orderBy("n_name"),
      Some("""SELECT n_name, COUNT(*) AS n_suppliers,
             |  string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Bitwise aggregates (bit_and/bit_or/bit_xor): order-independent
    // by construction, so they distribute with map-side partials like
    // any hash agg. DuckDB's infix ^ is exponentiation — its xor is
    // the xor() function — while Spark's ^ is the scalar xor.
    QueryDef(
      "q110_bitwise_agg",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(bit_and(col("l_orderkey")).as("key_and"),
            bit_or(col("l_orderkey")).as("key_or"),
            bit_xor(col("l_orderkey")).as("key_xor"),
            bit_or(shiftleft(col("l_linenumber"), 8).bitwiseOR(lit(1)))
              .as("packed_or"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  bit_and(l_orderkey) AS key_and,
             |  bit_or(l_orderkey) AS key_or,
             |  bit_xor(l_orderkey) AS key_xor,
             |  bit_or((l_linenumber << 8) | 1) AS packed_or
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Inline VALUES dimension: a literal priority→weight mapping
    // joined to the fact. Spark broadcasts the 5-row local relation —
    // the pattern for config-table lookups that must never shuffle the
    // fact side.
    QueryDef(
      "q111_values_dim",
      (s, d) => {
        val weights = s.createDataFrame(Seq(
          ("1-URGENT", 5.0), ("2-HIGH", 4.0), ("3-MEDIUM", 3.0),
          ("4-NOT SPECIFIED", 2.0), ("5-LOW", 1.0)))
          .toDF("prio", "weight")
        orders(s, d)
          .join(broadcast(weights), col("o_orderpriority") === col("prio"))
          .groupBy("prio")
          .agg(dsum(col("o_totalprice") * col("weight"))
            .as("weighted_price"))
          .orderBy("prio")
      },
      Some(s"""SELECT prio, ${sqlDsum("o_totalprice * weight")}
              |    AS weighted_price
              |FROM orders
              |JOIN (VALUES ('1-URGENT', 5.0), ('2-HIGH', 4.0),
              |  ('3-MEDIUM', 3.0), ('4-NOT SPECIFIED', 2.0),
              |  ('5-LOW', 1.0)) AS w(prio, weight)
              |  ON o_orderpriority = prio
              |GROUP BY prio ORDER BY prio""".stripMargin)),

    // Calendar date parts beyond q82: quarter, ISO week, Monday-based
    // weekday. Spark's weekday() (0 = Monday) is DuckDB's isodow - 1;
    // Spark's weekofyear is the ISO week, DuckDB's week().
    QueryDef(
      "q112_calendar_parts",
      (s, d) =>
        orders(s, d)
          .groupBy(year(col("o_orderdate")).as("o_year"),
            quarter(col("o_orderdate")).as("o_quarter"))
          .agg(count(lit(1)).as("n_orders"),
            count_distinct(weekofyear(col("o_orderdate"))).as("n_weeks"),
            count_distinct(weekday(col("o_orderdate"))).as("n_weekdays"))
          .orderBy("o_year", "o_quarter"),
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
             |  COUNT(*) AS n_orders,
             |  COUNT(DISTINCT week(o_orderdate)) AS n_weeks,
             |  COUNT(DISTINCT isodow(o_orderdate) - 1) AS n_weekdays
             |FROM orders GROUP BY o_year, o_quarter
             |ORDER BY o_year, o_quarter""".stripMargin)),

    // Higher-order array predicates (exists / forall / filter+count):
    // per-row lambda evaluation inside codegen — the no-UDF way to ask
    // set questions of an array column. DuckDB's spelling folds a
    // transformed boolean list through bool_or / bool_and.
    QueryDef(
      "q121_hof_predicates",
      (s, d) => {
        val ws = graft.functions.TextFunctions.words(col("text"))
        documents(s, d)
          .select(col("doc_id"),
            exists(ws, w => length(w) > 6).as("has_long_tok"),
            forall(ws, w => w.rlike("^[a-z]+$")).as("all_alpha"),
            size(filter(ws, w => length(w) > 6)).as("n_long_toks"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  list_aggregate(list_transform(string_split(text, ' '),
             |    w -> len(w) > 6), 'bool_or') AS has_long_tok,
             |  list_aggregate(list_transform(string_split(text, ' '),
             |    w -> regexp_matches(w, '^[a-z]+$')), 'bool_and')
             |    AS all_alpha,
             |  CAST(len(list_filter(string_split(text, ' '),
             |    w -> len(w) > 6)) AS INTEGER) AS n_long_toks
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Defensive parsing (TRY_CAST): dirty-input ingestion must yield
    // NULL, not a crashed job — the schema-on-read safety net for S6's
    // all-string external tables. One in three rows here is
    // deliberately unparseable.
    QueryDef(
      "q122_try_cast",
      (s, d) => {
        val raw = when(col("c_custkey") % 3 === 0, col("c_name"))
          .otherwise(col("c_custkey").cast("string"))
        customer(s, d)
          .select(col("c_custkey"), raw.as("raw"),
            expr("try_cast(" +
              "CASE WHEN c_custkey % 3 = 0 THEN c_name " +
              "ELSE CAST(c_custkey AS STRING) END AS BIGINT)").as("parsed"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 3 = 0 THEN c_name
             |    ELSE CAST(c_custkey AS VARCHAR) END AS raw,
             |  TRY_CAST(CASE WHEN c_custkey % 3 = 0 THEN c_name
             |    ELSE CAST(c_custkey AS VARCHAR) END AS BIGINT) AS parsed
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // GROUPING() flags over a rollup: the disambiguator between "key
    // is NULL in the data" and "key rolled up" — required before any
    // downstream consumer can trust subtotal rows. Keys are coalesced
    // out of the sort per the NULLS FIRST/LAST cross-engine rule.
    QueryDef(
      "q123_grouping_flags",
      (s, d) =>
        lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            grouping(col("l_returnflag")).cast("int").as("g_flag"),
            grouping(col("l_linestatus")).cast("int").as("g_status"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("g_flag"), col("g_status"), col("n_rows"))
          .orderBy("returnflag", "linestatus"),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |  COALESCE(l_linestatus, 'ALL') AS linestatus,
             |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
             |  COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin))
  )
}
