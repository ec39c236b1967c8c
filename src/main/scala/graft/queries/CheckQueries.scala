package graft.queries

import graft.Tables._
import graft.check._
import org.apache.spark.sql.functions._

/** Declared queries for the constraint/validation surface (SURVEY.md
  * §2.7): the Check algebra fused into one aggregation pass, and the
  * dbt-style uniqueness test.
  */
object CheckQueries {

  /** The suite mirrors the reference's expectation shapes on orders:
    * in-set membership, not-null, plus a deliberately-failing strict
    * set (counts 'P' rows) so the query proves non-zero counting too.
    */
  val ordersSuite: Seq[Check] = Seq(
    InSet("o_orderstatus", Seq("F", "O", "P")),
    InSet("o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
    NotNull("o_orderdate"),
    NonNegative("o_totalprice"),
    MatchesRegex("o_orderstatus", "^[FO]$"),
    // deliberately-tight range so the count is non-zero on real data
    Between("o_totalprice", 0.0, 450000.0))

  val all: Seq[QueryDef] = Seq(
    // GE checkpoint analog: every expectation evaluated in ONE scan.
    QueryDef(
      "q20_check_suite",
      (s, d) => CheckRunner.reportDf(orders(s, d), ordersSuite),
      Some("""SELECT
             |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
             |    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS inset_o_orderstatus,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN
             |    ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
             |    OR o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS inset_o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS notnull_o_orderdate,
             |  CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS nonneg_o_totalprice,
             |  CAST(SUM(CASE WHEN NOT regexp_matches(o_orderstatus, '^[FO]$')
             |    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS regex_o_orderstatus,
             |  CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
             |    OR o_totalprice > 450000.0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS between_o_totalprice
             |FROM orders""".stripMargin)),

    // dbt `unique` test analog (schema.yml:10-12): duplicate counts via
    // count(*) - count(distinct key). o_orderkey is unique (0);
    // lineitem l_orderkey is not (>0); the composite lineitem key is.
    QueryDef(
      "q21_unique_check",
      (s, d) => {
        val o = orders(s, d).agg(
          (count(lit(1)) - count_distinct(col("o_orderkey")))
            .as("dup_o_orderkey"))
        val l = lineitem(s, d).agg(
          (count(lit(1)) - count_distinct(col("l_orderkey")))
            .as("dup_l_orderkey"),
          (count(lit(1)) -
            count_distinct(struct(col("l_orderkey"), col("l_linenumber"))))
            .as("dup_l_composite"))
        o.crossJoin(l)
      },
      Some("""SELECT
             |  (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
             |    AS dup_o_orderkey,
             |  (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
             |    FROM lineitem) AS dup_l_composite,
             |  (SELECT COUNT(*) - COUNT(DISTINCT l_orderkey) FROM lineitem)
             |    AS dup_l_orderkey""".stripMargin)),

    // Column profiling — the "what does this table even look like"
    // report every ingestion run emits before constraints are written
    // (null rates, cardinalities, ranges per column, typed). Plan
    // shape: one PER-COLUMN aggregation subtree, crossJoined (each a
    // 1-row result). On columnar storage this is the right plan, not
    // a compromise: each subtree's scan prunes to exactly one column
    // (ReadSchema shows a single field), so the five subtrees
    // together read the same bytes a single wide scan would — while
    // avoiding the 5× row EXPAND Spark's multi-count-distinct
    // rewrite pays in a fused aggregate (measured at sf0.1: 3.7 s
    // fused vs 0.62 s split). Typed min/max
    // (bigint/double/varchar/timestamp) rather
    // than stringified, so the gate also pins type fidelity.
    QueryDef(
      "q249_column_profile",
      (s, d) => {
        val li = lineitem(s, d)
        def prof(c: String, p: String) = li.select(col(c)).agg(
          sum(when(col(c).isNull, 1L).otherwise(0L))
            .cast("long").as(s"${p}_nulls"),
          countDistinct(col(c)).as(s"${p}_distinct"),
          min(col(c)).as(s"${p}_min"),
          max(col(c)).as(s"${p}_max"))
        li.agg(count(lit(1)).cast("long").as("n_rows"))
          .crossJoin(prof("l_orderkey", "ok"))
          .crossJoin(prof("l_quantity", "qty"))
          .crossJoin(prof("l_returnflag", "rf"))
          .crossJoin(prof("l_shipdate", "sd"))
      },
      Some("""SELECT
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS ok_nulls,
             |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ok_distinct,
             |  MIN(l_orderkey) AS ok_min,
             |  MAX(l_orderkey) AS ok_max,
             |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS qty_nulls,
             |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS qty_distinct,
             |  MIN(l_quantity) AS qty_min,
             |  MAX(l_quantity) AS qty_max,
             |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS rf_nulls,
             |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS rf_distinct,
             |  MIN(l_returnflag) AS rf_min,
             |  MAX(l_returnflag) AS rf_max,
             |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS sd_nulls,
             |  CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS sd_distinct,
             |  MIN(l_shipdate) AS sd_min,
             |  MAX(l_shipdate) AS sd_max
             |FROM lineitem""".stripMargin)),

    // k-anonymity profile (Sweeney, IJUFKS'02) — the privacy audit a
    // training-data release runs beside PII masking (q113): group the
    // table by its quasi-identifier tuple (nation, market segment,
    // account-balance bucket of 500) and report the dataset's
    // k-anonymity (the MIN group size — any member of a smaller
    // group is re-identifiable by those attributes alone) plus how
    // many groups/rows fall under k = 2 / 5 / 10. One hash-agg over
    // the QI tuple + a one-row summary fold — linear, partial aggs
    // map-side; the QI bucketing is the knob (coarser buckets raise
    // k, the generalization move k-anonymization automates).
    QueryDef(
      "q283_k_anonymity",
      (s, d) => {
        val groups = customer(s, d)
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            expr("CAST(floor(c_acctbal / 500) AS BIGINT)").as("bal_bucket"))
          .agg(count(lit(1)).as("gsz"))
        groups.agg(
          count(lit(1)).cast("long").as("n_groups"),
          min(col("gsz")).cast("long").as("k_anonymity"),
          sum(when(col("gsz") < 2, 1L).otherwise(0L)).cast("long")
            .as("groups_lt_2"),
          sum(when(col("gsz") < 2, col("gsz")).otherwise(0L))
            .cast("long").as("rows_lt_2"),
          sum(when(col("gsz") < 5, 1L).otherwise(0L)).cast("long")
            .as("groups_lt_5"),
          sum(when(col("gsz") < 5, col("gsz")).otherwise(0L))
            .cast("long").as("rows_lt_5"),
          sum(when(col("gsz") < 10, 1L).otherwise(0L)).cast("long")
            .as("groups_lt_10"),
          sum(when(col("gsz") < 10, col("gsz")).otherwise(0L))
            .cast("long").as("rows_lt_10"))
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 500) AS BIGINT) AS bal_bucket,
             |    COUNT(*) AS gsz
             |  FROM customer GROUP BY 1, 2, 3
             |)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             |  CAST(MIN(gsz) AS BIGINT) AS k_anonymity,
             |  CAST(SUM(CASE WHEN gsz < 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS groups_lt_2,
             |  CAST(SUM(CASE WHEN gsz < 2 THEN gsz ELSE 0 END) AS BIGINT)
             |    AS rows_lt_2,
             |  CAST(SUM(CASE WHEN gsz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS groups_lt_5,
             |  CAST(SUM(CASE WHEN gsz < 5 THEN gsz ELSE 0 END) AS BIGINT)
             |    AS rows_lt_5,
             |  CAST(SUM(CASE WHEN gsz < 10 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS groups_lt_10,
             |  CAST(SUM(CASE WHEN gsz < 10 THEN gsz ELSE 0 END) AS BIGINT)
             |    AS rows_lt_10
             |FROM g""".stripMargin))
  )
}
