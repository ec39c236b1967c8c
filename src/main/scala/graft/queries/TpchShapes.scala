package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Deeper TPC-H join-aggregate shapes (Q7/Q8/Q9/Q14/Q19 adapted to
  * this schema — no partsupp table, categorical p_type), extending the
  * q51/q52/q57 set: multi-hop star joins with date-window filters,
  * conditional-share ratios, and disjunctive join predicates. These
  * are the bench's multi-join muscle: every dimension is broadcast,
  * every date/category filter reaches its scan, and the only
  * fact-sized shuffles are the final group-by keys.
  *
  * The reference runs exactly this class of SQL in its warehouse
  * (data_transformations/models/example/ materializations); here each
  * is a declarative plan Catalyst reorders + prunes.
  */
object TpchShapes {
  import Exact._

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val sqlRev = "l_extendedprice * (1.0 - l_discount)"

  val all: Seq[QueryDef] = Seq(
    // TPC-H Q7 (volume shipping): revenue flowing between three named
    // nations in either direction, per year. Two independent nation
    // lookups (supplier side / customer side) — both broadcast; the
    // nation filter prunes most of the fact rows right after the
    // supplier/customer joins.
    QueryDef(
      "q103_volume_shipping",
      (s, d) => {
        val pair = Seq("NATION_1", "NATION_2", "NATION_3")
        val n1 = nation(s, d)
          .filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n1_key"),
            col("n_name").as("supp_nation"))
        val n2 = nation(s, d)
          .filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n2_key"),
            col("n_name").as("cust_nation"))
        lineitem(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1998-01-01")
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(dsum(rev).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
              |  ${sqlDsum(sqlRev)} AS revenue
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
              |  AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
              |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
              |  AND n1.n_name <> n2.n_name
              |GROUP BY supp_nation, cust_nation, l_year
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q8 (market share): one supplier nation's share of the
    // revenue delivered to one region's customers, per year. The
    // share is a ratio of two exact-decimal sums computed in the SAME
    // aggregation pass (sum(CASE)/sum), then one double division —
    // deterministic on both engines.
    QueryDef(
      "q104_market_share",
      (s, d) => {
        val asiaNations = nation(s, d)
          .join(broadcast(region(s, d)
              .filter(col("r_name") === "ASIA")
              .select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cn_key"))
        val suppNation = nation(s, d)
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))
        lineitem(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1998-01-01")
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("l_shipdate")).as("l_year"))
          .agg(
            dsum(when(col("supp_nation") === "NATION_5", rev)
              .otherwise(0.0)).as("nation5_rev"),
            dsum(rev).as("total_rev"))
          .withColumn("mkt_share", col("nation5_rev") / col("total_rev"))
          .orderBy("l_year")
      },
      Some(s"""SELECT l_year, nation5_rev, total_rev,
              |  nation5_rev / total_rev AS mkt_share
              |FROM (
              |  SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
              |    ${sqlDsum(s"CASE WHEN n2.n_name = 'NATION_5' THEN $sqlRev ELSE 0.0 END")}
              |      AS nation5_rev,
              |    ${sqlDsum(sqlRev)} AS total_rev
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |  JOIN region ON n1.n_regionkey = r_regionkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |  WHERE r_name = 'ASIA'
              |    AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
              |  GROUP BY l_year)
              |ORDER BY l_year""".stripMargin)),

    // TPC-H Q9 (profit by nation × year, adapted: no partsupp, so
    // profit = discounted revenue over a part-type slice): the
    // part-side filter prunes the fact early (join-to-filtered-dim),
    // then two broadcast dims resolve the grouping keys.
    QueryDef(
      "q105_profit_by_nation",
      (s, d) => {
        val stdParts = part(s, d)
          .filter(col("p_type") === "STANDARD")
          .select("p_partkey")
        val suppNation = nation(s, d)
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))
        lineitem(s, d)
          .join(broadcast(stdParts), col("l_partkey") === col("p_partkey"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .groupBy(col("supp_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(dsum(rev).as("profit"))
          .orderBy("supp_nation", "l_year")
      },
      Some(s"""SELECT n_name AS supp_nation,
              |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
              |  ${sqlDsum(sqlRev)} AS profit
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |WHERE p_type = 'STANDARD'
              |GROUP BY supp_nation, l_year
              |ORDER BY supp_nation, l_year""".stripMargin)),

    // TPC-H Q14 (promo revenue share) per month of 1996: conditional
    // share inside one aggregation pass over the part join — the
    // ratio-of-sums pattern again, windowed by month.
    QueryDef(
      "q106_promo_revenue",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01")
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(month(col("l_shipdate")).as("l_month"))
          .agg(
            dsum(when(col("p_type") === "PROMO", rev).otherwise(0.0))
              .as("promo_rev"),
            dsum(rev).as("total_rev"))
          .withColumn("promo_pct",
            lit(100.0) * col("promo_rev") / col("total_rev"))
          .orderBy("l_month"),
      Some(s"""SELECT l_month, promo_rev, total_rev,
              |  100.0 * promo_rev / total_rev AS promo_pct
              |FROM (
              |  SELECT CAST(month(l_shipdate) AS INTEGER) AS l_month,
              |    ${sqlDsum(s"CASE WHEN p_type = 'PROMO' THEN $sqlRev ELSE 0.0 END")}
              |      AS promo_rev,
              |    ${sqlDsum(sqlRev)} AS total_rev
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              |  GROUP BY l_month)
              |ORDER BY l_month""".stripMargin)),

    // TPC-H Q19 (disjunctive join predicates): revenue over an OR of
    // three (brand × size × quantity-band) conjuncts. The disjunction
    // can't prune the scan wholesale, but each conjunct's column
    // bounds still reach the row-group level as min/max residuals and
    // the part side is a broadcast — the query tests that OR-heavy
    // predicates don't force a shuffle join.
    QueryDef(
      "q107_disjunctive_join",
      (s, d) => {
        val cond =
          (col("p_brand") === "Brand#1" && col("p_size") <= 10 &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size") <= 20 &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size") <= 30 &&
            col("l_quantity").between(20, 30))
        lineitem(s, d)
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT ${sqlDsum(sqlRev)} AS revenue, COUNT(*) AS n_lines
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#1' AND p_size <= 10
              |       AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#2' AND p_size <= 20
              |       AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#3' AND p_size <= 30
              |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q18 (large-volume orders): orders whose total line
    // quantity crosses a threshold, with customer context. The IN
    // subquery over an aggregate becomes a semi-join against the
    // grouped lineitem — the aggregate runs ONCE, map-side partialed,
    // never per-outer-row.
    QueryDef(
      "q118_large_orders",
      (s, d) => {
        val bigOrders = lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 60.0)
        orders(s, d)
          .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING SUM(l_quantity) > 60.0) big
             |  ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin)),

    // TPC-H Q22 (global sales opportunity): customers above the
    // average balance of the positive-balance population with no
    // RECENT orders (the lapsed-customer window keeps the anti join
    // selective but non-empty on this data), counted per market
    // segment. Composes a scalar subquery (one-row broadcast), an
    // anti join, and a final hash agg.
    QueryDef(
      "q119_sales_opportunity",
      (s, d) => {
        val avgBal = customer(s, d)
          .filter(col("c_acctbal") > 0.0)
          .agg(davg(col("c_acctbal")).as("avg_bal"))
        val recent = orders(s, d)
          .filter(col("o_orderdate") >= "1999-01-01")
        customer(s, d)
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_custs"),
            dsum(col("c_acctbal")).as("total_bal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_custs,
              |  ${sqlDsum("c_acctbal")} AS total_bal
              |FROM customer
              |WHERE c_acctbal > (
              |    SELECT ${sqlDavg("c_acctbal")} FROM customer
              |    WHERE c_acctbal > 0.0)
              |  AND NOT EXISTS (
              |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
              |      AND o_orderdate >= '1999-01-01')
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // TPC-H Q13 (customer distribution): histogram of customers by
    // order count, zeros included via the left join — the aggregate-
    // of-an-aggregate shape (two chained hash aggs, the second over
    // the first's small output).
    QueryDef(
      "q131_cust_distribution",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"),
            "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q11 (important stock): groups whose share of the global
    // total crosses a threshold — the fraction-of-total HAVING, a
    // one-row broadcast of the global sum against the grouped sums.
    QueryDef(
      "q132_value_share",
      (s, d) => {
        val total = customer(s, d)
          .agg(dsum(col("c_acctbal")).as("total_bal"))
        customer(s, d)
          .groupBy("c_mktsegment")
          .agg(dsum(col("c_acctbal")).as("seg_bal"))
          .crossJoin(broadcast(total))
          .filter(col("seg_bal") > col("total_bal") * 0.19)
          .select(col("c_mktsegment"), col("seg_bal"))
          .orderBy(col("seg_bal").desc, col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, ${sqlDsum("c_acctbal")} AS seg_bal
              |FROM customer
              |GROUP BY c_mktsegment
              |HAVING ${sqlDsum("c_acctbal")} >
              |  (SELECT ${sqlDsum("c_acctbal")} FROM customer) * 0.19
              |ORDER BY seg_bal DESC, c_mktsegment""".stripMargin)),

    // TPC-H Q15 (top supplier): max over a revenue view — the
    // argmax-with-ties shape (all suppliers hitting the max revenue,
    // not an arbitrary first row).
    QueryDef(
      "q133_top_supplier",
      (s, d) => {
        val rev = lineitem(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01")
          .groupBy(col("l_suppkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("total_rev"))
        val best = rev.agg(max(col("total_rev")).as("max_rev"))
        supplier(s, d)
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .crossJoin(broadcast(best))
          .filter(col("total_rev") === col("max_rev"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey,
              |    ${sqlDsum("l_extendedprice * (1.0 - l_discount)")}
              |      AS total_rev
              |  FROM lineitem
              |  WHERE l_shipdate >= '1996-01-01'
              |    AND l_shipdate < '1997-01-01'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_rev
              |FROM supplier JOIN rev ON s_suppkey = l_suppkey
              |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q16 (parts/supplier relationship): distinct-supplier
    // counts over attribute groups with a NOT IN blacklist — the
    // anti-join-then-distinct-agg shape.
    QueryDef(
      "q134_supplier_cnt",
      (s, d) => {
        val blacklist = supplier(s, d)
          .filter(col("s_acctbal") < 0.0)
          .select(col("s_suppkey").as("bad_key"))
        lineitem(s, d)
          .join(broadcast(part(s, d).filter(col("p_size").isin(5, 10, 15))),
            col("l_partkey") === col("p_partkey"))
          .join(blacklist, col("l_suppkey") === col("bad_key"),
            "left_anti")
          .groupBy("p_brand", "p_size")
          .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      Some("""SELECT p_brand, p_size,
             |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size IN (5, 10, 15)
             |  AND l_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
             |GROUP BY p_brand, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)),

    // TPC-H Q21 (suppliers who kept orders waiting): the double
    // correlated subquery — EXISTS (another supplier on the order) AND
    // NOT EXISTS (another supplier who also returned) — written in SQL
    // so Catalyst's decorrelation plans both as join semi/anti forms.
    QueryDef(
      "q135_waiting_supplier",
      (s, d) => {
        Seq("supplier", "orders").foreach(t =>
          graft.Tables.table(s, d, t).createOrReplaceTempView(t))
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql("""SELECT s_name, COUNT(*) AS numwait
                |FROM supplier, lineitem l1, orders
                |WHERE s_suppkey = l1.l_suppkey
                |  AND o_orderkey = l1.l_orderkey
                |  AND o_orderstatus = 'F'
                |  AND l1.l_returnflag = 'R'
                |  AND EXISTS (
                |    SELECT 1 FROM lineitem l2
                |    WHERE l2.l_orderkey = l1.l_orderkey
                |      AND l2.l_suppkey <> l1.l_suppkey)
                |  AND NOT EXISTS (
                |    SELECT 1 FROM lineitem l3
                |    WHERE l3.l_orderkey = l1.l_orderkey
                |      AND l3.l_suppkey <> l1.l_suppkey
                |      AND l3.l_returnflag = 'R')
                |GROUP BY s_name
                |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
             |FROM supplier, lineitem l1, orders
             |WHERE s_suppkey = l1.l_suppkey
             |  AND o_orderkey = l1.l_orderkey
             |  AND o_orderstatus = 'F'
             |  AND l1.l_returnflag = 'R'
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey
             |      AND l3.l_returnflag = 'R')
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // Ratio-to-report: each nation's share of global revenue via an
    // unpartitioned window over the ALREADY-AGGREGATED frame (25 rows
    // — the window is cheap because aggregation shrank the data first;
    // the window sum stays in exact decimal so partition order can't
    // perturb the total).
    QueryDef(
      "q141_share_of_total",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val w = W.partitionBy()
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        nation(s, d)
          .join(supplier(s, d), col("n_nationkey") === col("s_nationkey"))
          .join(lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
          .groupBy("n_name")
          .agg(dsum(rev).as("nation_rev"))
          .withColumn("global_rev",
            sum(col("nation_rev").cast(Dec)).over(w).cast(Dec2)
              .cast("double"))
          .withColumn("rev_share", col("nation_rev") / col("global_rev"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, nation_rev,
              |  CAST(round(SUM(CAST(nation_rev AS DECIMAL(38,12)))
              |    OVER (), 2) AS DOUBLE) AS global_rev,
              |  nation_rev / CAST(round(SUM(CAST(nation_rev
              |    AS DECIMAL(38,12))) OVER (), 2) AS DOUBLE) AS rev_share
              |FROM (
              |  SELECT n_name, ${sqlDsum(sqlRev)} AS nation_rev
              |  FROM nation
              |  JOIN supplier ON n_nationkey = s_nationkey
              |  JOIN lineitem ON s_suppkey = l_suppkey
              |  GROUP BY n_name)
              |ORDER BY n_name""".stripMargin)),

    // TPC-H Q17 shape (small-quantity order revenue): revenue from
    // lineitems whose quantity sits below half the PART's average —
    // the correlated-scalar-aggregate pattern, decorrelated into one
    // per-part aggregate joined back to the fact. The per-part
    // averages are a part-cardinality table (broadcastable at any
    // realistic part/fact ratio); the fact scans once.
    QueryDef(
      "q256_small_qty_revenue",
      (s, d) => {
        val li = lineitem(s, d)
        val avgQ = li.groupBy("l_partkey")
          .agg(davg(col("l_quantity")).as("avg_qty"))
        li.join(broadcast(avgQ), "l_partkey")
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(dsum(col("l_extendedprice")).as("total_price"),
            count(lit(1)).cast("long").as("n_rows"))
      },
      Some(s"""WITH avgq AS (
              |  SELECT l_partkey, ${sqlDavg("l_quantity")} AS avg_qty
              |  FROM lineitem GROUP BY l_partkey
              |)
              |SELECT ${sqlDsum("l_extendedprice")} AS total_price,
              |  CAST(COUNT(*) AS BIGINT) AS n_rows
              |FROM lineitem JOIN avgq USING (l_partkey)
              |WHERE l_quantity < 0.5 * avg_qty""".stripMargin)),

    // TPC-H Q2 shape (min-cost supplier, adapted — no partsupp
    // table, so "cost" is the supplier's average observed unit price
    // on the part): for each part in a part-key slice, the EUROPE
    // supplier with the lowest average unit price, ties to the lower
    // suppkey. Region/nation prune the supplier dim BEFORE the fact
    // join (broadcast both); the argmin is a per-part window over the
    // (part, supplier) aggregate, not the fact.
    QueryDef(
      "q257_min_cost_supplier",
      (s, d) => {
        val li = lineitem(s, d).filter(col("l_partkey") % 50 === 0)
        val eur = supplier(s, d)
          .join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name")
        val perSupp = li
          .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"))
          .agg(davg(col("l_extendedprice") / col("l_quantity"))
            .as("avg_unit"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_partkey")
          .orderBy(col("avg_unit").asc, col("s_suppkey").asc)
        perSupp
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_partkey"), col("s_suppkey"), col("s_name"),
            col("avg_unit"))
          .orderBy("l_partkey")
      },
      Some(s"""WITH eur AS (
              |  SELECT s_suppkey, s_name FROM supplier
              |  JOIN nation ON s_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |  WHERE r_name = 'EUROPE'
              |), persupp AS (
              |  SELECT l_partkey, s_suppkey, s_name,
              |    ${sqlDavg("l_extendedprice / l_quantity")} AS avg_unit
              |  FROM lineitem
              |  JOIN eur ON l_suppkey = s_suppkey
              |  WHERE l_partkey % 50 = 0
              |  GROUP BY l_partkey, s_suppkey, s_name
              |)
              |SELECT l_partkey, s_suppkey, s_name, avg_unit FROM (
              |  SELECT l_partkey, s_suppkey, s_name, avg_unit,
              |    row_number() OVER (PARTITION BY l_partkey
              |      ORDER BY avg_unit ASC, s_suppkey ASC) AS rn
              |  FROM persupp)
              |WHERE rn = 1
              |ORDER BY l_partkey""".stripMargin)),

    // TPC-H Q20 shape (dominant suppliers, adapted — shipped volume
    // instead of stocked volume): suppliers who shipped more than 12%
    // of some part's total shipped quantity, with how many parts they
    // dominate. Two aggregates over the same fact at different keys
    // ((part, supplier) then (part)) joined on the part key — the
    // double-aggregation + ratio-threshold pattern; supplier names
    // join AFTER the per-supplier rollup (a supplier-cardinality
    // table, broadcast).
    QueryDef(
      "q258_dominant_suppliers",
      (s, d) => {
        val li = lineitem(s, d)
        val ps = li.groupBy("l_partkey", "l_suppkey")
          .agg(dsum(col("l_quantity")).as("supp_qty"))
        val tot = li.groupBy("l_partkey")
          .agg(dsum(col("l_quantity")).as("tot_qty"))
        ps.join(tot, "l_partkey")
          .filter(col("supp_qty") > lit(0.12) * col("tot_qty"))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).cast("long").as("n_parts_dominated"))
          .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("n_parts_dominated"))
          .orderBy(col("n_parts_dominated").desc, col("s_suppkey"))
      },
      Some(s"""WITH ps AS (
              |  SELECT l_partkey, l_suppkey,
              |    ${sqlDsum("l_quantity")} AS supp_qty
              |  FROM lineitem GROUP BY l_partkey, l_suppkey
              |), tot AS (
              |  SELECT l_partkey, ${sqlDsum("l_quantity")} AS tot_qty
              |  FROM lineitem GROUP BY l_partkey
              |)
              |SELECT s_suppkey, s_name,
              |  CAST(COUNT(*) AS BIGINT) AS n_parts_dominated
              |FROM ps
              |JOIN tot USING (l_partkey)
              |JOIN supplier ON l_suppkey = s_suppkey
              |WHERE supp_qty > 0.12 * tot_qty
              |GROUP BY s_suppkey, s_name
              |ORDER BY n_parts_dominated DESC, s_suppkey""".stripMargin))
  )
}
