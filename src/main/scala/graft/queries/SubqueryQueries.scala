package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Subquery-shaped relational coverage: EXISTS / NOT EXISTS with
  * correlated non-equi predicates, IN-subquery over an aggregate
  * (TPC-H Q18 shape), correlated scalar subqueries (decorrelated to a
  * broadcast join — the plan a 100 TB engine must pick anyway), HAVING,
  * and multi-CTE SQL through the engine's own `spark.sql` surface.
  *
  * The reference ships these shapes as raw SQL to its warehouse
  * (dags/run_validations.py:21-38 builds `select * from t_<entity>`
  * strings; transformation SQL lives in data_transformations/models/);
  * here each is a declarative DataFrame plan so Catalyst decorrelates /
  * reorders, plus a SQL-oracle twin.
  */
object SubqueryQueries {
  import Exact._

  val all: Seq[QueryDef] = Seq(
    // EXISTS with a correlated non-equi predicate (TPC-H Q4 shape):
    // orders having at least one lineitem shipped > 60 days after the
    // order date, counted per priority. Spark plans the EXISTS as a
    // left-semi hash join on the equi key with the inequality as a
    // residual — one shuffle, no duplicate-elimination pass.
    QueryDef(
      "q88_exists_subquery",
      (s, d) => {
        val o = orders(s, d)
        val l = lineitem(s, d)
        o.join(l,
            o("o_orderkey") === l("l_orderkey") &&
              l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // NOT EXISTS with a correlated filter (TPC-H Q22 flavor): active
    // customers who never placed a 300k+ order, per market segment.
    // The anti join's build side is the *filtered* orders — push the
    // 300k predicate below the join so the hash table holds only the
    // few qualifying orders (broadcast-small even at 100 TB).
    QueryDef(
      "q89_not_exists",
      (s, d) => {
        val big = orders(s, d).filter(col("o_totalprice") > 300000)
        customer(s, d)
          .filter(col("c_acctbal") > 0)
          .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            davg(col("c_acctbal")).as("avg_acctbal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
              |  ${sqlDavg("c_acctbal")} AS avg_acctbal
              |FROM customer c
              |WHERE c_acctbal > 0
              |  AND NOT EXISTS (SELECT 1 FROM orders o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_totalprice > 300000)
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // IN-subquery over an aggregate (TPC-H Q18): orders whose total
    // line quantity exceeds 150. The IN collapses to an inner join
    // with the HAVING-filtered aggregate — aggregate first (6× row
    // reduction before the join), then join on the key. l_quantity is
    // integer-valued so the double sum is exact in any order.
    QueryDef(
      "q90_in_subquery_agg",
      (s, d) => {
        val big = lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty"))
          .filter(col("total_qty") > 150)
        orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select("o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice, total_qty
             |FROM orders JOIN (
             |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING SUM(l_quantity) > 150
             |) big ON o_orderkey = l_orderkey
             |ORDER BY o_orderkey""".stripMargin)),

    // Correlated scalar subquery: each order against its priority
    // class's average price, keeping the above-average ones. The
    // correlation decorrelates to a 5-row broadcast join (the plan any
    // engine must reach — evaluating the subquery per row would be a
    // full scan per order).
    QueryDef(
      "q91_correlated_scalar",
      (s, d) => {
        val o = orders(s, d)
        val avgs = o.groupBy("o_orderpriority")
          .agg(davg(col("o_totalprice")).as("class_avg"))
        o.join(broadcast(avgs), "o_orderpriority")
          .filter(col("o_totalprice") > col("class_avg"))
          .select("o_orderkey", "o_orderpriority", "o_totalprice", "class_avg")
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_orderpriority, o_totalprice,
              |  (SELECT ${sqlDavg("o_totalprice")} FROM orders o2
              |   WHERE o2.o_orderpriority = o1.o_orderpriority) AS class_avg
              |FROM orders o1
              |WHERE o_totalprice > (SELECT ${sqlDavg("o_totalprice")}
              |                      FROM orders o3
              |                      WHERE o3.o_orderpriority = o1.o_orderpriority)
              |ORDER BY o_orderkey""".stripMargin)),

    // HAVING over a two-measure aggregate: repeat customers (≥ 15
    // orders) with their exact total spend. The post-aggregation
    // filter runs on the final agg — grouped rows never leave the
    // reducers unfiltered.
    QueryDef(
      "q92_having",
      (s, d) =>
        orders(s, d)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_spend"))
          .filter(col("n_orders") >= 15)
          .orderBy("o_custkey"),
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
              |  ${sqlDsum("o_totalprice")} AS total_spend
              |FROM orders GROUP BY o_custkey
              |HAVING COUNT(*) >= 15
              |ORDER BY o_custkey""".stripMargin)),

    // TPC-H Q6 (forecast revenue): pure scan-filter-sum — the query
    // whose whole cost is how much the scan avoids reading. All three
    // predicates push to the parquet scan (min/max row-group pruning
    // on l_shipdate at scale); the sum is one partial+final agg with
    // no shuffle beyond the 1-row exchange.
    QueryDef(
      "q93_tpch_q6",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1997-01-01" &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount"))
            .as("revenue")),
      Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue
              |FROM lineitem
              |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              |  AND l_discount BETWEEN 0.05 AND 0.07
              |  AND l_quantity < 24""".stripMargin)),

    // Multi-CTE through the engine's own SQL surface (S7): two
    // aggregating CTEs outer-joined to the nation dimension. Catalyst
    // inlines the CTEs and plans each aggregate before its (broadcast)
    // join — WITH is a naming construct, not a materialization fence.
    QueryDef(
      "q94_cte_sql",
      (s, d) => {
        Seq("nation", "customer", "supplier").foreach(t =>
          table(s, d, t).createOrReplaceTempView(t))
        s.sql("""WITH cust_per_nation AS (
                |  SELECT c_nationkey AS cnk, COUNT(*) AS n_cust
                |  FROM customer GROUP BY c_nationkey
                |), supp_per_nation AS (
                |  SELECT s_nationkey AS snk, COUNT(*) AS n_supp
                |  FROM supplier GROUP BY s_nationkey
                |)
                |SELECT n_name, COALESCE(n_cust, 0) AS n_cust,
                |       COALESCE(n_supp, 0) AS n_supp
                |FROM nation
                |LEFT JOIN cust_per_nation ON n_nationkey = cnk
                |LEFT JOIN supp_per_nation ON n_nationkey = snk
                |ORDER BY n_name""".stripMargin)
      },
      Some("""WITH cust_per_nation AS (
             |  SELECT c_nationkey AS cnk, COUNT(*) AS n_cust
             |  FROM customer GROUP BY c_nationkey
             |), supp_per_nation AS (
             |  SELECT s_nationkey AS snk, COUNT(*) AS n_supp
             |  FROM supplier GROUP BY s_nationkey
             |)
             |SELECT n_name, COALESCE(n_cust, 0) AS n_cust,
             |       COALESCE(n_supp, 0) AS n_supp
             |FROM nation
             |LEFT JOIN cust_per_nation ON n_nationkey = cnk
             |LEFT JOIN supp_per_nation ON n_nationkey = snk
             |ORDER BY n_name""".stripMargin))
  )
}
