package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.2–§2.6, §7.4).
  *
  * Each query is the Spark-idiomatic declaration of one operator
  * family from the reference inventory; Catalyst picks the physical
  * strategy. Scale notes are on each query — broadcast for dims,
  * partial aggregation for groupBys, sort-merge only where both sides
  * are large.
  */
object RelationalQueries {
  import Exact._

  val all: Seq[QueryDef] = Seq(
    // P1-P5: scan → pushed filter → projection.
    // Reference: metadata SELECT/WHERE, dags/ingest_bundesliga_match_scores.py:36-38.
    QueryDef(
      "q01_scan_filter_project",
      (s, d) =>
        lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-02-01").cast("timestamp") &&
              col("l_discount") > 0.05)
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-02-01'
             |  AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // P4: LIKE prefix predicate.
    // Reference: s3_file_name_wc LIKE '<file>%', dags/…scores.py:153.
    QueryDef(
      "q02_like_prefix",
      (s, d) =>
        part(s, d)
          .filter(col("p_name").like("red%"))
          .select("p_partkey", "p_name", "p_brand")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand FROM part
             |WHERE p_name LIKE 'red%' ORDER BY p_partkey""".stripMargin)),

    // A1: DISTINCT projection. Reference: dags/…scores.py:152.
    QueryDef(
      "q03_distinct",
      (s, d) =>
        orders(s, d).select("o_orderpriority").distinct()
          .orderBy("o_orderpriority"),
      Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority")),

    // A2: multi-aggregate hash agg (TPC-H Q1 shape). Partial+final agg,
    // no shuffle of raw rows — only 4-group partials.
    QueryDef(
      "q04_agg_pricing",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqlDsum("l_quantity")} AS sum_qty,
              |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
              |  ${sqlDavg("l_quantity")} AS avg_qty,
              |  ${sqlDavg("l_discount")} AS avg_disc,
              |  COUNT(*) AS count_order
              |FROM lineitem
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Grouping sets: ROLLUP. Subtotal rows' NULL keys are coalesced to
    // 'ALL' so the total ORDER BY needs no NULLS FIRST/LAST pinning.
    QueryDef(
      "q05_rollup",
      (s, d) =>
        lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n_rows"), col("sum_qty"))
          .orderBy("returnflag", "linestatus"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
              |  COALESCE(l_linestatus, 'ALL') AS linestatus,
              |  COUNT(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
              |FROM lineitem
              |GROUP BY ROLLUP(l_returnflag, l_linestatus)
              |ORDER BY returnflag, linestatus""".stripMargin)),

    // Grouping sets: CUBE.
    QueryDef(
      "q06_cube",
      (s, d) =>
        orders(s, d)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
            col("n_orders"), col("sum_price"))
          .orderBy("orderstatus", "orderpriority"),
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
              |  COALESCE(o_orderpriority, 'ALL') AS orderpriority,
              |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders
              |GROUP BY CUBE(o_orderstatus, o_orderpriority)
              |ORDER BY orderstatus, orderpriority""".stripMargin)),

    // Star-schema join-aggregate (flagship; also SparkEntry.entry).
    // nation/region are broadcast — only orders⋈customer shuffles, on
    // the join key, then a 25-group agg. Survives 100× scale-up: the
    // shuffle is on the fact tables' keys, dims never shuffle.
    QueryDef(
      "q07_join_agg",
      (s, d) => {
        val o = orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val c = customer(s, d)
        val n = nation(s, d)
        val r = region(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name, ${sqlDsum("o_totalprice")} AS revenue,
              |  COUNT(*) AS n_orders
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY r_name, n_name
              |ORDER BY r_name, n_name""".stripMargin)),

    // Left outer join preserving unmatched left rows.
    QueryDef(
      "q08_join_left",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_totalprice") > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_big_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
             |FROM customer
             |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // Left semi join (EXISTS).
    QueryDef(
      "q09_join_semi",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_totalprice") > 450000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Left anti join (NOT EXISTS): customers with no pending ('P')
    // order — non-empty at every scale factor, unlike "no orders at
    // all" (every customer has orders in this data).
    QueryDef(
      "q10_join_anti",
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    // Top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    // only k rows reach the driver. Tie-broken on o_orderkey for a
    // total order.
    QueryDef(
      "q11_topk",
      (s, d) =>
        orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin)),

    // Window: row_number per partition, top-2 per customer.
    QueryDef(
      "q12_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        orders(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 2)
          .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_custkey
             |          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
             |      FROM orders)
             |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin)),

    // Window: running frame sum (ROWS UNBOUNDED PRECEDING..CURRENT),
    // exact decimal accumulation so prefix sums are reproducible.
    QueryDef(
      "q13_window_running",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .withColumn("running_spend",
            sum(col("o_totalprice").cast(Dec)).over(w).cast(Dec2)
              .cast("double"))
          .select("o_custkey", "o_orderkey", "o_totalprice", "running_spend")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(38,12))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             |    AS DOUBLE) AS running_spend
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Set op: UNION ALL. Reference: my_first_dbt_model.sql:12-18.
    QueryDef(
      "q14_union_all",
      (s, d) => {
        val c = customer(s, d)
        val a = c.filter(col("c_mktsegment") === "HOUSEHOLD")
          .select(col("c_custkey"), lit("household").as("seg"))
        val b = c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey"), lit("machinery").as("seg"))
        a.unionAll(b).orderBy("seg", "c_custkey")
      },
      Some("""SELECT c_custkey, 'household' AS seg FROM customer
             |WHERE c_mktsegment = 'HOUSEHOLD'
             |UNION ALL
             |SELECT c_custkey, 'machinery' AS seg FROM customer
             |WHERE c_mktsegment = 'MACHINERY'
             |ORDER BY seg, c_custkey""".stripMargin)),

    // Set op: INTERSECT (distinct semantics in both engines).
    QueryDef(
      "q15_intersect",
      (s, d) => {
        val o = orders(s, d)
        val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
        f.intersect(p).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
             |ORDER BY o_custkey""".stripMargin)),

    // Set op: EXCEPT.
    QueryDef(
      "q16_except",
      (s, d) => {
        val o = orders(s, d)
        val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
        f.except(p).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
             |ORDER BY o_custkey""".stripMargin)),

    // F1-F3: string functions (concat_ws, split/element_at, upper,
    // substring, length). Reference: path building via join/split,
    // dags/…scores.py:136-137,148-149.
    QueryDef(
      "q17_string_funcs",
      (s, d) =>
        part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            length(col("p_name")).as("name_len"),
            element_at(split(col("p_name"), " "), -1).as("last_word"),
            concat_ws("/", col("p_brand"), col("p_type")).as("brand_path"),
            substring(col("p_type"), 1, 3).as("type_prefix"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
             |  CAST(length(p_name) AS INTEGER) AS name_len,
             |  string_split(p_name, ' ')[-1] AS last_word,
             |  concat_ws('/', p_brand, p_type) AS brand_path,
             |  substring(p_type, 1, 3) AS type_prefix
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // F4-F7: date functions incl. the reference Partitioner's
    // lowercase-month-name path (include/scripts/file_services/
    // partitioner.py:12-22): <year>/<monthname-lower>/<day>.
    QueryDef(
      "q18_date_funcs",
      (s, d) =>
        orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("order_year"),
            lower(date_format(col("o_orderdate"), "MMMM")).as("order_month"),
            dayofmonth(col("o_orderdate")).as("order_day"),
            concat_ws("/",
              year(col("o_orderdate")),
              lower(date_format(col("o_orderdate"), "MMMM")),
              dayofmonth(col("o_orderdate"))).as("partition_path"),
            to_date(col("o_orderdate")).as("order_date"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
             |  lower(monthname(o_orderdate)) AS order_month,
             |  CAST(day(o_orderdate) AS INTEGER) AS order_day,
             |  concat_ws('/', CAST(year(o_orderdate) AS INTEGER),
             |    lower(monthname(o_orderdate)),
             |    CAST(day(o_orderdate) AS INTEGER)) AS partition_path,
             |  CAST(o_orderdate AS DATE) AS order_date
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // P6/F9: NULL handling — nullif/coalesce/CASE WHEN/IS NULL.
    QueryDef(
      "q19_null_handling",
      (s, d) =>
        orders(s, d)
          .select(
            col("o_orderkey"),
            coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING"))
              .as("status_resolved"),
            when(col("o_totalprice") > 300000.0, lit("big"))
              .otherwise(lit("small")).as("size_class"),
            nullif(col("o_orderstatus"), lit("P")).isNull.as("is_pending"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
             |  CASE WHEN o_totalprice > 300000.0 THEN 'big' ELSE 'small' END
             |    AS size_class,
             |  NULLIF(o_orderstatus, 'P') IS NULL AS is_pending
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    // revenue per order, top-10. Both fact joins shuffle on their
    // keys; the segment filter prunes customer before the join.
    QueryDef(
      "q51_shipping_priority",
      (s, d) => {
        val cut = lit("1997-06-01").cast("timestamp")
        val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = orders(s, d).filter(col("o_orderdate") < cut)
        val l = lineitem(s, d).filter(col("l_shipdate") > cut)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1997-06-01'
              |  AND l_shipdate > TIMESTAMP '1997-06-01'
              |GROUP BY l_orderkey, o_orderdate, o_orderpriority
              |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue ranking per customer over
    // a quarter, with nation dimension broadcast.
    QueryDef(
      "q52_returned_items",
      (s, d) => {
        val lo = lit("1997-01-01").cast("timestamp")
        val hi = lit("1997-04-01").cast("timestamp")
        val c = customer(s, d)
        val o = orders(s, d)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        val l = lineitem(s, d).filter(col("l_returnflag") === "R")
        val n = nation(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1997-01-01'
              |  AND o_orderdate < TIMESTAMP '1997-04-01'
              |GROUP BY c_custkey, c_name, n_name
              |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)),

    // Theta join (equi key + inequality residual): Catalyst plans a
    // sort-merge/hash join on the equi key with the inequality as a
    // post-join residual — never a nested loop over the full inputs.
    QueryDef(
      "q22_theta_join",
      (s, d) => {
        val su = supplier(s, d)
        val c = customer(s, d)
        su.join(c,
            su("s_nationkey") === c("c_nationkey") &&
              su("s_acctbal") > c("c_acctbal"))
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("nationkey")
      },
      Some("""SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs
             |FROM supplier JOIN customer
             |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
             |GROUP BY s_nationkey ORDER BY nationkey""".stripMargin)),

    // Range join: lineitem quantity within a part-size band.
    QueryDef(
      "q23_range_join",
      (s, d) => {
        val l = lineitem(s, d)
        val p = part(s, d)
        l.join(broadcast(p),
            l("l_partkey") === p("p_partkey") &&
              l("l_quantity") >= p("p_size") - lit(5) &&
              l("l_quantity") <= p("p_size") + lit(5))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand, COUNT(*) AS n_lines,
              |  ${sqlDsum("l_extendedprice")} AS sum_price
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
              |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // TPC-H Q5 shape (local supplier volume): the 6-table star+snowflake
    // join — fact lineitem shuffles once on l_orderkey; customer joins
    // on the orders side; supplier/nation/region are broadcast dims.
    // The c_nationkey = s_nationkey residual makes it a genuine Q5
    // (revenue where the customer and supplier share a nation).
    QueryDef(
      "q57_local_supplier_volume",
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1997-01-01").cast("timestamp")
        val r = region(s, d).filter(col("r_name") === "ASIA")
        val n = nation(s, d)
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        val sup = supplier(s, d)
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        val o = orders(s, d)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        val c = customer(s, d)
        lineitem(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      Some(s"""SELECT n_name,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |  AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1997-01-01'
              |GROUP BY n_name
              |ORDER BY revenue DESC, n_name ASC""".stripMargin)),

    // Window-function breadth: ntile quartiles, percent_rank and
    // cume_dist over the same per-customer ordering — one window
    // spec, one sort, three rank family functions.
    QueryDef(
      "q58_window_ranks",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_totalprice ASC, o_orderkey ASC)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
