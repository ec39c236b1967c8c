package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage completions for SURVEY.md §2: the SQL entry point (S7 —
  * the engine executes textual SQL like the reference ships SQL to
  * Snowflake), full outer join, lag/lead windows, and approximate
  * distinct (HLL — declared without an oracle since sketch internals
  * are engine-specific).
  */
object ExtraQueries {
  import Exact._

  val all: Seq[QueryDef] = Seq(
    // S7: arbitrary SQL executor — the whole query goes through
    // spark.sql over registered views (the engine's own SQL surface).
    QueryDef(
      "q40_sql_entry",
      (s, d) => {
        Seq("customer", "nation").foreach(t =>
          table(s, d, t).createOrReplaceTempView(t))
        s.sql("""SELECT n_name, COUNT(*) AS n_customers
                |FROM customer JOIN nation ON c_nationkey = n_nationkey
                |GROUP BY n_name ORDER BY n_name""".stripMargin)
      },
      Some("""SELECT n_name, COUNT(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Full outer join with null-preserving coalesce on both sides.
    QueryDef(
      "q41_join_full",
      (s, d) => {
        val o = orders(s, d)
        val f = o.filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey").as("fk"))
          .agg(count(lit(1)).as("n_f"))
        val p = o.filter(col("o_orderstatus") === "P")
          .groupBy(col("o_custkey").as("pk"))
          .agg(count(lit(1)).as("n_p"))
        f.join(p, col("fk") === col("pk"), "full_outer")
          .select(
            coalesce(col("fk"), col("pk")).as("custkey"),
            coalesce(col("n_f"), lit(0L)).as("n_f"),
            coalesce(col("n_p"), lit(0L)).as("n_p"))
          .orderBy("custkey")
      },
      Some("""SELECT COALESCE(f.fk, p.pk) AS custkey,
             |  COALESCE(f.n_f, 0) AS n_f, COALESCE(p.n_p, 0) AS n_p
             |FROM (SELECT o_custkey AS fk, COUNT(*) AS n_f FROM orders
             |      WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
             |FULL JOIN (SELECT o_custkey AS pk, COUNT(*) AS n_p FROM orders
             |      WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
             |  ON f.fk = p.pk
             |ORDER BY custkey""".stripMargin)),

    // lag/lead window navigation + day gaps between a customer's orders.
    QueryDef(
      "q43_window_lag",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            datediff(to_date(col("o_orderdate")),
              to_date(lag(col("o_orderdate"), 1).over(w)))
              .as("days_since_prev"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price,
             |  CAST(date_diff('day',
             |    CAST(lag(o_orderdate, 1) OVER w AS DATE),
             |    CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY o_orderdate ASC, o_orderkey ASC)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // A2 approximate: HyperLogLog distinct estimate. Raw sketch values
    // are engine-specific, so the oracle checks the checkable halves:
    // the exact count, and the SEMANTIC property that the estimate is
    // within 15% of exact (both engines' HLLs are far inside that —
    // Spark's default rsd is 5%; FunctionsSpec asserts the rsd bound
    // directly on the Spark estimate).
    QueryDef(
      "q42_approx_distinct",
      (s, d) => {
        val exact = count_distinct(col("l_partkey"))
        lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            exact.as("exact_parts"),
            (abs(approx_count_distinct(col("l_partkey")) - exact) <=
              exact * 0.15).as("approx_within_15pct"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
             |    <= COUNT(DISTINCT l_partkey) * 0.15 AS approx_within_15pct
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Right outer join — symmetric to q08_join_left, completing the
    // §2.3 join-type matrix: all customers preserved from the right
    // side, big-order counts from the filtered left side.
    QueryDef(
      "q54_join_right",
      (s, d) => {
        val o = orders(s, d).filter(col("o_totalprice") > 400000.0)
        val c = customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_big_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
             |FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
             |RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // Conditional aggregation (TPC-H Q12 shape, adapted to this
    // schema): urgent- vs relaxed-priority line counts per return
    // flag — sum(CASE …) folds the pivot into one hash agg pass.
    QueryDef(
      "q59_conditional_agg",
      (s, d) => {
        val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Top-k per group: rank-filter pattern (row_number ≤ k inside
    // each partition) — the per-group LIMIT Spark plans as one window
    // sort, no per-group driver loops.
    QueryDef(
      "q60_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice
             |FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // The bounded-heap per-group top-k AGGREGATOR (operators.TopK),
    // oracle-checked against the same SQL as q60's window form: the
    // cross-engine witness that map-side partial top-k buffers merge
    // to exactly the rank-filter answer.
    QueryDef(
      "q68_topk_aggregator",
      (s, d) =>
        graft.operators.TopK
          .topKPerGroup(s, orders(s, d),
            "o_orderpriority", "o_totalprice", "o_orderkey", 3)
          .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_orderpriority", "rn"),
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice
             |FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // The salted skew join (operators.SkewJoin), oracle-checked
    // against the plain join it must be equivalent to: salting is a
    // physical re-distribution, never a semantic change.
    QueryDef(
      "q69_salted_join",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
        val p = part(s, d).select("p_partkey", "p_brand")
        graft.operators.SkewJoin.saltedJoin(li, p, "p_partkey", 8)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand, COUNT(*) AS n_lines,
              |  ${sqlDsum("l_extendedprice")} AS sum_price
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Window value functions: first_value / last_value (full frame) /
    // nth_value over the per-customer order history — completes the
    // rank-family coverage of q58 with the value family.
    QueryDef(
      "q81_window_values",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val wFull = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            first(col("o_totalprice")).over(wFull).as("first_price"),
            last(col("o_totalprice")).over(wFull).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  first_value(o_totalprice) OVER w AS first_price,
             |  last_value(o_totalprice) OVER w AS last_price,
             |  nth_value(o_totalprice, 2) OVER w AS second_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate ASC, o_orderkey ASC
             |             ROWS BETWEEN UNBOUNDED PRECEDING
             |                      AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderkey""".stripMargin)),

    // Date arithmetic: datediff / date_trunc / add_months — the
    // calendar math family beyond q18's parse/extract.
    QueryDef(
      "q82_date_arith",
      (s, d) =>
        orders(s, d)
          .select(col("o_orderkey"),
            datediff(lit("1998-01-01").cast("date"),
              col("o_orderdate").cast("date")).as("days_to_98"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            add_months(col("o_orderdate"), 2).as("plus_two_months"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(datediff('day', CAST(o_orderdate AS DATE),
             |    DATE '1998-01-01') AS INTEGER) AS days_to_98,
             |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
             |    AS month_start,
             |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)
             |    AS plus_two_months
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // UNION (distinct) — q14 covers UNION ALL; this is the
    // dedup-across-branches form (Spark plans union + hash-distinct).
    QueryDef(
      "q86_union_distinct",
      (s, d) => {
        val big = orders(s, d).filter(col("o_totalprice") > 350000.0)
          .select("o_custkey")
        val urgent = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey")
        big.union(urgent).distinct().orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 350000.0
             |UNION
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_custkey""".stripMargin)),

    // LIKE beyond the prefix form (q02): contains, suffix, and
    // single-char wildcard — each pushable as a string predicate.
    QueryDef(
      "q87_like_forms",
      (s, d) =>
        customer(s, d)
          .select(col("c_custkey"),
            col("c_name").like("%42%").as("contains_42"),
            col("c_name").like("%7").as("ends_in_7"),
            col("c_name").like("Customer#00000000_").as("single_wildcard"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  c_name LIKE '%42%' AS contains_42,
             |  c_name LIKE '%7' AS ends_in_7,
             |  c_name LIKE 'Customer#00000000_' AS single_wildcard
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Math scalar functions — the IEEE-exactly-defined subset (abs /
    // sqrt / floor / ceil / sign / self-product), so both engines
    // produce identical bits; libm-backed ln/exp are deliberately NOT
    // oracle-gated (last-ulp differences across engines).
    QueryDef(
      "q83_math_funcs",
      (s, d) =>
        orders(s, d)
          .select(col("o_orderkey"),
            abs(col("o_totalprice") - 250000.0).as("abs_dev"),
            sqrt(col("o_totalprice")).as("sqrt_price"),
            floor(col("o_totalprice") / 1000).cast("long").as("k_floor"),
            ceil(col("o_totalprice") / 1000).cast("long").as("k_ceil"),
            signum(col("o_totalprice") - 250000.0).as("sign_dev"),
            (col("o_totalprice") * col("o_totalprice")).as("price_sq"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  abs(o_totalprice - 250000.0) AS abs_dev,
             |  sqrt(o_totalprice) AS sqrt_price,
             |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS k_floor,
             |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS k_ceil,
             |  CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS sign_dev,
             |  o_totalprice * o_totalprice AS price_sq
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // String scalar functions beyond q17: pad / replace / reverse /
    // repeat / position.
    QueryDef(
      "q84_string_funcs2",
      (s, d) =>
        customer(s, d)
          .select(col("c_custkey"),
            lpad(col("c_name"), 25, "_").as("padded"),
            regexp_replace(col("c_name"), "Customer", "Cust")
              .as("replaced"),
            reverse(col("c_name")).as("reversed"),
            repeat(col("c_mktsegment"), 2).as("doubled"),
            instr(col("c_name"), "#").cast("int").as("hash_pos"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  lpad(c_name, 25, '_') AS padded,
             |  replace(c_name, 'Customer', 'Cust') AS replaced,
             |  reverse(c_name) AS reversed,
             |  repeat(c_mktsegment, 2) AS doubled,
             |  CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicity (q15/q16 are the distinct forms) — counted so the
    // multiplicity itself is what the oracle checks.
    QueryDef(
      "q80_setops_all",
      (s, d) => {
        val big = lineitem(s, d).filter(col("l_quantity") >= 25)
          .select("l_partkey")
        val ret = lineitem(s, d).filter(col("l_returnflag") === "R")
          .select("l_partkey")
        val inter = big.intersectAll(ret)
          .agg(count(lit(1)).as("n_intersect_all"))
        val exc = big.exceptAll(ret)
          .agg(count(lit(1)).as("n_except_all"))
        inter.crossJoin(exc)
      },
      Some("""SELECT
             |  (SELECT COUNT(*) FROM (
             |     SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
             |     INTERSECT ALL
             |     SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'))
             |    AS n_intersect_all,
             |  (SELECT COUNT(*) FROM (
             |     SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
             |     EXCEPT ALL
             |     SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'))
             |    AS n_except_all""".stripMargin)),

    // Exact interpolated percentiles (quantile_cont semantics): both
    // engines compute lower + (upper - lower) * frac at position
    // p × (n - 1) — bit-identical on this integer-valued measure.
    QueryDef(
      "q61_percentiles",
      (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            percentile(col("l_quantity"), lit(0.25)).as("p25"),
            percentile(col("l_quantity"), lit(0.5)).as("median"),
            percentile(col("l_quantity"), lit(0.75)).as("p75"),
            percentile(col("l_quantity"), lit(0.95)).as("p95"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
             |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median,
             |  percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75,
             |  percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Higher moments (skewness / excess kurtosis) from exact decimal
    // power sums: both engines evaluate the IDENTICAL double formula
    // over identical Σx..Σx⁴, so the results are bit-equal without
    // trusting either engine's built-in skewness (whose one-pass
    // update orders differ). pow() is avoided (last-ulp divergence):
    // m2^1.5 is spelled m2·sqrt(m2).
    QueryDef(
      "q142_higher_moments",
      (s, d) => {
        def s6(c: org.apache.spark.sql.Column) =
          sum(c.cast(Dec)).cast(org.apache.spark.sql.types.DecimalType(38, 6))
            .cast(org.apache.spark.sql.types.DoubleType)
        val x = col("l_quantity")
        lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            s6(x).as("sx"), s6(x * x).as("sx2"),
            s6(x * x * x).as("sx3"), s6(x * x * x * x).as("sx4"))
          .withColumn("nd", col("n_rows").cast("double"))
          .withColumn("mean", col("sx") / col("nd"))
          .withColumn("m2",
            col("sx2") / col("nd") - col("mean") * col("mean"))
          .withColumn("m3",
            col("sx3") / col("nd") -
              lit(3.0) * col("mean") * (col("sx2") / col("nd")) +
              lit(2.0) * col("mean") * col("mean") * col("mean"))
          .withColumn("m4",
            col("sx4") / col("nd") -
              lit(4.0) * col("mean") * (col("sx3") / col("nd")) +
              lit(6.0) * col("mean") * col("mean") * (col("sx2") / col("nd")) -
              lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
          .select(col("l_returnflag"), col("n_rows"),
            (col("m3") / (col("m2") * sqrt(col("m2")))).as("skewness"),
            (col("m4") / (col("m2") * col("m2")) - lit(3.0))
              .as("excess_kurtosis"))
          .orderBy("l_returnflag")
      },
      Some {
        def s6(e: String) =
          s"CAST(round(SUM(CAST(($e) AS DECIMAL(38,12))), 6) AS DOUBLE)"
        s"""SELECT l_returnflag, n_rows,
           |  m3 / (m2 * sqrt(m2)) AS skewness,
           |  m4 / (m2 * m2) - 3.0 AS excess_kurtosis
           |FROM (
           |  SELECT l_returnflag, n_rows, mean,
           |    sx2 / nd - mean * mean AS m2,
           |    sx3 / nd - 3.0 * mean * (sx2 / nd)
           |      + 2.0 * mean * mean * mean AS m3,
           |    sx4 / nd - 4.0 * mean * (sx3 / nd)
           |      + 6.0 * mean * mean * (sx2 / nd)
           |      - 3.0 * mean * mean * mean * mean AS m4
           |  FROM (
           |    SELECT l_returnflag, n_rows, nd, sx / nd AS mean,
           |      sx, sx2, sx3, sx4
           |    FROM (
           |      SELECT l_returnflag, COUNT(*) AS n_rows,
           |        CAST(COUNT(*) AS DOUBLE) AS nd,
           |        ${s6("l_quantity")} AS sx,
           |        ${s6("l_quantity * l_quantity")} AS sx2,
           |        ${s6("l_quantity * l_quantity * l_quantity")} AS sx3,
           |        ${s6("l_quantity * l_quantity * l_quantity * l_quantity")}
           |          AS sx4
           |      FROM lineitem GROUP BY l_returnflag)))
           |ORDER BY l_returnflag""".stripMargin
      }),

    // Deterministic MODE with explicit tie-break (highest count, then
    // lexicographically smallest token): min_by over an inverted-count
    // + token key — one agg pass, no window, and no reliance on either
    // engine's arbitrary-tie mode().
    QueryDef(
      "q143_mode_token",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("source"),
            explode(graft.functions.TextFunctions.words(col("text")))
              .as("tok"))
          .groupBy("source", "tok")
          .agg(count(lit(1)).as("c"))
        toks
          .groupBy("source")
          .agg(min_by(col("tok"),
              concat(format_string("%010d", lit(1000000000) - col("c")),
                col("tok"))).as("mode_tok"),
            max(col("c")).as("mode_count"))
          .orderBy("source")
      },
      Some("""WITH tf AS (
             |  SELECT source, tok, COUNT(*) AS c FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  GROUP BY source, tok)
             |SELECT source,
             |  min_by(tok, printf('%010d', 1000000000 - c) || tok)
             |    AS mode_tok,
             |  CAST(MAX(c) AS BIGINT) AS mode_count
             |FROM tf GROUP BY source ORDER BY source""".stripMargin)),

    // MERGE / upsert (the dbt-incremental materialization the
    // reference configures, data_transformations/models/example/
    // *.sql, re-expressed as a declarative plan): target = each
    // customer's top order before 1997, source = same for 1997+;
    // source rows overwrite matched targets, unmatched sources insert,
    // untouched targets carry forward. Spark's MERGE plan IS a
    // full-outer join on the key + coalesce projection — one shuffle,
    // scales with the bigger side, no row-at-a-time upserts.
    QueryDef(
      "q100_merge_upsert",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        def top(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
        val o = orders(s, d)
        val tgt = top(o.filter(col("o_orderdate") < "1997-01-01")).as("t")
        val src = top(o.filter(col("o_orderdate") >= "1997-01-01")).as("s")
        tgt.join(src, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            coalesce(col("s.o_orderkey"), col("t.o_orderkey"))
              .as("o_orderkey"),
            coalesce(col("s.o_totalprice"), col("t.o_totalprice"))
              .as("o_totalprice"),
            when(col("s.o_orderkey").isNotNull &&
                col("t.o_orderkey").isNotNull, "update")
              .when(col("t.o_orderkey").isNull, "insert")
              .otherwise("keep").as("action"))
          .orderBy("o_custkey")
      },
      Some("""WITH ranked AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders
             |), tgt AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |    SELECT o_custkey, o_orderkey, o_totalprice,
             |      row_number() OVER (PARTITION BY o_custkey
             |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |    FROM orders WHERE o_orderdate < '1997-01-01')
             |  WHERE rn = 1
             |), src AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |    SELECT o_custkey, o_orderkey, o_totalprice,
             |      row_number() OVER (PARTITION BY o_custkey
             |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |    FROM orders WHERE o_orderdate >= '1997-01-01')
             |  WHERE rn = 1
             |)
             |SELECT COALESCE(t.o_custkey, s.o_custkey) AS o_custkey,
             |  COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
             |  COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
             |  CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
             |    THEN 'update'
             |  WHEN t.o_orderkey IS NULL THEN 'insert'
             |  ELSE 'keep' END AS action
             |FROM tgt t FULL OUTER JOIN src s ON t.o_custkey = s.o_custkey
             |ORDER BY o_custkey""".stripMargin)),

    // Statistical moments from exact sums: stddev / correlation /
    // covariance assembled from exact Σx, Σx², Σy, Σy², Σxy with the
    // textbook formulas written identically in both engines, so every
    // double op is the same IEEE op. Built-in stddev/corr use
    // different accumulation orders per engine and can't cross-engine
    // hash-match. The sums are quantized scaled-long sums (inputs
    // carry ≤2 fractional digits, so qx=floor(x*100+.5) is exact and
    // qx·qy reproduces the scale-4 cross terms exactly) — precision-38
    // decimal sums aggregate as byte-array BigDecimals and were ~2.5×
    // slower here. Two-level aggregation keeps the hot path on
    // codegen'd long adds while staying overflow-safe at any corpus
    // size: level 1 sums longs per (flag, input partition) — bounded
    // by rows-per-partition × 2.5e7 ≪ 2^63 — and level 2 promotes the
    // tiny partial set (groups × partitions rows) to DECIMAL(38,0).
    QueryDef(
      "q101_stats_moments",
      (s, d) => {
        val D0 = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = lineitem(s, d)
          .select(col("l_returnflag"),
            floor(col("l_quantity") * lit(100d) + lit(0.5d)).as("qx"),
            floor(col("l_discount") * lit(100d) + lit(0.5d)).as("qy"))
        val partial = base
          .groupBy(col("l_returnflag"), spark_partition_id().as("pid"))
          .agg(count(lit(1)).as("pn"),
            sum(col("qx")).as("px"),
            sum(col("qx") * col("qx")).as("px2"),
            sum(col("qy")).as("py"),
            sum(col("qy") * col("qy")).as("py2"),
            sum(col("qx") * col("qy")).as("pxy"))
        partial
          .groupBy("l_returnflag")
          .agg(sum("pn").as("n_rows"),
            sum(col("px").cast(D0)).as("tx"),
            sum(col("px2").cast(D0)).as("tx2"),
            sum(col("py").cast(D0)).as("ty"),
            sum(col("py2").cast(D0)).as("ty2"),
            sum(col("pxy").cast(D0)).as("txy"))
          .select(col("l_returnflag"), col("n_rows"),
            col("n_rows").cast("double").as("nd"),
            (col("tx").cast("double") / lit(1e2)).as("sx"),
            (col("tx2").cast("double") / lit(1e4)).as("sx2"),
            (col("ty").cast("double") / lit(1e2)).as("sy"),
            (col("ty2").cast("double") / lit(1e4)).as("sy2"),
            (col("txy").cast("double") / lit(1e4)).as("sxy"))
          .select(col("l_returnflag"), col("n_rows"),
            sqrt((col("nd") * col("sx2") - col("sx") * col("sx")) /
              (col("nd") * (col("nd") - 1))).as("stddev_qty"),
            ((col("nd") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("nd") * col("sx2") - col("sx") * col("sx")) *
                sqrt(col("nd") * col("sy2") - col("sy") * col("sy"))))
              .as("corr_qty_disc"),
            ((col("sxy") - col("sx") * col("sy") / col("nd")) /
              (col("nd") - 1)).as("covar_qty_disc"))
          .orderBy("l_returnflag")
      },
      Some(
        """WITH q AS (
          |  SELECT l_returnflag,
          |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qx,
          |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS qy
          |  FROM lineitem),
          |t AS (
          |  SELECT l_returnflag, COUNT(*) AS n_rows,
          |    CAST(COUNT(*) AS DOUBLE) AS nd,
          |    CAST(SUM(qx) AS DOUBLE) / 1e2 AS sx,
          |    CAST(SUM(qx * qx) AS DOUBLE) / 1e4 AS sx2,
          |    CAST(SUM(qy) AS DOUBLE) / 1e2 AS sy,
          |    CAST(SUM(qy * qy) AS DOUBLE) / 1e4 AS sy2,
          |    CAST(SUM(qx * qy) AS DOUBLE) / 1e4 AS sxy
          |  FROM q GROUP BY l_returnflag)
          |SELECT l_returnflag, n_rows,
          |  sqrt((nd * sx2 - sx * sx) / (nd * (nd - 1))) AS stddev_qty,
          |  (nd * sxy - sx * sy) /
          |    (sqrt(nd * sx2 - sx * sx) * sqrt(nd * sy2 - sy * sy))
          |    AS corr_qty_disc,
          |  (sxy - sx * sy / nd) / (nd - 1) AS covar_qty_disc
          |FROM t
          |ORDER BY l_returnflag""".stripMargin)),

    // Regex extraction (completes the regex family: q84 replaces,
    // q87 LIKEs): capture-group extract + typed cast + boolean match,
    // all codegen'd scalar ops on the scan — no shuffle at any scale.
    QueryDef(
      "q102_regexp_extract",
      (s, d) =>
        customer(s, d)
          .select(col("c_custkey"),
            regexp_extract(col("c_name"), "#(\\d+)", 1).as("id_digits"),
            regexp_extract(col("c_name"), "#(\\d+)", 1).cast("long")
              .as("id_num"),
            col("c_name").rlike("#0{3}").as("has_triple_zero"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  regexp_extract(c_name, '#(\d+)', 1) AS id_digits,
             |  CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) AS id_num,
             |  regexp_matches(c_name, '#0{3}') AS has_triple_zero
             |FROM customer ORDER BY c_custkey""".stripMargin))
  )
}
