package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Reshaping + nested-data operator coverage: pivot, unpivot, array
  * functions, explode with ordinality, and a scalar subquery.
  */
object ReshapeQueries {
  import Exact._

  val all: Seq[QueryDef] = Seq(
    // Pivot: order counts per priority × status. Spark's groupBy.pivot
    // with explicit values; oracle is conditional aggregation (the
    // engine-portable spelling).
    QueryDef(
      "q45_pivot",
      (s, d) =>
        orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Unpivot (melt): per-nation account-balance stats to long form.
    QueryDef(
      "q46_unpivot",
      (s, d) => {
        val stats = customer(s, d)
          .groupBy("c_nationkey")
          .agg(dsum(col("c_acctbal")).as("total_bal"),
            count(lit(1)).cast("double").as("n_customers"))
        stats.unpivot(Array(col("c_nationkey")),
            Array(col("total_bal"), col("n_customers")),
            "metric", "value")
          .orderBy("c_nationkey", "metric")
      },
      Some(s"""WITH stats AS (
              |  SELECT c_nationkey, ${sqlDsum("c_acctbal")} AS total_bal,
              |    CAST(COUNT(*) AS DOUBLE) AS n_customers
              |  FROM customer GROUP BY c_nationkey
              |)
              |SELECT c_nationkey, metric, value FROM stats
              |UNPIVOT (value FOR metric IN (total_bal, n_customers))
              |ORDER BY c_nationkey, metric""".stripMargin)),

    // Array functions: sort, slice, join, membership over token arrays.
    QueryDef(
      "q47_array_funcs",
      (s, d) => {
        val ws = split(col("text"), " ")
        documents(s, d)
          .select(col("doc_id"),
            size(ws).as("n_words"),
            array_join(slice(sort_array(ws), 1, 3), " ").as("first3_sorted"),
            array_contains(ws, "the").as("has_the"),
            element_at(ws, 1).as("first_word"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
             |  array_to_string(list_sort(string_split(text, ' '))[1:3], ' ')
             |    AS first3_sorted,
             |  list_contains(string_split(text, ' '), 'the') AS has_the,
             |  string_split(text, ' ')[1] AS first_word
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Generator/UDTF analog: posexplode with ordinality.
    QueryDef(
      "q48_posexplode",
      (s, d) =>
        documents(s, d)
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("pos", "word_pos")
          .withColumnRenamed("col", "word")
          .orderBy("doc_id", "word_pos"),
      Some("""SELECT doc_id,
             |  CAST(generate_subscripts(string_split(text, ' '), 1) - 1
             |    AS INTEGER) AS word_pos,
             |  unnest(string_split(text, ' ')) AS word
             |FROM documents WHERE doc_id < 20
             |ORDER BY doc_id, word_pos""".stripMargin)),

    // Explicit GROUPING SETS (beyond rollup/cube): chosen subtotal
    // combinations, through the SQL surface on both engines.
    QueryDef(
      "q50_grouping_sets",
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                |  COALESCE(l_linestatus, 'ALL') AS linestatus,
                |  COUNT(*) AS n_rows
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                |  (l_linestatus), ())
                |ORDER BY returnflag, linestatus""".stripMargin)
      },
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |  COALESCE(l_linestatus, 'ALL') AS linestatus,
             |  COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |  (l_linestatus), ())
             |ORDER BY returnflag, linestatus""".stripMargin)),

    // Scalar subquery: each order's price relative to the global mean.
    QueryDef(
      "q49_scalar_subquery",
      (s, d) => {
        val o = orders(s, d)
        val avgDf = o.agg(davg(col("o_totalprice")).as("avg_price"))
        o.crossJoin(avgDf)
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("o_totalprice") / col("avg_price")).as("price_ratio"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_totalprice,
              |  o_totalprice / (SELECT ${Exact.sqlDavg("o_totalprice")}
              |                  FROM orders) AS price_ratio
              |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
