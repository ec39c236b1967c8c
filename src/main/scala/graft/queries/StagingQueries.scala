package graft.queries

import graft.Tables._
import graft.ingest.ExternalTable
import org.apache.spark.sql.functions._

/** The reference's defining data path, oracle-gated END TO END: CSV
  * lands in a stage, an external table reads it ALL-VARCHAR
  * (schema-on-read), and every downstream consumer casts what it needs
  * (`CREATE OR REPLACE EXTERNAL TABLE … varchar(1000) AS
  * (value:cN::varchar)`, dags/ingest_bundesliga_match_scores.py:
  * 174-188; SURVEY.md §1.2-1.3).
  *
  * Each query here WRITES a deterministic CSV stage from the testdata
  * parquet (the reference's copy-into-stage step), re-reads it through
  * [[ExternalTable]]'s stringly-typed surface — header sniff,
  * `Unnamed: 0` → `data_id` rename, all-string schema — then casts
  * and aggregates. The DuckDB oracle reads the SAME staged files with
  * `read_csv(all_varchar=true)` and applies identical casts, so the
  * hash gate covers CSV serialization, quoting, the header rename,
  * and string→typed casts on both engines, not just the final
  * aggregate.
  *
  * The stage lives at a FIXED path (the oracle SQL is a static
  * string): `/tmp/graft_stage/<entity>`, rewritten by each run before
  * the oracle reads it. Numeric round-trip is safe bit-exactly:
  * both engines parse a decimal double literal with correct rounding,
  * and the JVM prints doubles as the shortest string that re-parses to
  * the same value.
  */
object StagingQueries {

  private val StageRoot = "/tmp/graft_stage"

  val all: Seq[QueryDef] = Seq(

    // Stage customer as pipe-delimited CSV with a pandas-style
    // unnamed index column, re-read all-varchar via the temp-view
    // registration, cast, aggregate by segment.
    QueryDef(
      "q151_csv_staging",
      (s, d) => {
        val stage = s"$StageRoot/customer"
        customer(s, d)
          .select(col("c_custkey").as("Unnamed: 0"), col("c_custkey"),
            col("c_name"), col("c_nationkey"), col("c_acctbal"),
            col("c_mktsegment"))
          .repartition(4) // multi-file stage: the glob path is real
          .write.mode("overwrite")
          .option("header", "true").option("delimiter", "|")
          .option("quote", "\"").option("escape", "\"")
          .csv(stage)
        val staged = ExternalTable.register(s, "stage_customer", stage,
          delimiter = "|")
        // schema-on-read contract: every column lands as a string
        require(staged.schema.fields.forall(
          _.dataType == org.apache.spark.sql.types.StringType),
          "external table must be all-string")
        staged
          .select(col("data_id").cast("long").as("data_id"),
            col("c_name"),
            col("c_nationkey").cast("int").as("c_nationkey"),
            col("c_acctbal").cast("double").as("c_acctbal"),
            col("c_mktsegment"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("c_nationkey")).as("nations"),
            Exact.dsum(col("c_acctbal")).as("bal_sum"),
            max(col("data_id")).as("max_id"),
            min(col("c_name")).as("min_name"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(COUNT(DISTINCT CAST(c_nationkey AS INTEGER)) AS BIGINT)
             |    AS nations,
             |  ${Exact.sqlDsum("CAST(c_acctbal AS DOUBLE)")} AS bal_sum,
             |  MAX(CAST("Unnamed: 0" AS BIGINT)) AS max_id,
             |  MIN(c_name) AS min_name
             |FROM read_csv('$StageRoot/customer/*.csv', delim='|',
             |  header=true, all_varchar=true)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // Same staging path through the SQL-DDL registration (`CREATE
    // TABLE … USING csv LOCATION …`) and the SQL executor over the
    // catalog table — the reference's external-table DDL + downstream
    // dbt-model SELECT, on one oracle row. Dates round-trip as ISO
    // strings; the cast exercises string→DATE on both engines.
    QueryDef(
      "q152_csv_ddl_staging",
      (s, d) => {
        val stage = s"$StageRoot/orders"
        orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite")
          .option("header", "true").option("delimiter", ",")
          .option("quote", "\"").option("escape", "\"")
          .csv(stage)
        ExternalTable.registerDdl(s, "stage_orders", stage)
        s.sql("""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT)
                |    AS o_year,
                |  COUNT(*) AS cnt,
                |  CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT)
                |    AS key_sum,
                |  MAX(o_orderpriority) AS max_prio
                |FROM t_stage_orders
                |WHERE CAST(o_totalprice AS DOUBLE) > 100000.0
                |GROUP BY o_year
                |ORDER BY o_year""".stripMargin)
      },
      Some(s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER)
             |    AS o_year,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT)
             |    AS key_sum,
             |  MAX(o_orderpriority) AS max_prio
             |FROM read_csv('$StageRoot/orders/*.csv', delim=',',
             |  header=true, all_varchar=true)
             |WHERE CAST(o_totalprice AS DOUBLE) > 100000.0
             |GROUP BY o_year
             |ORDER BY o_year""".stripMargin)),

    // JSONL staging — the other landing format every training-data
    // pipeline ingests (one JSON document per line, nested metadata
    // object). Stage documents as newline-delimited JSON with a
    // nested `meta` struct, re-read with an EXPLICIT schema (the
    // production contract: schema-on-read inference over 100 TB of
    // JSONL means a second full scan — declare, don't sniff), then
    // extract nested fields and aggregate. The oracle re-reads the
    // same staged lines with DuckDB's newline-delimited reader, so
    // the gate covers JSON serialization, nested-field extraction,
    // and numeric round-trips on both engines.
    QueryDef(
      "q182_jsonl_staging",
      (s, d) => {
        import org.apache.spark.sql.types._
        val stage = s"$StageRoot/docs_jsonl"
        documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            struct(col("lang"), col("source")).as("meta"))
          .repartition(4)
          .write.mode("overwrite").json(stage)
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_chars", LongType),
          StructField("meta", StructType(Seq(
            StructField("lang", StringType),
            StructField("source", StringType))))))
        s.read.schema(schema).json(stage)
          .groupBy(col("meta.lang").as("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars_total"),
            min(col("doc_id")).as("min_doc"),
            countDistinct(col("meta.source")).as("n_sources"))
          .orderBy("lang")
      },
      Some(s"""SELECT meta.lang AS lang,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
             |  MIN(doc_id) AS min_doc,
             |  CAST(COUNT(DISTINCT meta.source) AS BIGINT) AS n_sources
             |FROM read_json('$StageRoot/docs_jsonl/*.json',
             |  format='newline_delimited')
             |GROUP BY meta.lang
             |ORDER BY lang""".stripMargin))
  )
}
