package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Header-sniff schema inference — the Spark-native form of the
  * reference's fallback path (dags/ingest_bundesliga_match_scores.py:
  * 164-172): read ONLY the header (the reference reads one pandas
  * chunk, `chunksize=1`, line 168 — a limit-1 scan, never the file),
  * take the column names, rename an unnamed leading column to
  * `data_id` (line 170), and type every column string — mirroring the
  * all-`varchar(1000)` external-table DDL (lines 174-188).
  *
  * The registry-lookup path that precedes it in the reference is dead
  * code (undefined `snowflake_colmap_table_name` config — SURVEY.md
  * §1.3) and deliberately not replicated; [[registryOrInfer]] keeps
  * the two-tier shape with a working registry hook instead.
  */
object SchemaInference {

  /** Pandas names an unnamed index column `Unnamed: 0`; Spark's CSV
    * reader names an empty leading header field `_c0`; a raw header
    * may just have an empty first field. All become `data_id`
    * (reference dags/…scores.py:170).
    */
  def normalizeHeader(cols: Seq[String]): Seq[String] =
    cols.map {
      case c if c == "Unnamed: 0" || c == "_c0" || c.trim.isEmpty => "data_id"
      case c => c
    }

  /** All-string schema from the CSV header only. Spark's CSV reader
    * with `inferSchema=false` reads just the header line to name the
    * columns and types everything string — the same limit-1 semantics
    * and cost as the reference's chunked read.
    */
  def inferHeaderSchema(spark: SparkSession, path: String,
      delimiter: String = ","): StructType = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("delimiter", delimiter)
      .csv(path)
    StructType(normalizeHeader(raw.schema.fieldNames.toSeq)
      .map(StructField(_, StringType, nullable = true)))
  }

  /** Two-tier resolution: explicit registry first, header sniff as the
    * fallback (the reference's always-taken branch).
    */
  def registryOrInfer(spark: SparkSession, path: String,
      registry: Map[String, Seq[String]], entity: String,
      delimiter: String = ","): StructType =
    registry.get(entity) match {
      case Some(cols) =>
        StructType(cols.map(StructField(_, StringType, nullable = true)))
      case None => inferHeaderSchema(spark, path, delimiter)
    }
}
