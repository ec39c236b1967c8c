package graft.meta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Key-value pipeline metadata table — the Spark-native form of
  * `pipeline_metadata.t_key_value_pairs` (reference:
  * include/scripts/settings.txt:20-21; read at
  * dags/ingest_bundesliga_match_scores.py:35-45,104-114; updated via
  * generated SQL at 80-102).
  *
  * Schema: (m_key, m_key_type, m_value), all strings.
  *
  * The table is intentionally tiny (pipeline configuration, not data),
  * so updates are copy-on-write through the driver: read → mutate →
  * overwrite one parquet file. This is the file-storage answer to the
  * reference's in-warehouse `UPDATE` (SURVEY.md §2.8 D1) — at 100 TB
  * the *data* never takes this path, only metadata does.
  */
final case class MetaEntry(m_key: String, m_key_type: String, m_value: String)

class MetadataStore(spark: SparkSession, path: String) {

  private val schema = StructType(Seq(
    StructField("m_key", StringType),
    StructField("m_key_type", StringType),
    StructField("m_value", StringType)))

  def init(entries: Seq[MetaEntry]): Unit = write(entries)

  def df: DataFrame = spark.read.schema(schema).parquet(path)

  private def readAll(): Seq[MetaEntry] =
    df.collect().toSeq.map(r =>
      MetaEntry(r.getString(0), r.getString(1), r.getString(2)))

  private def write(entries: Seq[MetaEntry]): Unit = {
    val rows = entries.map(e => Row(e.m_key, e.m_key_type, e.m_value))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** `SELECT m_value FROM … WHERE m_key = ?` (reference :105-107). */
  def get(key: String): Option[String] =
    readAll().find(_.m_key == key).map(_.m_value)

  /** `SELECT m_key_type FROM … WHERE m_key = ?` (reference :36-38). */
  def getKeyType(key: String): Option[String] =
    readAll().find(_.m_key == key).map(_.m_key_type)

  /** Keyed UPDATE (reference :80-92): `SET m_value = m_key_type || '/'
    * || key || '/' || suffix WHERE m_key = key`.
    */
  def updatePathValue(key: String, suffix: String): Unit = {
    val updated = readAll().map {
      case e if e.m_key == key =>
        e.copy(m_value = s"${e.m_key_type}/$key/$suffix")
      case e => e
    }
    write(updated)
  }

  /** General keyed update. */
  def put(key: String, keyType: String, value: String): Unit = {
    val all = readAll()
    val updated =
      if (all.exists(_.m_key == key))
        all.map(e => if (e.m_key == key) MetaEntry(key, keyType, value) else e)
      else all :+ MetaEntry(key, keyType, value)
    write(updated)
  }
}
