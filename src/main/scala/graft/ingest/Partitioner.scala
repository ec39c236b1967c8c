package graft.ingest

import java.time.LocalDate
import java.time.format.TextStyle
import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-based partition-path generation — the Spark-native form of the
  * reference's `Partitioner` (include/scripts/file_services/
  * partitioner.py:7-25; level config settings.txt:6-10): a 3-level
  * `<year>/<monthname-lowercase>/<day>/` suffix, from a given date or
  * from "now" when none is supplied (partitioner.py:19-22).
  *
  * Two forms:
  *  - driver-side [[suffix]] for path construction (metadata values),
  *  - column-form [[withPartitionColumns]] + [[writePartitioned]] for
  *    the distributed write: Hive-style `partitionBy` directories give
  *    Catalyst partition pruning for free on read — the 100 TB answer
  *    to the reference's per-batch S3 prefix copy.
  */
object Partitioner {

  /** `2022-05-12` → `2022/may/12/` (month spelled out, lowercase —
    * partitioner.py:14-15,19-20; numeric year/day via attribute access
    * :17,22).
    */
  def suffix(date: LocalDate): String = {
    val month = date.getMonth
      .getDisplayName(TextStyle.FULL, Locale.ENGLISH).toLowerCase
    s"${date.getYear}/$month/${date.getDayOfMonth}/"
  }

  /** No-date branch: use the current date (partitioner.py:19-22). */
  def suffixNow(): String = suffix(LocalDate.now())

  /** The same three levels as columns derived from a date column. */
  def partitionColumns(dateCol: Column): Seq[(String, Column)] = Seq(
    "p_year" -> year(dateCol),
    "p_month" -> lower(date_format(dateCol, "MMMM")),
    "p_day" -> dayofmonth(dateCol))

  def withPartitionColumns(df: DataFrame, dateCol: Column): DataFrame =
    partitionColumns(dateCol).foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }

  /** Partitioned parquet write (S3→S3 copy-into-partition analog,
    * dags/…scores.py:130-143). Shuffle-free: partition values derive
    * from each row, files land under year/month/day directories.
    */
  def writePartitioned(df: DataFrame, dateCol: Column, path: String): Unit =
    withPartitionColumns(df, dateCol)
      .write.mode("append")
      .partitionBy("p_year", "p_month", "p_day")
      .parquet(path)
}
