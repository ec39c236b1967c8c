package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: smoke-check the driver's flagship contract —
  * `SparkEntry.entry` must return >0 rows on sf0.001
  * (`runMain graft.EntryProbe`).
  */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
