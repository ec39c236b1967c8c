package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries
  * (`runMain graft.PlanProbe q07_join_agg …`) — the audit loop for
  * PushedFilters / broadcast-vs-shuffle / WholeStageCodegen spans
  * that the scale notes in each query's Scaladoc claim.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- args) {
      println(s"==== $n ====")
      SparkEntry.allQueries.find(_.name == n).get.run(spark, d)
        .explain("formatted")
    }
    spark.stop()
  }
}
