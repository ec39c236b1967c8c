package graft

import org.apache.spark.sql.SparkSession

/** One-off plan auditor: prints the formatted physical plan of named
  * queries so scan pushdown / join strategy / codegen spans can be
  * eyeballed (builder prompt: iterate until it's the plan you'd want).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"======== $name ========")
      SparkEntry.allQueries.find(_.name == name).get.run(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
