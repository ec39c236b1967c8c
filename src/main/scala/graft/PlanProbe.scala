package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.allQueries.find(_.name == args(0)).get
    q.run(spark, "/root/testdata/sf0.01").explain("formatted")
    spark.stop()
  }
}
