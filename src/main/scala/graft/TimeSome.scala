package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state timing of a subset of declared queries
  * (`runMain graft.TimeSome q31_ngram_jaccard …`) through the same
  * noop sink as Bench — the focused loop for perf work without
  * re-running all workloads. Round 0 warms codegen/JIT; round 1 is
  * reported.
  */
object TimeSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.allQueries.filter(q => args.contains(q.name))
    for (round <- 0 to 1; q <- qs) {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (round == 1) println(f"TIME ${q.name} $dt%.2f")
    }
    spark.stop()
  }
}
