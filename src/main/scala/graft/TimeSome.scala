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
    // Bench methodology in miniature: round 0 warms codegen/JIT and
    // pays StoreCache builds; rounds 1-2 are timed and the per-query
    // MIN is reported (single warm runs spike 2-6× on random JIT/GC
    // pauses — the min of two is the steady state, as in Bench).
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (round <- 0 to 2; q <- qs) {
      // Bench's settle(): without it, garbage from a prior query's
      // pass (decimal folds, broadcast builds) storms a random later
      // query's GC and poisons the comparison.
      if (qs.headOption.contains(q)) { System.gc(); Thread.sleep(2000) }
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (round >= 1)
        best(q.name) = math.min(best.getOrElse(q.name, dt), dt)
    }
    qs.foreach(q => println(f"TIME ${q.name} ${best(q.name)}%.2f"))
    spark.stop()
  }
}
