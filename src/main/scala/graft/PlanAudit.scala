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
    // Internal build-path frames: the expensive pass of an index/store
    // BUILD lives inside a write job, not in the declared query's
    // returned DataFrame — these pseudo-names expose those frames so
    // their plans can be audited like any query's.
    val internal: Map[String, SparkSession => org.apache.spark.sql.DataFrame] = Map(
      "winnow_fingerprints" -> (s =>
        graft.operators.Winnowing.fingerprints(
          graft.Tables.documents(s, sfDir))),
      "bm25_index_postings" -> (s =>
        graft.llm.Bm25.index(graft.Tables.documents(s, sfDir)).postings),
      "dupspan_duplicated_positions" -> (s =>
        graft.llm.DuplicateSpans.duplicatedPositions(
          graft.Tables.documents(s, sfDir), 12)))
    args.foreach { name =>
      println(s"======== $name ========")
      internal.get(name) match {
        case Some(f) => f(spark).explain("formatted")
        case None =>
          SparkEntry.allQueries.find(_.name == name).get.run(spark, sfDir)
            .explain("formatted")
      }
    }
    spark.stop()
  }
}
