package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Polling file sensor — the Spark-native form of the reference's
  * `S3KeySensor` (dags/ingest_bundesliga_match_scores.py:54-67):
  * wildcard match over a landing prefix, fixed poke interval, overall
  * timeout, bounded retries, and soft-fail (sensor timeout is not an
  * error — the DAG simply doesn't progress; `soft_fail=True`, line 62).
  *
  * The reference's `mode='reschedule'` (free the worker slot between
  * pokes) has no analog in a driver program — the driver just sleeps;
  * for continuous arrival the Structured Streaming path
  * (graft.streaming.EventStream.fileStream) replaces polling entirely.
  */
object FileSensor {

  final case class SensorConfig(
      pokeIntervalMs: Long = 30000L, // poke_interval=30 (line 64)
      timeoutMs: Long = 180000L,     // timeout=180 (line 63)
      retries: Int = 2,              // retries=2 (line 66)
      softFail: Boolean = true)      // soft_fail=True (line 62)

  /** Poll `globPattern` until ≥1 path matches; returns matches, or
    * empty on soft-fail timeout. Throws on hard-fail timeout after
    * exhausting retries.
    */
  def await(spark: SparkSession, globPattern: String,
      conf: SensorConfig = SensorConfig()): Seq[String] = {
    val path = new Path(globPattern)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def poll(): Seq[String] = {
      val deadline = System.nanoTime() + conf.timeoutMs * 1000000L
      var matches = Seq.empty[String]
      var done = false
      while (!done) {
        val st = Option(fs.globStatus(path)).getOrElse(Array.empty)
        if (st.nonEmpty) { matches = st.map(_.getPath.toString).toSeq; done = true }
        else if (System.nanoTime() > deadline) done = true
        else Thread.sleep(conf.pokeIntervalMs)
      }
      matches
    }

    var attempt = 0
    var result = Seq.empty[String]
    while (result.isEmpty && attempt <= conf.retries) {
      result = poll()
      attempt += 1
    }
    if (result.isEmpty && !conf.softFail)
      throw new java.util.concurrent.TimeoutException(
        s"no files matched $globPattern after ${conf.retries + 1} attempts")
    result
  }
}
