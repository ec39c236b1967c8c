package graft.streaming

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StatefulOpsSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("mapGroupsWithState running stats converge to the batch totals") {
    val batch = Tables.events(spark, sfDir).select("ts", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    batch.write.mode("overwrite").parquet(dir)

    val streamed = StatefulOps.runningUserStats(spark,
      EventStream.fileStream(spark, dir, batch.schema))
    val q = streamed.writeStream.format("memory").queryName("user_stats")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // last update per user must equal the batch aggregate
    val finalStats = spark.table("user_stats")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val expected = batch.groupBy("user_id").count()
    finalStats.join(expected, "user_id")
      .filter(col("n_events") =!= col("count"))
      .count() shouldBe 0
  }

  test("flatMapGroupsWithState sessionizer emits exactly the closed " +
      "sessions") {
    val batch = Tables.events(spark, sfDir).select("user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    // one file -> one micro-batch, so event-time order within the
    // batch is what the operator sorts, not arrival order
    batch.coalesce(1).write.mode("overwrite").parquet(dir)

    val streamed = StatefulOps.sessionizeFlat(spark,
      EventStream.fileStream(spark, dir, batch.schema), gapMinutes = 5)
    val q = streamed.writeStream.format("memory").queryName("sess_flat")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sess_flat").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3))).toSet

    // batch truth: session_window sessions minus each user's LAST
    // session (still open in state, so the stream never emits it)
    val sessions = batch
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), min("ts").as("start_ts"),
        max("ts").as("end_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("start_ts").desc)
    val expected = sessions
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"),
        r.getAs[java.sql.Timestamp]("start_ts"),
        r.getAs[java.sql.Timestamp]("end_ts"))).toSet

    got shouldBe expected
    got should not be empty
  }

  test("dropDuplicatesWithinWatermark removes re-sent events") {
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    // write the data twice — simulated at-least-once duplicate delivery
    batch.write.mode("overwrite").parquet(dir)
    batch.write.mode("append").parquet(dir)
    spark.read.parquet(dir).count() shouldBe batch.count() * 2

    val streamed = StatefulOps.dedupByKey(
      EventStream.fileStream(spark, dir, batch.schema), "1 hour")
    val q = streamed.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table("dedup_out").count() shouldBe batch.count()
  }

  test("dedup watermark semantics: in-window duplicates removed, late " +
      "duplicates dropped, evicted keys re-admitted after the window") {
    val s = spark
    import s.implicits._
    def ts(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
    val schema = Seq((1L, ts("00:00"))).toDF("event_id", "ts").schema
    val inDir = java.nio.file.Files.createTempDirectory("graft-ddl-in")
      .toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-ddl-out")
      .toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ddl-ck")
      .toString
    def runOnce(): Unit = {
      val q = StatefulOps.dedupByKey(
          EventStream.fileStream(spark, inDir, schema), "10 minutes")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
    }
    def landed(): Set[(Long, java.sql.Timestamp)] =
      spark.read.schema(schema).parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet

    // run 1: an in-batch duplicate of key 1 is removed; 12:00 advances
    // the watermark to 11:50, evicting key state last seen before then
    Seq((1L, ts("10:00")), (2L, ts("10:01")), (1L, ts("10:02")),
      (3L, ts("12:00")))
      .toDF("event_id", "ts").coalesce(1).write.mode("append")
      .parquet(inDir)
    runOnce()
    landed() shouldBe Set((1L, ts("10:00")), (2L, ts("10:01")),
      (3L, ts("12:00")))

    // run 2 (watermark 11:50 restored from the checkpoint):
    //  (1, 10:05) re-sent BEHIND the watermark → dropped as late (not
    //             double-emitted);
    //  (1, 12:30) same key with a fresh in-window timestamp → key 1's
    //             state was evicted, so it is re-admitted — the
    //             documented bounded-state trade of
    //             dropDuplicatesWithinWatermark
    Seq((1L, ts("10:05")), (1L, ts("12:30")))
      .toDF("event_id", "ts").coalesce(1).write.mode("append")
      .parquet(inDir)
    runOnce()
    landed() shouldBe Set((1L, ts("10:00")), (2L, ts("10:01")),
      (3L, ts("12:00")), (1L, ts("12:30")))
  }

  // The same watermarked-dedup recovery scenario, parameterized over
  // the two state-store providers that matter operationally: the
  // default HDFS-backed in-memory map and RocksDB (the provider a
  // 100 TB deployment runs, where keyed state outgrows executor
  // heap). Recovery semantics — watermark restored from the
  // checkpoint, late re-sends dropped, evicted keys re-admitted —
  // must be IDENTICAL under both; the provider only changes where
  // state lives.
  for (provider <- Seq(
      ("hdfs", "org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider"),
      ("rocksdb", "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")))
    test(s"dedup recovery across restart under the ${provider._1} " +
        "state store provider") {
      val s = spark
      import s.implicits._
      def ts(hhmm: String) =
        java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
      val schema = Seq((1L, ts("00:00"))).toDF("event_id", "ts").schema
      val inDir = java.nio.file.Files
        .createTempDirectory(s"graft-ssp-in-${provider._1}").toString
      val outDir = java.nio.file.Files
        .createTempDirectory(s"graft-ssp-out-${provider._1}")
        .toString + "/out"
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-ssp-ck-${provider._1}").toString
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val before = spark.conf.getOption(confKey)
      spark.conf.set(confKey, provider._2)
      try {
        def runOnce(): Unit = {
          val q = StatefulOps.dedupByKey(
              EventStream.fileStream(spark, inDir, schema),
              "10 minutes")
            .writeStream.format("parquet").option("path", outDir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination(120000L)
        }
        def landed(): Set[(Long, java.sql.Timestamp)] =
          spark.read.schema(schema).parquet(outDir).collect()
            .map(r => (r.getLong(0), r.getTimestamp(1))).toSet

        Seq((1L, ts("10:00")), (2L, ts("10:01")), (1L, ts("10:02")),
          (3L, ts("12:00")))
          .toDF("event_id", "ts").coalesce(1).write.mode("append")
          .parquet(inDir)
        runOnce()
        landed() shouldBe Set((1L, ts("10:00")), (2L, ts("10:01")),
          (3L, ts("12:00")))

        // restart against the same checkpoint: watermark 11:50 must
        // be restored by THIS provider's recovery path
        Seq((1L, ts("10:05")), (1L, ts("12:30")))
          .toDF("event_id", "ts").coalesce(1).write.mode("append")
          .parquet(inDir)
        runOnce()
        landed() shouldBe Set((1L, ts("10:00")), (2L, ts("10:01")),
          (3L, ts("12:00")), (1L, ts("12:30")))
      } finally {
        before match {
          case Some(v) => spark.conf.set(confKey, v)
          case None => spark.conf.unset(confKey)
        }
      }
    }

  test("check report sink writes a readable JSON report") {
    import graft.check._
    val df = Tables.orders(spark, sfDir)
    val results = CheckRunner.run(df,
      Seq(NotNull("o_orderdate"), InSet("o_orderstatus", Seq("F", "O"))))
    val path = java.nio.file.Files.createTempDirectory("graft-report")
      .toString + "/report"
    CheckRunner.writeReport(spark, results, path)
    val back = spark.read.json(path)
    back.count() shouldBe 2
    back.filter(col("check") === "inset_o_orderstatus")
      .head().getAs[Long]("violations") should be > 0L // 'P' rows
  }

  test("streaming CDC compaction converges to the q167 batch result " +
      "across micro-batch splits") {
    val batch = Tables.events(spark, sfDir)
      .select("ts", "user_id", "event_type", "value", "event_id")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    // several files → several potential micro-batches; arrival order
    // (file order) deliberately differs from version order
    batch.orderBy(col("event_id").desc).repartition(4)
      .write.mode("overwrite").parquet(dir)

    val streamed = StatefulOps.cdcLatestState(spark,
      EventStream.fileStream(spark, dir, batch.schema))
    val q = streamed.writeStream.format("memory").queryName("cdc_state")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // last update per key = the row carrying the full change count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_changes").desc)
    val finalState = spark.table("cdc_state")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("deleted"))
      .select(col("user_id"), col("state"), col("last_value"),
        unix_micros(col("updated_at")).as("upd_us"), col("n_changes"))

    val expected = graft.SparkEntry.allQueries
      .find(_.name == "q167_cdc_compact").get.run(spark, sfDir)
      .select(col("user_id"), col("state"), col("last_value"),
        unix_micros(col("updated_at")).as("upd_us"), col("n_changes"))

    val got = finalState.collect().map(_.toSeq).toSet
    val want = expected.collect().map(_.toSeq).toSet
    got shouldBe want
    want should not be empty
  }
}
