package graft.streaming

import graft.SparkFixture
import graft.operators.VersionedStore
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming-epoch idempotence is scoped by (queryId, epochId), the
  * public delta (txnAppId, txnVersion) pair — NOT by the bare epoch
  * id: two queries writing to one table, or one pipeline restarted
  * under a FRESH checkpoint (whose epoch ids restart at 0), must
  * commit their own epochs instead of silently no-op'ing against
  * another writer's tags (the r18 data-loss finding). Replays of the
  * SAME (queryId, epochId) stay no-ops.
  */
class StreamEpochScopeSpec extends AnyFunSuite with SparkFixture
    with Matchers {

  private def stage(p: String, rows: Seq[(Long, String)],
      tag: String): Seq[String] = {
    val s = spark
    import s.implicits._
    val f = new org.apache.hadoop.fs.Path(p).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dir = s"$p/data/.stream-stage/$tag"
    f.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft-scope-$tag").toString
    rows.toDF("id", "body").coalesce(1).write
      .mode("overwrite").parquet(tmp)
    val src = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = s"$dir/${src.getName}"
    f.rename(new org.apache.hadoop.fs.Path(src.toString),
      new org.apache.hadoop.fs.Path(dst))
    Seq(dst)
  }

  test("colliding epoch ids from two queries BOTH commit; a replay " +
      "of the same (queryId, epoch) is a no-op; an unscoped batch " +
      "txn never collides with a scoped one") {
    val s = spark
    import s.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-scope").toString + "/t"
    VersionedStore.create(spark, p)
    VersionedStore.append(Seq((0L, "seed")).toDF("id", "body"), p)

    // query A commits epoch 0
    val vA = VersionedStore.adoptStreamEpoch(spark, p,
      stage(p, Seq((1L, "a0")), "qa-0"), txn = 0L, app = "query-A")
    // query B (fresh checkpoint / second pipeline) ALSO at epoch 0:
    // before the scoping fix this silently no-op'ed = data loss
    val vB = VersionedStore.adoptStreamEpoch(spark, p,
      stage(p, Seq((2L, "b0")), "qb-0"), txn = 0L, app = "query-B")
    vB should be > vA
    VersionedStore.read(spark, p).count() shouldBe 3L

    // a replay of query A's epoch 0 IS a no-op at the original
    // version — the staged litter is never adopted
    val vReplay = VersionedStore.adoptStreamEpoch(spark, p,
      stage(p, Seq((1L, "a0")), "qa-0r"), txn = 0L, app = "query-A")
    vReplay shouldBe vA
    VersionedStore.read(spark, p).count() shouldBe 3L

    // an UNSCOPED idempotent batch append with the same txn number
    // is a different scope — it commits, and replays no-op in its
    // own scope only
    val vBatch = VersionedStore.appendIdempotent(
      Seq((3L, "c0")).toDF("id", "body"), p, txn = 0L)
    vBatch should be > vB
    VersionedStore.appendIdempotent(
      Seq((3L, "c0")).toDF("id", "body"), p, txn = 0L) shouldBe vBatch
    VersionedStore.read(spark, p).count() shouldBe 4L
    VersionedStore.hasTxn(spark, p, 0L) shouldBe true
    VersionedStore.hasTxn(spark, p, 0L,
      Some("query-A")) shouldBe true
    VersionedStore.hasTxn(spark, p, 0L,
      Some("query-C")) shouldBe false
  }

  test("end-to-end: the same source re-streamed under a FRESH " +
      "checkpoint lands again (epoch ids reset, different queryId) " +
      "— no silent loss; re-running the SAME checkpoint stays " +
      "exactly-once") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft-scope-wh").toString
    spark.conf.set("spark.sql.catalog.scwh",
      "graft.sources.GraftStoreCatalog")
    spark.conf.set("spark.sql.catalog.scwh.root", wh)
    spark.sql("CREATE TABLE scwh.t (id BIGINT, body STRING) " +
      "USING `graft-store`")
    val in = java.nio.file.Files
      .createTempDirectory("graft-scope-in").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "body")
      .coalesce(1).write.mode("append").parquet(in)
    def run(ck: String): Unit = {
      val q = spark.readStream.schema("id BIGINT, body STRING")
        .parquet(in)
        .writeStream.option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger
          .AvailableNow())
        .toTable("scwh.t")
      q.awaitTermination(60000) shouldBe true
    }
    val ck1 = java.nio.file.Files
      .createTempDirectory("graft-scope-ck1").toString
    run(ck1)
    spark.table("scwh.t").count() shouldBe 2L
    run(ck1) // same checkpoint: nothing new, nothing committed
    spark.table("scwh.t").count() shouldBe 2L
    // FRESH checkpoint: epoch ids restart at 0 under a NEW queryId —
    // the batch re-processes and must LAND (pre-fix: silent no-op)
    val ck2 = java.nio.file.Files
      .createTempDirectory("graft-scope-ck2").toString
    run(ck2)
    spark.table("scwh.t").count() shouldBe 4L
  }
}
