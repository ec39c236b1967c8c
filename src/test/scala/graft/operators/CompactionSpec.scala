package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CompactionSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile).toSeq

  test("compaction collapses a many-small-files directory, " +
      "preserving rows and tightening sort-key file bounds") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
    val in = s"$tmp/in"
    val out = s"$tmp/out"

    // 64 shuffled micro-files
    (1 to 20000).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v")
      .orderBy(md5(col("k").cast("string"))) // scatter keys across files
      .repartition(64)
      .write.parquet(in)
    parquetFiles(in).size shouldBe 64

    val totalBytes = Compaction.dataBytes(s, in)
    val target = totalBytes / 4 // aim for ~4 files
    val n = Compaction.compact(s, in, out, target, sortCols = Seq("k"))

    n shouldBe math.ceil(totalBytes.toDouble / target).toInt
    parquetFiles(out).size shouldBe n
    s.read.parquet(out).count() shouldBe 20000L

    // range-partitioned + sorted on k: per-file [min,max] spans must
    // be (near-)disjoint — total span coverage ~ keyspace, vs 64
    // shuffled input files that each span the whole keyspace
    val spans = parquetFiles(out).map { f =>
      val df = s.read.parquet(f.getAbsolutePath)
        .agg(min("k"), max("k")).collect()(0)
      (df.getLong(0), df.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => lo2 should be > hi
      case _ => ()
    }
  }

  test("compact without sort columns still hits the file-count target") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact2")
    val in = s"$tmp/in"
    val out = s"$tmp/out"
    (1 to 1000).toDF("x").repartition(16).write.parquet(in)
    val bytes = Compaction.dataBytes(s, in)
    Compaction.compact(s, in, out, bytes * 2) shouldBe 1
    parquetFiles(out).size shouldBe 1
    s.read.parquet(out).agg(sum("x")).collect()(0).getLong(0) shouldBe
      (1000L * 1001 / 2)
  }
}
