package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** BM25 against an in-memory reference scorer: index shape, textbook
  * double-path scores (exact per-(query,doc) comparison within float
  * tolerance), and the transcendental-free core's ranking contract.
  */
class Bm25Spec extends AnyFunSuite with SparkFixture with Matchers {

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the log",
    3L -> "cats and dogs and cats",
    4L -> "a cat a dog a mat a log",
    5L -> "quantum flux capacitor cat",
    6L -> "the the the the the the the the"
  )

  private def docsDf = {
    val s = spark
    import s.implicits._
    corpus.toDF("doc_id", "text")
  }

  private def queriesDf(qs: Seq[(Long, Seq[String])]) = {
    val s = spark
    import s.implicits._
    qs.toDF("query_id", "terms")
  }

  /** In-memory textbook BM25 (same Lucene idf as Bm25.search). */
  private def refScores(k1: Double, b: Double,
      terms: Seq[String]): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    val df = terms.map { t =>
      t -> toks.count(_._2.contains(t)).toDouble
    }.toMap
    toks.map { case (id, ws) =>
      val dl = ws.size.toDouble
      id -> terms.distinct.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          idf * (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * dl / avgdl))
        }
      }.sum
    }.filter(_._2 > 0).toMap
  }

  test("index builds whitespace postings and doc lengths") {
    val idx = Bm25.index(docsDf)
    val post = idx.postings.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    post(("cat", 1L)) shouldBe 1L
    post(("the", 6L)) shouldBe 8L
    post(("cats", 3L)) shouldBe 2L
    post.get(("dog", 1L)) shouldBe None
    val dls = idx.docLens.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    dls(1L) shouldBe 6L
    dls(6L) shouldBe 8L
  }

  test("search matches the in-memory textbook BM25 reference") {
    val idx = Bm25.index(docsDf)
    val terms = Seq("cat", "mat")
    val got = Bm25.search(idx, queriesDf(Seq(7L -> terms)), topK = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val want = refScores(1.2, 0.75, terms)
    got.keySet shouldBe want.keySet
    got.foreach { case (id, s) => s shouldBe want(id) +- 1e-9 }
  }

  test("search ranks score desc with doc_id tiebreak and honors topK") {
    val idx = Bm25.index(docsDf)
    val rows = Bm25.search(idx, queriesDf(Seq(7L -> Seq("cat"))), topK = 2)
      .collect()
    rows.length shouldBe 2
    val scores = rows.map(_.getDouble(2))
    scores.sliding(2).foreach { w =>
      if (w.length == 2) w(0) should be >= w(1)
    }
  }

  test("duplicate query terms score once (terms are deduped)") {
    val idx = Bm25.index(docsDf)
    val once = Bm25.search(idx, queriesDf(Seq(7L -> Seq("cat"))), 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val twice = Bm25.search(idx,
      queriesDf(Seq(7L -> Seq("cat", "cat"))), 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    twice shouldBe once
  }

  test("searchCore ranks single-term queries exactly like log BM25") {
    // Per term both scorers are idf(t) · sat(tf, dl) with idf constant
    // within the term, so single-term rankings must coincide exactly
    // (multi-term SUMS can legitimately differ: the integer idf
    // compresses rare-vs-common trade-offs relative to ln).
    val idx = Bm25.index(docsDf)
    for (t <- Seq("cat", "the", "log")) {
      val q = queriesDf(Seq(9L -> Seq(t)))
      val logRank = Bm25.search(idx, q, 10).collect().map(_.getLong(1))
      val coreRank = Bm25.searchCore(idx, q, 10).collect()
        .map(_.getLong(1))
      coreRank shouldBe logRank
    }
  }

  test("write/read round-trips the index; stored search = inline search") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-idx").toString + "/idx"
    val idx = Bm25.index(docsDf)
    Bm25.writeIndex(idx, dir, numBuckets = 8)
    val stored = Bm25.readIndex(spark, dir)
    val q = queriesDf(Seq(7L -> Seq("cat", "mat")))
    val inline = Bm25.search(idx, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fromDisk = Bm25.search(stored, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    fromDisk shouldBe inline
  }

  test("probeIndex prunes to the probed terms' buckets, same rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-probe").toString + "/idx"
    Bm25.writeIndex(Bm25.index(docsDf), dir, numBuckets = 8)
    val got = Bm25.probeIndex(spark, dir, Seq("cat", "quantum"), 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = Bm25.index(docsDf).postings
      .filter(org.apache.spark.sql.functions.col("term")
        .isin("cat", "quantum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    got shouldBe want
    // pruning really happened: the bucket predicate must surface as a
    // PARTITION filter on the scan (pruned before IO), not a post-scan
    // data filter
    val probed = Bm25.probeIndex(spark, dir, Seq("cat", "quantum"), 8)
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .head.toString
    scan should include("PartitionFilters")
    scan should include("bucket")
    val pf = scan.substring(scan.indexOf("PartitionFilters"))
    pf.substring(0, math.min(pf.length, 200)) should include("bucket")
  }

  test("searchCoreStored (pruned read) equals the inline searchCore") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-stored").toString + "/idx"
    val idx = Bm25.index(docsDf)
    Bm25.writeIndex(idx, dir, numBuckets = 8)
    val q = queriesDf(Seq(7L -> Seq("cat", "mat"), 8L -> Seq("dog")))
    val inline = Bm25.searchCore(idx, q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val stored = Bm25.searchCoreStored(spark, dir, q, 10, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    stored shouldBe inline
  }

  test("scoreCoreStored (pruned read) equals the inline scoreCore") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-scored").toString + "/idx"
    val idx = Bm25.index(docsDf)
    Bm25.writeIndex(idx, dir, numBuckets = 8)
    val q = queriesDf(Seq(7L -> Seq("cat", "mat"), 8L -> Seq("dog")))
    val inline = Bm25.scoreCore(idx, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val stored = Bm25.scoreCoreStored(spark, dir, q, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    stored shouldBe inline
  }

  test("mergeIndex on a new batch equals a full rebuild") {
    val s = spark
    import s.implicits._
    val oldDocs = corpus.take(4).toDF("doc_id", "text")
    val newDocs = corpus.drop(4).toDF("doc_id", "text")
    val merged = Bm25.mergeIndex(Bm25.index(oldDocs), newDocs)
    val full = Bm25.index(docsDf)
    merged.postings.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet shouldBe
      full.postings.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    merged.docLens.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      full.docLens.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // and the merged index serves identically
    val q = queriesDf(Seq(7L -> Seq("cat")))
    Bm25.search(merged, q, 10).collect().map(_.getLong(1)) shouldBe
      Bm25.search(full, q, 10).collect().map(_.getLong(1))
  }

  test("searchCore's integer ratio equals the k1=1.2 b=0.75 saturation") {
    val idx = Bm25.index(docsDf)
    // Single-term query on a unique term: core score = (N - df + 1) *
    // sat(tf, dl) with the reference double saturation, rounded to 2
    // decimals by the Exact.dsum contract.
    val got = Bm25.searchCore(idx,
      queriesDf(Seq(9L -> Seq("quantum"))), 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val n = corpus.size.toDouble
    val avgdl = corpus.map(_._2.split(" ").length).sum / n
    val dl = 4.0
    val sat = (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val want = BigDecimal((n - 1 + 1) * sat)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.keySet shouldBe Set(5L)
    got(5L) shouldBe want +- 0.011
  }
}
