package graft.llm

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** BPE training against an in-memory reference implementation: the
  * learned merge sequence, the final word segmentation, and the
  * serving-path encode must all match the classic algorithm with the
  * same (count desc, left asc, right asc) tie-break.
  */
class BpeTrainerSpec extends AnyFunSuite with SparkFixture with Matchers {

  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new",
    "wider wide new low")

  private def docsDf = {
    val s = spark
    import s.implicits._
    corpus.toDF("text")
  }

  /** Reference BPE: word-freq table, weighted pair counts, greedy
    * left-to-right merge, deterministic tie-break.
    */
  private def refTrain(numMerges: Int)
      : (Seq[(String, String)], Map[String, Seq[String]]) = {
    val freq = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    var toks: Map[String, Seq[String]] =
      freq.keys.map(w => w -> w.split("").toSeq).toMap
    def mergeOne(ts: Seq[String], l: String, r: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < ts.size) {
        if (i + 1 < ts.size && ts(i) == l && ts(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += ts(i); i += 1 }
      }
      out.result()
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = toks.toSeq.flatMap { case (w, ts) =>
        ts.zip(ts.drop(1)).map(p => p -> freq(w))
      }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += ((l, r))
        toks = toks.map { case (w, ts) => w -> mergeOne(ts, l, r) }
      }
      k += 1
    }
    (merges.result(), toks)
  }

  test("learned merge sequence matches the reference") {
    val (gotMerges, _) = BpeTrainer.train(docsDf, 6)
    val (wantMerges, _) = refTrain(6)
    gotMerges.map(m => (m.left, m.right)) shouldBe wantMerges
  }

  test("final word segmentation matches the reference") {
    val (_, words) = BpeTrainer.train(docsDf, 6)
    val (_, wantToks) = refTrain(6)
    val got = words.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    got.keySet shouldBe wantToks.keySet
    got.foreach { case (w, ts) => ts shouldBe wantToks(w) }
  }

  test("encode applies merges to new text in training order") {
    val s = spark
    import s.implicits._
    val (merges, _) = BpeTrainer.train(docsDf, 6)
    val (_, wantToks) = refTrain(6)
    val got = BpeTrainer
      .encode(Seq("low newest").toDF("text"), merges)
      .select("tokens").collect().head.getSeq[String](0)
    got shouldBe (wantToks("low") ++ wantToks("newest"))
  }

  test("encodeBulk equals the fold-form encode on trained merges") {
    val s = spark
    import s.implicits._
    val (merges, _) = BpeTrainer.train(docsDf, 8)
    val newText = Seq("low newest wider", "newer lowest wide low", "", "x")
      .toDF("text")
    val want = BpeTrainer.encode(newText, merges)
      .select("text", "tokens").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val got = BpeTrainer.encodeBulk(newText, merges)
      .select("text", "tokens").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    got shouldBe want
  }

  test("encodeBulk preserves the input columns and row count on the " +
      "corpus documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, _) = BpeTrainer.train(docs, 8)
    val out = BpeTrainer.encodeBulk(docs, merges)
    out.columns.toSeq shouldBe (docs.columns.toSeq :+ "tokens")
    out.count() shouldBe docs.count()
    // parity on real text too, not just the toy corpus
    val want = BpeTrainer.encode(docs, merges)
      .select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = out.select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got shouldBe want
  }

  test("encodeBulk runs at real-vocab scale (>= 1k merges) where the " +
      "fold form cannot plan") {
    val s = spark
    import s.implicits._
    // an 1100-entry ranking — far past the fold form's expression-
    // tree bound. Ranks 0 and 1 fire on this input ((a,b) then
    // (ab,ab), left-to-right non-overlapping → 300 "abab" tokens,
    // after which (abab,abab) is unranked and the loop stops); the
    // other 1098 entries exercise the broadcast-map scale.
    val word = "ab" * 600
    val chain = BpeTrainer.Merge("a", "b") +:
      (1 until 1100).map(i =>
        BpeTrainer.Merge("ab" * i, "ab")).toSeq
    val got = BpeTrainer
      .encodeBulk(Seq(word, "ab ab").toDF("text"), chain)
      .select("tokens").collect().map(_.getSeq[String](0))
    got(0) shouldBe Seq.fill(300)("abab")
    got(0).mkString("") shouldBe word
    got(1) shouldBe Seq("ab", "ab")
  }

  test("train stops early when no pairs remain") {
    val s = spark
    import s.implicits._
    val single = Seq("a b a").toDF("text")
    val (merges, words) = BpeTrainer.train(single, 5)
    merges shouldBe empty
    words.collect().map(_.getString(0)).toSet shouldBe Set("a", "b")
  }

  test("mergeExpr is the left-to-right non-overlapping scan") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq("a", "a", "a"), Seq("b", "a", "a", "b"))
      .toDF("tokens")
    val got = df.select(
      BpeTrainer.mergeExpr(org.apache.spark.sql.functions.col("tokens"),
        "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    got(0) shouldBe Seq("aa", "a")
    got(1) shouldBe Seq("b", "aa", "b")
  }
}
