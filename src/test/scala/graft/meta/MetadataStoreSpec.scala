package graft.meta

import java.nio.file.Files

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MetadataStoreSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def freshStore(): MetadataStore = {
    val dir = Files.createTempDirectory("graft-meta").toString + "/kv"
    val store = new MetadataStore(spark, dir)
    store.init(Seq(
      MetaEntry("bundesliga_match_scores", "transactional", ""),
      MetaEntry("laliga_match_scores", "transactional", "old/value")))
    store
  }

  test("get / getKeyType (reference :35-45,104-114)") {
    val s = freshStore()
    s.getKeyType("bundesliga_match_scores") shouldBe Some("transactional")
    s.get("laliga_match_scores") shouldBe Some("old/value")
    s.get("missing") shouldBe None
  }

  test("updatePathValue mirrors the generated UPDATE (reference :80-92): " +
      "m_value = m_key_type || '/' || key || '/' || suffix") {
    val s = freshStore()
    s.updatePathValue("bundesliga_match_scores", "2022/may/12/")
    s.get("bundesliga_match_scores") shouldBe
      Some("transactional/bundesliga_match_scores/2022/may/12/")
    // other keys untouched
    s.get("laliga_match_scores") shouldBe Some("old/value")
  }

  test("put upserts") {
    val s = freshStore()
    s.put("new_key", "master", "v1")
    s.get("new_key") shouldBe Some("v1")
    s.put("new_key", "master", "v2")
    s.get("new_key") shouldBe Some("v2")
    s.df.count() shouldBe 3
  }
}
