package graft.meta

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftConfigSpec extends AnyFunSuite with Matchers {

  test("defaults mirror the reference settings.txt") {
    val c = GraftConfig.load(None, Map.empty)
    c.entities should have length 5
    c.entities.head shouldBe "bundesliga_match_scores"
    c.delimiter shouldBe ","
    c.filePartitionLevels shouldBe 3
  }

  test("properties file overrides defaults") {
    val p = Files.createTempFile("graft", ".properties")
    Files.write(p, "entities=a,b\ndelimiter=;\n".getBytes)
    val c = GraftConfig.load(Some(p.toString), Map.empty)
    c.entities shouldBe Seq("a", "b")
    c.delimiter shouldBe ";"
    c.filePartitionLevels shouldBe 3 // untouched key keeps default
  }

  test("environment overrides properties (pydantic env-first)") {
    val p = Files.createTempFile("graft", ".properties")
    Files.write(p, "raw_root=from_file\n".getBytes)
    val c = GraftConfig.load(Some(p.toString),
      Map("GRAFT_RAW_ROOT" -> "from_env", "GRAFT_FILE_PARTITION_LEVELS" -> "2"))
    c.rawRoot shouldBe "from_env"
    c.filePartitionLevels shouldBe 2
  }
}
