package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Lane-classification invariants: the build/serve split the bench
  * reports is only useful if it cannot silently drift — every query
  * whose timed body forces a rebuild must be tagged, and every tag
  * must name a real query.
  */
class LanesSpec extends AnyFunSuite with Matchers {

  test("every Lanes.build entry is a registered query") {
    val names = SparkEntry.allQueries.map(_.name).toSet
    Lanes.build.filterNot(names) shouldBe empty
  }

  test("every QueryDef whose body calls StoreCache.rebuild is " +
      "tagged build-lane (mechanical membership, grepped from " +
      "source)") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val rebuilds = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { f =>
        val noComments = java.nio.file.Files.readAllLines(f)
          .asScala.filterNot(_.trim.startsWith("//")).mkString("\n")
        "QueryDef\\(\\s*\\n?\\s*\"([a-z0-9_]+)\"".r
          .findAllMatchIn(noComments).map(_.group(1)).toSeq
          .zip("QueryDef\\(\\s*\\n?\\s*\"".r
            .split(noComments).drop(1).toSeq)
          .collect { case (name, body0)
            // the file's LAST body segment runs to EOF and would
            // swallow trailing private helpers (whose own rebuild
            // calls are charged to getOrBuild callers too) — cut
            // each segment at the first member definition
            if body0.split("\n  private def ").head
              .contains("StoreCache.rebuild") => name }
      }.toSet
    rebuilds.filterNot(Lanes.build) shouldBe empty
  }

  test("laneOf defaults to serve") {
    Lanes.laneOf("q01_scan_filter_project") shouldBe "serve"
    Lanes.laneOf("q357_zorder_compaction") shouldBe "build"
  }
}
