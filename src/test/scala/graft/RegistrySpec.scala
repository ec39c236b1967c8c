package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry invariants: the driver contract keys on query NAME, so a
  * duplicate silently drops a query from `queries`/`oracleSql` maps —
  * catch it at test time instead.
  */
class RegistrySpec extends AnyFunSuite with Matchers {

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    dups shouldBe empty
  }

  test("every query name follows the qNN_slug convention") {
    SparkEntry.allQueries.map(_.name).foreach { n =>
      n should fullyMatch regex "q[0-9]{2,3}_[a-z0-9_]+"
    }
  }

  test("the flagship entry is a registered declared query") {
    SparkEntry.allQueries.exists(_.name == "q07_join_agg") shouldBe true
  }

  test("every declared query carries an oracle except the pinned " +
      "rows-only set") {
    // rows-only is a deliberate, documented exception (iterative
    // k-means training loops are not one SQL expression) — pin the
    // exact set so a forgotten oracle can't silently downgrade a new
    // query to the weaker rows-only check
    val rowsOnly = SparkEntry.allQueries
      .filter(_.oracle.isEmpty).map(_.name).toSet
    rowsOnly shouldBe Set("q309_pq_trained_recall",
      "q317_ivf_trained_cells", "q319_heldout_trained_cells",
      "q348_heldout_trained_pq")
  }

  test("README declared-query counts match the registry (no stale " +
      "prose)") {
    // the VERDICT r12/r13 finding: README's hand-written counts
    // drifted twice. Pin every "<N> declared queries" occurrence and
    // the "q01..qNNN" index range to the registry itself.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val declared = "(\\d+) declared queries".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    declared should not be empty
    all(declared) shouldBe SparkEntry.allQueries.size
    val maxIdx = SparkEntry.allQueries
      .map(_.name.drop(1).takeWhile(_.isDigit).toInt).max
    val range = "q01\\.\\.q(\\d+)".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    range should not be empty
    all(range) shouldBe maxIdx
  }
}
