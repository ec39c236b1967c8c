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
}
