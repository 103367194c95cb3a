package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contract between the blueprint and the code: SURVEY.md §2.2's
  * declared-query table rows (`| `query_id` | …`) must be EXACTLY the
  * keys of SparkEntry.queries, and every oracle key must name a declared
  * query. A query added to one side but not the other — the drift this
  * suite exists to catch — would either overstate coverage in the doc or
  * ship an undocumented operator. */
class InventorySpec extends AnyFunSuite {

  private lazy val surveyIds: Set[String] = {
    val src = scala.io.Source.fromFile("SURVEY.md")(scala.io.Codec.UTF8)
    try src.getLines()
      .flatMap("""^\| `([a-z0-9_]+)`""".r.findFirstMatchIn(_))
      .map(_.group(1)).toSet
    finally src.close()
  }

  test("SURVEY.md §2.2 inventory equals SparkEntry.queries exactly") {
    val declared = SparkEntry.queries.keySet
    val docOnly = surveyIds -- declared
    val codeOnly = declared -- surveyIds
    assert(docOnly.isEmpty, s"in SURVEY.md but not implemented: $docOnly")
    assert(codeOnly.isEmpty, s"implemented but missing from SURVEY.md: $codeOnly")
  }

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for undeclared queries: $orphans")
  }
}
