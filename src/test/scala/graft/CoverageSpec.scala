package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory consistency: the judge-facing SURVEY.md §2 checklist, the
  * declared runtime surface (`SparkEntry.queries`), and the oracle map must
  * stay in lock-step — a query added to the code but absent from SURVEY (or
  * vice versa) is a silent coverage hole no other gate sees.
  */
class CoverageSpec extends AnyFunSuite {

  private lazy val survey = scala.io.Source.fromFile("SURVEY.md")("UTF-8")
    .mkString

  // Every declared query is hash-gated since round 8: the three sketch
  // gates (r14b, l13b, r30) export exact-value + within-band verdict rows
  // instead of raw engine-specific estimates, so this set is empty and
  // must stay empty.
  private val rowsOnly = Set.empty[String]

  test("every declared query name appears in SURVEY.md") {
    // SURVEY §2.2 names the original surface by short row IDs (`| M1 |`,
    // `| R13b |`, `| SQL3 |`); later additions are named in full. Either
    // form counts as inventoried.
    def rowId(name: String): String = {
      val id = name.split("_").head           // "r13b", "mm1", "sql3"
      val alpha = id.takeWhile(_.isLetter)
      alpha.toUpperCase + id.drop(alpha.length)  // "R13b" keeps the suffix
    }
    val missing = SparkEntry.queries.keySet.filterNot { n =>
      survey.contains(n) || survey.contains(s"| ${rowId(n)} |")
    }
    assert(missing.isEmpty,
      s"queries with no SURVEY.md mention: ${missing.toSeq.sorted}")
  }

  test("every oracle key is a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("every query is hash-gated except the declared rows-only sketches") {
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unGated == rowsOnly,
      s"un-oracled queries beyond the declared rows-only set: " +
      s"${(unGated -- rowsOnly).toSeq.sorted}; " +
      s"rows-only entries that grew oracles: ${(rowsOnly -- unGated).toSeq.sorted}")
  }

  test("PlanAudit's default set only names declared queries") {
    val orphans = PlanAudit.defaultQueries -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"audited non-queries: ${orphans.toSeq.sorted}")
  }
}
