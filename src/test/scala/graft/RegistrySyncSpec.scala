package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the judge's coverage checklist; SparkEntry.queries
  * is the driver's gate. This spec pins them to each other so a new
  * registration without a survey row (or a stale survey row without
  * code) fails CI-style instead of surfacing as drift in a verdict. */
class RegistrySyncSpec extends AnyFunSuite {

  private def surveyKeys: Set[String] = {
    val path = Seq("SURVEY.md", "../SURVEY.md")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
      .getOrElse(fail("SURVEY.md not found from test working directory"))
    val text = java.nio.file.Files.readString(path)
    // §2 table rows look like: | `q_foo` | description | ✓ | done |
    "(?m)^\\| `(q[0-9a-z_]+)` \\|".r.findAllMatchIn(text).map(_.group(1)).toSet
  }

  test("every registered query has a SURVEY §2 row") {
    val missing = SparkEntry.queries.keySet -- surveyKeys
    assert(missing.isEmpty,
      s"registered but not in SURVEY §2: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every SURVEY §2 query row is registered") {
    val stale = surveyKeys -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"in SURVEY §2 but not registered: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle key refers to a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracle without query: ${dangling.toSeq.sorted.mkString(", ")}")
  }
}
