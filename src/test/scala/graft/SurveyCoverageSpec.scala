package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage contract the build is judged against:
  * every oracle-gated query key must have its own checklist line, so
  * a query can never ship undocumented again (the round-7
  * t15_dataset_card gap). Pure file+registry check, no Spark
  * session. */
class SurveyCoverageSpec extends AnyFunSuite {

  test("every SparkEntry.queries key has a SURVEY §2 checklist line") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s2 = survey.substring(survey.indexOf("## §2"), survey.indexOf("## §3"))
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => s2.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"oracle query keys missing a SURVEY §2 line: ${missing.mkString(", ")}")
  }

  test("every queries key has an oracleSql entry (no silent rows-only checks)") {
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.oracleSql.contains)
    assert(missing.isEmpty,
      s"query keys without an oracle: ${missing.mkString(", ")}")
  }
}
