package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.5 is the judged operator inventory; the registry is the
  * implemented one. VERDICT r9 (missing #2) found them drifting — ~29
  * entries were implemented and green but never added to the survey — so
  * this spec pins them 1:1: every registered query name must appear
  * backtick-cited in SURVEY.md, and every backtick-cited name shaped
  * like a registry entry must be registered (no dangling citations).
  */
class SurveySyncSpec extends AnyFunSuite {

  private lazy val survey: String = java.nio.file.Files.readString(
    Bench.repoRoot.resolve("SURVEY.md"))

  test("every registry entry is cited in SURVEY.md") {
    val missing = SparkEntry.queries.keySet
      .filterNot(n => survey.contains("`" + n + "`"))
    assert(missing.isEmpty,
      s"registry entries not cited in SURVEY.md (add a §2.5 row): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("README.md's query count matches the live registry (r10 VERDICT: count drifted)") {
    val readme = java.nio.file.Files.readString(
      Bench.repoRoot.resolve("README.md"))
    val counts = "\\((\\d+) (?:named|queries)\\)".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty, "README.md no longer states the query count")
    val live = SparkEntry.queries.size
    assert(counts.forall(_ == live),
      s"README.md says ${counts.mkString("/")} but the registry has $live " +
        "entries — update README.md's counts")
  }

  test("every SURVEY-cited query name exists in the registry (no dangling citations)") {
    // Registry names have the shape <family><num>[letter]_<slug>: a
    // backticked token matching it that is NOT registered is a survey row
    // pointing at nothing (renamed or deleted entry).
    val cited = "`([a-z]{1,2}[0-9]+[a-z]?_[a-z0-9_]+)`".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    val dangling = cited.diff(SparkEntry.queries.keySet)
    assert(dangling.isEmpty,
      s"SURVEY.md cites query names with no registry entry: " +
        dangling.toSeq.sorted.mkString(", "))
  }
}
