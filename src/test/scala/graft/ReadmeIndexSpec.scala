package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r04 item 8: the README query cross-index must stay true as
  * the registry grows. The table is generated (tools/readme_index.py);
  * this suite fails the build whenever it drifts from the live
  * registry — missing/extra queries, stale file:line anchors, or a
  * wrong oracle column. */
class ReadmeIndexSpec extends AnyFunSuite {
  private val root = java.nio.file.Paths.get(".").toAbsolutePath

  private lazy val tableRows: Seq[(String, String, String, String)] = {
    val text = new String(java.nio.file.Files.readAllBytes(root.resolve("README.md")), "UTF-8")
    val begin = text.indexOf("QUERY_INDEX_BEGIN")
    val end = text.indexOf("QUERY_INDEX_END")
    assert(begin >= 0 && end > begin, "README.md lacks the QUERY_INDEX markers")
    text.substring(begin, end).linesIterator
      .filter(l => l.startsWith("| ") && l.contains("`"))
      .filterNot(_.startsWith("| survey row"))
      .map { l =>
        val c = l.split("\\|").map(_.trim)
        // | tag | `name` | oracle | `file:line` | specs |
        (c(1), c(2).stripPrefix("`").stripSuffix("`"), c(3),
          c(4).stripPrefix("`").stripSuffix("`"))
      }.toSeq
  }

  // VERDICT r05 item 1: a duplicate name silently shadows a query in the
  // name-keyed `queries` map (last wins). SparkEntry.all `require`s
  // uniqueness at construction; this test inspects the RAW pre-require
  // registry (ADVICE r07: asserting on `all` was unreachable — the
  // require threw first) so a collision reports the offending names.
  test("registry query names are unique") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    assert(SparkEntry.all.size == SparkEntry.queries.size,
      "queries map dropped entries relative to the registry")
  }

  // r12 verdict task 4: §2b rows implemented outside the query registry
  // (streaming ingest, sinks, the CLI) get PINNED-SURFACE rows in the
  // same table — visible to a README reader, validated here like any
  // registry row, so the coverage test below holds by construction.
  private lazy val queryRows = tableRows.filterNot(_._3 == "pinned surface")
  private lazy val pinnedRows = tableRows.filter(_._3 == "pinned surface")

  test("README index lists exactly the registered queries") {
    val listed = queryRows.map(_._2).toSet
    val registered = SparkEntry.queries.keySet
    assert(listed == registered,
      s"missing from README: ${(registered -- listed).toSeq.sorted.mkString(",")}; " +
        s"stale in README: ${(listed -- registered).toSeq.sorted.mkString(",")} — " +
        "run tools/readme_index.py")
  }

  test("README index file:line anchors point at the live registrations") {
    queryRows.foreach { case (_, name, _, loc) =>
      val Array(file, line) = loc.split(":")
      val p = root.resolve(file)
      assert(java.nio.file.Files.exists(p), s"$name: $file gone — regenerate index")
      val l = java.nio.file.Files.readAllLines(p).get(line.toInt - 1)
      assert(l.contains(s""""$name""""),
        s"$name: $loc no longer holds its registration — regenerate index")
    }
  }

  test("pinned-surface rows exist and their anchors carry the survey-row tag") {
    // the registry-less §2b surfaces the table must keep visible
    val expected = Set("G21", "G23", "G24", "G24b", "G33", "X59", "X60", "X81")
    val tags = pinnedRows.map(_._1).toSet
    assert(tags == expected,
      s"pinned-surface rows drifted: missing ${(expected -- tags).mkString(",")}, " +
        s"extra ${(tags -- expected).mkString(",")} — run tools/readme_index.py")
    pinnedRows.foreach { case (tag, _, _, loc) =>
      val Array(file, line) = loc.split(":")
      val p = root.resolve(file)
      assert(java.nio.file.Files.exists(p), s"$tag: $file gone — regenerate index")
      val l = java.nio.file.Files.readAllLines(p).get(line.toInt - 1)
      assert(s"\\b${java.util.regex.Pattern.quote(tag)}\\b".r.findFirstIn(l).isDefined,
        s"$tag: $loc no longer carries the survey-row tag — regenerate index")
    }
  }

  test("every SURVEY §2b row ID is attributed to a registered query or a pinned surface") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(root.resolve("SURVEY.md")), "UTF-8")
    val rowIds = "(?m)^\\| ([GX]\\d{1,2}[a-z]?)\\b".r
      .findAllMatchIn(survey).map(_.group(1)).toSeq
    assert(rowIds.size >= 115, s"SURVEY §2b row table shrank to ${rowIds.size} rows?")

    // pinned-surface rows count exactly like query rows — a registry-less
    // operator (X81) is attributed through the same table
    val tags = tableRows.map(_._1).toSet
    // a finer-grained sub-tag (X40a…X40d) covers its base row (X40);
    // a base tag never covers a suffixed row (G24 does not cover G24b)
    def covered(id: String) =
      tags.contains(id) || tags.exists(t => t.length == id.length + 1 &&
        t.startsWith(id) && t.last.isLetter)

    val missing = rowIds.filterNot(covered)
    assert(missing.isEmpty,
      s"SURVEY §2b rows with no query attribution and no pinned surface: " +
        s"${missing.mkString(",")} — tag the owning query's doc comment, add a " +
        "TAG_OVERRIDES entry, or a PINNED_SURFACES entry in " +
        "tools/readme_index.py, then regenerate")
  }

  test("README oracle column matches oracleSql registration") {
    val oracled = SparkEntry.oracleSql.keySet
    queryRows.foreach { case (_, name, oracle, _) =>
      assert((oracle == "DuckDB") == oracled.contains(name),
        s"$name: README says '$oracle' but oracleSql ${if (oracled.contains(name)) "has" else "lacks"} it")
    }
  }
}
