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

  test("README index lists exactly the registered queries") {
    val listed = tableRows.map(_._2).toSet
    val registered = SparkEntry.queries.keySet
    assert(listed == registered,
      s"missing from README: ${(registered -- listed).toSeq.sorted.mkString(",")}; " +
        s"stale in README: ${(listed -- registered).toSeq.sorted.mkString(",")} — " +
        "run tools/readme_index.py")
  }

  test("README index file:line anchors point at the live registrations") {
    tableRows.foreach { case (_, name, _, loc) =>
      val Array(file, line) = loc.split(":")
      val p = root.resolve(file)
      assert(java.nio.file.Files.exists(p), s"$name: $file gone — regenerate index")
      val l = java.nio.file.Files.readAllLines(p).get(line.toInt - 1)
      assert(l.contains(s""""$name""""),
        s"$name: $loc no longer holds its registration — regenerate index")
    }
  }

  test("README oracle column matches oracleSql registration") {
    val oracled = SparkEntry.oracleSql.keySet
    tableRows.foreach { case (_, name, oracle, _) =>
      assert((oracle == "DuckDB") == oracled.contains(name),
        s"$name: README says '$oracle' but oracleSql ${if (oracled.contains(name)) "has" else "lacks"} it")
    }
  }
}
