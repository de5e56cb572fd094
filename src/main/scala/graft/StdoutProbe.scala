package graft

/** Prints exactly one JSON line to stdout and one marker to stderr —
  * nothing else, no Spark session. Exists to verify (in seconds, not a
  * full bench run) that `sbt "runMain …"` delivers forked-JVM stdout
  * UNDECORATED: the driver's BENCH_r{N}.json parse reads a 2000-char
  * stdout tail and needs the compact metric line bare, but sbt's
  * default LoggedOutput prefixes every line with "[info] " — the
  * root cause of 16 rounds of `"parsed": null` (see build.sbt's
  * outputStrategy setting and tools/test_bench_guard.py's literal-tail
  * fixture).
  *
  *   sbt "runMain graft.StdoutProbe" | grep -x '\{"probe":"stdout"\}'
  *
  * exits 0 iff the line arrives with no decoration.
  */
object StdoutProbe {
  def main(args: Array[String]): Unit = {
    println("""{"probe":"stdout"}""")
    System.err.println("""{"probe":"stderr"}""")
  }
}
