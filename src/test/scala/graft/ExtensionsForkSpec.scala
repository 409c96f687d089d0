package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate for the one-line integration story: fork a FRESH JVM with
  * `spark.sql.extensions=graft.GraftExtensions` (extensions apply at
  * session creation only, so the suite's shared session cannot test
  * this) and run [[graft.tools.ExtensionsSmoke]] end to end — SQL
  * function registration, the AutoSpatialJoin rewrite shape, the
  * TopKPerGroup strategy, and the optimizer fixed-point property over
  * generated spatial-join shapes. Previously a manually-run tool; as
  * a suite member a registration regression now fails `sbt test`. */
class ExtensionsForkSpec extends AnyFunSuite {

  test("GraftExtensions one-line config registers in a fresh JVM") {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    assert(cp.contains("classes") || cp.contains(".jar"),
      s"test JVM classpath looks unusable for forking: ${cp.take(200)}")
    // same module opens Spark 4 on JDK 17 needs (mirrors build.sbt)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-cp", cp, "graft.tools.ExtensionsSmoke")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    // drain on a separate thread: a hung fork that keeps stdout open
    // would block readLine() forever and the timeout below could
    // never fire — the drain must not gate the waitFor
    val out = new java.lang.StringBuilder
    val drain = new Thread(() => {
      val rdr = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
      var line = rdr.readLine()
      while (line != null) {
        out.synchronized { out.append(line).append('\n') }
        line = rdr.readLine()
      }
    })
    drain.setDaemon(true)
    drain.start()
    val finished = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    assert(finished, "forked extensions smoke timed out after 300s; " +
      "tail:\n" + out.synchronized(out.toString).takeRight(4000))
    drain.join(10000) // let the pipe flush after exit
    val text = out.synchronized(out.toString)
    assert(p.exitValue() == 0 && text.contains("EXTENSIONS SMOKE PASSED"),
      s"forked smoke failed (rc=${p.exitValue()}); tail:\n" +
        text.takeRight(4000))
    // each stage's marker must be present — a partial pass is a fail
    Seq("functions OK", "optimizer rule OK", "planner strategy OK",
      "idempotence property OK").foreach(m =>
      assert(text.contains(m), s"missing stage marker '$m'"))
  }
}
