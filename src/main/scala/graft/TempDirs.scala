package graft

/** Scratch directories for query-internal round-trip artifacts (CSV/JSON/
  * ORC/XML rewrites, per-run stream logs). Every directory is registered
  * for recursive deletion on JVM exit, so repeated bench/verify runs do not
  * accumulate on-disk garbage (round-4 advice: q70/q71/q86/q140 leaked one
  * temp dir per invocation).
  */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(p => deleteRecursively(p))
    }, "graft-tempdir-cleanup"))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(deleteRecursively)
      java.nio.file.Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () }

  /** A fresh directory deleted (recursively) when the JVM exits. */
  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
