package graft.core

import java.nio.file.{Files, Path}

/** Process-lifetime scratch directories for the engine/streaming twin
  * queries (temp stores, checkpoint dirs, symlinked sources). Query
  * bodies return LAZY DataFrames that may still read from their
  * scratch store when the driver materializes them much later, so
  * per-query try/finally deletion would race evaluation; instead every
  * scratch dir registers here and ONE JVM shutdown hook deletes them
  * all recursively — repeated bench/correctness invocations no longer
  * leak disk (each erase/backup twin ingests a full store per run). */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(
      () => dirs.forEach(deleteRecursively(_)),
      "graft-scratch-cleanup"))
    true
  }

  /** Create a temp directory that lives until JVM exit. */
  def dir(prefix: String): String = path(prefix).toString

  /** Path-typed variant for callers that resolve children. */
  def path(prefix: String): Path = {
    require(hookInstalled)
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_)) finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () } // best-effort at exit
  }
}
