package graft.io

import java.nio.file.{Files, Path}

/** Tracked temp staging dirs for the queries that must WRITE as part
  * of their semantics (schema-evolution q132, ORC round-trip q163,
  * partitioned-write q164, corrupt-tolerance q166). Each invocation
  * still gets a fresh dir (concurrent Verify + dev loops must not race
  * on one path), but every dir is deleted on JVM exit — repeated
  * verify/bench rounds no longer accrete table copies in /tmp.
  */
object Staging {
  private val created = scala.collection.mutable.ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized { created.foreach(deleteRecursively) }))

  def tempDir(tag: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(tag)
    created.synchronized { created += p }
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p))
        Files.list(p).forEach(deleteRecursively)
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () } // best-effort on shutdown
}
