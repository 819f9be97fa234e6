package graft.queries

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Session-scoped temp directories for the graded fixture bootstraps
  * (the cfi/csvq/index-compaction/time-travel memos): every directory
  * created here is registered for SHUTDOWN-HOOK deletion, so a
  * long-lived session that touches many corpus dirs never accumulates
  * unbounded disk (r15 ADVICE #1 — the memos themselves are bounded by
  * construction at one PATH STRING per (applicationId, corpus dir), so
  * eviction is a disk-hygiene concern, not a heap one).
  *
  * Deletion is best-effort and recursive, deepest-first; a directory
  * that disappears mid-walk (the OS tmp reaper) is ignored. The hook
  * runs at JVM exit, but JVM shutdown hooks run CONCURRENTLY in
  * unspecified order — Spark's own shutdown hooks may still be
  * flushing while this walk deletes (r16 ADVICE #3: no ordering
  * guarantee exists against them). That is acceptable here because
  * the walk swallows every exception, the fixtures are read-only
  * after creation, and the worst case is a benign partial delete the
  * OS tmp reaper finishes later.
  */
private[graft] object SessionTemp {
  private val dirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try {
        if (Files.exists(d)) {
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => () }; () })
          finally walk.close()
        }
      } catch { case _: Exception => () }
    }
  }, "graft-session-temp-cleanup"))

  /** Create a registered temp directory; returns its absolute path. */
  def createDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
