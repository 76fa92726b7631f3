package graft.operators

import java.nio.file.{Files, Path, Paths}

/** PID-scoped /tmp workspaces for operators that must materialize a
  * filesystem fixture at query-build time (q118's binary-asset corpus,
  * q134's partitioned IVF index). The lifecycle contract, shared by
  * every caller:
  *
  *  - the dir is FIXED per (JVM, key) — a fresh temp dir per invocation
  *    would leak one fixture copy to /tmp per Bench/Verify run, because
  *    the DataFrames scanning it are lazy and the dir must outlive the
  *    query builder; bounding the leak to one copy per live JVM is the
  *    cleanup;
  *  - the PID key keeps CONCURRENT Bench/Verify JVMs apart — without
  *    it, one process's clear races the other's lazy scan of the same
  *    path;
  *  - siblings left by DEAD JVMs are swept best-effort on every call
  *    (each run is a fresh PID, so dead copies are everyone's to reap);
  *    live PIDs are skipped — their scan may still be lazy. Concurrent
  *    reapers race benignly: every delete is a swallowed no-op on loss,
  *    because a best-effort sweep failing must never fail the query
  *    build itself. Races surface as IOException subtypes
  *    (NoSuchFile/DirectoryNotEmpty/NotDirectory from a prefix-matching
  *    plain file) or as the unchecked wrappers a mid-iteration delete
  *    makes Files.walk/list streams throw (UncheckedIOException,
  *    DirectoryIteratorException) — all swallowed.
  */
object TmpWorkspaces {

  /** Best-effort bottom-up recursive delete; never throws, tolerates
    * absent paths and nested layouts (parquet partition dirs).
    */
  private def deleteTree(root: Path): Unit =
    try {
      if (Files.exists(root)) {
        val s = Files.walk(root)
        try s.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach { p =>
            try Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () }
          }
        finally s.close()
      }
    } catch {
      case _: java.io.IOException => ()
      case _: java.io.UncheckedIOException => ()
      case _: java.nio.file.DirectoryIteratorException => ()
    }

  /** Returns the fixed per-(JVM, key) workspace path for `prefix`,
    * cleared of any previous contents, after sweeping dead-PID
    * siblings. The dir itself is NOT created — writers (Hadoop
    * FileSystem, parquet) create it on first write.
    */
  def pidScoped(prefix: String, key: String): Path = {
    val tmpRoot = Paths.get(sys.props("java.io.tmpdir"))
    val dir = tmpRoot.resolve(prefix + ProcessHandle.current().pid() + "_" +
      key.replaceAll("[^A-Za-z0-9]", "_"))
    try {
      val s1 = Files.list(tmpRoot)
      try s1.filter(p => p.getFileName.toString.startsWith(prefix))
        .forEach { p =>
          val pid = p.getFileName.toString.stripPrefix(prefix)
            .takeWhile(_.isDigit)
          val alive = pid.nonEmpty &&
            ProcessHandle.of(pid.toLong)
              .map[java.lang.Boolean](h => h.isAlive).orElse(false)
          if (!alive) deleteTree(p)
        }
      finally s1.close()
    } catch {
      case _: java.io.IOException => ()
      case _: java.io.UncheckedIOException => ()
      case _: java.nio.file.DirectoryIteratorException => ()
    }
    deleteTree(dir)
    dir
  }
}
