package graft.queries

/** Process-lifetime temp-dir reclamation with ONE lazily-registered
  * shutdown hook draining a shared queue — gate builders that stage
  * scratch stores (x95) register here instead of adding a hook per
  * invocation (bench sweeps call a builder dozens of times; a
  * hook-per-pass leaks threads and `addShutdownHook` throws
  * IllegalStateException once shutdown has begun). */
private[graft] object TempReaper {
  private val roots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val hooked: Boolean =
    try {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var p = roots.poll()
        while (p != null) {
          try java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
          catch { case _: Throwable => () }
          p = roots.poll()
        }
      }, "graft-temp-reaper"))
      true
    } catch {
      // shutdown already in progress: nothing to clean later anyway
      case _: IllegalStateException => false
    }

  /** Queue `root` for recursive deletion at JVM exit. */
  def register(root: java.nio.file.Path): Unit = {
    hooked
    roots.add(root)
    ()
  }
}
