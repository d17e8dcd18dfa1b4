package graft.sources

/** Registry of tmpdir-scoped store directories (dedup signature stores,
  * ANN indexes) written by self-contained query flows: a JVM shutdown
  * hook removes everything registered, so repeated bench/verify runs on
  * a long-lived machine never accumulate store copies in tmpdir. */
object TmpStores {
  private val paths = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private lazy val hook: Unit = {
    val _ = Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.keys.foreach { p =>
        val dir = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(dir)) {
          val s = java.nio.file.Files.walk(dir)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          catch { case scala.util.control.NonFatal(_) => () }
          finally s.close()
        }
      }))
  }

  /** Register a tmp store dir for end-of-JVM deletion; returns it. */
  def register(path: String): String = {
    hook
    paths.putIfAbsent(path, ())
    path
  }
}
