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

  /** Stores already built this JVM, keyed by path. Scoped paths hash the
    * caller's KEY STRING (the dataset directory path — NOT the dataset's
    * contents), so the memo is only sound while dataset dirs are
    * immutable for the JVM's lifetime: a dir rewritten mid-JVM would
    * keep serving the store built from its old contents. That matches
    * every in-repo caller (bench/verify over the driver's read-only
    * testdata); TmpStoresSpec pins the assumption explicitly. */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[Unit]]

  /** Build a scoped store once per JVM: the first caller pays the write
    * (logged separately, so store-build cost never hides inside probe
    * timings), every later caller reuses the store — the production
    * shape, where an index is written once and probed many times, and
    * what keeps the bench measuring what a user would actually repeat.
    * The memo is a promise per path: `putIfAbsent` elects exactly one
    * builder, losers block on the promise until the store lands, and a
    * THROWING build un-memoizes itself before failing its promise — the
    * thrown-into losers retry (one may become the new winner) and later
    * callers never reuse a half-written store. Unlike a
    * `computeIfAbsent`-held build, the map is never locked while a
    * multi-second Spark write runs: builds for unrelated paths proceed
    * concurrently even under hash-bin collisions. A loser blocked on a
    * FAILED winner retries the build at most once (it may become the new
    * winner); if its own attempt also fails, the winner's root cause
    * rides along as a suppressed exception instead of being swallowed,
    * and retries never recurse unboundedly across repeated failures.
    * TmpStoresSpec proves reuse, exactly-once-under-race, and
    * retry-after-throw. */
  def buildOnce(path: String)(build: => Unit): Unit = buildOnce(path, retries = 1)(build)

  private def buildOnce(path: String, retries: Int)(build: => Unit): Unit = {
    val mine = new java.util.concurrent.CompletableFuture[Unit]()
    val existing = built.putIfAbsent(path, mine)
    if (existing == null) {
      val t0 = System.nanoTime()
      try {
        build
        System.err.println(
          f"[graft] store build $path: ${(System.nanoTime() - t0) / 1e9}%.3f s (reused afterwards)")
        mine.complete(())
      } catch {
        case e: Throwable =>
          built.remove(path, mine) // un-memoize FIRST: retriers see no entry
          mine.completeExceptionally(e)
          throw e
      }
    } else {
      try { existing.join(); () }
      catch {
        case ce: java.util.concurrent.CompletionException =>
          val winnerCause = if (ce.getCause != null) ce.getCause else ce
          if (retries <= 0) throw winnerCause
          try buildOnce(path, retries - 1)(build)
          catch {
            case e: Throwable =>
              if (e ne winnerCause) e.addSuppressed(winnerCause)
              throw e
          }
      }
    }
  }

  /** THE scoping scheme for self-contained tmp stores, in one place:
    * key-hashed (distinct dataset PATHS cannot collide; see [[buildOnce]]
    * for the resulting immutable-dataset-dir assumption), pid-scoped
    * (concurrent drivers never race overwrite-vs-read on one store),
    * registered for end-of-JVM cleanup. */
  def scopedPath(prefix: String, key: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(12)
    register(
      s"${sys.props("java.io.tmpdir")}/$prefix-$tag-p${ProcessHandle.current().pid()}")
  }
}
