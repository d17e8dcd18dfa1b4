package graft.functions

/** One LOUD line the first time any native-kernel dispatch falls back
  * to its builtin-tree/UDF twin because `GraftExtensions` is not
  * installed (r19 verdict: the fallbacks are bit-identical and
  * spec-pinned, but a deployment that silently forgets the extension
  * gets a measured +79% sweep tax — 4–9.5× on the ANN/PQ surface
  * (BASELINE.md's extension-less sweep) — with no runtime signal; this
  * is the signal). Once per driver JVM: the first construction warns,
  * every later fallback stays silent — the point is startup
  * discoverability, not log spam. */
object FallbackWarning {
  private val warned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Print seam (the spec swaps it for a buffer to pin the
    * exactly-once contract; production leaves it on stderr, where the
    * driver log collects it). */
  @volatile private[graft] var sink: String => Unit = System.err.println(_)

  def note(fn: String): Unit =
    if (warned.compareAndSet(false, true))
      sink(s"[graft] WARN: native function '$fn' is not registered — " +
        "GraftExtensions is not installed in this SparkSession, so every " +
        "graft vector/hash kernel will run as its builtin-tree/UDF fallback " +
        "twin. Results are bit-identical, but the measured cost is +79% on " +
        "the full sweep and 4-9.5x on the ANN/PQ surface (BASELINE.md, " +
        "extension-less sweep). Set spark.sql.extensions=graft.GraftExtensions.")

  private[graft] def hasFired: Boolean = warned.get()
  private[graft] def resetForSpec(): Unit = warned.set(false)
}
