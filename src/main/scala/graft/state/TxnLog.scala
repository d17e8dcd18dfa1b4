package graft.state

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Optimistic-concurrency commit log — the multi-writer seam the
  * single-writer [[StateStore]] documents (its `_writer.lock` forbids
  * concurrent drivers; this log welcomes them).
  *
  * Protocol (the public Delta-protocol shape, re-expressed on plain
  * java.nio for the driver-local control plane):
  *
  *  1. a writer composes the full commit payload for version `v =
  *     latest + 1` and writes it to a hidden temp file;
  *  2. it PUBLISHES by `Files.createLink(_txn/<v>.commit, tmp)` — a
  *     POSIX hard link is atomic and fails with EEXIST if the version
  *     is taken, so exactly one writer wins each version and a reader
  *     can never observe a partially-written commit (the link appears
  *     only after the payload is fully on disk);
  *  3. a loser re-reads the latest version, re-derives its payload
  *     against the new snapshot, and retries — read-modify-write
  *     transactions are serializable because the payload function runs
  *     against everything `< v` and winning `v` proves nothing else
  *     committed in between.
  *
  * Versions are therefore dense (1, 2, 3, …) and totally ordered — the
  * property [[MwStateStore]] exploits to make the commit version itself
  * the global `event_seq`.
  *
  * Atomic-rename alternatives were rejected deliberately:
  * `Files.move` without `REPLACE_EXISTING` is check-then-act on the
  * default provider (racy), and `ATOMIC_MOVE` maps to rename(2), which
  * silently REPLACES an existing target — either would let two writers
  * both believe they own a version. `createLink` is the one primitive
  * that is both atomic and fail-if-exists.
  *
  * Deployment scope: writers must share a filesystem where link(2) is
  * atomic-fail-if-exists — same-machine drivers trivially, cross-machine
  * drivers via a POSIX shared mount (NFS servers implement LINK
  * atomically server-side; link-after-full-write keeps torn reads
  * impossible even under client caching). A DFS control plane (HDFS,
  * where hard links don't exist but rename is atomic no-overwrite)
  * swaps the publish primitive behind this class — the seam is
  * [[tryCommit]] alone; versioning, retry, checkpointing and vacuum
  * semantics carry over unchanged.
  *
  * Scale: this is a CONTROL-plane log — one commit per run transition /
  * config change, payloads of a few hundred bytes. Directory listings
  * stay bounded because [[MwStateStore]] checkpoints consolidated state
  * every K commits and [[vacuum]] drops commits the checkpoint covers.
  * Contention cost is O(writers) retries per commit, independent of any
  * data-plane size.
  */
final class TxnLog(val dir: String) {

  // same driver-local contract (and reason) as StateStore: java.nio on a
  // remote URI silently resolves a literal local path — fail construction
  require(!dir.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*") && !dir.startsWith("file:"),
    s"TxnLog requires a driver-local filesystem path, got '$dir'")

  private val txnDir: Path = Paths.get(dir, "_txn")

  private def commitPath(v: Long): Path = txnDir.resolve(f"$v%020d.commit")

  /** Commit files only — temp files (`.tmp-*`) and foreign names are
    * invisible, so a crashed writer's orphan staging can never be read
    * as a commit. */
  private def listVersions(): Seq[Long] =
    if (!Files.isDirectory(txnDir)) Seq.empty
    else {
      val s = Files.list(txnDir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.endsWith(".commit") => n.stripSuffix(".commit").toLong }
        .toSeq
      finally s.close()
    }

  /** `floor` guards against version REUSE after [[vacuum]]: once old
    * commit files are dropped, a raw listing under-reports history, and
    * a writer that trusted it would re-claim a version (and with it a
    * seq) that already existed. Callers that vacuum must pass the
    * highest version their checkpoint durably covers. */
  def latestVersion(floor: Long = 0L): Long = {
    val vs = listVersions()
    math.max(if (vs.isEmpty) 0L else vs.max, floor)
  }

  /** All commits with version in `(afterVersion, ∞)`, ordered. Payload is
    * returned verbatim. */
  def commitsAfter(afterVersion: Long): Seq[(Long, String)] =
    listVersions().filter(_ > afterVersion).sorted.map { v =>
      v -> new String(Files.readAllBytes(commitPath(v)), "UTF-8")
    }

  /** One attempt to claim `v` with `payload`; true iff this writer won
    * the version. */
  def tryCommit(v: Long, payload: String): Boolean = {
    Files.createDirectories(txnDir)
    val tmp = Files.createTempFile(txnDir, ".tmp-", "")
    try {
      Files.write(tmp, payload.getBytes("UTF-8"))
      try { Files.createLink(commitPath(v), tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        // our staging vanished before the link (a concurrent vacuum
        // raced the age guard, an operator rm'd it): nothing was
        // published, so "lost this attempt" is the honest answer — the
        // commit loop re-stages and retries
        case _: java.nio.file.NoSuchFileException => false
      }
    } finally Files.deleteIfExists(tmp)
  }

  /** Serializable read-modify-write: `payload(v)` composes the commit
    * for the version about to be claimed, reading any state it likes
    * from versions `< v`; it re-runs from scratch on every retry, so by
    * the time a claim SUCCEEDS the payload is guaranteed to have been
    * derived against the immediately-preceding snapshot. Returns the won
    * version.
    *
    * `maxRetries` bounds livelock under pathological contention — the
    * control plane has a handful of drivers, so hitting it means
    * something is broken (e.g. a tight commit loop), and failing loudly
    * beats spinning.
    */
  def commit(payload: Long => String, maxRetries: Int = 1000,
      floor: => Long = 0L): Long =
    commitOpt(v => Some(payload(v)), maxRetries, floor).get

  /** [[commit]] with an abort path: `payload(v)` returning None abandons
    * the transaction without committing anything (the guarded-append /
    * gated-transition shape — the guard re-evaluates against the pre-`v`
    * snapshot on every retry, exactly like the payload). Returns the won
    * version, or None on abort.
    *
    * Ordering matters for the version floor: the `_txn` listing runs
    * FIRST, the by-name `floor` evaluates AFTER it. Vacuum only deletes
    * commits a PUBLISHED checkpoint covers, so any version missing from
    * our listing is ≤ some checkpoint that already existed when we then
    * read the floor — evaluating the floor first would open a window
    * (checkpoint+vacuum between floor and listing) where both
    * under-report and a vacuumed version gets REUSED, forking a
    * duplicate seq below the checkpoint that every reader would miss. */
  def commitOpt(payload: Long => Option[String], maxRetries: Int = 1000,
      floor: => Long = 0L): Option[Long] = {
    var attempt = 0
    while (attempt < maxRetries) {
      val listed = latestVersion()
      val v = math.max(listed, floor) + 1
      payload(v) match {
        case None => return None
        case Some(p) => if (tryCommit(v, p)) return Some(v)
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"TxnLog $dir: lost the commit race $maxRetries times — " +
        "either pathological writer contention or a stuck commit loop")
  }

  /** Drop commits at or below `throughVersion` — call only with versions
    * a durable checkpoint fully covers (MwStateStore does). Also sweeps
    * temp-file orphans from crashed writers — but ONLY stale ones
    * (`staleMs` old): a LIVE writer's staging exists for milliseconds
    * between its write and its link, and an age-blind sweep would
    * delete in-flight commits out from under concurrent drivers (found
    * by the churn spec). Idempotent; safe under concurrent vacuums
    * (losers' deletes no-op). */
  def vacuum(throughVersion: Long, staleMs: Long = 10 * 60 * 1000L): Unit = {
    listVersions().filter(_ <= throughVersion)
      .foreach(v => Files.deleteIfExists(commitPath(v)))
    if (Files.isDirectory(txnDir)) {
      val cutoff = System.currentTimeMillis() - staleMs
      val s = Files.list(txnDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".tmp-"))
        .filter { p =>
          try Files.getLastModifiedTime(p).toMillis < cutoff
          catch { case _: java.io.IOException => false } // already gone
        }
        .foreach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }
}
