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
  * The publish primitive — atomically claim a version name with a
  * fully-written payload, failing if the version exists — is the ONE
  * filesystem-specific piece, factored behind [[CommitPublisher]];
  * versioning, retry, floor, checkpointing and vacuum semantics are
  * publisher-independent. In-repo implementations (both torture-proven
  * by the same suites):
  *
  *  - [[TxnLog.HardLink]] (default): `Files.createLink` — POSIX link(2)
  *    is atomic and fails EEXIST. Plain-file rename alternatives were
  *    rejected deliberately: `Files.move` without `REPLACE_EXISTING` is
  *    check-then-act on the default provider (racy), and `ATOMIC_MOVE`
  *    on a FILE maps to rename(2), which silently REPLACES an existing
  *    target — either would let two writers both believe they own a
  *    version.
  *  - [[TxnLog.DirRename]]: the atomic NO-OVERWRITE rename that rename(2)
  *    does provide — for DIRECTORIES: renaming a staging dir (payload
  *    fully written inside) onto an existing non-empty directory fails
  *    ENOTEMPTY atomically, so exactly one writer's staging becomes the
  *    commit dir. For filesystems without link(2) (or where hard links
  *    are administratively disabled).
  *
  * Deployment scope: writers must share a filesystem where the chosen
  * publisher's primitive is atomic — POSIX mounts for both in-repo
  * implementations (NFS implements LINK and RENAME atomically
  * server-side; publish-after-full-write keeps torn reads impossible
  * even under client caching). Deployments on other storage write a
  * third [[CommitPublisher]] against the same five methods: HDFS =
  * `FileSystem.rename` of a payload file (fail-if-exists is serialized
  * in the NameNode — atomic there even though the raw-local-fs flavor
  * of the same API is check-then-act, which is why it is not shipped
  * here); S3/GCS = conditional put (`If-None-Match: *` / precondition
  * generation 0) of the payload object. Versioning, retry, floor,
  * checkpoint and vacuum semantics carry over unchanged.
  *
  * Scale: this is a CONTROL-plane log — one commit per run transition /
  * config change, payloads of a few hundred bytes. Directory listings
  * stay bounded because [[MwStateStore]] checkpoints consolidated state
  * every K commits and [[vacuum]] drops commits the checkpoint covers.
  * Contention cost is O(writers) retries per commit, independent of any
  * data-plane size.
  */
/** The filesystem-specific third of the commit protocol: how a version
  * is durably REPRESENTED under `_txn/` and atomically CLAIMED. The
  * contract every implementation must honor (the torture suites drive
  * it for both in-repo publishers):
  *
  *  - [[publish]] returns true iff THIS caller made `v` exist, and a
  *    published version is complete — no reader may ever observe a
  *    partial payload (stage fully, then claim atomically);
  *  - a failed/crashed attempt leaves only staging residue that
  *    [[commitVersion]] never recognizes as a commit and
  *    [[sweepStaging]] can remove once stale;
  *  - [[read]]/[[delete]] round-trip whatever [[publish]] wrote.
  */
trait CommitPublisher {
  /** Atomically claim `txnDir/<canonical name of v>` with `payload`;
    * true iff this writer won the version. */
  def publish(txnDir: Path, v: Long, payload: Array[Byte]): Boolean
  /** The payload of a published version, verbatim. */
  def read(txnDir: Path, v: Long): Array[Byte]
  /** Parse a directory-entry name: Some(version) iff it is a commit in
    * this publisher's representation (staging and foreign names → None). */
  def commitVersion(name: String): Option[Long]
  /** Remove a published version (vacuum); idempotent. */
  def delete(txnDir: Path, v: Long): Unit
  /** Remove staging residue older than `cutoffMs` (epoch millis) — never
    * a live writer's in-flight staging newer than it. */
  def sweepStaging(txnDir: Path, cutoffMs: Long): Unit
}

final class TxnLog(val dir: String,
    val publisher: CommitPublisher = TxnLog.HardLink) {

  // same driver-local contract (and reason) as StateStore: java.nio on a
  // remote URI silently resolves a literal local path — fail construction
  require(!dir.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*") && !dir.startsWith("file:"),
    s"TxnLog requires a driver-local filesystem path, got '$dir'")

  private val txnDir: Path = Paths.get(dir, "_txn")

  /** Commit entries only — staging and foreign names are invisible
    * ([[CommitPublisher.commitVersion]]), so a crashed writer's orphan
    * staging can never be read as a commit. */
  private def listVersions(): Seq[Long] =
    if (!Files.isDirectory(txnDir)) Seq.empty
    else {
      val s = Files.list(txnDir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .flatMap(n => publisher.commitVersion(n))
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
      v -> new String(publisher.read(txnDir, v), "UTF-8")
    }

  /** One attempt to claim `v` with `payload`; true iff this writer won
    * the version. */
  def tryCommit(v: Long, payload: String): Boolean = {
    Files.createDirectories(txnDir)
    publisher.publish(txnDir, v, payload.getBytes("UTF-8"))
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
      .foreach(v => publisher.delete(txnDir, v))
    if (Files.isDirectory(txnDir))
      publisher.sweepStaging(txnDir, System.currentTimeMillis() - staleMs)
  }
}

object TxnLog {

  private def commitName(v: Long): String = f"$v%020d.commit"

  private def parseCommitName(name: String): Option[Long] =
    if (!name.endsWith(".commit")) None
    else name.stripSuffix(".commit").toLongOption

  /** POSIX hard-link publisher (the default): stage to a hidden temp
    * file, claim by `Files.createLink` — link(2) is atomic and fails
    * EEXIST, and the link appears only after the payload is fully on
    * disk, so a reader can never observe a partial commit. A commit is
    * a plain FILE named `<v>.commit`. */
  object HardLink extends CommitPublisher {
    def publish(txnDir: Path, v: Long, payload: Array[Byte]): Boolean = {
      val tmp = Files.createTempFile(txnDir, ".tmp-", "")
      try {
        Files.write(tmp, payload)
        try { Files.createLink(txnDir.resolve(commitName(v)), tmp); true }
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

    def read(txnDir: Path, v: Long): Array[Byte] =
      Files.readAllBytes(txnDir.resolve(commitName(v)))

    def commitVersion(name: String): Option[Long] = parseCommitName(name)

    def delete(txnDir: Path, v: Long): Unit =
      Files.deleteIfExists(txnDir.resolve(commitName(v)))

    def sweepStaging(txnDir: Path, cutoffMs: Long): Unit = {
      val s = Files.list(txnDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".tmp-"))
        .filter { p =>
          try Files.getLastModifiedTime(p).toMillis < cutoffMs
          catch { case _: java.io.IOException => false } // already gone
        }
        .foreach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  /** Atomic DIRECTORY-rename publisher — for filesystems without usable
    * hard links. rename(2) silently replaces an existing FILE target
    * (which is why a plain-file move can't claim a version) but fails
    * ENOTEMPTY on an existing NON-EMPTY DIRECTORY target, atomically —
    * so staging the payload INSIDE a directory and renaming the
    * directory is an atomic fail-if-exists claim with the same
    * no-torn-reads property as the link (the payload is fully on disk
    * before the rename makes the directory appear; our protocol never
    * creates an empty commit dir, so the replaced-if-empty edge cannot
    * arise from a protocol participant). A commit is a DIRECTORY
    * `<v>.commit/` containing one `payload` file. Same POSIX/NFS scope
    * as the hard link; the kill -9 torture suite drives this publisher
    * through the same density audit. */
  object DirRename extends CommitPublisher {
    def publish(txnDir: Path, v: Long, payload: Array[Byte]): Boolean = {
      val tmp = Files.createTempDirectory(txnDir, ".stage-")
      try {
        Files.write(tmp.resolve("payload"), payload)
        try {
          Files.move(tmp, txnDir.resolve(commitName(v)),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.nio.file.DirectoryNotEmptyException => false
          // staging swept by a racing vacuum (the HardLink case): lost
          // this attempt honestly; the commit loop re-stages
          case _: java.nio.file.NoSuchFileException => false
          case e: java.nio.file.FileSystemException
            // ENOTEMPTY surfaces as the generic FileSystemException on
            // some providers; only a taken version reads as a loss —
            // anything else (EXDEV, EIO) stays loudly fatal
            if Files.exists(txnDir.resolve(commitName(v))) => false
        }
      } finally {
        // failed attempt: remove staging (payload file first, then dir)
        if (Files.isDirectory(tmp)) {
          Files.deleteIfExists(tmp.resolve("payload"))
          Files.deleteIfExists(tmp)
        }
      }
    }

    def read(txnDir: Path, v: Long): Array[Byte] =
      Files.readAllBytes(txnDir.resolve(commitName(v)).resolve("payload"))

    def commitVersion(name: String): Option[Long] = parseCommitName(name)

    def delete(txnDir: Path, v: Long): Unit = {
      val d = txnDir.resolve(commitName(v))
      Files.deleteIfExists(d.resolve("payload"))
      Files.deleteIfExists(d)
    }

    def sweepStaging(txnDir: Path, cutoffMs: Long): Unit = {
      val s = Files.list(txnDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".stage-"))
        .filter { p =>
          try Files.getLastModifiedTime(p).toMillis < cutoffMs
          catch { case _: java.io.IOException => false } // already gone
        }
        .foreach { p =>
          Files.deleteIfExists(p.resolve("payload"))
          Files.deleteIfExists(p)
        }
      finally s.close()
    }
  }

  /** Resolve a publisher by name — the process-boundary seam the
    * torture driver uses (`TxnTortureMain <dir> <max> <publisher>`). */
  def publisherNamed(name: String): CommitPublisher = name match {
    case "hardlink" => HardLink
    case "dirrename" => DirRename
    case other => throw new IllegalArgumentException(
      s"unknown commit publisher '$other' (hardlink | dirrename)")
  }
}
