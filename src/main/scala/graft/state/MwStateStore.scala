package graft.state

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Retention marker for the multi-writer batch_log (see
  * [[MwStateStore.purgeBatchLog]]): immutable commits can't rewrite
  * history, so the purge is an event too — readers filter by the max
  * horizon, checkpoints bake the filter in. */
private[state] final case class LogPurge(horizon: java.sql.Timestamp)

/** Multi-writer [[ControlStore]]: the full control plane (monitor
  * events, envvar config, dimension tables, batch log, mail audit)
  * under TRUE concurrent drivers — the transactional swap the
  * single-writer [[StateStore]]'s scaladoc promises.
  *
  * Design (reference semantics: pkg_batch_util_body.sql:170-182 run-id
  * assignment, 192-214 autonomous status writes, 861-875 envvar reads):
  *
  *  - Every mutation is one [[TxnLog]] commit; **the commit version IS
  *    the event's `event_seq`**. Versions are dense and totally ordered
  *    across writers, so the single-assigner AtomicLong of the
  *    single-writer store is replaced by the log's own serialization —
  *    no lock file, no writer role, no handover.
  *  - Rows ride INSIDE the commit payload (a kind tag + one JSON line
  *    per row): control-plane rows are a few hundred bytes, so the
  *    payload-as-data design makes an append one tmp-write + one atomic
  *    link — no Spark job, no parquet task commit — while staying fully
  *    durable-on-return (the X1 autonomous-transaction property).
  *  - Read-modify-write ([[transactRunId]]) runs inside
  *    `TxnLog.commit(v => …)`: the payload derives `max(run_id)+1` from
  *    the snapshot `< v`, and winning `v` proves no concurrent
  *    assignment slipped in — NVL(MAX)+1 stays monotonic per
  *    (module, day) across any number of drivers.
  *  - Retention ([[purgeBatchLog]]) is an EVENT: a horizon marker
  *    commit. Readers filter `run_date >= max(horizon)`; the next
  *    checkpoint materializes the filtered rows and folds markers to
  *    their max — immutable history, same observable semantics as the
  *    single-writer rewrite-in-place.
  *  - Every K commits the committer writes a consolidated parquet
  *    CHECKPOINT (all kinds, seqs baked in) and publishes it by atomic
  *    directory rename; readers load the newest checkpoint plus the ≤K
  *    JSON tail commits, so read cost is bounded regardless of history
  *    length, and [[vacuum]] can drop checkpoint-covered commits.
  *
  * Crash safety, by construction: a temp payload without its link is
  * invisible; a published link is complete (the link appears only after
  * the payload is on disk); a half-written checkpoint never gets
  * renamed into place; a crash between checkpoint and vacuum merely
  * leaves redundant commits. The JSON round-trip is Spark's own
  * (`spark.read.schema(…).json`), timestamps as explicit-offset ISO
  * instants, so parsing is session-timezone-proof.
  *
  * Scale: identical to [[TxnLog]]'s story — control-plane rates (one
  * commit per run transition), O(writers) retry contention, bounded
  * listings. The data plane never goes through this store.
  */
final class MwStateStore(val spark: SparkSession, val dir: String,
    checkpointEvery: Int = 64,
    publisher: CommitPublisher = TxnLog.HardLink)
    extends ControlStore {
  require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")

  val log = new TxnLog(dir, publisher)

  private val ckptDir: Path = Paths.get(dir, "_ckpt")
  private def ckptPath(v: Long): Path = ckptDir.resolve(f"$v%020d")

  // ---- payload codec ------------------------------------------------------
  // line 1: kind; lines 2..: one JSON object per row. Rows are hand-encoded
  // (flat types only) and Spark-decoded, so escaping/null/timestamp
  // semantics are exactly the json datasource's.

  // NOT ISO_INSTANT: it emits a VARIABLE-length fraction (none / 3 / 6 /
  // 9 digits), and Spark's default JSON timestamp parser only accepts
  // [.SSS] — a micros-precision instant would silently parse to NULL
  // under PERMISSIVE mode. Fixed 6-digit micros (Spark's own timestamp
  // precision) with an explicit offset, and the SAME pattern pinned on
  // the read side, makes the round-trip lossless and session-TZ-proof.
  private val TsPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val Iso = DateTimeFormatter.ofPattern(TsPattern)
    .withZone(java.time.ZoneOffset.UTC)

  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Generic flat-Product JSON encoder, schema-driven so field names
    * come from the SAME Encoder the read side pins its schema to — a
    * codec and its decoder cannot disagree on a name. `fields` is hoisted
    * by [[payload]]: TypeTag-driven schema derivation goes through
    * scala-reflect's global-locked runtime mirror, so paying it per ROW
    * (worse, per commit RETRY × row) would serialize all writers on the
    * reflection lock for no reason. */
  private def rowJson(fields: Array[org.apache.spark.sql.types.StructField],
      row: Product): String =
    fields.iterator.zip(row.productIterator).map { case (f, raw) =>
      val v = raw match { case Some(x) => x; case None => null; case x => x }
      val enc = v match {
        case null => "null"
        case s: String => js(s)
        case t: java.sql.Timestamp => js(Iso.format(t.toInstant))
        case n: Long => n.toString
        case n: Int => n.toString
        case n: Double => n.toString
        case b: Boolean => b.toString
        case other => throw new IllegalArgumentException(
          s"MwStateStore codec: unsupported control-row field type " +
            s"${other.getClass.getName} at ${f.name}")
      }
      s"${js(f.name)}:$enc"
    }.mkString("{", ",", "}")

  private def payload[T <: Product : TypeTag](kind: String, rows: Seq[T]): String = {
    val fields = Encoders.product[T].schema.fields
    (kind +: rows.map(rowJson(fields, _))).mkString("\n")
  }

  // ---- snapshot read ------------------------------------------------------

  private def listCheckpointVersions(): Seq[Long] =
    if (!Files.isDirectory(ckptDir)) Seq.empty
    else {
      val s = Files.list(ckptDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSeq
      finally s.close()
    }

  private def latestCheckpointVersion(): Long = {
    val vs = listCheckpointVersions()
    if (vs.isEmpty) 0L else vs.max
  }

  /** ((version, kind, JSON line) tail rows, checkpoint version). Retries
    * until the view is CONSISTENT: a concurrent checkpoint+vacuum can
    * (a) delete a tail commit mid-read (NoSuchFileException), or —
    * subtler — (b) land entirely between our checkpoint listing and our
    * commit listing, so the vacuumed versions are simply ABSENT with no
    * exception and events ckptV+1..ckptV' would silently vanish from the
    * view. Versions are dense by construction and vacuum only deletes
    * prefixes a published checkpoint covers, so consistency is checkable:
    * the checkpoint version must not have moved, and a non-empty tail
    * must start exactly at ckptV+1. */
  private def snapshot(): (Seq[(Long, String, String)], Long) = {
    val MaxAttempts = 10
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < MaxAttempts) {
      val ckptV = latestCheckpointVersion()
      try {
        val commits = log.commitsAfter(ckptV)
        // FULL contiguity, not just the head: directory iteration during
        // concurrent link creation can miss a MID-tail entry (hash-order
        // readdir passes the slot before the entry lands), and a
        // head-only check would bless that listing with an event silently
        // absent from the middle
        val dense = commits.map(_._1) == ((ckptV + 1) to (ckptV + commits.length))
        if (dense && latestCheckpointVersion() == ckptV) {
          val tail = commits.flatMap { case (v, p) =>
            val lines = p.split('\n')
            lines.drop(1).filter(_.nonEmpty).map(l => (v, lines.head, l))
          }
          return (tail, ckptV)
        }
        attempt += 1 // gap in the tail or the checkpoint moved — re-read
      } catch {
        case e: java.nio.file.NoSuchFileException => lastError = e; attempt += 1
      }
    }
    throw new IllegalStateException(
      s"MwStateStore $dir: could not obtain a consistent snapshot in " +
        s"$MaxAttempts attempts (checkpoint/vacuum storm?)", lastError)
  }

  /** One kind's full frame: newest checkpoint + tail commits. `cap`
    * (checkpointing only) pins the view to commits ≤ cap, so a commit
    * racing past the checkpoint's chosen version can never be baked in
    * AND replayed from the tail — the duplicate a capless dump would
    * create for seq-free kinds. */
  /** Schema-pinned FAILFAST json frame over tail rows — a malformed
    * control event must abort, not null out. Shared by the latest-view
    * and time-travel readers so the codec cannot drift between them. */
  private def tailFrame(schema: org.apache.spark.sql.types.StructType,
      lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema)
      .option("timestampFormat", TsPattern)
      .option("mode", "FAILFAST")
      .json(spark.createDataset(lines))
  }

  /** checkpoint parquet ∪ tail. None when the checkpoint DIR vanished
    * (GC deleted our listed version out from under us — two newer
    * checkpoints + a vacuum since the listing); a missing KIND subdir
    * inside a present checkpoint just means the kind was empty at
    * checkpoint time. The two must not be conflated, or the reader
    * would silently serve the ≤K tail as the entire table. */
  private def ckptUnion(schema: org.apache.spark.sql.types.StructType,
      ckptV: Long, kind: String, tailDf: DataFrame): Option[DataFrame] =
    if (ckptV == 0) Some(tailDf)
    else if (Files.isDirectory(ckptPath(ckptV))) {
      val kindPath = ckptPath(ckptV).resolve(kind)
      Some(if (Files.isDirectory(kindPath))
        spark.read.schema(schema).parquet(kindPath.toString).union(tailDf)
      else tailDf)
    } else None

  private def readKindAt[T <: Product : TypeTag](
      kind: String, cap: Option[Long] = None): DataFrame = {
    val schema = Encoders.product[T].schema
    var attempt = 0
    while (true) {
      val (tails, ckptV) = snapshot()
      val lines = tails
        .filter(t => t._2 == kind && cap.forall(t._1 <= _))
        .map(_._3)
      ckptUnion(schema, ckptV, kind, tailFrame(schema, lines)) match {
        case Some(df) => return df
        case None =>
          attempt += 1
          if (attempt >= 10) throw new IllegalStateException(
            s"MwStateStore $dir: checkpoint $ckptV vanished under $attempt " +
              "consecutive reads (GC storm?)")
      }
    }
    sys.error("unreachable")
  }

  private def readKind[T <: Product : TypeTag](kind: String): DataFrame =
    readKindAt[T](kind)

  // ---- time travel --------------------------------------------------------

  /** Does this failure mean "a file WE just listed under one of
    * `anchors` no longer exists"? Walks the cause chain: Spark wraps the
    * underlying FileNotFound in job/analysis exceptions, and DSv2 path
    * resolution reports a vanished root as an AnalysisException whose
    * message (not class) carries "Path does not exist".
    *
    * The match is ANCHORED: a vanished-file signal only counts when the
    * failing path (exception message, or NoSuchFileException's file
    * field) names the checkpoint / commit-log directory this read is
    * actually touching. An unanchored class/phrase match would classify
    * a genuinely missing store root — or any unrelated error that
    * happens to embed the phrase — as the retryable GC race and burn
    * the whole retry budget before surfacing it. */
  private def fileVanished(t: Throwable, anchors: Seq[String]): Boolean = {
    def anchored(s: String): Boolean =
      s != null && anchors.exists(s.contains)
    var cur = t
    var depth = 0
    while (cur != null && depth < 20) {
      cur match {
        case e: java.nio.file.NoSuchFileException
          if anchored(e.getFile) || anchored(e.getMessage) => return true
        case e: java.io.FileNotFoundException
          if anchored(e.getMessage) => return true
        case e if e.getMessage != null && anchored(e.getMessage) &&
          (e.getMessage.contains("Path does not exist") ||
            e.getMessage.contains("PATH_NOT_FOUND")) => return true
        case _ =>
      }
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** One kind's frame AS OF commit version `asOf` — exactly the table a
    * reader saw when `asOf` was the newest commit (Delta-style time
    * travel; the commit version is the store's only clock, so "as of"
    * is exact, not approximate). Reconstruction = the newest SURVIVING
    * checkpoint ≤ asOf plus the dense commit run (ckpt, asOf]. Like
    * Delta, the horizon is bounded by retention: once vacuum has
    * dropped a needed commit and checkpoint GC the ≤-asOf checkpoints,
    * the version is gone — the read then fails LOUDLY naming the oldest
    * still-reconstructable version rather than silently serving a
    * partial table (the same no-silent-partial-view doctrine as
    * [[snapshot]]'s density check). */
  private def readKindAsOf[T <: Product : TypeTag](kind: String, asOf: Long): DataFrame = {
    require(asOf >= 1, s"asOf must be >= 1, got $asOf")
    // checkpoint floor, NOT a raw listing: after a vacuum that empties
    // the commit dir, latestVersion() without the floor reports 0 and
    // would reject asOf = the checkpoint version itself — which is
    // exactly reconstructable (checkpoint + empty tail)
    val latest = version
    require(asOf <= latest,
      s"MwStateStore $dir: asOf $asOf is in the future (latest commit is $latest)")
    val schema = Encoders.product[T].schema
    var attempt = 0
    var lastProblem = ""
    while (attempt < 10) {
      val ckpts = listCheckpointVersions().filter(_ <= asOf)
      val ckptV = if (ckpts.isEmpty) 0L else ckpts.max
      try {
        val commits = log.commitsAfter(ckptV).filter(_._1 <= asOf)
        if (commits.map(_._1) != ((ckptV + 1) to asOf)) {
          // permanent (vacuumed prefix) and transient (listing race)
          // gaps are indistinguishable from one listing — retry the few
          // cheap attempts, then report as unreconstructable
          lastProblem = s"commits ${ckptV + 1}..$asOf incomplete over checkpoint $ckptV"
          attempt += 1
        } else {
          val lines = commits.flatMap { case (_, p) =>
            val ls = p.split('\n')
            if (ls.head == kind) ls.drop(1).filter(_.nonEmpty).toSeq else Seq.empty
          }
          ckptUnion(schema, ckptV, kind, tailFrame(schema, lines)) match {
            case Some(df) => return df
            case None =>
              lastProblem = s"checkpoint $ckptV vanished (GC race)"
              attempt += 1
          }
        }
      } catch {
        // a checkpoint GC'd between the directory check and the Spark
        // parquet read surfaces as a Spark-side FileNotFound /
        // AnalysisException (possibly nested in a job failure), not the
        // NIO NoSuchFileException the commit-log reads throw — and as-of
        // reads target OLD checkpoints, the prime GC candidates, so both
        // shapes are the same retryable race. Anything that is not a
        // vanished-file signal ANCHORED to this store's checkpoint or
        // commit-log directories stays fatal — and if the checkpoint dir
        // is simply gone (GC finished while Spark was mid-read), that
        // directory check alone settles it without any message parsing.
        case scala.util.control.NonFatal(e)
          if (ckptV > 0 && !Files.isDirectory(ckptPath(ckptV))) ||
            fileVanished(e, Seq(ckptPath(ckptV).toString,
              Paths.get(dir, "_txn").toString)) =>
          lastProblem = e.toString; attempt += 1
      }
    }
    throw new IllegalStateException(
      s"MwStateStore $dir: version $asOf is not reconstructable ($lastProblem); " +
        s"oldest reconstructable version is ${oldestReconstructableVersion()} — " +
        "time travel is bounded by vacuum + checkpoint-GC retention")
  }

  /** The newest commit version — the value [[monitorEventsAsOf]] of
    * which equals [[monitorEvents]]. Floored at the newest checkpoint:
    * TxnLog.latestVersion's raw listing under-reports after a vacuum
    * that emptied the commit dir (its own scaladoc's warning — every
    * commit path here already passes the same floor). */
  def version: Long = log.latestVersion(latestCheckpointVersion())

  /** EARLIEST `asOf` a time-travel read can still reconstruct: 1 while
    * no commit has been vacuumed; after vacuum, the oldest surviving
    * checkpoint (a checkpoint version is always reconstructable by
    * itself — checkpoint + empty tail). NOTE the reconstructable set is
    * not necessarily contiguous: a version BETWEEN two surviving
    * checkpoints whose tail commits were vacuumed (e.g. 5 when
    * checkpoints {4, 8} survive but commits 1..8 are gone) is still
    * unreconstructable; this is the lower bound, and the per-read
    * failure is authoritative for any specific version. */
  def oldestReconstructableVersion(): Long = {
    val ckpts = listCheckpointVersions()
    val surviving = log.commitsAfter(0L).map(_._1)
    if (surviving.nonEmpty && surviving.min <= 1) 1L
    else if (ckpts.nonEmpty) ckpts.min
    // no checkpoint: vacuum can't have run (it only deletes what a
    // published checkpoint covers), so either the store is empty (0 =
    // nothing to reconstruct) or commits survive from 1 in full
    else if (surviving.isEmpty) 0L
    else surviving.min
  }

  def monitorEventsAsOf(asOf: Long): DataFrame =
    readKindAsOf[MonitorEvent]("monitor", asOf)
  def envvarEventsAsOf(asOf: Long): DataFrame =
    readKindAsOf[EnvVarEvent]("envvar", asOf)

  /** [[monitorState]] as of a commit version — "what did the control
    * plane believe when run 123 started" as a first-class query. */
  def monitorStateAsOf(asOf: Long): DataFrame =
    StateStore.latestState(monitorEventsAsOf(asOf), Seq("run_key"), Seq(col("event_seq").desc))

  // ---- monitor event log --------------------------------------------------

  def monitorEvents: DataFrame = readKind[MonitorEvent]("monitor")
  def envvarEvents: DataFrame = readKind[EnvVarEvent]("envvar")

  /** Current batch_monitor state — same W1 view as the single-writer
    * store. */
  def monitorState: DataFrame =
    StateStore.latestState(monitorEvents, Seq("run_key"), Seq(col("event_seq").desc))

  /** Append a monitor event; the caller's `event_seq` is IGNORED — the
    * commit version is the seq (returned). Durable on return. */
  def appendMonitorEvent(ev: MonitorEvent): Long =
    appendEventAssigned(s => ev.copy(event_seq = s))

  /** Guard + append in one optimistic transaction: `admit` re-evaluates
    * against the pre-`v` snapshot on every retry, so winning the version
    * proves the guard held with nothing interleaved. */
  def appendEventGuarded(mk: Long => MonitorEvent,
      admit: () => Boolean): Option[Long] =
    log.commitOpt(v =>
        if (!admit()) None
        else Some(payload("monitor", Seq(mk(v).copy(event_seq = v)))),
        floor = latestCheckpointVersion())
      .map(_.tap(maybeCheckpoint))

  def transactRunIdGuarded(moduleId: Long, at: java.time.Instant,
      mk: (Long, Long) => MonitorEvent,
      admit: () => Boolean): Option[(Long, Long)] = {
    // guard and max re-derived from the pre-v snapshot on EVERY retry:
    // winning v proves neither a concurrent assignment nor a
    // guard-relevant event interleaved, so same-day run ids stay unique
    // and contiguous across any number of drivers
    var assigned = 0L
    log.commitOpt({ v =>
      if (!admit()) None
      else {
        assigned = ControlStore.maxRunId(monitorState, moduleId, at) + 1
        Some(payload("monitor",
          Seq(mk(assigned, v).copy(event_seq = v, run_id = assigned))))
      }
    }, floor = latestCheckpointVersion())
      .map { v => maybeCheckpoint(v); (assigned, v) }
  }

  // ---- envvar config ------------------------------------------------------

  def getEnv(name: String): Option[String] = getEnvs(Seq(name)).get(name)

  def getEnvs(names: Seq[String]): Map[String, String] =
    if (names.isEmpty) Map.empty
    else StateStore.latestState(
        envvarEvents.filter(col("variable_name").isin(names: _*)),
        Seq("variable_name"), Seq(col("event_seq").desc))
      .select("variable_name", "value").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  def updEnv(name: String, value: String): Unit = updEnvAssigned(name, value)

  /** [[updEnv]] returning the assigned seq (= commit version). */
  def updEnvAssigned(name: String, value: String): Long =
    log.commit(v => payload("envvar", Seq(EnvVarEvent(name, value, v))),
        floor = latestCheckpointVersion())
      .tap(maybeCheckpoint)

  // ---- dimension / manifest tables ---------------------------------------
  // Seq-free appends: one commit per put (multi-row payload), read back
  // through the same schema-pinned codec.

  private def putKind[T <: Product : TypeTag](kind: String, rows: Seq[T]): Unit =
    if (rows.nonEmpty) {
      log.commit(_ => payload(kind, rows), floor = latestCheckpointVersion())
        .tap(maybeCheckpoint)
      ()
    }

  def batchMaster: Dataset[BatchMaster] =
    readKind[BatchMaster]("master").as(Encoders.product[BatchMaster])
  def putBatchMaster(rows: Seq[BatchMaster]): Unit = putKind("master", rows)

  def dependencies: Dataset[BatchDependency] =
    readKind[BatchDependency]("dependency").as(Encoders.product[BatchDependency])
  def putDependencies(rows: Seq[BatchDependency]): Unit = putKind("dependency", rows)

  def loaderFiles: Dataset[TmpRunLoader] =
    readKind[TmpRunLoader]("loader").as(Encoders.product[TmpRunLoader])
  def putLoaderFiles(rows: Seq[TmpRunLoader]): Unit = putKind("loader", rows)

  def runCommands: Dataset[RunCommand] =
    readKind[RunCommand]("runcmd").as(Encoders.product[RunCommand])
  def putRunCommands(rows: Seq[RunCommand]): Unit = putKind("runcmd", rows)

  def mailAddresses: Dataset[MailAddr] =
    readKind[MailAddr]("mailaddr").as(Encoders.product[MailAddr])
  def putMailAddresses(rows: Seq[MailAddr]): Unit = putKind("mailaddr", rows)

  // ---- batch log + mail audit --------------------------------------------

  def appendLog(rec: BatchLogRec): Unit = putKind("log", Seq(rec))

  /** Purge-aware view: rows at or after every marker's horizon. */
  def batchLog: DataFrame = batchLogAt(None)

  private def batchLogAt(cap: Option[Long]): DataFrame = {
    val hz = readKindAt[LogPurge]("logpurge", cap).agg(max("horizon")).collect()(0)
    val base = readKindAt[BatchLogRec]("log", cap)
    if (hz.isNullAt(0)) base
    else base.filter(col("run_date") >= lit(hz.getTimestamp(0)))
  }

  /** S6 retention as an EVENT: immutable commits can't rewrite history,
    * so the purge appends a horizon marker; reads filter, the next
    * checkpoint materializes (same observable rows as the single-writer
    * rewrite, no 5000-row delete loop, no backup/swap window). */
  def purgeBatchLog(horizon: java.sql.Timestamp): Unit =
    putKind("logpurge", Seq(LogPurge(horizon)))

  def appendMailAudit(rec: MailAudit): Unit = putKind("mailaudit", Seq(rec))
  def mailAudit: DataFrame = readKind[MailAudit]("mailaudit")

  /** No writer role to release — multi-writer by construction. */
  def close(): Unit = ()

  // ---- checkpoint / vacuum -----------------------------------------------

  private implicit class Tap(v: Long) {
    def tap(f: Long => Unit): Long = { f(v); v }
  }

  /** Write a consolidated checkpoint when the committed version crosses a
    * K boundary: full per-kind parquet under a temp dir, published by
    * atomic directory rename (present ⟹ complete). Losing a concurrent
    * checkpoint race is fine — the winner's content is identical. */
  private def maybeCheckpoint(v: Long): Unit =
    if (v % checkpointEvery == 0) checkpoint()

  def checkpoint(): Long = {
    val ckptV0 = latestCheckpointVersion()
    val v = log.latestVersion(ckptV0)
    if (v == 0L) return 0L
    val target = ckptPath(v)
    if (Files.exists(target)) return v
    Files.createDirectories(ckptDir)
    val tmp = Files.createTempDirectory(ckptDir, ".tmp-")
    // every dump is pinned to commits ≤ v: a commit racing past v lands
    // in the tail the reader pairs with this checkpoint, and a capless
    // dump would deliver it TWICE (baked in + replayed)
    val cap = Some(v)
    def dump(kind: String, df: DataFrame): Unit =
      if (!df.isEmpty)
        df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve(kind).toString)
    dump("monitor", readKindAt[MonitorEvent]("monitor", cap))
    dump("envvar", readKindAt[EnvVarEvent]("envvar", cap))
    dump("master", readKindAt[BatchMaster]("master", cap))
    dump("dependency", readKindAt[BatchDependency]("dependency", cap))
    dump("loader", readKindAt[TmpRunLoader]("loader", cap))
    dump("runcmd", readKindAt[RunCommand]("runcmd", cap))
    dump("mailaddr", readKindAt[MailAddr]("mailaddr", cap))
    dump("mailaudit", readKindAt[MailAudit]("mailaudit", cap))
    // the purge horizon BAKES IN: log rows are stored pre-filtered and
    // the marker set folds to its max (still needed — a marker filters
    // rows appended after it with pre-horizon run_date)
    dump("log", batchLogAt(cap))
    dump("logpurge",
      readKindAt[LogPurge]("logpurge", cap).agg(max("horizon").as("horizon"))
        .filter(col("horizon").isNotNull))
    // a checkpoint that RACED PAST ours mid-dump is the one hazard: the
    // dumps above read "newest checkpoint + tail ≤ cap", so a newer
    // checkpoint appearing mid-dump would have fed them rows ABOVE our
    // cap for the seq-free kinds. Readers always take the max version,
    // so such a stale-labeled dump would never be READ — but don't even
    // publish it: discard and defer to the winner.
    if (latestCheckpointVersion() != ckptV0) { deleteRecursively(tmp); return v }
    try Files.move(tmp, target)
    catch { case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.DirectoryNotEmptyException =>
      deleteRecursively(tmp) // lost the race; winner's content is identical
    }
    v
  }

  /** Drop commits the newest checkpoint covers (and temp orphans), and
    * garbage-collect superseded checkpoints — each checkpoint is a FULL
    * history snapshot, so keeping every one would accumulate O(N²)
    * cumulative bytes over a deployment's life. The newest
    * `retainCheckpoints` survive: readers always take the max, but a
    * reader that listed the previous max just before this vacuum may
    * still be lazily reading its parquet — retaining one predecessor
    * gives those in-flight frames their grace window (same reasoning as
    * the tail-commit retry, which covers the JSON side). The checkpoint
    * version remains the floor [[TxnLog.commit]] consults, so vacuuming
    * can never cause version/seq reuse. */
  def vacuum(retainCheckpoints: Int = 2): Unit = {
    log.vacuum(latestCheckpointVersion())
    listCheckpointVersions().sorted
      .dropRight(math.max(retainCheckpoints, 1))
      // two drivers vacuuming concurrently race each other's deletes —
      // a dir vanishing mid-recursion must no-op, not throw (the same
      // idempotence TxnLog.vacuum documents)
      .foreach { v =>
        try deleteRecursively(ckptPath(v))
        catch { case _: java.nio.file.NoSuchFileException => () }
      }
  }

  private def deleteRecursively(path: Path): Unit = {
    if (Files.isDirectory(path)) {
      val children = Files.list(path)
      try children.forEach(deleteRecursively(_))
      finally children.close()
    }
    Files.deleteIfExists(path)
  }
}
