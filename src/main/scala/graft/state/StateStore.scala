package graft.state

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sourced control-table store (SURVEY §7.1): the Spark-native
  * replacement for the reference's mutable Oracle control tables.
  *
  *  - In-place UPDATE + autonomous transaction (body:192-214, 438-466, 676)
  *    → immediate, independent parquet append of a status event (X1): the
  *    event is durable the moment `appendMonitorEvent` returns, decoupled
  *    from the batch job's own outputs, exactly the write-ahead property
  *    the AUTONOMOUS_TRANSACTION pragma provided.
  *  - "Current state" (the monitor row the reference reads back,
  *    body:158-165, 224-237, 269-322) → the W1 latest-event-per-run view.
  *  - Chunked DELETE retention (body:926-939) → filter-rewrite (S6); no
  *    5000-row commit loop because immutable storage has no undo pressure.
  *
  * Scale: control tables are tiny relative to the data they orchestrate
  * (one event per run transition), so single-file appends are fine; a
  * long-lived deployment would periodically compact the event dir — the
  * read path (plain `spark.read.parquet`) is unchanged by compaction.
  * Concurrent drivers use [[MwStateStore]] — the transactional
  * implementation of this store's seq-sensitive surface (optimistic
  * [[TxnLog]] commits, version-as-seq) that replaces the `_writer.lock`
  * exclusion below with real multi-writer serialization.
  */
class StateStore(val spark: SparkSession, val dir: String) extends ControlStore {

  // The locking/recovery layer is java.nio, which resolves a remote URI
  // ("s3a://…", "hdfs://…") as a LITERAL LOCAL PATH: existence checks go
  // false, so the store would read as empty (no duplicate-run guard,
  // seqs re-assigned from 0) while Spark happily appends real events to
  // the remote dir — the exact silent no-op Stores.scala documents.
  // The control plane is driver-local by design; fail construction, not
  // the first read that quietly returns nothing.
  require(!dir.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*") && !dir.startsWith("file:"),
    s"StateStore requires a driver-local filesystem path, got '$dir' — its java.nio " +
      "locking/crash-recovery would silently treat a remote URI as a missing local " +
      "path (empty state, duplicate seqs). Use local storage for the control plane.")

  private def p(name: String): String = s"$dir/$name"

  // ---- single-writer guard ----------------------------------------------
  // The event logs are plain parquet appends with a single-assigner seq —
  // correct only under ONE writing driver. Rather than document that and
  // hope, enforce it: the first mutating call atomically creates a lock
  // file (CREATE_NEW is atomic on POSIX and HDFS-compatible stores);
  // a second store writing to the same dir fails loudly instead of
  // interleaving appends with stale seqs. `close()` releases the lock;
  // after a driver crash the operator removes the stale lock file (its
  // contents say who held it) — the seam where a transactional table
  // format with real transactions would replace the whole mechanism.
  private val writerId =
    s"pid=${ProcessHandle.current().pid()} store=${java.util.UUID.randomUUID()}"
  private def lockPath: Path = Paths.get(p("_writer.lock"))
  @volatile private var lockHeld = false
  private val unlockHook = new Thread(() => Files.deleteIfExists(lockPath))

  private def ensureWriterLock(): Unit = if (!lockHeld) synchronized {
    var attempts = 0
    while (!lockHeld) {
      Files.createDirectories(Paths.get(dir))
      try {
        Files.write(lockPath, writerId.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        // Writer-role handover, BEFORE the store is marked writer: the
        // counter must sit above everything durably logged before any
        // assignment. If the re-sync itself fails (e.g. an unreadable
        // log), release the lock and propagate — marking the store
        // writer with a stale counter would hand out duplicate seqs on
        // the caller's retry.
        try seq.getAndUpdate(cur => math.max(cur, maxLoggedSeq()))
        catch { case e: Throwable => Files.deleteIfExists(lockPath); throw e }
        // a cleanly-exiting driver that never calls close() must not
        // strand the lock for the next run
        Runtime.getRuntime.addShutdownHook(unlockHook)
        lockHeld = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // racing the holder's close(): the file can vanish between our
          // failed create and the read — retry the acquisition once
          val holder =
            try Some(new String(Files.readAllBytes(lockPath), "UTF-8"))
            catch { case _: java.io.IOException => None }
          if (holder.isEmpty && attempts == 0) { attempts += 1 }
          else throw new IllegalStateException(
            s"state dir $dir is held by another writer (${holder.getOrElse("unknown")}); " +
              "concurrent drivers would interleave event appends — close() the " +
              "other store, or remove the stale lock if that driver crashed")
      }
    }
  }

  /** Release the writer lock (idempotent). A store that never wrote never
    * acquired it. */
  def close(): Unit = synchronized {
    if (lockHeld) {
      Files.deleteIfExists(lockPath)
      lockHeld = false
      try Runtime.getRuntime.removeShutdownHook(unlockHook)
      catch { case _: IllegalStateException => () } // JVM already shutting down
    }
  }

  private def readOrEmpty[T <: Product : scala.reflect.runtime.universe.TypeTag](
      name: String): DataFrame = {
    recoverRewrite(name)
    val schema = Encoders.product[T].schema
    if (Files.exists(Paths.get(p(name))))
      spark.read.schema(schema).parquet(p(name))
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** In-JVM write serialization. The lock FILE guards cross-process
    * writers; threads inside one driver share this instance (the
    * BatchContext-per-run design invites concurrent batches), and
    * Spark's FileOutputCommitter stages every append of a log under the
    * same `_temporary` dir — two concurrent commits there can delete
    * each other's staged task files and silently lose events. All
    * writes serialize here, and callers composing an atomic
    * read-assign-append section (run-id assignment) synchronize on the
    * same monitor — `synchronized` is reentrant, so their inner appends
    * are safe. Appends are single-row control-plane writes; serializing
    * them costs nothing. */
  private[graft] val writeMonitor = new Object

  private def append[T <: Product : scala.reflect.runtime.universe.TypeTag](
      name: String, rows: Seq[T]): Unit = writeMonitor.synchronized {
    ensureWriterLock()
    spark.createDataset(rows)(Encoders.product[T]).write.mode("append").parquet(p(name))
  }

  // ---- batch_master (registry dimension) ---------------------------------
  def batchMaster: Dataset[BatchMaster] =
    readOrEmpty[BatchMaster]("batch_master").as(Encoders.product[BatchMaster])
  def putBatchMaster(rows: Seq[BatchMaster]): Unit = append("batch_master", rows)

  // ---- batch_monitor event log (S5/X1/X2) --------------------------------
  /** Monotonic event sequence; initialized from the max across EVERY
    * seq-numbered log (monitor + envvar events) so a restarted driver
    * continues above all prior writes — initializing from one log alone
    * could hand out seqs below existing envvar events and make the
    * latest-value view return stale config (single-assigner design,
    * SURVEY §7.6). */
  private def maxLoggedSeq(): Long = {
    def maxSeq(name: String, df: => DataFrame): Long =
      if (Files.exists(Paths.get(p(name))))
        df.agg(coalesce(max("event_seq"), lit(0L))).head().getLong(0)
      else 0L
    math.max(
      maxSeq("batch_monitor_events", monitorEvents),
      maxSeq("envvar_events", envvarEvents))
  }

  /** Starts at 0; the writer-lock acquisition in [[ensureWriterLock]] —
    * which [[nextSeq]] always performs before assigning — raises it to
    * the max across the durable logs, so the log scan happens exactly
    * once, at the moment this store becomes the writer. */
  private val seq: AtomicLong = new AtomicLong(0L)

  /** Seq assignment is a writer-role action: acquiring the lock here (not
    * only at append time) means a store that loses the writer race never
    * consumes numbers, and a store that wins after another writer's
    * close() re-syncs above that writer's events first. */
  def nextSeq(): Long = { ensureWriterLock(); seq.incrementAndGet() }

  /** X1: durable the moment this returns, independent of any job outcome. */
  def appendMonitorEvent(ev: MonitorEvent): Unit = append("batch_monitor_events", Seq(ev))

  /** [[ControlStore]] seam: guard + seq assignment + append, atomic
    * under the write monitor (this store's in-JVM serialization point;
    * the lock file covers cross-process, so an in-JVM admit check reads
    * state only this process writes). */
  def appendEventGuarded(mk: Long => MonitorEvent,
      admit: () => Boolean): Option[Long] = writeMonitor.synchronized {
    if (!admit()) None
    else {
      val s = nextSeq()
      appendMonitorEvent(mk(s))
      Some(s)
    }
  }

  /** [[ControlStore]] seam: guard + NVL(MAX)+1 run-id assignment fused
    * with the monitor insert — the read-assign-append section two
    * concurrent startups of one module must not interleave. */
  def transactRunIdGuarded(moduleId: Long, at: java.time.Instant,
      mk: (Long, Long) => MonitorEvent,
      admit: () => Boolean): Option[(Long, Long)] = writeMonitor.synchronized {
    if (!admit()) None
    else {
      val runId = ControlStore.maxRunId(monitorState, moduleId, at) + 1
      val s = nextSeq()
      appendMonitorEvent(mk(runId, s))
      Some((runId, s))
    }
  }

  def monitorEvents: DataFrame = readOrEmpty[MonitorEvent]("batch_monitor_events")

  /** Current batch_monitor state: latest event per run (W1 over run_key). */
  def monitorState: DataFrame =
    StateStore.latestState(monitorEvents, Seq("run_key"), Seq(col("event_seq").desc))

  // ---- batch_dependency (DAG edges, body:258-261) ------------------------
  def dependencies: Dataset[BatchDependency] =
    readOrEmpty[BatchDependency]("batch_dependency").as(Encoders.product[BatchDependency])
  def putDependencies(rows: Seq[BatchDependency]): Unit = append("batch_dependency", rows)

  // ---- batch_log (append-only, 7-day retention) --------------------------
  def appendLog(rec: BatchLogRec): Unit = append("batch_log", Seq(rec))
  def batchLog: DataFrame = readOrEmpty[BatchLogRec]("batch_log")

  /** Rewrite a log dir in place via temp-write, backup-move, swap-in
    * (Spark cannot overwrite a path it is reading). No window loses
    * data: a crash leaves either the original (before the backup move),
    * or the `.bak` copy that [[recoverRewrite]] restores on the next
    * open. This matters because compaction also runs over the monitor
    * and envvar logs — the control state's single source of truth, NOT
    * re-derivable — and it is still the seam where a transactional table
    * format would slot in. */
  private def rewriteInPlace(name: String, df: DataFrame): Unit = writeMonitor.synchronized {
    recoverRewrite(name)
    val path = Paths.get(p(name))
    if (!Files.exists(path)) return
    ensureWriterLock()
    val tmp = Paths.get(p(s"$name.rewrite"))
    val bak = Paths.get(p(s"$name.bak"))
    df.write.mode("overwrite").parquet(tmp.toString)
    deleteRecursively(bak)      // stale backup from an old crash
    Files.move(path, bak)       // crash here → recoverRewrite restores bak
    Files.move(tmp, path)
    deleteRecursively(bak)
  }

  /** Crash recovery for [[rewriteInPlace]]: if a driver died between the
    * backup move and the swap-in, the live dir is missing but the `.bak`
    * holds the full pre-rewrite content — restore it. Runs on every read
    * path (cheap existence checks). */
  private def recoverRewrite(name: String): Unit = {
    val path = Paths.get(p(name))
    val bak = Paths.get(p(s"$name.bak"))
    if (!Files.exists(path) && Files.exists(bak)) {
      // runs on every READ path, so two threads can race the same
      // recovery; the loser's move throws after the winner already
      // restored — tolerate exactly that state (Stores.recover's
      // require(ok || exists) discipline), re-throw anything else
      try Files.move(bak, path)
      catch { case e: java.nio.file.FileSystemException =>
        if (!Files.exists(path)) throw e
      }
    }
  }

  /** S6 retention purge (body:926-939) as filter-rewrite: keep rows newer
    * than the horizon. */
  def purgeBatchLog(horizon: java.sql.Timestamp): Unit =
    rewriteInPlace("batch_log", batchLog.filter(col("run_date") >= lit(horizon)))

  // ---- envvar config store (S9, body:861-875) ----------------------------
  def envvarEvents: DataFrame = readOrEmpty[EnvVarEvent]("envvar_events")

  /** func_get_env_from_db (body:861-875): current value or None. */
  def getEnv(name: String): Option[String] = getEnvs(Seq(name)).get(name)

  /** Batched [[getEnv]]: ONE latest-state job for any number of
    * variables — startup needs four (three flags + the control date),
    * and four independent window-over-events jobs per batch start is
    * pure control-plane overhead. */
  def getEnvs(names: Seq[String]): Map[String, String] =
    if (names.isEmpty) Map.empty
    else StateStore.latestState(
        envvarEvents.filter(col("variable_name").isin(names: _*)),
        Seq("variable_name"), Seq(col("event_seq").desc))
      .select("variable_name", "value").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  /** pack_envvar.proc_upd_env analogue (body:919-922): append new value. */
  def updEnv(name: String, value: String): Unit =
    append("envvar_events", Seq(EnvVarEvent(name, value, nextSeq())))

  // ---- tmp_run_batch (U8, body:994-1009) ---------------------------------
  def runCommands: Dataset[RunCommand] =
    readOrEmpty[RunCommand]("tmp_run_batch").as(Encoders.product[RunCommand])
  def putRunCommands(rows: Seq[RunCommand]): Unit = append("tmp_run_batch", rows)

  // func_get_run_command: the shared ControlStore default (WHEN OTHERS
  // → "0") reads this store's runCommands — nothing to add here.

  /** Compact an event log: rewrite the many small append files into one
    * coalesced layout (content unchanged — same events, same seqs; reads
    * go through the schema-pinned loaders). Run periodically from a
    * maintenance batch, exactly like the retention purge. */
  def compactLog(name: String): Unit = {
    val df = name match {
      case "batch_monitor_events" => monitorEvents
      case "envvar_events"        => envvarEvents
      case "batch_log"            => batchLog
      case other => throw new IllegalArgumentException(s"not a compactable event log: $other")
    }
    rewriteInPlace(name, df.coalesce(1))
  }

  // ---- tmp_run_loader manifest (S7, body:1174-1197) ----------------------
  def loaderFiles: Dataset[TmpRunLoader] =
    readOrEmpty[TmpRunLoader]("tmp_run_loader").as(Encoders.product[TmpRunLoader])
  def putLoaderFiles(rows: Seq[TmpRunLoader]): Unit = append("tmp_run_loader", rows)

  // ---- mail directory + audit (S8/S4, body:1059-1067, 1136-1148) ---------
  def mailAddresses: Dataset[MailAddr] =
    readOrEmpty[MailAddr]("mail_addr_lookup").as(Encoders.product[MailAddr])
  def putMailAddresses(rows: Seq[MailAddr]): Unit = append("mail_addr_lookup", rows)

  def appendMailAudit(rec: MailAudit): Unit = append("send_mail_audit", Seq(rec))
  def mailAudit: DataFrame = readOrEmpty[MailAudit]("send_mail_audit")

  private def deleteRecursively(path: Path): Unit = {
    if (Files.isDirectory(path)) {
      val children = Files.list(path)
      try children.forEach(deleteRecursively(_))
      finally children.close()
    }
    Files.deleteIfExists(path)
  }
}

object StateStore {
  /** W1 latest-row-per-group view (body:158-165 intent — see SURVEY §2.5):
    * one window pass partitioned by the key; at scale this shuffles once on
    * the key and never collects a group to the driver. */
  def latestState(events: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
