package graft.state

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-writer control store: the seq-sensitive half of [[StateStore]]
  * (monitor events, envvar config, run-id assignment) under TRUE
  * concurrent drivers — the swap the single-writer store's scaladoc
  * promises ("concurrent drivers would put the event log on a
  * transactional table format; the store API is the seam").
  *
  * Design (reference semantics: pkg_batch_util_body.sql:170-182 run-id
  * assignment, 192-214 autonomous status writes, 861-875 envvar reads):
  *
  *  - Every mutation is one [[TxnLog]] commit; **the commit version IS
  *    the event's `event_seq`**. Versions are dense and totally ordered
  *    across writers, so the single-assigner AtomicLong of the
  *    single-writer store is replaced by the log's own serialization —
  *    no lock file, no writer role, no handover.
  *  - Events ride INSIDE the commit payload (a kind tag + one JSON line
  *    per row): control-plane rows are a few hundred bytes, so the
  *    payload-as-data design makes an append one tmp-write + one atomic
  *    link — no Spark job, no parquet task commit — while staying fully
  *    durable-on-return (the X1 autonomous-transaction property).
  *  - Read-modify-write (run-id assignment) runs inside
  *    `TxnLog.commit(v => …)`: the payload derives `max(run_id)+1` from
  *    the snapshot `< v`, and winning `v` proves no concurrent
  *    assignment slipped in — NVL(MAX)+1 stays monotonic per
  *    (module, day) across any number of drivers.
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
final class MwStateStore(val spark: SparkSession, val dir: String, checkpointEvery: Int = 64) {
  require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")

  val log = new TxnLog(dir)

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
  private def jts(t: java.sql.Timestamp): String = js(Iso.format(t.toInstant))
  private def jopt(o: Option[String], enc: String => String = js): String =
    o.map(enc).getOrElse("null")

  private def monitorJson(e: MonitorEvent): String =
    s"""{"run_key":${js(e.run_key)},"event_seq":${e.event_seq},""" +
      s""""module_id":${e.module_id},"run_date":${jts(e.run_date)},""" +
      s""""run_id":${e.run_id},"parameters":${jopt(e.parameters)},""" +
      s""""audit_id":${jopt(e.audit_id)},"run_status":${js(e.run_status)},""" +
      s""""sub_system":${jopt(e.sub_system)},""" +
      s""""exclusive_run_yn":${jopt(e.exclusive_run_yn)},""" +
      s""""control_date":${e.control_date.map(jts).getOrElse("null")},""" +
      s""""end_time":${e.end_time.map(jts).getOrElse("null")},""" +
      s""""records_processed":${e.records_processed.map(_.toString).getOrElse("null")},""" +
      s""""records_in_error":${e.records_in_error.map(_.toString).getOrElse("null")}}"""

  private def envvarJson(e: EnvVarEvent): String =
    s"""{"variable_name":${js(e.variable_name)},"value":${js(e.value)},""" +
      s""""event_seq":${e.event_seq}}"""

  // ---- snapshot read ------------------------------------------------------

  private def latestCheckpointVersion(): Long =
    if (!Files.isDirectory(ckptDir)) 0L
    else {
      val s = Files.list(ckptDir)
      try {
        val vs = s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.forall(_.isDigit)).map(_.toLong).toSeq
        if (vs.isEmpty) 0L else vs.max
      } finally s.close()
    }

  /** (kind → JSON lines from tail commits, checkpoint version). Retries
    * if a concurrent checkpoint+vacuum deletes a tail commit mid-read —
    * the re-read starts from the NEWER checkpoint, which covers it. */
  private def snapshot(): (Map[String, Seq[String]], Long) = {
    var attempt = 0
    while (true) {
      val ckptV = latestCheckpointVersion()
      try {
        val tail = log.commitsAfter(ckptV).flatMap { case (_, payload) =>
          val lines = payload.split('\n')
          lines.drop(1).filter(_.nonEmpty).map(lines.head -> _)
        }
        return (tail.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }, ckptV)
      } catch {
        case e: java.nio.file.NoSuchFileException =>
          attempt += 1
          if (attempt > 10) throw new IllegalStateException(
            s"MwStateStore $dir: tail commits kept vanishing under reads " +
              "(vacuum storm?)", e)
      }
    }
    sys.error("unreachable")
  }

  private def readKind[T <: Product : scala.reflect.runtime.universe.TypeTag](
      kind: String): DataFrame = {
    val schema = Encoders.product[T].schema
    val (tails, ckptV) = snapshot()
    import spark.implicits._
    val tailDf = spark.read.schema(schema)
      .option("timestampFormat", TsPattern)
      .option("mode", "FAILFAST") // a malformed control event must abort, not null out
      .json(spark.createDataset(tails.getOrElse(kind, Seq.empty)))
    val ckptKindPath = ckptPath(ckptV).resolve(kind)
    if (ckptV > 0 && Files.isDirectory(ckptKindPath))
      spark.read.schema(schema).parquet(ckptKindPath.toString).union(tailDf)
    else tailDf
  }

  def monitorEvents: DataFrame = readKind[MonitorEvent]("monitor")
  def envvarEvents: DataFrame = readKind[EnvVarEvent]("envvar")

  /** Current batch_monitor state — same W1 view as the single-writer
    * store. */
  def monitorState: DataFrame =
    StateStore.latestState(monitorEvents, Seq("run_key"), Seq(col("event_seq").desc))

  // ---- mutations ----------------------------------------------------------

  /** Append a monitor event; the caller's `event_seq` is IGNORED — the
    * commit version is the seq (returned). Durable on return. */
  def appendMonitorEvent(ev: MonitorEvent): Long =
    log.commit(v => s"monitor\n${monitorJson(ev.copy(event_seq = v))}",
        floor = latestCheckpointVersion())
      .tap(maybeCheckpoint)

  /** Current value of a variable (latest event wins — by seq = version,
    * so "latest" is the total commit order, not a wall clock). */
  def getEnv(name: String): Option[String] =
    StateStore.latestState(
        envvarEvents.filter(col("variable_name") === name),
        Seq("variable_name"), Seq(col("event_seq").desc))
      .select("value").collect().headOption.map(_.getString(0))

  def updEnv(name: String, value: String): Long =
    log.commit(v => s"envvar\n${envvarJson(EnvVarEvent(name, value, v))}",
        floor = latestCheckpointVersion())
      .tap(maybeCheckpoint)

  /** Transactional func_get_run_id + WAITING insert (body:170-182 +
    * 192-214 fused): assigns `NVL(MAX(run_id), 0) + 1` for (module, day
    * of `runDate`) and appends the run's first monitor event in ONE
    * commit. The max is re-derived from the pre-`v` snapshot on every
    * retry, so concurrent drivers get unique, contiguous run ids — the
    * guarantee the single-writer store could only provide by forbidding
    * the second driver. Returns (run_id, event_seq). */
  def assignRunId(template: MonitorEvent): (Long, Long) = {
    val epochDay = Math.floorDiv(template.run_date.toInstant.getEpochSecond, 86400L)
    var assigned = 0L
    val v = log.commit({ v =>
      val mx = monitorState.filter(
          col("module_id") === template.module_id &&
          expr("unix_micros(run_date) div 86400000000") === lit(epochDay))
        .agg(coalesce(max("run_id"), lit(0L))).head().getLong(0)
      assigned = mx + 1
      s"monitor\n${monitorJson(template.copy(event_seq = v, run_id = assigned))}"
    }, floor = latestCheckpointVersion())
    maybeCheckpoint(v)
    (assigned, v)
  }

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
    val v = log.latestVersion(latestCheckpointVersion())
    if (v == 0L) return 0L
    val target = ckptPath(v)
    if (Files.exists(target)) return v
    Files.createDirectories(ckptDir)
    val tmp = Files.createTempDirectory(ckptDir, ".tmp-")
    // materialize the CURRENT view (checkpoint + tail as of now); rows
    // with seq > v may slip in — harmless, the checkpoint then covers
    // MORE than v and tail commits merely re-deliver rows the union
    // de-duplicates by construction (identical (kind, seq) rows appear
    // once per source, and sources never overlap: tail starts AFTER the
    // checkpoint version the reader pairs it with)
    def dump[T <: Product : scala.reflect.runtime.universe.TypeTag](kind: String): Unit = {
      val df = readKind[T](kind).filter(col("event_seq") <= v)
      if (!df.isEmpty)
        df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve(kind).toString)
    }
    dump[MonitorEvent]("monitor")
    dump[EnvVarEvent]("envvar")
    try Files.move(tmp, target)
    catch { case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.DirectoryNotEmptyException =>
      deleteRecursively(tmp) // lost the race; winner's content is identical
    }
    v
  }

  /** Drop commits the newest checkpoint covers (and temp orphans). The
    * checkpoint version is the floor [[TxnLog.commit]] consults, so
    * vacuuming can never cause version/seq reuse. */
  def vacuum(): Unit = log.vacuum(latestCheckpointVersion())

  private def deleteRecursively(path: Path): Unit = {
    if (Files.isDirectory(path)) {
      val children = Files.list(path)
      try children.forEach(deleteRecursively(_))
      finally children.close()
    }
    Files.deleteIfExists(path)
  }
}
