package graft.lifecycle

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.state.{BatchLogRec, ControlStore, MwStateStore, StateStore}

/** The reference's batch-BODY shape as a reusable runner: `startup` →
  * work with a WHEN-OTHERS handler per step → `endup` with counts
  * (pkg_batch_util_body.sql:472-627 envelope + the X4
  * catch-log-continue discipline its callers wrap every step in),
  * applied to the engine's own upkeep — the nightly maintenance batch a
  * deployment schedules behind [[Lifecycle.dailyGate]].
  *
  * One failing store must not abort the sweep: a task failure is caught
  * (NonFatal only — a dying JVM aborts, as everywhere else), logged to
  * batch_log with the task named, counted into `records_in_error`, and
  * the remaining tasks still run. The batch ends SUCCESS only when
  * every task succeeded, with (ok, failed) as the record counts — so
  * the monitor view alone says whether maintenance is healthy, and
  * batch_log says which store is not.
  *
  * Scale: each task is one of the stores' own maintenance entry points
  * (watermark-driven compactions, bounded checkpoint/vacuum) — all
  * designed for their 100 TB layouts; the runner adds only
  * control-plane work.
  */
object Maintenance {

  /** One maintenance step. `run` must be idempotent — a re-run after a
    * crash replays the whole batch (every store compaction here is
    * crash-safe and replay-idempotent by design). */
  final case class Task(name: String, run: () => Unit)

  /** What happened: task names that succeeded, (name, error) for
    * failures, and the lifecycle run id the batch ran under. */
  final case class Report(runId: Long, succeeded: Seq[String], failed: Seq[(String, String)]) {
    def healthy: Boolean = failed.isEmpty
  }

  /** Run `tasks` under the lifecycle envelope. Startup failures (batch
    * not registered, duplicate run, …) surface as Left exactly like any
    * batch; task failures do NOT — they are the Report's `failed`. */
  def runBatch(lc: Lifecycle, batchName: String, tasks: Seq[Task]): Either[BatchError, Report] =
    lc.startup(batchName).map { ctx =>
      val ok = ArrayBuffer.empty[String]
      val bad = ArrayBuffer.empty[(String, String)]
      tasks.zipWithIndex.foreach { case (t, i) =>
        ctx.capture(Some(t.name))
        try { t.run(); ok += t.name }
        catch {
          case NonFatal(e) =>
            bad += t.name -> String.valueOf(e.getMessage)
            // the X4 discipline: log-and-continue, with the step named
            // (proc_reclog shape: batch_log row per handled failure)
            lc.store.appendLog(BatchLogRec(ctx.runDate, "maintenance", i + 1L,
              "graft.lifecycle", Some(batchName),
              Some(s"${t.name} failed: ${String.valueOf(e.getMessage).take(2000)}")))
        }
      }
      lc.endup(ctx,
        if (bad.isEmpty) RunStatus.Success else RunStatus.Failure,
        recordsProcessed = Some(ok.size.toLong), recordsInError = Some(bad.size.toLong))
      Report(ctx.runId, ok.toSeq, bad.toSeq)
    }

  /** Where a deployment's stores live; `None` skips the task. Fold
    * watermarks follow each store's replay contract (batches strictly
    * below the id are safe to fold — the caller's checkpoint/commit
    * bookkeeping decides the value). */
  final case class StoreLayout(
      searchIndex: Option[(String, Long)] = None,   // (path, foldBelow)
      lmModel: Option[(String, Long)] = None,       // (path, foldBelow)
      // batch-scoped since round 14 (appendNbBatch): same watermark
      // contract as the LM — retraction absorption waits for the fold
      // that covers every replay-protected batch
      nbModel: Option[(String, Long)] = None,       // (path, foldBelow)
      signatureStore: Option[String] = None,
      annIndex: Option[String] = None,
      ivfIndex: Option[String] = None,
      // replay watermark for the three stores above (their compactions
      // fold scoped batches below it, which is what lets a pending
      // RETRACTION physically complete — Dedup.retractSignatures). One
      // value, not per-store: the protecting checkpoint is the ingest
      // stream's, shared by whatever stores it feeds; 0 = fold nothing
      // scoped (always safe).
      retractionFoldBelow: Long = 0L)

  /** The standard sweep: every data-plane store the engine can
    * materialize, plus the control store's own upkeep (event-log
    * compaction for the single-writer store; checkpoint + vacuum for
    * the multi-writer one). */
  def standardTasks(s: SparkSession, store: ControlStore, layout: StoreLayout): Seq[Task] = {
    val data = Seq(
      layout.searchIndex.map { case (p, w) =>
        Task("compact-search-index", () => graft.operators.Search.compactSearchIndex(s, p, w)) },
      layout.lmModel.map { case (p, w) =>
        Task("compact-lm-model", () => graft.operators.TextOps.compactLmModel(s, p, w)) },
      layout.nbModel.map { case (p, w) =>
        Task("compact-nb-model", () => graft.operators.TextOps.compactNbModel(s, p, w)) },
      layout.signatureStore.map(p =>
        Task("compact-signatures", () =>
          graft.operators.Dedup.compactSignatures(s, p, layout.retractionFoldBelow))),
      layout.annIndex.map(p =>
        Task("compact-ann-index", () =>
          graft.operators.Similarity.compactAnnIndex(s, p, layout.retractionFoldBelow))),
      layout.ivfIndex.map(p =>
        Task("compact-ivf-index", () =>
          graft.operators.Similarity.compactIvfIndex(s, p, layout.retractionFoldBelow)))
    ).flatten
    val control = store match {
      case sw: StateStore => Seq(
        Task("compact-monitor-log", () => sw.compactLog("batch_monitor_events")),
        Task("compact-envvar-log", () => sw.compactLog("envvar_events")),
        Task("compact-batch-log", () => sw.compactLog("batch_log")))
      case mw: MwStateStore => Seq(
        Task("checkpoint-control-log", () => { mw.checkpoint(); () }),
        Task("vacuum-control-log", () => mw.vacuum()))
      case _ => Seq.empty
    }
    data ++ control
  }

  /** The maintenance sweep as ORCHESTRATOR MODULES — the DAG face of
    * [[standardTasks]]: one registry entry per data store, so
    * operations point each module's run command at
    * `graft.query maint_compact_<store>` and sequence the DAG through
    * the dependency DECODE matrix (compactions behind the ingest
    * module, exactly like any other batch estate), instead of one
    * monolithic task batch. Each entry runs the store's compaction and
    * returns the POST-COMPACTION store frame, so the orchestrator's
    * endup records the surviving row count — the monitor view then
    * shows per-store fold volume, not just a task tally (the
    * rows-folded-as-record-count convention the reference's loaders
    * used for their insert counts).
    *
    * Fold watermarks: when `ingestCheckpoint` names the ingest stream's
    * checkpoint dir, every foldBelow is DERIVED from it
    * ([[graft.streaming.EventStreams.committedWatermark]] + 1 — a batch
    * with a durable commit can never be replayed), so the orchestrated
    * sweep needs no human in the watermark loop; without one, the
    * layout's asserted values hold (0 = fold nothing scoped, always
    * safe). Model stores read back under their pinned count schemas —
    * a legitimately-empty fileless layout must report 0, not die on
    * schema inference. */
  def moduleRegistry(layout: StoreLayout, ingestCheckpoint: Option[String] = None)
      : Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    import graft.operators.{Dedup, Search, Similarity, TextOps}
    def wm(s: SparkSession, asserted: Long): Long = ingestCheckpoint
      .map(cp => graft.streaming.EventStreams.committedWatermark(s, cp) + 1L)
      .getOrElse(asserted)
    // Post-compaction readback for the stores WITHOUT pinned count
    // schemas: an absent store or an all-rows-folded fileless layout is
    // a SUCCESSFUL compaction with 0 survivors — report a 0-row frame,
    // never die on schema inference and fail the module (which would
    // cascade FAILURE into every MANDATORY dependent of the DAG while
    // standardTasks over the identical layout succeeds).
    // two layers: hasVisibleData rules out absent/residue-only dirs
    // cheaply, and the catch covers layouts the top-level listing
    // cannot see through (a visible shard dir whose every batch dir
    // folded away leaves files NOWHERE — schema inference dies where
    // an explicit schema would read 0)
    def countFrame(s: SparkSession, p: String): org.apache.spark.sql.DataFrame =
      if (!graft.sources.Stores.hasVisibleData(s, p)) s.range(0).toDF("rows")
      else try s.read.parquet(p)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).contains("UNABLE_TO_INFER_SCHEMA") ||
              e.getMessage.toLowerCase(java.util.Locale.ROOT)
                .contains("unable to infer schema") =>
          s.range(0).toDF("rows")
      }
    // Model stores carry pinned count schemas, so an EXISTING-but-
    // fileless layout already reads as 0 rows — but a NEVER-written
    // path (configured before the first train) must too, not die on
    // PATH_NOT_FOUND and cascade FAILURE through the DAG's dependents.
    def schemaFrame(s: SparkSession, p: String,
        schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
      if (graft.sources.Stores.pathExists(s, p)) s.read.schema(schema).parquet(p)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Seq(
      layout.searchIndex.map { case (p, w) => "maint_compact_search" ->
        ((s: SparkSession, _: String) => {
          Search.compactSearchIndex(s, p, wm(s, w)); countFrame(s, p) }) },
      layout.lmModel.map { case (p, w) => "maint_compact_lm" ->
        ((s: SparkSession, _: String) => {
          TextOps.compactLmModel(s, p, wm(s, w))
          schemaFrame(s, p, TextOps.lmCountsSchema) }) },
      layout.nbModel.map { case (p, w) => "maint_compact_nb" ->
        ((s: SparkSession, _: String) => {
          TextOps.compactNbModel(s, p, wm(s, w))
          schemaFrame(s, p, TextOps.nbCountsSchema) }) },
      layout.signatureStore.map(p => "maint_compact_signatures" ->
        ((s: SparkSession, _: String) => {
          Dedup.compactSignatures(s, p, wm(s, layout.retractionFoldBelow))
          countFrame(s, p) })),
      layout.annIndex.map(p => "maint_compact_ann" ->
        ((s: SparkSession, _: String) => {
          Similarity.compactAnnIndex(s, p, wm(s, layout.retractionFoldBelow))
          countFrame(s, p) })),
      layout.ivfIndex.map(p => "maint_compact_ivf" ->
        ((s: SparkSession, _: String) => {
          Similarity.compactIvfIndex(s, p, wm(s, layout.retractionFoldBelow))
          countFrame(s, p) })),
    ).flatten.toMap
  }
}
