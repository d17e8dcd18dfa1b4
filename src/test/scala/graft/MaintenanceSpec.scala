package graft

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.lifecycle._
import graft.state._

/** The maintenance batch (lifecycle/Maintenance): the reference's
  * startup → catch-log-continue → endup shape over real store upkeep,
  * proven on both control stores with REAL data-plane stores being
  * compacted mid-batch. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private class FixedClock(t: Instant) extends Clock { def now(): Instant = t }

  private def fixture(store: ControlStore): Lifecycle = {
    store.putBatchMaster(Seq(BatchMaster(100, "MAINT", 1, Some("OPS"), None)))
    new Lifecycle(store, new FixedClock(Instant.parse("2026-08-12T02:00:00Z")), SystemSleeper)
  }

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the long trip"),
    (3L, "sphinx of black quartz judge my vow before the winter ends")
  ).toDF("doc_id", "text")

  test("healthy sweep: every store compacts, batch ends SUCCESS with counts") {
    val store = new MwStateStore(spark, Files.createTempDirectory("graft-maint").toString)
    val lc = fixture(store)
    val idx = Files.createTempDirectory("graft-maint-idx").toString + "/postings"
    val sig = Files.createTempDirectory("graft-maint-sig").toString + "/signatures"
    graft.operators.Search.writeSearchIndexFrom(spark, corpus, idx)
    graft.operators.Search.appendSearchIndexBatch(spark, Seq(
      (4L, "a second batch of text rides in as its own posting partition"))
      .toDF("doc_id", "text"), idx, batchId = 1L)
    graft.operators.Dedup.writeSignatures(graft.operators.Dedup.signaturesOf(corpus), sig)
    val probeBefore = SearchProbe.scores(spark, idx)
    // an NB model with a PENDING retraction: the sweep's new
    // compact-nb-model task is its absorption path
    val nb = Files.createTempDirectory("graft-maint-nb").toString + "/nbmodel"
    graft.operators.TextOps.writeNbModel(spark, corpus, nb)
    graft.operators.TextOps.retractNbDocs(spark, nb, corpus.filter(
      org.apache.spark.sql.functions.col("doc_id") === 1L))
    assert(graft.sources.Stores.hasTombstones(spark, nb))

    val tasks = Maintenance.standardTasks(spark, store, Maintenance.StoreLayout(
      searchIndex = Some((idx, 2L)), nbModel = Some((nb, 100L)), signatureStore = Some(sig)))
    assert(tasks.map(_.name) === Seq("compact-search-index", "compact-nb-model",
      "compact-signatures", "checkpoint-control-log", "vacuum-control-log"))
    val report = Maintenance.runBatch(lc, "MAINT", tasks).toOption.get
    assert(report.healthy && report.succeeded.length === 5 && report.runId === 1L)
    assert(!graft.sources.Stores.hasTombstones(spark, nb),
      "the sweep must absorb the NB store's pending retraction")

    // the batch is VISIBLE in the monitor with its counts
    val st = store.monitorState.filter(
      org.apache.spark.sql.functions.col("module_id") === 100L).head()
    assert(st.getAs[String]("run_status") === RunStatus.Success)
    assert(st.getAs[Long]("records_processed") === 5L)
    assert(st.getAs[Long]("records_in_error") === 0L)
    // and the compaction preserved search semantics (batch partitions folded)
    assert(SearchProbe.scores(spark, idx) === probeBefore,
      "compaction must be score-preserving")
  }

  test("a failing task logs, counts, and does NOT stop the sweep (X4)") {
    val store = new MwStateStore(spark, Files.createTempDirectory("graft-maint2").toString)
    val lc = fixture(store)
    var ranAfter = false
    val tasks = Seq(
      Maintenance.Task("boom", () => sys.error("store is on fire")),
      Maintenance.Task("after", () => { ranAfter = true }))
    val report = Maintenance.runBatch(lc, "MAINT", tasks).toOption.get
    assert(!report.healthy && ranAfter, "tasks after the failure must still run")
    assert(report.failed === Seq("boom" -> "store is on fire"))
    val st = store.monitorState.filter(
      org.apache.spark.sql.functions.col("module_id") === 100L).head()
    assert(st.getAs[String]("run_status") === RunStatus.Failure)
    assert(st.getAs[Long]("records_processed") === 1L)
    assert(st.getAs[Long]("records_in_error") === 1L)
    val logged = store.batchLog.collect()
    assert(logged.length === 1 &&
      logged(0).getAs[String]("message") === "boom failed: store is on fire")
  }

  test("single-writer store upkeep tasks compact its event logs in-batch") {
    val store = new StateStore(spark, Files.createTempDirectory("graft-maint3").toString)
    val lc = fixture(store)
    (1 to 4).foreach(i => store.updEnv("K", s"v$i"))
    val before = store.envvarEvents.orderBy("event_seq").collect().toSeq
    val tasks = Maintenance.standardTasks(spark, store, Maintenance.StoreLayout())
    assert(tasks.map(_.name) === Seq("compact-monitor-log", "compact-envvar-log",
      "compact-batch-log"))
    val report = Maintenance.runBatch(lc, "MAINT", tasks).toOption.get
    assert(report.healthy)
    assert(store.envvarEvents.orderBy("event_seq").collect().toSeq === before,
      "compaction preserves events exactly")
    store.close()
  }

  test("startup failures surface as Left, not as a task failure") {
    val store = new MwStateStore(spark, Files.createTempDirectory("graft-maint4").toString)
    val lc = fixture(store)
    assert(Maintenance.runBatch(lc, "UNREGISTERED", Seq.empty) === Left(NoRecordBatchMaster))
  }
}
