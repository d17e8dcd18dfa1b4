package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.lifecycle._
import graft.state._

/** Differential twin for the control plane: ONE scripted lifecycle
  * scenario executed against the single-writer StateStore and the
  * multi-writer MwStateStore must produce IDENTICAL observable state —
  * same events, same seqs (a sequential op stream assigns 1,2,3,… in
  * both disciplines), same latest-state views, same purge results. Any
  * divergence means one store implements different control semantics
  * than the other, which the ControlStore seam exists to forbid. */
class StoreEquivalenceSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private class FakeClock(var t: Instant) extends Clock {
    def now(): Instant = t
    def advance(secs: Long): Unit = t = t.plusSeconds(secs)
  }

  /** The scripted scenario: registry setup, env config, successful and
    * failed runs, typed failures, duplicate rejection, an exclusive run
    * over a satisfied dependency, log appends and a retention purge. */
  private def runScenario(store: ControlStore): Unit = {
    val clock = new FakeClock(Instant.parse("2026-08-12T10:00:00Z"))
    val lc = new Lifecycle(store, clock, SystemSleeper)
    store.putBatchMaster(Seq(
      BatchMaster(1, "etl_load", 1, Some("TEST"), None),
      BatchMaster(2, "etl_report", 1, Some("TEST"), None),
      BatchMaster(3, "etl_off", 1, Some("TEST"),
        Some(Timestamp.from(Instant.parse("2026-01-01T00:00:00Z"))))))
    store.putDependencies(Seq(BatchDependency(1L, 2L, "MANDATORY")))
    store.updEnv("BATCH_FLG_DBG", "Y")
    store.updEnv("BATCH_CONTROL_DATE", "12-Aug-2026")

    val a = lc.startup("etl_load").toOption.get            // seq: WAITING-free RUNNING
    clock.advance(60)
    assert(lc.endup(a, RunStatus.Success, Some(100L), Some(0L)))
    clock.advance(60)
    val b = lc.startup("etl_load", parameters = Some("x=1")).toOption.get
    assert(lc.startup("etl_load", parameters = Some("x=1")).swap.toOption
      .contains(DuplicateRun))                             // gate event
    assert(lc.startup("etl_off").swap.toOption.contains(BatchDisabled))
    assert(lc.startup("nope").swap.toOption.contains(NoRecordBatchMaster))
    // the parent must TERMINATE before the dependent child starts — a
    // RUNNING parent would put the exclusive startup into its (real,
    // 120 s) dependency poll loop
    assert(lc.endup(b, RunStatus.Success, Some(7L), Some(0L)))
    // exclusive child over the SUCCESS parent: WAITING then RUNNING
    val c = lc.startup("etl_report", exclusiveRun = true).toOption.get
    clock.advance(30)
    assert(lc.endup(c, RunStatus.Failure, Some(5L), Some(2L)))
    assert(!lc.endup(b), "re-endup is a no-op in both stores")

    (1 to 6).foreach { d =>
      store.appendLog(BatchLogRec(
        Timestamp.from(Instant.parse(f"2026-08-$d%02dT00:00:00Z")),
        "p", d.toLong, "graft", Some("etl_load"), Some(s"m$d")))
    }
    store.purgeBatchLog(Timestamp.from(Instant.parse("2026-08-04T00:00:00Z")))
    store.updEnv("BATCH_FLG_DBG", "N")
  }

  /** The honest equivalence relation: the two stores assign DIFFERENT
    * literal seq numbers (the multi-writer store's versions are commits,
    * and dimension puts are commits too, so monitor seqs sit higher) —
    * but the seq-bearing event stream must be the SAME EVENTS in the
    * SAME ORDER with consistently-derived run keys. Normalize by
    * re-ranking the combined (monitor ∪ envvar) seq space to 1..N and
    * rewriting the seq-derived run_key suffixes through the same map. */
  private def normalized(monitorEvents: Seq[MonitorEvent],
      envvarEvents: Seq[EnvVarEvent]): (Seq[String], Seq[String]) = {
    val rank = (monitorEvents.map(_.event_seq) ++ envvarEvents.map(_.event_seq))
      .sorted.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    def normKey(k: String): String = k.split("-", 2) match {
      case Array(m, s) if s.nonEmpty && s.forall(_.isDigit) =>
        s"$m-${rank.getOrElse(s.toLong, -1L)}"
      case _ => k
    }
    (monitorEvents.sortBy(_.event_seq)
      .map(e => e.copy(event_seq = rank(e.event_seq), run_key = normKey(e.run_key)).toString),
     envvarEvents.sortBy(_.event_seq)
      .map(e => e.copy(event_seq = rank(e.event_seq)).toString))
  }

  private def collectEvents(store: ControlStore): (Seq[MonitorEvent], Seq[EnvVarEvent]) = {
    import org.apache.spark.sql.Encoders
    val env = store match {
      case s: StateStore => s.envvarEvents
      case s: MwStateStore => s.envvarEvents
      case other => fail(s"unexpected store $other")
    }
    (store.monitorEvents.as(Encoders.product[MonitorEvent]).collect().toSeq,
      env.as(Encoders.product[EnvVarEvent]).collect().toSeq)
  }

  test("single-writer and multi-writer stores produce identical control state") {
    val swDir = Files.createTempDirectory("graft-eq-sw").toString
    val mwDir = Files.createTempDirectory("graft-eq-mw").toString
    val sw = new StateStore(spark, swDir)
    val mw = new MwStateStore(spark, mwDir)
    runScenario(sw)
    runScenario(mw)
    sw.close()

    val (swMon, swEnv) = (normalized _).tupled(collectEvents(sw))
    val (mwMon, mwEnv) = (normalized _).tupled(collectEvents(mw))
    assert(swMon === mwMon,
      "monitor event streams must match field-for-field under seq re-ranking")
    assert(swMon.length >= 10, "scenario must exercise a real stream")
    assert(swEnv === mwEnv)

    def rows(df: org.apache.spark.sql.DataFrame, order: String*): Seq[String] =
      df.orderBy(order.head, order.tail: _*).collect().map(_.toString).toSeq
    assert(rows(sw.batchLog, "statement_num") === rows(mw.batchLog, "statement_num"),
      "purge-as-rewrite and purge-as-marker must yield the same surviving rows")
    // latest-state view: identical modulo the surrogate key/seq columns
    def state(df: org.apache.spark.sql.DataFrame): Seq[String] =
      rows(df.drop("run_key", "event_seq"), "module_id", "run_id")
    assert(state(sw.monitorState) === state(mw.monitorState))
    assert(sw.getEnvs(Seq("BATCH_FLG_DBG", "BATCH_CONTROL_DATE")) ===
      mw.getEnvs(Seq("BATCH_FLG_DBG", "BATCH_CONTROL_DATE")))
  }

  test("equivalence survives the multi-writer checkpoint/vacuum cycle") {
    val swDir = Files.createTempDirectory("graft-eq2-sw").toString
    val mwDir = Files.createTempDirectory("graft-eq2-mw").toString
    val sw = new StateStore(spark, swDir)
    val mw = new MwStateStore(spark, mwDir, checkpointEvery = 5)
    runScenario(sw)
    runScenario(mw)
    sw.close()
    mw.checkpoint(); mw.vacuum()
    val fresh = new MwStateStore(spark, mwDir, checkpointEvery = 5)
    val (swMon, swEnv) = (normalized _).tupled(collectEvents(sw))
    val (mwMon, mwEnv) = (normalized _).tupled(collectEvents(fresh))
    assert(swMon === mwMon,
      "checkpointed+vacuumed multi-writer state must still equal the single-writer twin")
    assert(swEnv === mwEnv)
  }
}
