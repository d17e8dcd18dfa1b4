package graft.lifecycle

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** X5 progress observability — the engine analogue of
  * DBMS_APPLICATION_INFO.set_module/set_action and
  * proc_write_session_longops (spec:122-124; body:486-487, 519, 541,
  * 1253-1266): operations tag the Spark job group/description so the UI,
  * event logs, and listeners attribute every stage to the batch step that
  * ran it.
  */
object Observability {

  /** Run `f` under a named job group, RESTORING any enclosing group
    * afterwards (even on failure) — clearing unconditionally would wipe a
    * session-level group a caller set for the whole batch, silently
    * losing UI/event-log attribution for everything after the first
    * nested step. */
  def withJobGroup[T](spark: SparkSession, opName: String, detail: String = "")(f: => T): T = {
    val sc = spark.sparkContext
    val prevId = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(opName,
      if (detail.isEmpty) opName else detail, interruptOnCancel = false)
    try f finally {
      if (prevId == null) sc.clearJobGroup()
      else {
        sc.setLocalProperty("spark.jobGroup.id", prevId)
        sc.setLocalProperty("spark.job.description", prevDesc)
        sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
      }
    }
  }

  /** A query's physical-plan footprint: stage count, task count, and
    * shuffle bytes read/written. Two runs of the SAME plan over the
    * same data report identical stages/tasks and (data-determined)
    * shuffle bytes — which makes a bench-gate flag adjudicable from
    * data instead of inference: metrics flat + wall up = host smear;
    * metrics moved = the plan actually drifted (r18 verdict item 2). */
  final case class PlanSnap(stages: Long, tasks: Long,
      shuffleRead: Long, shuffleWrite: Long) {
    def -(o: PlanSnap): PlanSnap = PlanSnap(stages - o.stages,
      tasks - o.tasks, shuffleRead - o.shuffleRead, shuffleWrite - o.shuffleWrite)
  }

  /** Accumulating plan meter. Attach once per session; diff
    * [[snapshot]]s around a query (draining the listener bus first —
    * stage-completed events are ASYNC) to get that query's footprint. */
  final class PlanMeter {
    import java.util.concurrent.atomic.AtomicLong
    private val stages = new AtomicLong(0)
    private val tasks = new AtomicLong(0)
    private val shr = new AtomicLong(0)
    private val shw = new AtomicLong(0)
    val listener: SparkListener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          // totalBytesRead is private[spark]; its two public addends are the same figure
          shr.addAndGet(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead)
          shw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    def attach(spark: SparkSession): this.type = {
      spark.sparkContext.addSparkListener(listener); this
    }
    def snapshot: PlanSnap = PlanSnap(stages.get, tasks.get, shr.get, shw.get)
  }

  /** Block until the async listener bus has delivered every queued
    * event — without this, a fast query's stage events land AFTER the
    * snapshot and get attributed to the NEXT query. listenerBus /
    * waitUntilEmpty are private[spark] (public at bytecode level);
    * reflection is the supported-surface-free drain, best-effort by
    * design. */
  def drainListenerBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus").map(_.invoke(sc))
      bus.foreach { b =>
        b.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .map(_.invoke(b))
          .getOrElse(b.getClass.getMethods
            .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 1)
            .foreach(_.invoke(b, java.lang.Long.valueOf(10000L))))
      }
    } catch { case _: Throwable => () }

  /** Session-longops analogue: a listener reporting completed stages and
    * task counts through `report` (e.g. a logger or the batch_log).
    * Returns the listener so callers can remove it. */
  def addProgressListener(spark: SparkSession, report: String => Unit): SparkListener = {
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        report(s"stage ${sc.stageInfo.stageId} done: ${sc.stageInfo.name} " +
          s"(${sc.stageInfo.numTasks} tasks)")
    }
    spark.sparkContext.addSparkListener(l)
    l
  }
}
