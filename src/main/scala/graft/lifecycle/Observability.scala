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
