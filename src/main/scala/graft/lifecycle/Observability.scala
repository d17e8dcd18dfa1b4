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

  /** Run `f` under a named job group (cleared afterwards even on failure). */
  def withJobGroup[T](spark: SparkSession, opName: String, detail: String = "")(f: => T): T = {
    spark.sparkContext.setJobGroup(opName,
      if (detail.isEmpty) opName else detail, interruptOnCancel = false)
    try f finally spark.sparkContext.clearJobGroup()
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
