package graft.operators

import org.apache.spark.sql.DataFrame

/** Pluggable lineage truncation for iterative operators (the CC loop in
  * [[Dedup.clusterPairs]]): each round's result must be materialized so
  * round N+1 doesn't recompute rounds 1..N, but WHERE it materializes is a
  * deployment decision, not an algorithm decision.
  */
sealed trait Checkpointer {
  def apply(df: DataFrame): DataFrame

  /** Best-effort release of the storage behind a frame previously
    * returned by [[apply]]. An iterative operator calls this on round
    * N−1 once round N has materialized — without it, every round's
    * blocks (Local) or DFS files (Reliable) survive to the end of the
    * job, and a long-running cluster accumulates dead checkpoint data
    * (Spark never deletes reliable checkpoints on its own). Must only be
    * called when nothing will read the frame again. */
  def release(df: DataFrame): Unit

  protected final def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}

object Checkpointer {

  /** Executor-local block storage. Fast (no replication, no DFS write) but
    * UNRELIABLE: lineage is truncated with no recompute path, so losing any
    * executor mid-iteration fails the job. Right for local mode and dev
    * loops; wrong for a 1000-executor cluster where some executor loss per
    * hour is the expected case, not the failure case.
    */
  case object Local extends Checkpointer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint()
    def release(df: DataFrame): Unit =
      checkpointedRdd(df).foreach(_.unpersist(blocking = false))
  }

  /** Reliable checkpoint to the SparkContext checkpoint directory (HDFS /
    * object store on a cluster). Each round pays a DFS write, and in
    * exchange an executor loss recovers by re-reading the checkpoint
    * instead of killing the job — the mode a 100 TB run uses.
    *
    * Sets the context checkpoint dir on first use if the caller hasn't;
    * an already-configured dir wins (cluster operators typically set it
    * once at submit time).
    */
  final case class Reliable(dir: String) extends Checkpointer {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
    def release(df: DataFrame): Unit =
      for (rdd <- checkpointedRdd(df); f <- rdd.getCheckpointFile) {
        val path = new org.apache.hadoop.fs.Path(f)
        val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(path, true)
      }
  }

  /** Deployment seam: pick the mode from session config —
    * `spark.graft.cc.checkpoint=reliable` (with
    * `spark.graft.cc.checkpointDir=<dfs path>` or a context checkpoint
    * dir already set) for clusters, Local otherwise. This is how the
    * production entry points (q_dedup_clusters, the capstone pipeline)
    * reach Reliable mode without code changes. */
  def fromConf(s: org.apache.spark.sql.SparkSession): Checkpointer =
    s.conf.getOption("spark.graft.cc.checkpoint") match {
      case Some("reliable") =>
        val dir = s.conf.getOption("spark.graft.cc.checkpointDir")
          .orElse(s.sparkContext.getCheckpointDir)
          .getOrElse(throw new IllegalArgumentException(
            "spark.graft.cc.checkpoint=reliable needs spark.graft.cc.checkpointDir " +
              "or an existing SparkContext checkpoint dir"))
        Reliable(dir)
      case _ => Local
    }
}
