package graft.operators

import org.apache.spark.sql.DataFrame

/** Pluggable lineage truncation for iterative operators (the CC loop in
  * [[Dedup.clusterPairs]]): each round's result must be materialized so
  * round N+1 doesn't recompute rounds 1..N, but WHERE it materializes is a
  * deployment decision, not an algorithm decision.
  */
sealed trait Checkpointer {
  def apply(df: DataFrame): DataFrame
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
  }
}
