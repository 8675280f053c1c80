package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative fixed-point operators (p5
  * alternating-star CC, c20 pointer jumping, the loops that reference
  * their previous round several times and would otherwise grow the
  * logical plan ~4× per round).
  *
  * Two materialization modes, selected by the session's checkpoint
  * configuration:
  *  - `SparkContext.setCheckpointDir` set (any reliable store — HDFS,
  *    S3, a mounted dir): reliable `checkpoint()`. Blocks live in the
  *    store, so a lost executor mid-iteration recomputes nothing and
  *    loses nothing — the right mode for a 1000-executor run where
  *    node loss during a long loop is routine.
  *  - no checkpoint dir (local/dev runs): eager `localCheckpoint()`.
  *    Blocks live on executors — fastest, but an executor loss kills
  *    the job; acceptable exactly when "the cluster" is one JVM.
  *
  * Both are EAGER, so each round's frame is computed once and the
  * lineage is cut at the same point in either mode; results are
  * bit-identical (CheckpointSpec proves p5 end-to-end equality). */
object Checkpoints {

  /** Materialize `df` and truncate its lineage per the session's
    * checkpoint configuration. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else
      df.localCheckpoint()
}
