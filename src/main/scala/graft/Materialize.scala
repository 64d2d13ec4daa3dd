package graft

import org.apache.spark.sql.DataFrame

/** Materialization helpers for session-lifetime substrates. */
object Materialize {

  /** Eagerly materialize a FACT-SIZED substrate with its lineage severed,
    * choosing the storage by deployment (r21 verdict item 6):
    *
    *  - when the session has a reliable checkpoint directory configured
    *    (`SparkContext.setCheckpointDir` or the `spark.checkpoint.dir`
    *    conf), use a RELIABLE checkpoint: blocks live in the checkpoint
    *    filesystem, so losing an executor cannot strand every consumer
    *    of the substrate for the rest of the session;
    *  - otherwise fall back to `localCheckpoint`, which stores blocks in
    *    executor memory/disk WITH NO RECOMPUTE PATH. That is the right
    *    local-mode/default posture (one JVM — executor loss IS session
    *    loss), but it is explicitly NOT safe under executor loss or
    *    dynamic allocation on a cluster: production deployments of the
    *    robust-location substrates should set a checkpoint dir.
    *
    * Node-SIZED materializations (cluster labels, candidate pair sets,
    * plan grids) keep calling `localCheckpoint` directly — their cost is
    * plan-size severing, and recomputation is cheap if ever needed. */
  def stateCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
