package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Strips the origin statistics a `Dataset.checkpoint`/`localCheckpoint`
  * stashes on its `LogicalRDD` (`originStats` — Spark copies the
  * pre-checkpoint plan's ESTIMATE through the cut, see
  * `sql/core/.../ExistingRDD.scala`).
  *
  * Why this exists: in an iterative algorithm (connected components,
  * label propagation) each round joins frames derived from the previous
  * round's checkpoint and checkpoints again. Size-only join estimation
  * multiplies the two input estimates, so the carried-over estimate is
  * SQUARED every round — after ~25 materialize rounds the BigInt
  * `sizeInBytes` exceeds BigInteger's supported range and planning dies
  * with `ArithmeticException: BigInteger would overflow supported
  * range` (observed on a 256-node bit-reversed path graph; any
  * long-running iterative job on a real cluster hits the same wall).
  * Dropping `originStats` makes the frame report the default leaf
  * estimate instead — constant per round, so estimates no longer
  * compound; AQE re-plans joins from TRUE runtime sizes anyway, which
  * is the planning posture this engine relies on.
  *
  * Lives in an `org.apache.spark.sql` subpackage only because
  * `Dataset.ofRows` is `private[sql]`; the `LogicalRDD` surface used is
  * its public case-class API. The wrapped frame keeps the SAME
  * checkpointed RDD — `Engine.release` still finds and frees it. */
object CheckpointStats {
  def dropOriginStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(session,
          lr.copy()(session, originStats = None, originConstraints = None))
      case _ => df
    }
}
