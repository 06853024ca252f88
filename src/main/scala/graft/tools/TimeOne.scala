package graft.tools

import org.apache.spark.sql.functions.{bit_xor, col, count, xxhash64}

/** Micro-bench one registered query in isolation (outlier triage —
  * the full [[graft.Bench]] suite is the recorded artifact):
  * `tools/run.sh graft.tools.TimeOne <query> [sfDir] [reps] [--count]`.
  * `--count` is for queries whose output is itself large (collect
  * would OOM the driver); it forces through the SAME all-columns
  * xxhash64 fold Bench uses — a bare `count()` would let Catalyst
  * prune every deterministic projection and time only the scan,
  * which is exactly wrong for the projection-heavy queries the flag
  * targets. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val countOnly = args.contains("--count")
    val pos = args.filterNot(_ == "--count")
    val name = pos(0)
    val dir = pos.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = pos.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.engine.Engine.session(
      "graft-time-one", Some("local[32]"), 32)
    try graft.Queries.q1PricingSummary(spark, dir).count()
    catch { case _: Throwable => () }
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n =
        if (countOnly) {
          val df = fn(spark, dir)
          df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*)
              .as("_h"))
            .agg(bit_xor(col("_h")), count(col("_h")))
            .collect()(0).getLong(1)
        } else fn(spark, dir).collect().length.toLong
      println(f"[$name] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        s" ($n rows)")
    }
    spark.stop()
  }
}
