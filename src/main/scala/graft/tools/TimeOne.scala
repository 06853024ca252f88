package graft.tools

/** Micro-bench one registered query in isolation (outlier triage —
  * the full [[graft.Bench]] suite is the recorded artifact):
  * `tools/run.sh graft.tools.TimeOne <query> [sfDir] [reps] [--count]`.
  * `--count` forces via count() instead of collect() — required for
  * queries whose output is itself large (collect would OOM the driver
  * and time the wrong thing). */
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
      val n = if (countOnly) fn(spark, dir).count()
              else fn(spark, dir).collect().length.toLong
      println(f"[$name] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        s" ($n rows)")
    }
    spark.stop()
  }
}
