package graft.tools

/** Print one registered query's FINAL executed plan (post-AQE) after
  * forcing it — the triage companion to [[TimeOne]]:
  * `tools/run.sh graft.tools.ExplainOne <query> [sfDir]`.
  * Used to adjudicate scale ratios: e.g. the r11 sf1 x_text_filter
  * read showed Catalyst pushing the quality predicate below the
  * spread-repartition onto the 1-split scan — correct at 100 TB
  * (filter before shuffle), serialized only by the fixture's single
  * parquet row group. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Engine.session(
      "graft-explain", Some("local[32]"), 32)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
