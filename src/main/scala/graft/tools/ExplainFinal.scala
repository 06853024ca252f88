package graft.tools

/** Post-execution plan audit: run a registered query to completion, then
  * print the FINAL adaptive plan — the one AQE actually executed, where
  * ReusedExchange / stage-reuse nodes are visible (the static plan from
  * [[Explain]] can show duplicate subtrees that AQE dedupes at runtime).
  *
  *   tools/run.sh graft.tools.ExplainFinal <query> [sfDir]
  */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.engine.Engine.session("graft-explain-final",
      Some("local[4]"), shufflePartitions = 4)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
