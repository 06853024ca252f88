package graft.tools

import graft.SparkEntry

/** Plan-audit tool: prints the formatted physical plan of each named
  * query (all registered queries when no names given) against a fixture
  * dir. Used to keep the shapes honest: pushed filters on scans, broadcast
  * on small sides, no Expand in profile, WholeStageCodegen spans wide.
  *
  *   tools/run.sh graft.tools.Explain /root/testdata/sf0.01 q1_pricing_summary
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.engine.Engine.session("graft-explain",
      Some("local[4]"), shufflePartitions = 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try println(fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
        case None => println(s"unknown query '$n'")
      }
    }
    spark.stop()
  }
}
