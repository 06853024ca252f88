package graft.tools

import org.apache.spark.sql.functions._

/** File-granular DML demonstration at scale (K10's r14 shape): curve-
  * cluster a copy of lineitem on its two hottest filter keys, run a
  * selective 2-D box UPDATE, and report rewritten-vs-carried file
  * counts and wall time against the whole-table rewrite the same
  * UPDATE used to cost.
  * `tools/run.sh graft.tools.DmlProbe [sfDir] [files=64]` */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = graft.engine.Engine.session(
      "graft-dml-probe", Some("local[32]"), 32)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[dml-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val table = java.nio.file.Files
      .createTempDirectory("graft-dml-probe").toString + "/lineitem"
    timed(s"curve_cluster_write x$nFiles")(
      graft.ext.LayoutOps.writeCurveClustered(li, "l_partkey",
        "l_suppkey", bits = 8, nFiles = nFiles, path = table))
    val box = col("l_partkey") < 500 && col("l_suppkey") < 50
    val st = timed("file_granular_update")(
      graft.sinks.Dml.updateWithStats(spark, table,
        Map("l_tax" -> lit(9.99)), box))
    System.err.println(s"[dml-probe] stats: affected=${st.affected} " +
      s"filesTotal=${st.filesTotal} rewritten=${st.filesRewritten} " +
      s"carried=${st.filesKept}")
    // the old whole-table shape, for the wall-time comparison
    val back = spark.read.parquet(table)
    timed("whole_table_rewrite_baseline") {
      back.withColumn("l_tax",
          when(box, lit(8.88)).otherwise(col("l_tax")))
        .write.mode("overwrite").parquet(table + "_full")
    }
    spark.stop()
  }
}
