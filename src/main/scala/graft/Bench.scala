package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark main — runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * Forcing: `.count()` under-measures (Catalyst prunes every column the
  * count doesn't need, so projection/window-heavy queries bench their
  * shuffles but not their expression evaluation). Instead each query is
  * forced through a single xxhash64 over ALL output columns reduced to one
  * driver-side long — every expression in the plan must actually evaluate,
  * while driver traffic stays one row. A shared warm-up query absorbs
  * one-time JVM/codegen/classloading costs.
  */
object Bench {

  /** Evaluate every output column of every row; returns a checksum
    * (bit_xor fold — overflow-free under ANSI mode). */
  private def force(df: DataFrame): Long = {
    val hashed = df.select(
      xxhash64(df.columns.map(col).toIndexedSeq: _*).as("_h"))
    val r = hashed.agg(bit_xor(col("_h"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Engine.session(
      "graft-bench", Some(s"local[$cpus]"), shufflePartitions = cpus)
    // Warm-up: one small end-to-end query (codegen, parquet footer reads).
    try force(Queries.q1PricingSummary(spark, sfDir))
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
