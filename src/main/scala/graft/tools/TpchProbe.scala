package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-cost triage for the q17/q18 lineitem self-join band (r16
  * verdict ask #6): times each candidate subplan with the noop sink so
  * the scan, the aggregate, and the join band are priced separately.
  *
  *   tools/run.sh graft.tools.TpchProbe /tmp/sf10
  */
object TpchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Engine.session(
      "graft-tpch-probe", Some("local[32]"), 32)
    import spark.implicits._
    def noop(df: DataFrame, label: String): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val q18only = args.contains("--q18")
    val li = graft.engine.Engine.table(spark, dir, "lineitem")
    if (!q18only) {
    noop(li.select($"l_partkey", $"l_quantity"), "scan lineitem 2col")
    val dec = sum($"l_quantity".cast("decimal(30,6)"))
    noop(li.groupBy($"l_partkey")
      .agg((dec / count(lit(1))).as("avg_qty")), "avg agg decimal")
    noop(li.groupBy($"l_partkey")
      .agg((sum($"l_quantity") / count(lit(1))).as("avg_qty")),
      "avg agg double")
    val brand = graft.engine.Engine.table(spark, dir, "part")
      .filter($"p_brand" === "Brand#1").select($"p_partkey")
    noop(li.join(broadcast(brand), $"l_partkey" === $"p_partkey",
      "left_semi"), "brand semi filter")
    noop(li.join(broadcast(brand), $"l_partkey" === $"p_partkey",
        "left_semi")
      .groupBy($"l_partkey").agg((dec / count(lit(1))).as("avg_qty")),
      "brand semi + avg agg decimal")
    noop(graft.engine.Engine.table(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("decimal(30,6)")).as("sum_qty"))
      .filter($"sum_qty" > 150.0), "q18 group-filter decimal")
    // dsum replacement candidates: the decimal cast from DOUBLE routes
    // through Double.toString + BigDecimal per row — the suspected 80x.
    val fxLong = round($"l_quantity" * lit(1000000.0)).cast("long")
    noop(li.groupBy($"l_partkey")
      .agg(((sum(fxLong).cast("decimal(38,0)") / lit(1000000))
        .cast("double") / count(lit(1))).as("avg_qty")),
      "avg agg fx-long")
    noop(li.groupBy($"l_partkey")
      .agg(((sum(fxLong.cast("decimal(18,0)")).cast("decimal(38,0)")
        / lit(1000000)).cast("double") / count(lit(1))).as("avg_qty")),
      "avg agg fx-long-dec18")
    // value parity check vs the decimal path, all partkeys, sf input
    val a = li.groupBy($"l_partkey".as("k"))
      .agg((sum($"l_quantity".cast("decimal(30,6)")).cast("double") /
        count(lit(1))).as("v1"))
    val b = li.groupBy($"l_partkey".as("k"))
      .agg(((sum(fxLong).cast("decimal(38,0)") / lit(1000000))
        .cast("double") / count(lit(1))).as("v2"))
    val diff = a.join(b, Seq("k"))
      .filter($"v1" =!= $"v2" ||
        ($"v1".isNull =!= $"v2".isNull)).count()
    println(s"fx-long vs decimal parity: $diff mismatching groups")
    }
    // q18 band with the fx-long dsum, staged
    val fxq = round($"l_quantity" * lit(1000000.0)).cast("long")
    val big = li.groupBy($"l_orderkey")
      .agg(((sum(fxq.cast("decimal(18,0)")).cast("decimal(38,0)")
        / lit(1000000)).cast("double")).as("sum_qty"))
      .filter($"sum_qty" > 150.0)
    noop(li.groupBy($"l_orderkey").agg(count(lit(1))),
      "orderkey count only")
    noop(li.groupBy($"l_orderkey").agg(sum(fxq).as("s")),
      "orderkey sum long")
    noop(li.groupBy($"l_orderkey")
      .agg(sum(fxq.cast("decimal(18,0)")).as("s")),
      "orderkey sum dec18")
    noop(big, "q18 group-filter fx-long")
    noop(big, "q18 group-filter fx-long (2nd)")
    noop(big.join(graft.engine.Engine.table(spark, dir, "orders"),
      $"l_orderkey" === $"o_orderkey"), "q18 + orders join")
    spark.stop()
  }
}
