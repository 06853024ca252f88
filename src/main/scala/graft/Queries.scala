package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.engine.Engine

/** Declared query surface: one entry per implemented operator family from
  * SURVEY.md §2, each paired (in [[SparkEntry.oracleSql]]) with equivalent
  * DuckDB SQL over the same parquet tables.
  *
  * Oracle-parity numerics: double-summation order differs across engines,
  * so every SUM over doubles goes through an exact fixed-point accumulator —
  * per-row double expressions (deterministic IEEE ops, identical association
  * on both sides) are cast to DECIMAL(30,6), summed exactly, and the total
  * cast back to DOUBLE. Scale 6 matters: the money columns carry exactly two
  * decimal digits, so any product of up to three of them has at most six
  * true decimal digits — the scale-6 cast reconstructs that exact value in
  * both engines (no rounding occurs), whereas a scale-4 cast hits genuine
  * x.xxxx5 ties that Spark rounds half-up and DuckDB half-even.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Exact decimal-accumulated sum of a double expression → double. */
  private def dsum(e: Column): Column =
    sum(e.cast(DecimalType(30, 6))).cast(DoubleType)

  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s))

  // ---------------------------------------------------------------------
  // Q1 — pricing summary (TPC-H Q1 style). Scan → filter (pushed to
  // parquet) → hash agg (partial+final, map-side combine) → small sort.
  // A8/A1-class aggregation; flagship slice 0 of SURVEY §7.2.
  // ---------------------------------------------------------------------
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= ts("2000-06-01 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-06-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // Q6 — forecast revenue: filter-only aggregation (predicate pushdown
  // showcase — all three filters reach the parquet scan).
  // ---------------------------------------------------------------------
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= ts("1996-01-01 00:00:00")
        && col("l_shipdate") < ts("1998-01-01 00:00:00")
        && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin
}
