package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** W2 — the flagship per-column profile ("describe++"), reproducing
  * `inspect_output` (`core/utils/data_core.py:178-299`): one output row per
  * input column with `{column, dtype, null_count, null_pct, unique_count,
  * sample_values, top_10}`.
  *
  * Scale design (100 TB): the whole profile is THREE distributed passes,
  * none of which collects data to the driver beyond #columns rows:
  *   1. one wide aggregate over all columns (null counts + distinct counts
  *      fused into a single stage);
  *   2. one melt (`stack`) → groupBy(column, value) → per-column top-K via
  *      `row_number` window — a single shuffle keyed on (column, value),
  *      partial aggregation makes the map side absorb heavy hitters;
  *   3. one melt → per-column first-N sample via the same window pattern.
  * `exact=false` swaps `count_distinct` for `approx_count_distinct` (HLL++)
  * — at 100 TB exact per-column distinct counts are a Cartesian-expansion
  * anti-pattern; keep exact only for oracle parity at test scale.
  */
object Profile {

  def profile(df: DataFrame, sampleN: Int = 5, topK: Int = 10,
              exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val dtypes = df.dtypes.toMap

    // Pass 1: single wide agg — rows, per-column null count + distinct count.
    val aggExprs: Seq[Column] = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"uniq_$c"))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    val rows = wide.getAs[Long]("_rows")
    val counts = cols.map { c =>
      (c, wide.getAs[Long](s"nulls_$c"), wide.getAs[Long](s"uniq_$c"))
    }.toDF("column", "null_count", "unique_count")

    // Melt once: (ord, column, value-as-string with null sentinel intact).
    // `_ord` preserves encounter order for the "first N samples" semantics
    // of the reference (pandas head-5 — order-dependent, documented).
    val melted = df
      .withColumn("_ord", monotonically_increasing_id())
      .select(col("_ord"), expr(
        "stack(" + cols.size + ", " +
          cols.map(c => s"'$c', cast(`$c` as string)").mkString(", ") + ")")
        .as(Seq("column", "value")))

    // Pass 2: top-K value counts per column (null → "__NULL__" sentinel,
    // ties broken by value for determinism, `data_core.py:254-262`).
    val topWin = Window.partitionBy("column")
      .orderBy(desc("count"), asc("value"))
    val top10 = melted
      .select(col("column"),
        coalesce(col("value"), lit("__NULL__")).as("value"))
      .groupBy("column", "value").agg(count(lit(1)).as("count"))
      .withColumn("_rk", row_number().over(topWin))
      .filter(col("_rk") <= topK)
      .groupBy("column")
      .agg(sort_array(collect_list(struct(col("_rk"), col("value"),
        col("count")))).as("_t"))
      .select(col("column"),
        expr("transform(_t, x -> struct(x.value as value, x.count as count))")
          .as("top_10"))

    // Pass 3: first-N non-null samples per column (encounter order).
    val sampWin = Window.partitionBy("column").orderBy(asc("_ord"))
    val samples = melted
      .filter(col("value").isNotNull)
      .withColumn("_rk", row_number().over(sampWin))
      .filter(col("_rk") <= sampleN)
      .groupBy("column")
      .agg(sort_array(collect_list(struct(col("_rk"), col("value")))).as("_s"))
      .select(col("column"),
        expr("transform(_s, x -> x.value)").as("sample_values"))

    val dtypeDf = cols.map(c => (c, dtypes(c))).toDF("column", "dtype")

    dtypeDf
      .join(counts, Seq("column"))
      .join(samples, Seq("column"), "left")
      .join(top10, Seq("column"), "left")
      .withColumn("null_pct",
        col("null_count").cast("double") / lit(rows).cast("double"))
      .select("column", "dtype", "null_count", "null_pct", "unique_count",
        "sample_values", "top_10")
  }

  /** A4 standalone — top-K value counts for one column, deterministic
    * tie-break (count desc, value asc). Catalyst plans the sort+limit as
    * TakeOrderedAndProject — no global sort at scale. */
  def topKValues(df: DataFrame, column: String, k: Int = 10): DataFrame =
    df.groupBy(Functions.nullSentinel(col(column)).as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc("value"))
      .limit(k)
}
