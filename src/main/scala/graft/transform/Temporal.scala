package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as primitives:
  * backward as-of joins (attribute each fact to the most recent prior
  * observation per key) and interval/range joins (match facts to
  * [start, end) windows).
  *
  * Both are composed from existing Catalyst operators — union + window,
  * and bin-blocked equi-join — per the custom-operator preference order
  * (compose first, custom plans only when composition can't express the
  * semantics). Neither plans an inequality join, so neither degrades to
  * BroadcastNestedLoop/CartesianProduct at scale.
  *
  * Reference context: the reference pipeline stores per-run scrape
  * snapshots keyed by capture time (`core/airflow/dags/data_capture/
  * wikipedia_dag.py:16-29`) and joins facts to the nearest snapshot
  * downstream in pandas; these operators are the distributed form.
  */
object Temporal {

  /** Backward (most-recent-prior, inclusive) as-of LEFT join.
    *
    * For each left row, attaches the right row with the greatest
    * `rightTime <= leftTime` within the same `key`; left rows with no
    * prior right row keep nulls. Right-side columns are prefixed with
    * `prefix` in the output.
    *
    * Plan shape — the 100 TB story: both sides are tagged and unioned,
    * shuffled ONCE on `key`, and resolved with a running
    * `last(_, ignoreNulls)` window ordered by (time, side). That is the
    * single-pass sorted merge a native engine would run; the naive
    * alternative (theta-join on `rightTime <= leftTime` + argmax) plans a
    * BroadcastNestedLoopJoin and is quadratic per key. Skew note: one
    * window partition per key — salt upstream if a single key dominates.
    *
    * Contract: right must be unique per (key, rightTime) — pre-aggregate
    * (e.g. `max_by`) if it isn't, otherwise which same-timestamp row wins
    * is not deterministic. Ties `rightTime == leftTime` match (inclusive).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       prefix: String = "asof_",
                       toleranceMicros: Option[Long] = None): DataFrame =
    asofJoin(left, right, key, leftTime, rightTime, prefix,
      forward = false, toleranceMicros)

  /** Forward variant: attaches the EARLIEST right row with
    * `rightTime >= leftTime` (nearest following observation — e.g. "next
    * maintenance window after this event"). Same plan, same contract. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      prefix: String = "asof_",
                      toleranceMicros: Option[Long] = None): DataFrame =
    asofJoin(left, right, key, leftTime, rightTime, prefix, forward = true,
      toleranceMicros)

  /** `toleranceMicros` (pandas merge_asof's `tolerance`): a match further
    * than this from the left time is nulled out — "most recent profile
    * update, but only if fresher than an hour". For timestamp time
    * columns the gap is measured in microseconds; for numeric time
    * columns it is measured in the column's own units. */
  private def asofJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       prefix: String, forward: Boolean,
                       toleranceMicros: Option[Long]): DataFrame = {
    val rightVals = right.columns.filterNot(_ == key).toIndexedSeq
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(rightVals.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // side 0 (right) sorts before side 1 (left) at equal times, so an
    // equal-time right row is visible to the left row (inclusive bound).
    val l = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_side"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val r = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    // Backward scans time ascending (running "latest right seen");
    // forward scans descending (running "earliest right still ahead").
    // Either way rights sort before lefts at equal times → inclusive.
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy("_k")
      .orderBy(timeOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val raw = last(col("_r"), ignoreNulls = true).over(w)
    val matched = toleranceMicros.fold(raw) { tol =>
      require(tol >= 0, s"tolerance must be non-negative: $tol")
      // Timestamps → integer micros; numeric time columns (the operator
      // is generic over orderable times) → their own units.
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      def units(c: Column): Column =
        left.schema(leftTime).dataType match {
          case TimestampType | TimestampNTZType => unix_micros(c)
          case _ => c.cast("long")
        }
      val gap =
        if (forward) units(raw.getField(rightTime)) - units(col("_t"))
        else units(col("_t")) - units(raw.getField(rightTime))
      when(gap <= tol, raw)
    }
    val resolved = l.unionByName(r)
      .withColumn("_m", matched)
      .filter(col("_side") === 1)

    val leftCols = left.columns.toIndexedSeq.map(c => col(s"_l.$c").as(c))
    val matchCols = rightVals.map(c => col(s"_m.$c").as(s"$prefix$c"))
    resolved.select(leftCols ++ matchCols: _*)
  }

  /** Interval (range) join: facts whose `timeCol` falls in an interval's
    * `[startCol, endCol)` — INNER, one output row per (fact, interval)
    * overlap. Output = all fact columns + all interval columns (caller
    * disambiguates name collisions up front).
    *
    * Plan shape — the 100 TB story: a raw `ts >= start AND ts < end` join
    * has no equality key, so Spark plans BroadcastNestedLoop — O(n·m).
    * Here each interval is exploded to the time bins it covers and each
    * fact mapped to its one bin, turning the match into an EQUI-join on
    * bin + a residual range filter. A fact occupies exactly one bin, so a
    * (fact, interval) pair can match only once — no dedup step. With a
    * dimension-sized interval side the exploded bins broadcast; with two
    * large sides it is a plain shuffled hash join. Choose `binSeconds`
    * near the typical interval length: much smaller explodes the interval
    * side, much larger makes every bin a mini cross-join.
    */
  def intervalJoin(facts: DataFrame, intervals: DataFrame, timeCol: String,
                   startCol: String, endCol: String,
                   binSeconds: Long = 86400L,
                   maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive: $maxBinsPerInterval")
    val binUs = binSeconds * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binUs)

    // Fail LOUDLY on an interval spanning an absurd number of bins (an
    // open-ended sentinel end date, or binSeconds far below the interval
    // length) instead of letting one row explode to millions of
    // elements. assert_true returns null on pass, so the coalesce'd
    // filter keeps every row while forcing the check to run per row.
    val span = binOf(col(endCol)) - binOf(col(startCol))
    val guarded = intervals.filter(coalesce(
      assert_true(span <= lit(maxBinsPerInterval.toLong),
        concat(lit(s"intervalJoin: interval spans more than " +
          s"$maxBinsPerInterval bins of ${binSeconds}s — raise " +
          "binSeconds or maxBinsPerInterval; offending span: "),
          span.cast("string"))),
      lit(true)))
    val iv = guarded.withColumn("_bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    val f = facts.withColumn("_bin", binOf(col(timeCol)))

    f.join(iv, f("_bin") === iv("_bin") &&
        col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_bin")
  }
}
