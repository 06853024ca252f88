package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.transform.Temporal

/** As-of and interval join semantics, including equivalence to the naive
  * (inequality-join) formulation on fixture data — the same property the
  * DuckDB oracle checks at sf0.01 with its native ASOF JOIN. */
class TemporalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward: most recent prior match, inclusive, per key, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"), // before any right row
      (1L, ts("2024-01-01 12:00:00"), "l2"), // equal ts -> inclusive match
      (1L, ts("2024-01-01 15:00:00"), "l3"), // picks latest of two priors
      (2L, ts("2024-01-01 15:00:00"), "l4")  // other key isolated
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 10.0),
      (1L, ts("2024-01-01 14:00:00"), 20.0),
      (2L, ts("2024-01-01 01:00:00"), 99.0)
    ).toDF("k", "t", "v")

    val out = Temporal.asofJoinBackward(left, right, "k", "t", "t")
      .select($"tag", $"asof_t", $"asof_v")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap
    assert(out("l1") == (None, None))
    assert(out("l2") == (Some(ts("2024-01-01 12:00:00")), Some(10.0)))
    assert(out("l3") == (Some(ts("2024-01-01 14:00:00")), Some(20.0)))
    assert(out("l4") == (Some(ts("2024-01-01 01:00:00")), Some(99.0)))
  }

  test("asofJoinForward: earliest following match, inclusive, null when none ahead") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"), // earliest right ahead = 12:00
      (1L, ts("2024-01-01 12:00:00"), "l2"), // equal ts -> inclusive match
      (1L, ts("2024-01-01 15:00:00"), "l3"), // nothing ahead -> null
      (2L, ts("2024-01-01 15:00:00"), "l4")  // key 2's right is in the past
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 10.0),
      (1L, ts("2024-01-01 14:00:00"), 20.0),
      (2L, ts("2024-01-01 01:00:00"), 99.0)
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoinForward(left, right, "k", "t", "t")
      .select($"tag", $"asof_t", $"asof_v")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap
    assert(out("l1") == (Some(ts("2024-01-01 12:00:00")), Some(10.0)))
    assert(out("l2") == (Some(ts("2024-01-01 12:00:00")), Some(10.0)))
    assert(out("l3") == (None, None))
    assert(out("l4") == (None, None))
  }

  test("asofJoin tolerance: stale matches null out, fresh ones survive (both directions)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "t", "v")
    val hour = 3600L * 1000000L
    // Backward gap is 2h: within a 3h tolerance, outside a 1h one.
    def back(tol: Long) = Temporal
      .asofJoinBackward(left, right, "k", "t", "t",
        toleranceMicros = Some(tol))
      .select($"asof_v").collect()(0)
    assert(back(3 * hour).getDouble(0) == 5.0)
    assert(back(1 * hour).isNullAt(0))
    // Forward: right at 10:00 is BEHIND the left at 12:00 → no match at
    // any tolerance (direction respected, not just |gap|).
    val fwd = Temporal.asofJoinForward(left, right, "k", "t", "t",
        toleranceMicros = Some(24 * hour))
      .select($"asof_v").collect()(0)
    assert(fwd.isNullAt(0))
    // Numeric time columns: tolerance in the column's own units.
    val ln = Seq((1L, 100L, "l")).toDF("k", "t", "tag")
    val rn = Seq((1L, 60L, 5.0)).toDF("k", "t", "v")
    def backN(tol: Long) = Temporal
      .asofJoinBackward(ln, rn, "k", "t", "t", toleranceMicros = Some(tol))
      .select($"asof_v").collect()(0)
    assert(backN(50L).getDouble(0) == 5.0) // gap 40 ≤ 50
    assert(backN(30L).isNullAt(0))         // gap 40 > 30
  }

  test("asofJoinBackward plans exactly ONE shuffle (the key partition for the window)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "t", "v")
    // executedPlan: EnsureRequirements has inserted the exchanges.
    val plan = Temporal.asofJoinBackward(left, right, "k", "t", "t")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected one shuffle, got $shuffles:\n$plan")
    assert(!plan.contains("Join"), s"no join operator should appear:\n$plan")
  }

  test("asofJoinBackward matches the naive argmax formulation on fixture events") {
    val ev = graft.engine.Engine.table(spark, fixtureDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("cv"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))

    val fast = Temporal
      .asofJoinBackward(purchases, clicks, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof_ts"), col("asof_cv"))

    // Naive: inequality join + row_number argmax — a different plan
    // (BroadcastNestedLoop) computing the same relation.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("c_ts").desc)
    val naive = purchases.as("p")
      .join(clicks.select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
        col("cv")), col("user_id") === col("c_uid") && col("c_ts") <= col("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("c_ts").as("asof_ts"),
        col("cv").as("asof_cv"))

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "as-of join must equal the naive argmax result")
  }

  test("intervalJoin: [start, end) bounds, multi-interval overlap, bin spanning") {
    import spark.implicits._
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (20L, ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00"))
    ).toDF("iv_id", "s", "e")
    val facts = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start of 10 -> in
      (2L, ts("2024-01-02 12:00:00")), // overlap zone -> both
      (3L, ts("2024-01-03 00:00:00")), // == end of 10 -> only 20
      (4L, ts("2024-01-09 00:00:00"))  // nowhere
    ).toDF("fid", "t")

    val got = Temporal.intervalJoin(facts, intervals, "t", "s", "e")
      .select($"fid", $"iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))

    // Bin narrower than the interval: same matches, more exploded bins.
    val fine = Temporal.intervalJoin(facts, intervals, "t", "s", "e",
        binSeconds = 3600L)
      .select($"fid", $"iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fine == got)
  }

  test("intervalJoin fails loudly on an interval spanning too many bins") {
    import spark.implicits._
    val openEnded = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("iv_id", "s", "e")
    val facts = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("fid", "t")
    val ex = intercept[Exception] {
      Temporal.intervalJoin(facts, openEnded, "t", "s", "e").collect()
    }
    assert(ex.getMessage.contains("intervalJoin"), ex.getMessage)
    // The same data passes with a bound that covers the span.
    val ok = Temporal.intervalJoin(facts, openEnded, "t", "s", "e",
      binSeconds = 86400L * 365 * 10000, maxBinsPerInterval = 10000)
    assert(ok.count() == 1)
  }

  test("intervalJoin plans an equi-join (no nested-loop/cartesian) and equals the naive form") {
    val ev = graft.engine.Engine.table(spark, fixtureDir, "events")
    val iv = graft.engine.Engine.table(spark, fixtureDir, "nation").select(
      col("n_nationkey").as("iv_id"),
      expr("timestampadd(DAY, n_nationkey, TIMESTAMP'2024-01-01 00:00:00')")
        .as("s"),
      expr("timestampadd(DAY, n_nationkey + 2, TIMESTAMP'2024-01-01 00:00:00')")
        .as("e"))
    val joined = Temporal.intervalJoin(ev, iv, "ts", "s", "e")
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must stay an equi-join:\n$plan")

    val got = joined.groupBy("iv_id").count()
    val naive = ev.join(iv, col("ts") >= col("s") && col("ts") < col("e"))
      .groupBy("iv_id").count()
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }
}
