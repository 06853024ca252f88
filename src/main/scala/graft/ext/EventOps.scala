package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream/table — the product-
  * analytics operator family (funnels; sessionization lives in
  * `Queries.qEventsSessions`, windowed rates in `qEventsHourly`).
  *
  * Reference provenance: the reference's event pipelines stop at
  * grouped counts; funnels are part of the §2.10 "what a real consumer
  * of this engine asks next" surface, same as the dedup/similarity
  * families.
  */
object EventOps {

  /** Per-(user, day) ordered event sequences — the assembly step that
    * turns raw event logs into training sequences (behavioral-model
    * pretraining, SFT-style trajectory export): one row per user-day
    * with the '>'-joined event-type chain in (ts, event_id) order.
    *
    * Determinism: collect_list is NOT order-stable across layouts, so
    * events are gathered as (ts, event_id, type) structs and
    * `array_sort`ed — struct ordering on the unique (ts, event_id)
    * prefix fixes the chain bit-for-bit on any partitioning, matching
    * SQL's `string_agg(... ORDER BY ts, event_id)`.
    *
    * Scale shape: ONE shuffle on (user, day) — the grouping the
    * downstream trainer reads anyway; sequences are bounded by a
    * user-day's activity, so no global ordering or window exists
    * anywhere. */
  def userSequences(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, typeCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    events
      .select(col(userCol).as("user_id"), day.as("day"),
        struct(col(tsCol).as("_ts"), col(idCol).as("_id"),
          col(typeCol).as("_t")).as("_e"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(array_sort(collect_list(col("_e"))),
          e => e.getField("_t")), ">").as("seq"))
  }

  /** First-order transition counts between consecutive event types per
    * user — the Markov-chain sufficient statistics a behavioral model
    * trains on (and the production drift check: compare this table
    * between weeks). Consecutive = adjacent in (ts, event_id) order
    * WITHIN a user; chains never cross users.
    *
    * Scale shape: one window per user partition (events shuffle once
    * on user_id — bounded per-user state, no global ordering), then a
    * (prev, next) grouped count with map-side partials. Output is
    * |event types|² rows at most. */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** PageRank over the observed transition graph (Page et al. 1999) —
    * where user journeys concentrate in steady state, the graph-rank
    * quality signal web-curation pipelines attach to sources (CCNet /
    * RefinedWeb rank domains by link centrality the same way). Runs
    * `rounds` power-iteration rounds at damping `alphaPct`/100 with
    * uniform teleport and uniform dangling-mass redistribution.
    *
    * EXACT integer arithmetic end to end so the DuckDB twin replays
    * every round bit for bit: ranks live in ppm (Σ ≈ 10⁶ minus floor
    * losses), edge weights are `n·10⁶ div outdeg` ppm, a round is
    * `rank'(v) = (100−α)·10⁶ div (100·N) + Σᵤ (α·rank(u)·w(u,v)) div
    * 10⁸ + (α·danglingMass) div (100·N)` — every product bounded by
    * 85·10⁶·10⁶ < 2⁶³.
    *
    * Scale shape — the standard relational PageRank, web-graph-sized
    * inputs intended: the edge relation is built ONCE (one shuffle on
    * src for outdegree) and each round is one src-keyed join + one
    * dst-keyed partial-agg shuffle of (node, long) pairs, with the
    * dangling mass a broadcast 1-row anti-join aggregate and N a
    * broadcast literal frame. Rank lineage is cut per round via
    * [[graft.engine.Engine.materialize]] (the connectedComponents
    * discipline), superseded iterates released eagerly. Rounds are
    * FIXED (not convergence-probed): deterministic cost, deterministic
    * oracle — PageRank at α = 0.85 contracts the error by α per round,
    * so 8 rounds pin ranks to well under one ppm of movement on graphs
    * whose diameter fits the round budget. */
  def stationaryRank(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, typeCol: String,
                     alphaPct: Int = 85, rounds: Int = 8): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99,
      s"stationaryRank: bad alphaPct $alphaPct")
    require(rounds >= 1 && rounds <= 64,
      s"stationaryRank: bad rounds $rounds")
    val tc = transitionCounts(events, userCol, tsCol, idCol, typeCol)
    val nodes = graft.engine.Engine.materialize(
      tc.select(col("prev_type").as("node"))
        .unionAll(tc.select(col("next_type")))
        .distinct())
    val outW = tc.groupBy(col("prev_type")).agg(sum(col("n")).as("_out"))
    val edges = graft.engine.Engine.materialize(
      tc.join(outW, Seq("prev_type"))
        .select(col("prev_type").as("src"), col("next_type").as("dst"),
          expr("n * 1000000 div _out").as("w_ppm")))
    val srcs = graft.engine.Engine.materialize(
      edges.select(col("src").as("node")).distinct())
    val nn = broadcast(nodes.agg(count(lit(1)).as("_nn")))
    var rank = graft.engine.Engine.materialize(
      nodes.crossJoin(nn).select(col("node"),
        expr("1000000 div _nn").as("rank_ppm")))
    for (_ <- 1 to rounds) {
      val contrib = edges
        .join(rank.select(col("node").as("src"), col("rank_ppm")),
          Seq("src"))
        .select(col("dst").as("node"),
          expr(s"($alphaPct * rank_ppm * w_ppm) div 100000000")
            .as("_c"))
        .groupBy(col("node")).agg(sum(col("_c")).as("_c"))
      val dangling = broadcast(rank.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank_ppm")), lit(0L)).as("_dm")))
      val prev = rank
      rank = graft.engine.Engine.materialize(
        nodes.join(contrib, Seq("node"), "left")
          .crossJoin(nn).crossJoin(dangling)
          .select(col("node"),
            (expr(s"(${100 - alphaPct} * 1000000) div (100 * _nn)") +
              coalesce(col("_c"), lit(0L)) +
              expr(s"($alphaPct * _dm) div (100 * _nn)"))
              .as("rank_ppm")))
      graft.engine.Engine.release(prev)
    }
    rank.select(col("node").as(typeCol), col("rank_ppm"))
  }

  /** Hourly anomaly flags for one event type — the ops-monitoring
    * staple: count events per hour, z-score each hour against the
    * corpus of observed hours, flag |z| beyond `zMax`. Moments are
    * exact integer sums (Σc, Σc²) turned into μ/σ by one fixed chain
    * of correctly-rounded ops, so scores and flags are deterministic
    * and engine-exact. Hours with NO events of the type are absent —
    * the stats describe observed hours (densify upstream if silence
    * itself is the anomaly; that is a calendar join, not a monitor
    * change).
    *
    * Scale shape: one filtered groupBy(hour) — counts with map-side
    * partials — then a 1-row moment aggregate broadcast back over the
    * (tiny) hourly relation. */
  def hourlyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
                      eventType: String, zMax: Double = 3.0): DataFrame = {
    require(zMax > 0.0, s"zMax must be positive: $zMax")
    val hourly = events.filter(col(typeCol) === eventType)
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val stats = hourly.agg(count(lit(1)).as("_n"),
      sum(col("n_events")).as("_s"),
      sum(col("n_events") * col("n_events")).as("_s2"))
    val mu = col("_s").cast("double") / col("_n").cast("double")
    val variance = col("_s2").cast("double") / col("_n").cast("double") -
      mu * mu
    // Catastrophic cancellation on near-equal counts can round the
    // difference to a tiny negative, and sqrt(neg)=NaN compares TRUE
    // under `NaN > 0.0` in Spark's ordering — clamp so a degenerate
    // spectrum falls into the z = 0 branch instead of flagging all.
    val sigma = sqrt(greatest(variance, lit(0.0)))
    hourly.crossJoin(broadcast(stats))
      .withColumn("z",
        when(sigma > 0.0,
          (col("n_events").cast("double") - mu) / sigma)
          .otherwise(lit(0.0)))
      .withColumn("is_anomaly", abs(col("z")) > zMax)
      .select(col("hour"), col("n_events"), col("z"), col("is_anomaly"))
  }

  /** Weekly cohort-retention matrix: users cohort by the ISO week of
    * their FIRST activity; each cell counts the cohort's users active
    * again `week_offset` weeks later ((cohort_week, week_offset,
    * n_users) rows — offset 0 is the cohort size). All arithmetic is
    * calendar truncation + integer day differences — deterministic and
    * engine-exact.
    *
    * Scale shape: raw events collapse FIRST to distinct (user, week)
    * pairs (one pass + one shuffle, the only corpus-sized step); the
    * cohort min and the matrix count are aggregates over that far
    * smaller activity relation. No window over raw event lists. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val activity = events.select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol)).cast("date").as("_p"))
      .distinct()
    val cohorts = activity.groupBy(col("_u")).agg(min(col("_p")).as("_c"))
    activity.join(cohorts, Seq("_u"))
      .groupBy(col("_c").as("cohort_week"),
        (datediff(col("_p"), col("_c")) / lit(7)).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Classic ordered funnel: for each user, the earliest time of step 1,
    * then the earliest step-2 event STRICTLY AFTER that, then the
    * earliest step-3 event strictly after step 2, and so on ("first
    * touch, earliest completion" semantics — deterministic, the standard
    * product-analytics definition). Users who never fire step 1 are
    * absent; users who stall mid-funnel keep NULL for the later stage
    * times. `steps_completed` counts the non-NULL stages.
    *
    * Scale shape: one filtered min-aggregate per stage plus a join per
    * transition, all keyed on the user column — n-1 shuffles for an
    * n-step funnel, each carrying one row per surviving user (funnels
    * only narrow). The event scan is pruned to (user, ts, type). No
    * window over the raw event stream — at 100 TB per-user event lists
    * can be huge, but per-user AGGREGATES are one row each. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct: $steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("t1"))
    val full = steps.tail.zipWithIndex.foldLeft(first) {
      case (acc, (st, i)) =>
        val prevT = s"t${i + 1}"
        val curT = s"t${i + 2}"
        val nxt = events.filter(col(typeCol) === st)
          .select(col(userCol).as("_u2"), col(tsCol).as("_ts"))
        val keyCols = col("_u") +: (1 to i + 1).map(j => col(s"t$j"))
        acc.join(nxt,
            col("_u") === col("_u2") && col("_ts") > col(prevT), "left")
          .groupBy(keyCols: _*)
          .agg(min(col("_ts")).as(curT))
    }
    val stepCols = (1 to steps.size).map(j => col(s"t$j"))
    full.withColumn("steps_completed",
        stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
          .reduce(_ + _))
      .select((col("_u").as(userCol) +: stepCols :+
        col("steps_completed")): _*)
  }

  /** Per-user inter-arrival statistics + Goh–Barabási burstiness
    * (Goh & Barabási 2008): `B = (σ − μ)/(σ + μ)` over the gaps
    * between a user's consecutive events — −1 = perfectly regular
    * (bot-like timer traffic), 0 = Poisson, → 1 = bursty human
    * sessions. The standard organic-vs-automated signal over an event
    * log, next to the hourly anomaly detector.
    *
    * Exactness: gaps are exact integer MICROSECONDS
    * (`unix_micros(ts)` deltas), the three moments (n, Σg, Σg²)
    * accumulate in DECIMAL(38,0) (order-free; Σg² over µs gaps passes
    * 2⁶³ fast), and the single double computation happens once on the
    * final scalars — `σ = √(n·Σg² − (Σg)²)/n`, mirrored verbatim by
    * the twin, then pinned to ppm. Degenerate users (one gap of 0, or
    * all simultaneous events: σ + μ = 0) pin to −10⁶ (perfectly
    * regular) rather than NaN.
    *
    * Scale shape: ONE user-partitioned window for the lag (parallel
    * across users — never an unpartitioned window) feeding ONE grouped
    * aggregate with map-side partials. Users with < 2 events drop
    * (no gaps to measure). */
  def interArrivalStats(events: DataFrame, userCol: String,
                        tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("_us"), col(idCol))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    events.select(col(userCol), unix_micros(col(tsCol)).as("_us"),
        col(idCol))
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
      .filter(col("_gap").isNotNull)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(dec(col("_gap"))).as("_sg"),
        sum(dec(col("_gap")) * dec(col("_gap"))).as("_sgg"),
        min(col("_gap")).as("min_gap_us"),
        max(col("_gap")).as("max_gap_us"))
      .withColumn("mean_gap_us", expr("cast(_sg div n_gaps as bigint)"))
      .withColumn("_m", col("_sg").cast("double") /
        col("n_gaps").cast("double"))
      .withColumn("_s",
        sqrt((dec(col("n_gaps")) * col("_sgg") - col("_sg") * col("_sg"))
          .cast("double")) / col("n_gaps").cast("double"))
      .withColumn("burst_ppm",
        when(col("_s") + col("_m") > 0.0,
          floor((col("_s") - col("_m")) / (col("_s") + col("_m")) *
            lit(1000000.0)).cast("long"))
          .otherwise(lit(-1000000L)))
      .select(col(userCol), col("n_gaps"), col("mean_gap_us"),
        col("min_gap_us"), col("max_gap_us"), col("burst_ppm"))
  }

  /** First/last-touch attribution — for every conversion event, the
    * user's FIRST and LAST preceding touch event (`touch.ts ≤
    * conversion.ts`) plus the touch count: the standard
    * marketing-attribution pair, and in a training-data pipeline the
    * provenance question "which acquisition path produced this
    * conversion". Ties at the same timestamp resolve deterministically
    * through struct order: first = (min ts, then min id), last =
    * (max ts, then max id). Conversions with no preceding touch stay
    * visible with null touch columns and `n_touches = 0`.
    *
    * Scale shape: both event slices project to (id, user, ts) triples
    * before anything joins — the props/payload columns never shuffle.
    * ONE user-keyed range join fans each conversion out to its
    * preceding touches, and ONE conversion-keyed aggregate (min-struct /
    * max-struct / count, all with map-side partials) collapses the
    * fan-out back to conversion grain. Per-user cost is
    * |conversions_u|·|touches_u| — bounded by per-user activity, the
    * same contract as [[transitionCounts]]; a single pathological user
    * is an AQE skew-split, not a plan change. (A backward as-of join
    * would avoid the fan-out for last-touch alone, but first-touch and
    * the count need the full preceding set anyway — one fan-out
    * serving all three beats two extra joins.) */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String,
                       convType: String, touchType: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("event_id"), col(userCol).as("_u"),
        col(tsCol).as("conv_ts"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(idCol).as("_tid"), col(userCol).as("_tu"),
        col(tsCol).as("_tts"))
    conv.join(touch,
        col("_u") === col("_tu") && col("_tts") <= col("conv_ts"), "left")
      .groupBy(col("event_id"), col("_u"), col("conv_ts"))
      .agg(count(col("_tid")).as("n_touches"),
        min(struct(col("_tts"), col("_tid"))).as("_f"),
        max(struct(col("_tts"), col("_tid"))).as("_l"))
      .select(col("event_id"), col("_u").as(userCol), col("conv_ts"),
        col("n_touches"),
        col("_f._tid").as("first_touch_id"),
        col("_f._tts").as("first_touch_ts"),
        col("_l._tid").as("last_touch_id"),
        col("_l._tts").as("last_touch_ts"))
  }
}
