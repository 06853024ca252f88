package graft

import org.apache.spark.sql.functions._
import graft.ext.EventOps

/** Ordered-funnel semantics: first touch, earliest completion, strict
  * ordering, mid-funnel stalls, no-entry exclusion. */
class EventOpsSpec extends SparkSpec {

  test("transitionCounts: per-user adjacency only, (ts,id) order") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      (1L, ts("2026-01-01 09:00:00"), 1L, "open"),
      (1L, ts("2026-01-01 09:05:00"), 2L, "click"),
      (1L, ts("2026-01-01 09:10:00"), 3L, "buy"),
      // user 2's chain must NOT bridge into user 1's
      (2L, ts("2026-01-01 09:07:00"), 4L, "open"),
      (2L, ts("2026-01-01 09:08:00"), 5L, "open")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ext.EventOps.transitionCounts(ev, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2))).toMap
    assert(out == Map(("open", "click") -> 1L, ("click", "buy") -> 1L,
      ("open", "open") -> 1L))
  }

  test("userSequences: (ts,id)-ordered chains, layout-independent") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 3L, "view"),
      (1L, ts("2026-01-01 09:00:00"), 1L, "open"),
      // same timestamp: event_id breaks the tie
      (1L, ts("2026-01-01 09:00:00"), 2L, "click"),
      (1L, ts("2026-01-02 08:00:00"), 4L, "open"),
      (2L, ts("2026-01-01 12:00:00"), 5L, "buy")
    ).toDF("user_id", "ts", "event_id", "event_type")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ext.EventOps.userSequences(d, "user_id", "ts", "event_id",
          "event_type")
        .orderBy("user_id", "day").collect()
        .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
          r.getString(3)))
    val out = run(ev)
    assert(out.toSeq == Seq(
      (1L, "2026-01-01", 3L, "open>click>view"),
      (1L, "2026-01-02", 1L, "open"),
      (2L, "2026-01-01", 1L, "buy")))
    assert(run(ev.repartition(7)).toSeq == out.toSeq)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: ordering, stalls, and entry semantics") {
    import spark.implicits._
    val events = Seq(
      // user 1: full conversion, with an out-of-order click decoy first
      (1L, ts("2024-01-01 09:00:00"), "click"),    // BEFORE the view: ignored
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "view"),     // later view: first touch wins
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: stalls after click (no purchase)
      (2L, ts("2024-01-02 10:00:00"), "view"),
      (2L, ts("2024-01-02 10:05:00"), "click"),
      // user 3: purchase BEFORE any view — never enters, purchase ignored
      (3L, ts("2024-01-03 08:00:00"), "purchase"),
      (3L, ts("2024-01-03 09:00:00"), "view"),
      // user 4: only clicks — no view, absent from the funnel
      (4L, ts("2024-01-04 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3),
          r.getInt(4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (ts("2024-01-01 10:00:00"),
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), 3))
    assert(out(2L)._3 == null && out(2L)._4 == 2)
    // user 3: view at 09:00, no click after it → steps = 1, t2/t3 null
    assert(out(3L) == (ts("2024-01-03 09:00:00"), null, null, 1))
  }

  test("funnel narrows monotonically on the fixture") {
    val events = graft.engine.Engine.table(spark, fixtureDir, "events")
    val out = EventOps.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).cache()
    try {
      val n1 = out.filter(col("t1").isNotNull).count()
      val n2 = out.filter(col("t2").isNotNull).count()
      val n3 = out.filter(col("t3").isNotNull).count()
      assert(n1 >= n2 && n2 >= n3, s"funnel must narrow: $n1/$n2/$n3")
      assert(n1 == out.count())
    } finally out.unpersist()
  }

  test("hourlyAnomalies flags the planted spike; constant series has no flags") {
    import spark.implicits._
    // 11 quiet hours at 2 errors, one spike hour at 30
    val quiet = (0 until 11).flatMap(h => (1 to 2).map(i =>
      (ts(f"2024-01-01 $h%02d:15:00"), "error")))
    val spike = (1 to 30).map(i => (ts("2024-01-01 11:30:00"), "error"))
    val noise = (0 until 12).map(h => (ts(f"2024-01-01 $h%02d:00:01"), "view"))
    val events = (quiet ++ spike ++ noise).toDF("ts", "event_type")
    val out = EventOps.hourlyAnomalies(events, "ts", "event_type",
        "error", zMax = 2.0)
      .collect().map(r => r.getTimestamp(0).toString ->
        (r.getLong(1), r.getBoolean(3))).toMap
    assert(out.size == 12)
    assert(out("2024-01-01 11:00:00.0") == (30L, true), "spike must flag")
    assert(out.count(_._2._2) == 1, "only the spike flags")
    // constant series: sigma = 0 → z defined as 0, nothing flags
    val flat = (0 until 6).flatMap(h => (1 to 3).map(_ =>
      (ts(f"2024-01-01 $h%02d:10:00"), "error"))).toDF("ts", "event_type")
    val flatOut = EventOps.hourlyAnomalies(flat, "ts", "event_type",
      "error").collect()
    assert(flatOut.forall(r => r.getDouble(2) == 0.0 && !r.getBoolean(3)))
  }

  test("cohortRetention: first-week cohorts, offsets, within-week dedup") {
    import spark.implicits._
    // Mondays: 2024-01-01, -08, -15 (weeks 0, 1, 2 of the year)
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), // A: cohort wk of 01-01
      (1L, ts("2024-01-03 11:00:00")), //   same week — counts once
      (1L, ts("2024-01-16 09:00:00")), //   active wk of 01-15 → offset 2
      (2L, ts("2024-01-10 12:00:00")), // B: cohort wk of 01-08
      (2L, ts("2024-01-17 12:00:00"))  //   offset 1
    ).toDF("user_id", "ts")
    val out = EventOps.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L, ("2024-01-08", 1) -> 1L))
  }

  test("keywordsTfidf ranks document-specific terms above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common common yak"),
      (3L, "common wolf wolf")).toDF("doc_id", "text")
    val out = graft.ext.TextOps.keywordsTfidf(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    // "common" appears in every doc → idf = ln(4/4) = 0 → scores 0;
    // the distinctive animal always wins rank 1.
    assert(out((1L, 1)) == "zebra")
    assert(out((2L, 1)) == "yak")
    assert(out((3L, 1)) == "wolf")
    // rank 2 is the zero-scoring ubiquitous term (ties → lexicographic)
    assert(out((1L, 2)) == "common")
  }

  test("stationaryRank equals a Scala mirror of the integer rounds; " +
      "sink accrues rank; ranks stay a near-distribution") {
    import spark.implicits._
    // one user, journey a a b a b c: transitions a→a, a→b(×2), b→a,
    // b→c; c is dangling (no out-edges).
    val seq = Seq("a", "a", "b", "a", "b", "c")
    val events = seq.zipWithIndex.map { case (t, i) =>
      (i.toLong, ts(s"2024-01-01 00:0$i:00"), 1L, t, 0.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ext.EventOps.stationaryRank(events, "user_id",
        "ts", "event_id", "event_type", alphaPct = 85, rounds = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // mirror: edges a→a w=333333, a→b w=666666, b→a w=500000,
    // b→c w=500000 (ppm of outdeg); N=3
    val w = Map(("a", "a") -> 333333L, ("a", "b") -> 666666L,
      ("b", "a") -> 500000L, ("b", "c") -> 500000L)
    var r = Map("a" -> 333333L, "b" -> 333333L, "c" -> 333333L)
    for (_ <- 1 to 8) {
      val dm = r("c") // c is the only dangling node
      r = Seq("a", "b", "c").map { v =>
        val contrib = w.collect { case ((s, d), wp) if d == v =>
          85L * r(s) * wp / 100000000L }.sum
        v -> (15L * 1000000L / (100L * 3L) + contrib +
          85L * dm / (100L * 3L))
      }.toMap
    }
    assert(out == r, s"got $out want $r")
    // floors only ever lose mass; teleport keeps everything positive
    assert(out.values.sum <= 1000000L && out.values.sum > 990000L)
    assert(out.values.forall(_ > 0L))
    // b receives the heaviest inflow (two-thirds of a's walk) — it
    // outranks the dangling sink c
    assert(out("b") > out("c"))
  }

  test("interArrivalStats: regular clock pins to -1e6, bursty user " +
    "positive, degenerate zero gaps pinned, singletons drop") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val events = (
      // user 1: perfect 60 s clock (bot) → sigma 0, B = -1
      (1L to 5L).map(i => (1L, at(i * 60), 100L + i)) ++
      // user 2: bursts — gaps 1, 1, 10000 s
      Seq((2L, at(0), 201L), (2L, at(1), 202L), (2L, at(2), 203L),
        (2L, at(10002), 204L)) ++
      // user 3: all simultaneous → gaps 0, sigma + mu = 0 → pinned
      Seq((3L, at(5), 301L), (3L, at(5), 302L)) ++
      // user 4: single event → no gaps, absent
      Seq((4L, at(9), 401L))
    ).toDF("user_id", "ts", "event_id")
    val got = EventOps.interArrivalStats(events, "user_id", "ts",
        "event_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((4L, 60000000L, -1000000L)))
    // user 2 exact mirror: gaps in µs
    val g = Seq(1000000L, 1000000L, 10000000000L)
    val (n, sg) = (g.size.toLong, g.sum)
    val sgg = g.map(x => BigInt(x) * BigInt(x)).sum
    val m = sg.toDouble / n
    val s = math.sqrt((BigInt(n) * sgg - BigInt(sg) * BigInt(sg)).toDouble) / n
    val want = math.floor((s - m) / (s + m) * 1000000.0).toLong
    assert(got(2L) == ((3L, sg / n, want)) && want > 0L)
    assert(got(3L) == ((1L, 0L, -1000000L)))
  }

  test("touchAttribution: first/last preceding touch, ties, no-touch row") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      // user 1: clicks at 09:00, 10:00; purchase at 10:30; click AFTER
      // at 11:00 must not attribute
      (1L, ts("2024-01-01 09:00:00"), 101L, "click"),
      (1L, ts("2024-01-01 10:00:00"), 102L, "click"),
      (1L, ts("2024-01-01 10:30:00"), 103L, "purchase"),
      (1L, ts("2024-01-01 11:00:00"), 104L, "click"),
      // user 1 second purchase at 12:00: all three clicks precede it
      (1L, ts("2024-01-01 12:00:00"), 105L, "purchase"),
      // user 2: two clicks at the SAME instant as the purchase — the
      // <= rule admits both; ties resolve (min id first, max id last)
      (2L, ts("2024-01-01 08:00:00"), 201L, "click"),
      (2L, ts("2024-01-01 08:00:00"), 202L, "click"),
      (2L, ts("2024-01-01 08:00:00"), 203L, "purchase"),
      // user 3: purchase with no click anywhere
      (3L, ts("2024-01-01 09:00:00"), 301L, "purchase"),
      // unrelated event types never attribute
      (1L, ts("2024-01-01 09:30:00"), 106L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.touchAttribution(events, "user_id", "ts",
        "event_type", "event_id", "purchase", "click")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_touches"),
          Option(r.getAs[java.lang.Long]("first_touch_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("last_touch_id")).map(_.toLong)))
      .toMap
    assert(got(103L) == ((2L, Some(101L), Some(102L))))
    assert(got(105L) == ((3L, Some(101L), Some(104L))))
    assert(got(203L) == ((2L, Some(201L), Some(202L))))
    assert(got(301L) == ((0L, None, None)))
    assert(got.size == 4)
  }
}
