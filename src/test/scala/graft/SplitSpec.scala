package graft

import org.apache.spark.sql.functions._
import graft.transform.Split

/** Deterministic hash split/sample: partition-layout independence (the
  * property randomSplit lacks), disjointness, fraction accuracy, and the
  * monotone-subset property of the sampler. */
class SplitSpec extends SparkSpec {

  private def docs = graft.engine.Engine.table(spark, fixtureDir, "documents")

  test("hashSplit assigns every row exactly one split, independent of partitioning") {
    val a = Split.hashSplit(docs, "doc_id",
      Seq("test" -> 0.05, "valid" -> 0.05)).select("doc_id", "split")
    val b = Split.hashSplit(docs.repartition(13, col("text")), "doc_id",
      Seq("test" -> 0.05, "valid" -> 0.05)).select("doc_id", "split")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "assignment must be a pure function of the id, not the layout")
    assert(a.count() == docs.count())
  }

  test("hashSplit realized fractions are within 1/256-granularity tolerance") {
    val n = docs.count().toDouble
    val counts = Split.hashSplit(docs, "doc_id",
        Seq("test" -> 0.1, "valid" -> 0.2))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("test", "valid", "train"))
    // 256 buckets + sampling noise at n=50: generous ±8pp window.
    assert(math.abs(counts("test") / n - 0.1) < 0.08,
      s"test fraction off: ${counts("test") / n}")
    assert(math.abs(counts("valid") / n - 0.2) < 0.08,
      s"valid fraction off: ${counts("valid") / n}")
  }

  test("hashSplit rejects weights summing to >= 1 and non-positive weights") {
    intercept[IllegalArgumentException] {
      Split.hashSplit(docs, "doc_id", Seq("a" -> 0.6, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Split.hashSplit(docs, "doc_id", Seq("a" -> -0.1, "b" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Split.hashSplit(docs, "doc_id", Seq("a" -> 0.0, "b" -> 0.5))
    }
  }

  test("hashSplit boundary: cumulative fraction above 255/256 must not empty the split") {
    // ceil(0.997*256) = 256: a naive %02x gives the 3-char "100", which
    // sorts below "11" and would silently send ~94% of 'b' to rest.
    val counts = Split.hashSplit(docs, "doc_id",
        Seq("a" -> 0.9, "b" -> 0.097))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("train", 0L) == 0L,
      s"virtually no rows should remain for rest: $counts")
    assert(counts.getOrElse("b", 0L) > 0L, s"split b emptied: $counts")
  }

  test("shuffleShards: deterministic across layouts/runs, disjoint " +
      "cover, seed changes the permutation, balanced-ish shards") {
    val df = spark.range(2000).toDF("id")
    val a = Split.shuffleShards(df, "id", "ep0", 8)
      .orderBy(col("shard"), col("shuffle_key"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val b = Split.shuffleShards(df.repartition(13), "id", "ep0", 8)
      .orderBy(col("shard"), col("shuffle_key"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq, "layout must not change the epoch order")
    // every row exactly once, shards in range
    assert(a.map(_._1).sorted.toSeq == (0L until 2000L).toSeq)
    assert(a.forall(t => t._3 >= 0 && t._3 < 8))
    // hash buckets are balanced in expectation: no shard empty or >2x
    val sizes = a.groupBy(_._3).map(_._2.length).toSeq
    assert(sizes.size == 8 && sizes.max < 2 * sizes.min,
      s"shard sizes $sizes")
    // a new seed is a genuinely different permutation
    val c = Split.shuffleShards(df, "id", "ep1", 8)
      .orderBy(col("shard"), col("shuffle_key"))
      .collect().map(_.getLong(0))
    assert(c.toSeq != a.map(_._1).toSeq)
    // the within-shard order is NOT id order (it actually shuffles)
    val shard0 = a.filter(_._3 == 0).map(_._1)
    assert(shard0.toSeq != shard0.sorted.toSeq)
    // guards
    intercept[IllegalArgumentException](
      Split.shuffleShards(df, "id", "a:b", 8))
    intercept[IllegalArgumentException](
      Split.shuffleShards(df, "id", "s", 0))
  }

  test("shuffleShards is a narrow no-shuffle projection") {
    val p = Split.shuffleShards(spark.range(100).toDF("id"), "id", "e", 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("hashSample boundary: fractions just under 1.0 keep ~everything") {
    // ceil(0.99999*65536) = 65536: a naive %04x gives "10000" (5 chars),
    // silently keeping only ~6% of rows.
    assert(Split.hashSample(docs, "doc_id", 0.99999).count() == docs.count())
  }

  test("hashSample: monotone subsets, empty at 0, everything at 1") {
    val ids10 = Split.hashSample(docs, "doc_id", 0.10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids30 = Split.hashSample(docs, "doc_id", 0.30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids30),
      "growing the fraction must only ADD rows (stable membership)")
    assert(Split.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Split.hashSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("stratifiedSample: exact per-stratum counts, small strata kept whole, layout-independent") {
    val byLang = Split.stratifiedSample(docs, "lang", "doc_id", 5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == full.keySet)
    byLang.foreach { case (lang, n) => assert(n == math.min(5L, full(lang))) }

    val a = Split.stratifiedSample(docs, "lang", "doc_id", 5)
      .select("doc_id")
    val b = Split.stratifiedSample(docs.repartition(11, col("n_chars")),
      "lang", "doc_id", 5).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "selection must be a pure function of the data")
  }

  test("hashSample is a narrow no-shuffle plan") {
    val plan = Split.hashSample(docs, "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("mixtureSample prunes ranks map-side (WindowGroupLimit from the constant bound)") {
    val plan = Split.mixtureSample(docs, "source", "doc_id",
        Map("src0" -> 3, "src1" -> 7))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"constant max-target bound must enable rank pruning:\n$plan")
  }

  test("mixtureSample: exact per-stratum targets, clamping, whitelist drop") {
    val out = Split.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 3, "src1" -> 1000, "src2" -> 0))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src1Total = docs.filter(col("source") === "src1").count()
    assert(bySrc == Map("src0" -> 3L, "src1" -> src1Total)) // src2 + others dropped
    // layout independence: same ids from a different physical layout
    val b = Split.mixtureSample(docs.repartition(7, col("text")),
      "source", "doc_id", Map("src0" -> 3, "src1" -> 1000, "src2" -> 0))
      .select("doc_id")
    assert(out.select("doc_id").exceptAll(b).isEmpty &&
      b.exceptAll(out.select("doc_id")).isEmpty)
  }

  test("temperatureSample: sqrt quotas flatten the mix, exact integer arithmetic") {
    import spark.implicits._
    // 100/25/4 docs (perfect squares, so √n·2³⁰ is an exact integer
    // and the fixed-point weights are exactly 10:5:2): raw shares
    // 77.5/19.4/3.1 % flatten to 20/10/4 of a 34-doc budget — the
    // low-resource stratum rises from 3.1 % to 11.8 %. Exact integer
    // quota division means the boundary is deterministic.
    val rows = (0 until 100).map(i => (i.toLong, "big")) ++
      (1000 until 1025).map(i => (i.toLong, "mid")) ++
      (2000 until 2004).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "src")
    val out = Split.temperatureSample(df, "src", "id", budget = 34)
    val got = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("big" -> 20L, "mid" -> 10L, "small" -> 4L), got)
    // layout independence
    val b = Split.temperatureSample(df.repartition(7, col("id")),
      "src", "id", budget = 34).select("id")
    assert(out.select("id").exceptAll(b).isEmpty &&
      b.exceptAll(out.select("id")).isEmpty)
  }

  test("temperatureSample up-samples low-resource strata vs proportional") {
    // On the fixture languages (en 218 of 500 = 43.6% raw), the α=0.5
    // rebalance must pull en's share toward the mean and push the
    // low-resource langs above their raw share.
    val out = Split.temperatureSample(docs, "lang", "doc_id", budget = 100)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = got.values.sum.toDouble
    val rawTotal = raw.values.sum.toDouble
    val enShare = got("en") / total
    assert(enShare < raw("en") / rawTotal, s"en not flattened: $got")
    raw.keys.filter(_ != "en").foreach { l =>
      assert(got(l) / total >= raw(l) / rawTotal,
        s"$l not up-sampled: $got vs $raw")
    }
  }

  test("tokenBudgetSample: boundary doc included, whole-stratum budgets, whitelist") {
    import spark.implicits._
    val rows = (1L to 30L).map { i =>
      val stratum = if (i <= 10) "a" else if (i <= 20) "b" else "c"
      (i, stratum, 10L * (i % 3 + 1)) // token counts 10/20/30
    }.toDF("id", "stratum", "n_tok")
    // Reference: replicate the op's spec directly (md5-rank order,
    // integer cumsum, keep while tokens-before < budget).
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val data = rows.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    def expect(stratum: String, budget: Long): Set[Long] = {
      val ordered = data.filter(_._2 == stratum)
        .sortBy { case (id, _, _) => (md5hex(id.toString), id) }
      var before = 0L
      ordered.flatMap { case (id, _, n) =>
        val keep = before < budget; before += n; if (keep) Some(id) else None
      }.toSet
    }
    val budgets = Map("a" -> 45L, "b" -> 10000L) // c absent → dropped
    val out = Split.tokenBudgetSample(rows, "stratum", "id", "n_tok", budgets)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == expect("a", 45L) ++ expect("b", 10000L))
    // b's budget exceeds the stratum total → whole stratum kept
    assert((11L to 20L).forall(out.contains))
    assert(!(21L to 30L).exists(out.contains), "stratum c must be dropped")
    // tiny budget still takes the first document
    val one = Split.tokenBudgetSample(rows, "stratum", "id", "n_tok",
      Map("a" -> 1L)).select("id").collect().map(_.getLong(0)).toSet
    assert(one.size == 1)
    // layout independence
    val re = Split.tokenBudgetSample(rows.repartition(7, col("n_tok")),
      "stratum", "id", "n_tok", budgets)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(re == out)
  }

  test("componentSplit keeps whole components together; singletons = hashSplit") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, s"doc $i")).toDF("id", "text")
    // components: {1,2,3} labeled 1, {10,11} labeled 10; rest singleton
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val fr = Seq("test" -> 0.3, "valid" -> 0.2)
    val out = Split.componentSplit(rows, "id", comps, fr)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 40)
    // whole component shares one split
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(10L) == out(11L))
    // component split == hashSplit of the LABEL id
    assert(out(2L) == out(1L))
    val plain = Split.hashSplit(rows, "id", fr)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == plain(1L) && out(10L) == plain(10L))
    // singletons identical to plain hashSplit (degrades bit-for-bit)
    ((4L to 9L) ++ (12L to 40L)).foreach(i => assert(out(i) == plain(i), s"id $i"))
  }

  test("leakageSafeSplit: no near-dup pair straddles splits (chain case)") {
    import spark.implicits._
    val rows = (1L to 20L).map(i => (i, s"doc $i")).toDF("id", "text")
    // chain 1-2-3 plus pair 7-15: transitive closure must group the chain
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 15L)).toDF("id_a", "id_b")
    val out = graft.ext.DedupOps
      .leakageSafeSplit(rows, "id", pairs, Seq("test" -> 0.4))
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(out(1L), out(2L), out(3L)).size == 1, "chain must co-split")
    assert(out(7L) == out(15L), "pair must co-split")
  }

  test("weightedSample: without replacement, weight-biased, layout-free") {
    import spark.implicits._
    // 100 heavy rows (w=10) among 900 light (w=1): heavy mass is
    // 1000/1900 ≈ 53%, so a 200-row sample should hold far more heavy
    // rows than their 10% population share — deterministic fixture,
    // this either passes or fails reproducibly.
    val df = (0L until 1000L)
      .map(i => (i, if (i < 100) 10L else 1L)).toDF("id", "w")
    val out = graft.transform.Split.weightedSample(df, "id", "w", 200)
      .select("id").collect().map(_.getLong(0))
    assert(out.length == 200)
    assert(out.distinct.length == 200, "sample must be w/o replacement")
    val heavy = out.count(_ < 100L)
    assert(heavy > 40, s"heavy rows under-represented: $heavy/200")
    // partition-layout independence
    val out2 = graft.transform.Split
      .weightedSample(df.repartition(7, col("w")), "id", "w", 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out2 == out.toSet)
  }

  test("weightedSample: non-positive weights are excluded; top-n plan") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, -3L), (3L, 5L), (4L, 5L)).toDF("id", "w")
    val got = graft.transform.Split.weightedSample(df, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 4L))
    // plan pin on a real scan: a local Seq constant-folds into a
    // LocalRelation whose row count lets EliminateLimits drop the
    // limit, and the top-k plan has nothing to do
    val docs = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .select(col("doc_id"), lit(1L).as("w"))
    val p = graft.transform.Split.weightedSample(docs, "doc_id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("allocateBudget: largest-remainder apportionment, sum == budget " +
      "exactly, ties break on group order") {
    import spark.implicits._
    def alloc(ws: Seq[(String, Long)], budget: Long): Map[String, Long] =
      graft.transform.Split.allocateBudget(
          ws.toDF("g", "w"), "g", "w", budget)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc"))
        .toMap
    // quotas 3.33333/3.33333/3.33334 of 10: one leftover unit goes to
    // the largest remainder (c)
    val a = alloc(Seq(("a", 333333L), ("b", 333333L), ("c", 333334L)), 10L)
    assert(a == Map("a" -> 3L, "b" -> 3L, "c" -> 4L), a.toString)
    // equal remainders: leftover goes by group order (a before b)
    val b = alloc(Seq(("a", 1L), ("b", 1L)), 3L)
    assert(b == Map("a" -> 2L, "b" -> 1L), b.toString)
    // exact-sum invariant under awkward budgets and weights; every
    // alloc within 1 of its real-valued quota (Hamilton's guarantee)
    val ws = Seq(("s0", 17L), ("s1", 3L), ("s2", 80L), ("s3", 900L))
    for (budget <- Seq(0L, 1L, 7L, 999L, 1000000007L)) {
      val out = alloc(ws, budget)
      assert(out.values.sum == budget, s"budget $budget: $out")
      val tw = ws.map(_._2).sum.toDouble
      for ((g, w) <- ws) {
        val quota = budget * w / tw
        assert(math.abs(out(g) - quota) < 1.0 + 1e-9,
          s"budget $budget group $g quota $quota got ${out(g)}")
      }
    }
    // decimal path: budget*weight past 2^63 still exact
    val big = alloc(Seq(("x", 999999L), ("y", 1L)), 4000000000000000000L)
    assert(big.values.sum == 4000000000000000000L)
    assert(big("y") == 4000000000000L)
    // rank rides a broadcast self-join count: no Window anywhere (the
    // single-partition WindowExec warning class is structurally absent)
    val p = graft.transform.Split.allocateBudget(
        ws.toDF("g", "w"), "g", "w", 999L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
  }

  test("weightedSamplePerGroup: equals a window mirror, exact per-group " +
    "k, zero weights excluded, layout-independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1L to 200L).map(i =>
      (i, s"g${i % 5}", if (i % 17 == 0) 0L else rnd.nextInt(50) + 1L))
      .toDF("id", "g", "w")
    val got = Split.weightedSamplePerGroup(df, "g", "id", "w", 7)
      .collect()
      .map(r => (r.getAs[Long]("id"),
        (r.getAs[String]("g"), r.getAs[Long]("sample_rank"))))
      .toMap
    // window mirror over the same engine-computed scores
    val h = conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0)
    val sc = floor(call_function("graft_ln", u) *
      lit(1073741824.0) / col("w").cast("double")).cast("long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("_s").desc, col("id"))
    val mirror = df.filter(col("w") > 0).withColumn("_s", sc)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 7)
      .collect()
      .map(r => (r.getAs[Long]("id"),
        (r.getAs[String]("g"), r.getAs[Int]("_rk").toLong)))
      .toMap
    assert(got == mirror)
    // per-group exactly min(k, group size) survivors; k=7 < every group
    assert(got.values.groupBy(_._1).forall(_._2.size == 7))
    // zero-weight rows (id % 17 == 0) never sampled
    assert(got.keys.forall(_ % 17 != 0))
    // layout independence
    val again = Split.weightedSamplePerGroup(df.repartition(13), "g",
        "id", "w", 7)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == got.keySet)
  }

  test("systematicPps: exact budget per group, certainty items, " +
    "zero-weight rows visible, degenerate group, layout-independent") {
    import spark.implicits._
    // group g: stride = T/n = 20/4 = 5 — every weight is a multiple of
    // the stride, so multiplicities are start-independent and exact
    val df = Seq(
      ("g", 1L, 5L), ("g", 2L, 0L), ("g", 3L, 10L), ("g", 4L, 5L),
      ("z", 8L, 0L), ("z", 9L, 0L),   // all-zero group: nothing selected
      ("c", 5L, 7L)                    // one item holds ALL the weight
    ).toDF("src", "id", "w")
    val out = Split.systematicPps(df, "src", "id", "w", n = 4,
        seed = "s0")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("multiplicity"), r.getAs[Boolean]("selected"),
          r.getAs[Long]("cum_before"), r.getAs[Long]("group_total"))))
      .toMap
    assert(out(1L) == ((1L, true, 0L, 20L)))
    assert(out(2L) == ((0L, false, 5L, 20L)))  // zero weight, visible
    assert(out(3L) == ((2L, true, 5L, 20L)))   // certainty item: 2 marks
    assert(out(4L) == ((1L, true, 15L, 20L)))
    assert(out(8L)._1 == 0L && out(9L)._1 == 0L)   // T = 0 group
    assert(out(5L) == ((4L, true, 0L, 7L)))    // all marks on one item
    // budget exactness on a seed-dependent split: weights do NOT divide
    // the stride, so WHO gets selected depends on the seed, but the
    // group total is always exactly n
    val frac = Seq(("h", 1L, 3L), ("h", 2L, 5L), ("h", 3L, 2L),
      ("h", 4L, 6L)).toDF("src", "id", "w")
    for (seed <- Seq("a", "b", "c")) {
      val m = Split.systematicPps(frac, "src", "id", "w", 2, seed)
        .collect().map(_.getAs[Long]("multiplicity")).sum
      assert(m == 2L, s"seed $seed: budget $m != 2")
    }
    // layout independence
    val again = Split.systematicPps(df.repartition(7), "src", "id", "w",
        4, "s0")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("multiplicity")).toMap
    assert(again == out.map { case (k, v) => k -> v._1 })
    // negative weights clamp to zero (never selected, still visible)
    val neg = Seq(("n", 1L, -5L), ("n", 2L, 4L)).toDF("src", "id", "w")
    val nOut = Split.systematicPps(neg, "src", "id", "w", 2, "s0")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("multiplicity")).toMap
    assert(nOut(1L) == 0L && nOut(2L) == 2L)
  }

  test("balancedPack: snake-draft hand case, every doc whole, loads " +
    "balanced, layout-independent") {
    import spark.implicits._
    // weights 8..1 into 2 bins: ranks 0..7 on (w desc, id), rounds
    // alternate direction: r0→b0, r1→b1, r2→b1, r3→b0, r4→b0, ...
    val df = (1L to 8L).map(i => (i, 9L - i)).toDF("id", "w")
    val got = Split.balancedPack(df, "id", "w", nBins = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("pack_rank"), r.getAs[Long]("pack_bin")))).toMap
    // id 1 has w=8 → rank 0 → bin 0; id 2 w=7 → rank 1 → bin 1;
    // id 3 w=6 → rank 2, round 1 (odd) → bin 1; id 4 → rank 3 → bin 0...
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((1L, 1L)))
    assert(got(3L) == ((2L, 1L)) && got(4L) == ((3L, 0L)))
    assert(got(5L) == ((4L, 0L)) && got(6L) == ((5L, 1L)))
    assert(got(7L) == ((6L, 1L)) && got(8L) == ((7L, 0L)))
    // perfect balance on this fixture: 8+5+4+1 = 7+6+3+2 = 18
    // and in general zigzag bounds the spread by ~one max item
    val loads = got.toSeq.groupBy(_._2._2)
      .map { case (b, xs) => b -> xs.map(x => 9L - x._1).sum }
    assert(loads == Map(0L -> 18L, 1L -> 18L))
    // wider fixture: spread stays under the max single weight
    val big = (1L to 103L).map(i => (i, (i * 37L) % 50L + 1L))
      .toDF("id", "w")
    val bins = Split.balancedPack(big, "id", "w", nBins = 7)
      .groupBy("pack_bin").agg(sum("w").as("load"))
      .collect().map(_.getAs[Long]("load"))
    assert(bins.length == 7 && bins.max - bins.min <= 50L,
      s"spread too wide: ${bins.toSeq}")
    // layout independence
    val again = Split.balancedPack(big.repartition(11), "id", "w", 7)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("pack_bin")).toMap
    val base = Split.balancedPack(big, "id", "w", 7)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("pack_bin")).toMap
    assert(again == base)
  }
}
