package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and train/valid/test splitting for
  * training-data pipelines.
  *
  * Why not `df.sample` / `randomSplit`: those are seeded per-partition and
  * re-deal rows when the partitioning changes, so yesterday's test set is
  * not today's. Here membership is a pure function of a stable id —
  * `md5(id)` — so a document lands in the same split on every run, at
  * every scale, on any cluster layout, and the assignment is reproducible
  * by any engine with md5 (the DuckDB oracle recomputes it exactly).
  *
  * Plan shape: one narrow projection (md5 + substring compare), no
  * shuffle, no driver traffic; at 100 TB the split column is free next to
  * the scan.
  */
object Split {

  /** First hex chars of md5(id) — 2 chars = 256 buckets for splits,
    * 4 chars = 65536 for fine-grained sampling. Lexicographic comparison
    * of fixed-width lowercase hex == numeric comparison. */
  private def hexPrefix(id: Column, chars: Int): Column =
    substring(md5(id.cast("string")), 1, chars)

  /** Append a `split` column assigning each row to a named fraction.
    *
    * `fractions` are (name, weight) with weights summing to < 1; rows not
    * claimed fall into `rest`. Bucket boundaries are ceil(weight·256), so
    * realized fractions are within 1/256 of the ask — the price of exact
    * reproducibility. Assignment depends only on `idCol` values.
    */
  def hashSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)],
                rest: String = "train"): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum < 1.0,
      "fractions must be non-empty and sum to < 1 (remainder goes to rest)")
    require(fractions.forall(_._2 > 0.0),
      s"every fraction must be positive: $fractions")
    val h = hexPrefix(col(idCol), 2)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map { c =>
        val b = math.ceil(c * 256).toLong
        // A cumulative bound that rounds up to all 256 buckets must
        // compare above every 2-char hex prefix — f"%02x" of 256 would
        // be the 3-char "100", which sorts BELOW "11" lexicographically
        // and would silently empty the split.
        if (b >= 256) "g" else f"$b%02x"
      }
    val assigned = fractions.zip(bounds).foldRight(lit(rest)) {
      case (((name, _), bound), fallback) =>
        when(h < lit(bound), lit(name)).otherwise(fallback)
    }
    // foldRight chains to when(h<b1, n1).otherwise(when(h<b2, n2)...): the
    // FIRST bound wins, so cumulative bounds assign disjoint ranges.
    df.withColumn("split", assigned)
  }

  /** Deterministic corpus shuffle + sharding — the LAST step before a
    * curated corpus ships to a trainer: a crawl-ordered corpus induces
    * domain/time correlation within training batches, so the standard
    * recipe (Pythia, OLMo reproducibility cards) is a SEEDED
    * pseudo-random total order plus a fixed shard count, both pure
    * functions of (seed, id) so the same corpus + seed yields the same
    * epoch order on any engine, cluster, or input layout — and a new
    * seed per epoch is a fresh permutation with zero state.
    *
    * Appends `shuffle_key` (md5 of seed:id — the within-shard sort key)
    * and `shard` (first 4 hex chars mod nShards — balanced in
    * expectation like every hash bucket). The write pattern that makes
    * the order physical is
    * `df.repartition(nShards, col("shard"))
    *    .sortWithinPartitions("shuffle_key")` — one shuffle keyed by
    * shard, each output file internally ordered; trainers stream shards
    * in key order. No global sort, no rank pass, no driver state.
    *
    * Deliberately NOT a global row_number: a contiguous global position
    * would cost the two-pass rank machinery per epoch and buys nothing —
    * trainers consume (shard, within-shard order), which the hex key
    * already totally determines (md5 collisions aside, and ties only
    * affect neighbors within a batch). */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(!seed.contains(":"),
      s"seed must not contain ':' (the seed:id separator): $seed")
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    df.withColumn("shuffle_key", key)
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 4), 16, 10)
          .cast("long"), lit(nShards.toLong)).cast("int"))
  }

  /** Deterministic balanced packing — the truncation-free counterpart
    * of [[graft.ext.TextOps.assignPackedBins]] (concat-and-chunk splits
    * documents across context boundaries; modern recipes keep each
    * document whole and balance bin LOADS instead — Ding et al. 2024,
    * "Fewer Truncations Improve Language Modeling", motivates the
    * objective). Assignment is the snake-draft / zigzag rule on the
    * (weight desc, id asc) global rank: round r = rank div nBins
    * alternates direction, so each bin receives one item per round and
    * consecutive rounds pair a bin's large pick with a small one —
    * LPT-flavor balance (Graham 1969 context) as a PURE FUNCTION of
    * (weights, ids, nBins): no sequential bin-load state, identical on
    * any engine/layout, and expressible in one SQL window for the
    * oracle.
    *
    * Scale shape: the global rank is [[Ids.assignContiguousIds]]'s
    * two-pass range-partitioned machinery (no single-partition window);
    * the zigzag is a narrow projection on the rank. Adds `pack_rank`
    * and `pack_bin`. */
  def balancedPack(df: DataFrame, idCol: String, weightCol: String,
                   nBins: Int): DataFrame = {
    require(nBins >= 1, s"balancedPack: nBins must be >= 1: $nBins")
    // materialize-before-rank (the r11 scoreTiles lesson): the range
    // partitioner SAMPLES its input to pick boundaries, so an expensive
    // weight expression (tokenize-the-corpus) would evaluate twice —
    // once for the sample, once for the shuffle write.
    val mat = graft.engine.Engine.materialize(df)
    val ranked = graft.transform.Ids.assignContiguousIds(mat,
      struct((-col(weightCol).cast("long")).as("_nw"), col(idCol)),
      "pack_rank", 0L)
    // ranked is eager + lineage-truncated, so the materialized input is
    // already dead — free it instead of pinning a corpus copy.
    graft.engine.Engine.release(mat)
    ranked
      .withColumn("_round", expr(s"pack_rank div $nBins"))
      .withColumn("_pos", pmod(col("pack_rank"), lit(nBins.toLong)))
      .withColumn("pack_bin",
        when(pmod(col("_round"), lit(2L)) === 0L, col("_pos"))
          .otherwise(lit(nBins.toLong - 1L) - col("_pos"))
          .cast("long"))
      .drop("_round", "_pos")
  }

  /** Systematic probability-proportional-to-size sampling (Madow 1949)
    * — the classic design for "sample documents proportional to token
    * count at a fixed per-group budget": lay every item's weight as an
    * interval on a line, walk the line with a fixed stride `T/n` from a
    * seeded start, select the item under each mark. Items heavier than
    * the stride are selected with multiplicity > 1 (certainty items —
    * faithful PPS, reported, not clamped); zero-weight items have empty
    * intervals and are never selected but stay VISIBLE at multiplicity
    * 0 (the same report drives the filter and the audit).
    *
    * Deterministic: the random start of the textbook design comes from
    * `md5(seed:group)` (the [[shuffleShards]] recipe — a pure function
    * of (seed, group), new seed = fresh sample), and ALL arithmetic is
    * exact integers — intervals scale by `n` so the stride is the
    * integer `T` and mark-counting is two offset integer divisions
    * (`(x+T) div T − 1`, operands kept non-negative so truncating and
    * floor division agree on every engine).
    *
    * Scale shape: one per-group exclusive-prefix window (the
    * [[graft.ext.TextOps.assignPackedBins]] shape — groups parallelize;
    * a group's items serialize through its window, which is how PPS is
    * sharded in practice), one per-group total window, no driver
    * state, no RNG. Negative weights are clamped to 0 up front. */
  def systematicPps(df: DataFrame, groupCol: String, idCol: String,
                    weightCol: String, n: Int, seed: String): DataFrame = {
    require(n >= 1, s"systematicPps: n must be >= 1: $n")
    require(!seed.contains(":"),
      s"seed must not contain ':' (the seed:group separator): $seed")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val w = greatest(col(weightCol).cast("long"), lit(0L))
    // Scale the line by n so the stride is the INTEGER `_tot`: marks
    // sit at `_start + k*_tot` (k in [0, n)), item i's interval is
    // [_cum*n, (_cum+_w)*n), and the marks-below-x count is
    // C(x) = (x - _start - 1 + _tot) div _tot — operand non-negative
    // for every x >= 0 since _start < _tot, so truncating and floor
    // division agree. multiplicity = C(hi) - C(lo).
    df.withColumn("_w", w)
      .withColumn("_cum", coalesce(sum(col("_w")).over(wOrd), lit(0L)))
      .withColumn("_tot", sum(col("_w")).over(wAll))
      .withColumn("_start",
        pmod(conv(substring(md5(concat(lit(seed), lit(":"),
          col(groupCol).cast("string"))), 1, 8), 16, 10).cast("long"),
          greatest(col("_tot"), lit(1L))))
      .withColumn("_hi", col("_cum") * n + col("_w") * n -
        col("_start") - 1 + col("_tot"))
      .withColumn("_lo", col("_cum") * n -
        col("_start") - 1 + col("_tot"))
      .withColumn("multiplicity",
        when(col("_tot") > 0,
          expr("_hi div _tot") - expr("_lo div _tot"))
          .otherwise(lit(0L)))
      .withColumn("selected", col("multiplicity") >= 1)
      .drop("_w", "_start", "_hi", "_lo")
      .withColumnRenamed("_cum", "cum_before")
      .withColumnRenamed("_tot", "group_total")
  }

  /** Keep a deterministic `fraction` of rows by id hash (65536 buckets —
    * resolution 1/65536). Same id set survives on every run/engine. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction: $fraction")
    val buckets = math.ceil(fraction * 65536).toLong
    // ceil hits 65536 for any fraction above 65535/65536 — that formats
    // as the 5-char "10000", which sorts below most 4-char prefixes and
    // would silently DROP ~94% of rows. All buckets selected == keep df.
    if (buckets >= 65536) df
    else df.filter(hexPrefix(col(idCol), 4) < lit(f"$buckets%04x"))
  }

  /** Deterministic stratified sample: EXACTLY min(n, |stratum|) rows per
    * stratum, chosen by md5(id) rank (id tie-break) — so the selection is
    * a pure function of the data, not the layout, and strata smaller than
    * `n` are kept whole rather than over-sampled. The fraction-based
    * sampler can't promise exact per-stratum counts; eval-set
    * construction usually needs them. One window per stratum (shuffle on
    * the stratum key); rank ≤ n prunes map-side via the window's
    * running limit at scale. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Deterministic domain-mixture sampling — the data-mixing step of a
    * training run ("60% web, 30% code, 10% books at a fixed budget"):
    * EXACTLY min(target, |stratum|) rows per stratum, chosen by md5(id)
    * rank like [[stratifiedSample]] but with a per-stratum target.
    * Strata absent from `targets` are DROPPED — a mixture is a
    * whitelist, not a default-keep. Same scale shape as the stratified
    * sampler: one window shuffle on the stratum key, selection a pure
    * function of the data. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    targets: Map[String, Int]): DataFrame = {
    require(targets.nonEmpty, "mixtureSample: empty target map")
    require(targets.values.forall(_ >= 0),
      s"mixtureSample: negative target in $targets")
    val target = targets.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    // The CONSTANT bound (max target) comes first: InferWindowGroupLimit
    // only fires on literal rank limits, and with it each task prunes
    // rows beyond the largest stratum target BEFORE the window shuffle;
    // the per-stratum CASE column then refines to the exact counts.
    val maxTarget = targets.values.max
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxTarget && col("_rn") <= target)
      .drop("_rn")
  }

  /** Temperature-weighted mixture sampling — the multilingual-
    * pretraining rebalance (Conneau & Lample 2019 §3.1; mT5, BLOOM):
    * per-stratum quotas proportional to n_i^α with α < 1, so
    * low-resource strata are UP-sampled relative to their raw share
    * ("temperature" because the distribution is flattened like a
    * softmax at T = 1/α). α = 0.5 here — and deliberately ONLY 0.5:
    * `sqrt` is correctly rounded under IEEE 754 on every engine, so
    * quota arithmetic can be made bit-identical cross-engine, while a
    * general `pow(n, α)` is not correctly rounded and a 1-ulp
    * divergence at a floor boundary would flip a quota. The weights go
    * through the round-7 fixed-point pattern: `floor(sqrt(n)·2³⁰)` as
    * BIGINT, integer SUM, and `(budget · fx_i) div Σfx` in exact
    * integer division — no float sum, no float divide, no
    * associativity hazard.
    *
    * Selection within a stratum is the usual md5-rank prefix, so the
    * sample is a pure function of the data. Scale shape: one tiny
    * stratum-count aggregate (broadcast back), one window shuffle on
    * the stratum key; the literal `budget` bound on the row_number
    * keeps InferWindowGroupLimit pruning ahead of the shuffle. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        budget: Int): DataFrame = {
    require(budget > 0, s"temperatureSample: budget $budget must be > 0")
    val fx = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_fx",
        floor(sqrt(col("_n").cast("double")) * lit(1073741824.0))
          .cast("long"))
    val tot = fx.agg(sum(col("_fx")).as("_tfx"))
    val quota = fx.crossJoin(broadcast(tot))
      .withColumn("_quota", expr(s"(${budget}L * _fx) div _tfx"))
      .select(col(stratumCol).as("_qs"), col("_quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .join(broadcast(quota), col(stratumCol) === col("_qs"))
      .filter(col("_rn") <= lit(budget) && col("_rn") <= col("_quota"))
      .drop("_rn", "_qs", "_quota")
  }

  /** Token-budget mixture sampling — [[mixtureSample]] denominated in
    * TOKENS instead of documents, because training mixtures are token
    * budgets ("300 B web tokens, 50 B code") and document counts are
    * only a proxy for them. Per stratum, documents are taken in
    * md5(id)-rank order until the budget fills: a document is kept iff
    * the token count of the documents BEFORE it is still under the
    * budget — so the boundary-straddling document is included, the
    * sample reaches ≥ budget tokens whenever the stratum has them, and
    * any positive budget takes at least one document. Strata absent
    * from `budgets` are dropped (a mixture is a whitelist).
    *
    * Deterministic by the same argument as every sampler here: the
    * order is a pure function of ids, the running sum is an INTEGER
    * window cumsum (exact, engine-independent), so the selected set is
    * reproducible on any layout, cluster, or engine. Scale shape: one
    * window shuffle on the stratum key; unlike the rank-bounded
    * samplers there is no constant bound for map-side pruning (the
    * cutoff depends on the running sum), so budget sampling pays its
    * stratum's full sort — acceptable because strata are the
    * parallelism unit and the window carries only (id, stratum,
    * token-count). */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokenCountCol: String,
                        budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample: empty budget map")
    require(budgets.values.forall(_ > 0),
      s"tokenBudgetSample: budgets must be positive: $budgets")
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    df.filter(col(stratumCol).isin(budgets.keys.toSeq: _*))
      .withColumn("_before",
        coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .filter(col("_before") < budget)
      .drop("_before")
  }

  /** Leakage-safe split core: assign every row of a duplicate COMPONENT
    * to the same split, so near-duplicates can never straddle
    * train/test (the eval-contamination vector [[hashSplit]] alone
    * cannot close — Lee et al. 2021 §6.2 measure exactly this leak).
    * `components` is an (id, component) labeling — produced by e.g.
    * `DedupOps.connectedComponents` over any near-dup pair relation;
    * rows absent from it are singletons and split by their own id. The
    * split of a component is [[hashSplit]] of its label, so singleton
    * assignments are IDENTICAL to plain hashSplit (a leakage-safe
    * split of a dup-free corpus degrades to hashSplit bit-for-bit).
    *
    * Scale shape: one join against the component labeling (dup-pair
    * members only — typically a small fraction of the corpus, AQE
    * broadcasts it when so) plus hashSplit's narrow md5 projection.
    * The convenience wrapper `DedupOps.leakageSafeSplit` runs the
    * whole chain from a pair relation. */
  def componentSplit(df: DataFrame, idCol: String, components: DataFrame,
                     fractions: Seq[(String, Double)],
                     rest: String = "train",
                     compIdCol: String = "id",
                     compCol: String = "component"): DataFrame = {
    val comps = components.select(col(compIdCol).as("_cid"),
      col(compCol).as("_comp"))
    val withRep = df.join(comps, df(idCol) === col("_cid"), "left")
      .withColumn("_rep", coalesce(col("_comp"), df(idCol)))
      .drop("_cid", "_comp")
    hashSplit(withRep, "_rep", fractions, rest).drop("_rep")
  }

  /** Weighted sampling WITHOUT replacement, Efraimidis–Spirakis 2006:
    * row i gets key `uᵢ^(1/wᵢ)` with uᵢ uniform; the n largest keys are
    * a weight-proportional sample. Deterministic twist: uᵢ is the
    * portable 60-bit md5 hash of the id mapped into (0, 1] — so the
    * sample, like every sampler here, is a pure function of the data
    * (same rows on every run, layout, and engine), yet weight-biased
    * the way inclusion probabilities demand (w ∝ token count ⇒ the
    * sample is uniform over TOKENS, the LM-training notion of "uniform").
    *
    * Engine-exact ordering: keys compare by `ln(u)/w`, computed as
    * `floor(ln(u)·2³⁰ / w)` — `(h+1)/2⁶⁰` is an exact power-of-two
    * scaling, `ln` agrees bit-for-bit across engines on this libm (the
    * `graft_ln` contract, proven by the DSIR/BM25/PMI oracles), the
    * multiply and divide are each correctly rounded, and `floor` pins
    * the BIGINT; ties break by id. Plan shape: one narrow projection +
    * a TakeOrdered — no shuffle, no window, weight-biased top-n at any
    * scale. Rows with w ≤ 0 are excluded (zero inclusion mass). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1: $n")
    val h = graft.ext.SketchOps.h60(col(idCol).cast("string"))
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0)
    val scoreFx = floor(call_function("graft_ln", u) *
      lit(1073741824.0) / col(weightCol).cast("double")).cast("long")
    df.filter(col(weightCol) > 0)
      .withColumn("sample_score_fx", scoreFx)
      .orderBy(col("sample_score_fx").desc, col(idCol))
      .limit(n)
  }

  /** Per-GROUP Efraimidis–Spirakis weighted sampling without
    * replacement: the k best exponential keys `u^(1/w)` within each
    * group — "k documents per domain, chosen ∝ token count", the
    * grouped form of [[weightedSample]] (same deterministic md5
    * uniform, same engine-exact `floor(ln(u)·2³⁰/w)` fixed-point
    * ordering, ties by id), so a sample is reproducible across runs,
    * engines, and layouts, and a group's selection is independent of
    * every other group's contents.
    *
    * Scale shape: the score is a narrow projection; the per-group
    * top-k comes from [[Ids.assignGroupedRanks]]'s two-pass
    * range-partitioned rank — a mega-group SPANS partitions instead of
    * funneling through the single-task window `row_number() OVER
    * (PARTITION BY group)` plans when one domain is half the corpus.
    * Appends `sample_score_fx`, `sample_rank`, `n_group`; keeps rows
    * with rank ≤ k. Zero/negative weights are excluded (a zero weight
    * must never be drawn; its u^(1/w) limit is 0). */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String,
                             idCol: String, weightCol: String,
                             k: Int): DataFrame = {
    require(k >= 1, s"weightedSamplePerGroup: k must be >= 1: $k")
    val h = graft.ext.SketchOps.h60(col(idCol).cast("string"))
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0)
    val scoreFx = floor(call_function("graft_ln", u) *
      lit(1073741824.0) / col(weightCol).cast("double")).cast("long")
    // Score ONCE (the scoreTiles lesson): the grouped-rank pass
    // range-samples and shuffles its input, re-evaluating the caller's
    // weight chain (typically a tokenize) per pass — the r11c sf10
    // probe measured 43.9 s vs 18.1 s with the scored frame
    // checkpointed first.
    val scored = graft.engine.Engine.materialize(
      df.filter(col(weightCol) > 0)
        .withColumn("sample_score_fx", scoreFx))
    Ids.assignGroupedRanks(scored, groupCol,
        Seq(col("sample_score_fx").desc, col(idCol)),
        "sample_rank", "n_group")
      .filter(col("sample_rank") <= k)
  }

  /** EXACT budget apportionment across groups — Hamilton's
    * largest-remainder method over integer weights (e.g.
    * [[graft.ext.TextOps.mixtureWeights]]' `weight_ppm`): every group
    * gets `⌊budget·w/Σw⌋` and the leftover units go one each to the
    * largest remainders (ties → group order), so `Σ alloc == budget`
    * EXACTLY — the invariant float scaling breaks (per-domain rounding
    * drift in a token-budget table silently over- or under-trains the
    * mix by whole documents). Arithmetic is exact end to end: the
    * quota rides DECIMAL(38,0) (budget·w can pass 2⁶³ at 100 TB token
    * budgets), the floor comes from the subtract-remainder form
    * `(q − q mod Σw)/Σw` — exact decimal division, never a rounded
    * one — and the remainder comparison stays decimal.
    *
    * Scale: the input is the WEIGHT TABLE (one row per domain,
    * thousands at most — the [[graft.ext.TextOps.mixtureWeights]]
    * contract). The leftover-unit rank is computed as a broadcast
    * non-equi self-join count over that tiny table ("how many rows
    * strictly ahead of mine"), NOT a global window — identical
    * largest-remainder semantics (rank = ahead + 1, ties → group
    * order) with no single-partition WindowExec anywhere. */
  def allocateBudget(weights: DataFrame, groupCol: String,
                     weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"allocateBudget: bad budget $budget")
    val tot = weights.agg(sum(col(weightCol)).as("_tw"))
    val base = weights
      .select(col(groupCol), col(weightCol))
      .crossJoin(broadcast(tot))
      .withColumn("_q",
        col(weightCol).cast("decimal(38,0)") * lit(budget))
      .withColumn("_rem", expr("_q % _tw"))
      .withColumn("_fl", expr("cast((_q - _rem) / _tw as bigint)"))
    val fsum = base.agg(sum(col("_fl")).as("_fsum"))
    val other = base.select(col(groupCol).as("_bg"),
      col("_rem").as("_brem"))
    base.crossJoin(broadcast(fsum))
      .join(broadcast(other),
        col("_brem") > col("_rem") ||
          (col("_brem") === col("_rem") && col("_bg") < col(groupCol)),
        "left")
      .groupBy(col(groupCol), col(weightCol), col("_fl"), col("_fsum"))
      .agg(count(col("_bg")).as("_ahead"))
      .select(col(groupCol), col(weightCol),
        (col("_fl") + when(col("_ahead") < lit(budget) - col("_fsum"),
          lit(1L)).otherwise(lit(0L))).as("alloc"))
  }
}
