package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable corpus sketches — the cardinality / frequency / coverage
  * summaries a 100 TB pipeline computes where the exact plan's shuffle
  * would be corpus- or vocabulary-sized. Every sketch here is
  * DETERMINISTIC (a pure function of the input set, independent of
  * partitioning and row order) over the repo's portable 60-bit md5 hash
  * (`conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
  * `('0x'||substr(md5(x),1,15))::BIGINT`, the DSIR convention —
  * [[TextOps.dsirSelect]]), so the DuckDB oracle reproduces not just
  * the answer but the sketch itself bit-for-bit. Reference scope: the
  * reference profiles corpora with exact pandas passes
  * (`core/utils/db_core.py` value_counts/nunique); these are the
  * scale-true replacements.
  *
  *  - [[kmvSketch]]: distinct counting with k-long state
  *    (Bar-Yossef et al. 2002) — vs `COUNT(DISTINCT)` whose exact plan
  *    shuffles every distinct value.
  *  - [[cmsSketch]]: token-frequency point queries from a fixed
  *    depth×width counter grid (Cormode & Muthukrishnan 2005) — vs the
  *    vocabulary-sized exact count relation.
  *  - [[vocabCoverage]]: tokenizer-design coverage curve (what token
  *    mass does a top-k vocabulary capture) without a corpus- or
  *    vocab-wide window.
  *
  * [[kmvSketch]] and [[cmsSketch]] are STREAM-LEGAL: both are grouped
  * aggregations whose state is bounded (k longs / the d×w grid) and
  * whose merge is associative, so they maintain themselves
  * incrementally in a Structured Streaming aggregation — the live
  * distinct/frequency monitors of the ingest DAG (StreamingSpec pins
  * micro-batch == batch equality for both).
  */
object SketchOps {

  /** Portable 60-bit hash, uniform on [0, 2⁶⁰): the first 15 hex chars
    * of md5 — small enough to stay exact through BIGINT/DOUBLE math in
    * every engine. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private final val Pow2_60 = 1152921504606846976.0 // exact double

  /** KMV distinct-token sketch per group: the k smallest distinct
    * token-hash values, the k-th of which estimates the group's
    * distinct-token count as `(k−1)·2⁶⁰ / h₍ₖ₎`; groups with fewer
    * than k distinct hashes report exactly (the sketch IS the set).
    *
    * Scale shape: explode to the token stream, hash (narrow,
    * codegen'd), then ONE grouped [[graft.expressions.KMinDistinct]]
    * aggregate — map-side partials put at most k longs per (task,
    * group) on the wire; no distinct-reduce of the token stream, no
    * vocabulary-sized exchange anywhere. The estimator arithmetic is
    * engine-exact: `(k−1)·2⁶⁰` is an exact double (8-bit significand
    * shifted), the BIGINT→DOUBLE cast of h₍ₖ₎ and the division are
    * correctly rounded identically under IEEE 754, and `floor` pins
    * the result to a BIGINT.
    *
    * Output: group, `n_seen` (min(k, distinct) — sketch fill), and
    * `est_distinct`. */
  def kmvSketch(df0: DataFrame, groupCol: String, textCol: String,
                k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvSketch: k must be >= 2: $k")
    val df = graft.engine.Engine.spread(df0)
    val hashes = df.select(col(groupCol),
        explode(TextOps.tokens(col(textCol))).as("_t"))
      .select(col(groupCol), h60(col("_t")).as("_h"))
    hashes.groupBy(col(groupCol))
      .agg(call_function("graft_kmin", col("_h"), lit(k)).as("_mins"))
      .select(col(groupCol),
        size(col("_mins")).as("n_seen"),
        when(size(col("_mins")) < k,
            size(col("_mins")).cast("long"))
          .otherwise(floor(lit((k - 1).toDouble * Pow2_60) /
            element_at(col("_mins"), k).cast("double")).cast("long"))
          .as("est_distinct"))
  }

  /** Count-min sketch of the corpus token-frequency distribution:
    * a fixed depth×width grid of counters, counter `(j, c)` summing
    * every occurrence of any token with `hash_j(token) = c`; a token's
    * frequency estimate is the MIN over its depth cells (never an
    * undercount; overcounts only from hash collisions). `hash_j` is
    * the portable 60-bit hash of `"j:token"`, reduced mod width.
    *
    * Scale shape: the token stream fans out ×depth and collapses into
    * ≤ depth·width cells with full map-side partial aggregation — per
    * task, only the tiny grid crosses the network, and the sketch
    * never holds the vocabulary. Returns the grid (`j`, `cell`,
    * `cnt`); probe with [[cmsEstimate]]. */
  def cmsSketch(df0: DataFrame, textCol: String,
                depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"cmsSketch: bad depth/width $depth/$width")
    val df = graft.engine.Engine.spread(df0)
    df.select(explode(TextOps.tokens(col(textCol))).as("_t"))
      .select(col("_t"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .select(col("j"), pmod(
          h60(concat(col("j").cast("string"), lit(":"), col("_t"))),
          lit(width.toLong)).as("cell"))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query a [[cmsSketch]] grid for each probe token: the
    * estimate is `min_j grid(j, hash_j(token))`. The grid side is
    * depth·width rows — broadcast; the probe side only ever carries
    * the probe tokens. Missing cells read as 0 (token never seen). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
                  tokenCol: String,
                  depth: Int = 4, width: Int = 64): DataFrame = {
    val probed = probes
      .select(col("*"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("cell", pmod(
        h60(concat(col("j").cast("string"), lit(":"), col(tokenCol))),
        lit(width.toLong)))
    probed.join(broadcast(sketch), Seq("j", "cell"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Vocabulary coverage curve: the fraction (ppm) of the corpus token
    * MASS captured by a frequency-ranked top-k vocabulary, at each cut
    * in `ks` — the tokenizer-design question ("how big must the vocab
    * be for 99% coverage") answered corpus-wide.
    *
    * Scale shape: the corpus reduces once to the (token, count)
    * relation; the global frequency rank comes from
    * [[graft.transform.Ids.assignContiguousIds]]'s two-pass
    * range-partitioned shape (NO single-partition window over the
    * vocabulary — rank by (count desc, token) via an integer-negated
    * struct key); each cut is then a conditional sum in ONE global
    * aggregate, so no prefix-sum window exists anywhere. Ties and the
    * ragged tail follow the deterministic (count desc, token asc)
    * order, mirrored in the oracle's ROW_NUMBER.
    *
    * Output: one row per cut — `top_k`, `covered_tokens`,
    * `total_tokens`, `coverage_ppm` (floor division, engine-exact). */
  def vocabCoverage(df0: DataFrame, textCol: String,
                    ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"vocabCoverage: bad ks $ks")
    val df = graft.engine.Engine.spread(df0)
    val vocab = df
      .select(explode(TextOps.tokens(col(textCol))).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val ranked = graft.transform.Ids.assignContiguousIds(
      vocab, struct((-col("_c")).as("_nc"), col("_t")), "_rk0")
      .withColumn("_rk", col("_rk0") + lit(1L))
    val sorted = ks.sorted
    val aggs = sorted.map(k =>
      sum(when(col("_rk") <= k, col("_c")).otherwise(lit(0L)))
        .as(s"_cov_$k")) :+ sum(col("_c")).as("_tot")
    val wide = ranked.agg(aggs.head, aggs.tail: _*)
    val stackArgs = sorted.map(k => s"$k, _cov_$k").mkString(", ")
    wide.selectExpr(
        s"stack(${sorted.length}, $stackArgs) as (top_k, covered_tokens)",
        "_tot as total_tokens")
      .select(col("top_k"), col("covered_tokens"), col("total_tokens"))
      .withColumn("coverage_ppm",
        expr("covered_tokens * 1000000 div total_tokens"))
  }
}
