package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark main — runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * Forcing: `.count()` under-measures (Catalyst prunes every column the
  * count doesn't need, so projection/window-heavy queries bench their
  * shuffles but not their expression evaluation). Instead each query is
  * forced through a single xxhash64 over ALL output columns reduced to one
  * driver-side long — every expression in the plan must actually evaluate,
  * while driver traffic stays one row. A shared warm-up query absorbs
  * one-time JVM/codegen/classloading costs.
  *
  * Degradation is LOUD, not silent (round-2 lesson: a codegen compile
  * failure fell back to interpreted eval and only showed up as a 26×
  * slowdown in the driver environment): a log4j2 appender on Spark's
  * `CodeGenerator` logger counts compile failures per query, query errors
  * are recorded per query instead of swallowed, and both surface in the
  * output JSON (`codegen_failures`, `errors`) next to the timings. The
  * `queries` map stays name→seconds for driver compatibility.
  */
object Bench {

  private val CodegenErrorCounter = graft.tools.CodegenWatch

  /** Evaluate every output column of every row; returns a checksum
    * (bit_xor fold — overflow-free under ANSI mode). */
  private def force(df: DataFrame): Long = {
    val hashed = df.select(
      xxhash64(df.columns.map(col).toIndexedSeq: _*).as("_h"))
    val r = hashed.agg(bit_xor(col("_h"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("\\p{Cntrl}", " ") + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    CodegenErrorCounter.install()
    val spark = graft.engine.Engine.session(
      "graft-bench", Some(s"local[$cpus]"), shufflePartitions = cpus)
    // Warm-up: one small end-to-end query (codegen, parquet footer
    // reads). The k-means pre-load is gone with x_sim_ivf's move to the
    // sampled quantizer — no registered query touches spark.ml now.
    try force(Queries.q1PricingSummary(spark, sfDir))
    catch { case _: Throwable => () }
    var errors = Map.empty[String, String]
    var codegenFails = Map.empty[String, Int]
    // Dev-loop subset filter (comma-separated names) — the driver never
    // sets it; used for targeted retimes (sf1/sf10 probes).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries
      .filter(kv => only.forall(_.contains(kv._1)))
    // Session-cache accounting (r17 verdict ask #10): the first
    // consumer of a shared subtree (lm chain, fuzzy/bpe/cc stages…)
    // pays its materialization inside its timed region; later
    // consumers read it ~free. Mark both so per-query times stay
    // interpretable: `cache_fill` = this query's run built ≥1 shared
    // entry (time includes shared work), `cache_warm` = the published
    // time read a warm entry (understates standalone cost).
    var cacheFill = Set.empty[String]
    var cacheWarm = Set.empty[String]
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cg0 = CodegenErrorCounter.count.get()
      val h0 = graft.engine.SessionCaches.hits
      val f0 = graft.engine.SessionCaches.fills
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch {
        case e: Throwable =>
          errors += name -> (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(200))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (graft.engine.SessionCaches.fills > f0) cacheFill += name
      if (graft.engine.SessionCaches.hits > h0) cacheWarm += name
      val cg = CodegenErrorCounter.count.get() - cg0
      if (cg > 0) codegenFails += name -> cg
      name -> sec
    }
    // Steady-state pass — PER-QUERY MIN-OF-N (the artifact of record is
    // this file's output, so the methodology lives here; r13 verdict
    // ask #2): on a shared machine a single measurement folds in
    // transient noise (CPU contention, first-touch JIT of the generated
    // classes, page-cache misses) — r3 showed 3-5× first-run outliers
    // in the driver env that vanish on a second run, and for three
    // consecutive rounds the single-retime record carried one
    // jitter-class query above the 2× bar that the min-of-three local
    // record contradicted. Rule: a query whose measurement exceeds
    // 1.2× its recorded quiet-box twin (BenchBaseline; absolute 2 s
    // floor for unbaselined queries) is re-run up to TWICE more,
    // stopping early when a measurement drops to ≤1.2× — the minimum
    // is recorded. Well-behaved queries cost one run; only genuinely
    // noisy ones pay three. All raw measurements are preserved in the
    // `retimed` stderr/full-artifact JSON so cold times stay
    // auditable. Bounded to the 40 slowest so the suite stays short.
    def outlier(n: String, t: Double): Boolean =
      BenchBaseline.local.get(n)
        .fold(t > 2.0)(b => t > 1.2 * b)
    // ONESHOT: skip the retime pass entirely — for scale-sweep probes
    // (sf1/sf10) where every query exceeds its sf0.1 baseline by
    // design and min-of-N would triple a multi-hour run. The artifact
    // records "oneshot":true so a single-run sweep is never mistaken
    // for a min-of-N record.
    val oneshot = sys.env.get("SPARK_GRAFT_BENCH_ONESHOT")
      .exists(v => v == "1" || v == "true")
    // Retime SELECTION (r16 driver-flag root cause, fixed r17): the cap
    // used to keep only the 40 slowest outliers BY ABSOLUTE TIME, so a
    // sub-2 s query sitting at 7× its frozen time — exactly what the
    // flag rule below catches — could miss the cut and publish a single
    // cold measurement (r16 driver artifact: t_derive_flags flagged at
    // 1.40 s on a 0.25 s frozen base, never retimed). Would-be-flagged
    // queries (per the same frozen-ratio rule the artifact applies) now
    // take retime slots FIRST; remaining slots go to the slowest rest.
    val frozenForRetime = BenchBaselineFrozen.local
    def flagWorthy(n: String, t: Double): Boolean =
      frozenForRetime.get(n).exists(b =>
        (t > 2.0 * b && t > 2.0) || (t > 3.0 * b && t > 0.5))
    // flagWorthy also qualifies a query as a candidate outright: the
    // rolling baseline can drift above frozen, leaving a would-be-
    // flagged query under the 1.2× rolling-outlier bar.
    val retimeCandidates = (if (oneshot) Seq.empty else firstPass)
      .filter { case (n, t) =>
        (outlier(n, t) || flagWorthy(n, t)) && !errors.contains(n) }
    val (mustRetime, mayRetime) = retimeCandidates
      .partition { case (n, t) => flagWorthy(n, t) }
    val retimed =
      (mustRetime.sortBy(-_._2) ++ mayRetime.sortBy(-_._2)).take(48)
      .map { case (name, t1) =>
        var times = List(t1)
        var reruns = 0
        while (reruns < 2 &&
            (outlier(name, times.min) || flagWorthy(name, times.min))) {
          val cg0 = CodegenErrorCounter.count.get()
          val t0 = System.nanoTime()
          // A transient rerun failure must NOT publish its (short)
          // failure duration as the query's time — keep the prior
          // measurements and surface the error.
          val ok =
            try { force(SparkEntry.queries(name)(spark, sfDir)); true }
            catch {
              case e: Throwable =>
                errors += s"$name#retime" -> (e.getClass.getSimpleName +
                  ": " + String.valueOf(e.getMessage).take(200))
                false
            }
          val t = (System.nanoTime() - t0) / 1e9
          val cg = CodegenErrorCounter.count.get() - cg0
          if (cg > 0)
            codegenFails += name -> (codegenFails.getOrElse(name, 0) + cg)
          if (ok) times = t :: times
          reruns += 1
          if (!ok) reruns = 2 // don't keep hammering a failing query
        }
        // A retimed query that filled a shared cache on its first run
        // republishes a warm min — mark it (ask #10).
        if (cacheFill.contains(name)) cacheWarm += name
        name -> times.reverse
      }.toMap
    val results = firstPass.map { case (name, t1) =>
      name -> retimed.get(name).fold(t1)(_.min)
    }
    // FROZEN-epoch ratios (r14 verdict ask #2): the rolling
    // BenchBaseline is regenerated from the record it later judges, so
    // its per-query ratio is 1.000x by construction in a regen round.
    // BenchBaselineFrozen only changes with a documented justification,
    // so vs_frozen is the non-circular cross-round gate; queries newer
    // than the epoch have no entry and are excluded from the total.
    val frozen = BenchBaselineFrozen.local
    val vsFrozen = results
      .collect { case (n, t) if frozen.contains(n) => n -> t / frozen(n) }
    // Regression FLAG rule (r15 verdict ask #6): raw vs_frozen ratios
    // stay in the artifact, but the actionable `flagged` list applies
    // an absolute-time floor — three sub-1.2 s jitter-class entries sat
    // over 2× frozen in r15 with no plan change, washing out real
    // signals on a 32-core warm box. Flag a query only when it is BOTH
    // >2× its frozen time AND above 2 s wall, or >3× when sub-2 s but
    // still above 0.5 s (a 0.3 s query at 3× is timer noise, never a
    // scale regression). Oneshot scale sweeps (sf1/sf10) suppress the
    // list outright — every query exceeds its sf0.1 baseline by design.
    val resultByName = results.toMap
    val flagged =
      if (oneshot) Seq.empty[String]
      else vsFrozen.collect {
        case (n, r) if (r > 2.0 && resultByName(n) > 2.0) ||
          (r > 3.0 && resultByName(n) > 0.5) => n
      }.sorted
    val frozenTotal =
      if (vsFrozen.isEmpty) 0.0
      else results.collect { case (n, t) if frozen.contains(n) => t }.sum /
        vsFrozen.map(kv => frozen(kv._1)).sum
    // Artifact contract (r4 judge finding: the full-precision line overflowed
    // the driver's tail capture → BENCH_r04 `parsed: null`): timings rounded
    // to 4 decimals (halves the line at zero timing fidelity lost), all
    // diagnostics on STDERR, and the one-line JSON printed as the absolute
    // LAST stdout line after spark.stop() so the tail always contains it.
    // Locale.ROOT: the default-locale `f` interpolator would emit
    // comma decimals (65,0688) under e.g. de_DE — invalid JSON.
    def f4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => jstr(k) + ":" + f4(v) }
      .mkString("{", ",", "}")
    val rtJson = retimed.toSeq.sortBy(_._1)
      .map { case (k, ts) =>
        jstr(k) + ":[" + ts.map(f4).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val cgJson = codegenFails.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    System.err.println(s"[bench] retimed=$rtJson")
    System.err.println(s"[bench] errors=$errJson codegen_failures=$cgJson")
    // stop() failures (shutdown-hook/teardown) must not eat the artifact.
    try spark.stop() catch { case _: Throwable => () }
    val vfJson = vsFrozen.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + f4(v) }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${f4(total)},"unit":"sec",""" +
        s""""queries":$qs,"errors":$errJson,"codegen_failures":$cgJson,""" +
        s""""n_errors":${errors.size},"oneshot":$oneshot,""" +
        s""""frozen_epoch":${BenchBaselineFrozen.epoch},""" +
        s""""vs_frozen_total":${f4(frozenTotal)},"vs_frozen":$vfJson,""" +
        s""""flagged":${flagged.map(jstr).mkString("[", ",", "]")},""" +
        s""""cache_fill":${cacheFill.toSeq.sorted.map(jstr)
          .mkString("[", ",", "]")},""" +
        s""""cache_warm":${cacheWarm.toSeq.sorted.map(jstr)
          .mkString("[", ",", "]")},""" +
        s""""sf":"$sfDir"}"""
    // The driver records only the LAST 2,000 chars of stdout. At 80+
    // queries the full line is ~2.4 KB, so if it is the last thing
    // printed its FRONT (including "value") is truncated — that cost the
    // r4 and r6 rounds their headline numbers. Contract now: full line
    // first (and mirrored to a file + stderr for audit), then a compact
    // <150-char summary line as the absolute LAST stdout line — it always
    // fits the tail window whole, whatever the query count.
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullOut),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-artifact write failed: $e") }
    System.err.println(s"[bench] full=$fullLine")
    println(fullLine)
    println(s"""{"metric":"total","value":${f4(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_errors":${errors.size},""" +
      s""""vs_frozen_total":${f4(frozenTotal)},"sf":"$sfDir"}""")
    Console.out.flush()
  }
}
