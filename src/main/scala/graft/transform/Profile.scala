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
  * Scale design (100 TB) — the shapes that survive a 1000-executor run:
  *   1. ONE plain wide aggregate for rows + per-column null counts (and
  *      HLL distincts when `exact=false`). No multi-`count_distinct` in a
  *      single agg — that plans an `Expand` that duplicates the input once
  *      per distinct aggregate.
  *   2. ONE melt (`stack`) → groupBy(column, value) — a single shuffle
  *      keyed on (column, value) with map-side partial aggregation — from
  *      which BOTH the exact per-column distinct counts and the top-K
  *      value counts derive. Top-K never windows over raw value rows:
  *      a per-partition bounded prune (≤ K rows per column per partition)
  *      runs first, so the final window sees ≤ partitions×columns×K rows
  *      even when a column is near-unique.
  *   3. The sample pass takes the FIRST ≤ N rows per column per partition
  *      with a streaming per-partition limit (constant memory, no sort),
  *      then resolves the global first-N over the tiny survivor set.
  *      No global per-column window ever touches raw rows.
  */
object Profile {

  def profile(df: DataFrame, sampleN: Int = 5, topK: Int = 10,
              exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val dtypes = df.dtypes.toMap

    // Pass 1: single wide agg — rows + null counts (+ HLL distincts when
    // approximate). All plain aggregates: no Expand in the plan.
    val aggExprs: Seq[Column] = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c") +:
        (if (exact) Nil
         else Seq(approx_count_distinct(col(c)).as(s"uniq_$c")))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    val rows = wide.getAs[Long]("_rows")

    // Melt once: (ord, column, value-as-string, null preserved).
    // `_ord` preserves encounter order for the "first N samples" semantics
    // of the reference (pandas head-5 — order-dependent, documented).
    val melted = df
      .withColumn("_ord", monotonically_increasing_id())
      .select(col("_ord"), expr(
        "stack(" + cols.size + ", " +
          cols.map(c => s"'$c', cast(`$c` as string)").mkString(", ") + ")")
        .as(Seq("column", "value")))

    // Pass 2: one shuffle on (column, value) → per-group counts; feeds
    // exact distinct counts AND top-K.
    val grouped = melted.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("cnt"))

    val counts: DataFrame =
      if (exact)
        grouped.groupBy("column")
          .agg(count(when(col("value").isNotNull, 1L)).as("unique_count"))
      else
        cols.map(c => (c, wide.getAs[Long](s"uniq_$c")))
          .toDF("column", "unique_count")
    val nulls = cols.map(c => (c, wide.getAs[Long](s"nulls_$c")))
      .toDF("column", "null_count")

    // Top-K value counts per column (null → "__NULL__" sentinel for
    // display, `data_core.py:254-262`; ties broken by value). Bounded
    // per-partition prune first: the window only ever sees
    // ≤ partitions × columns × K candidate rows.
    val sentineled = grouped.select(col("column"),
      coalesce(col("value"), lit("__NULL__")).as("value"), col("cnt"))
    val prunedTop = boundedTopKPerColumn(sentineled, topK)
    val topWin = Window.partitionBy("column")
      .orderBy(desc("cnt"), asc("value"))
    val top10 = prunedTop
      .withColumn("_rk", row_number().over(topWin))
      .filter(col("_rk") <= topK)
      .groupBy("column")
      .agg(sort_array(collect_list(struct(col("_rk"), col("value"),
        col("cnt").as("count")))).as("_t"))
      .select(col("column"),
        expr("transform(_t, x -> struct(x.value as value, x.count as count))")
          .as("top_10"))

    // Sample pass: first-N non-null per column — streaming per-partition
    // limit (constant memory), then global first-N over the survivors.
    val prunedSamples = firstNPerColumnPerPartition(
      melted.filter(col("value").isNotNull), sampleN)
    val sampWin = Window.partitionBy("column").orderBy(asc("_ord"))
    val samples = prunedSamples
      .withColumn("_rk", row_number().over(sampWin))
      .filter(col("_rk") <= sampleN)
      .groupBy("column")
      .agg(sort_array(collect_list(struct(col("_rk"), col("value")))).as("_s"))
      .select(col("column"),
        expr("transform(_s, x -> x.value)").as("sample_values"))

    val dtypeDf = cols.map(c => (c, dtypes(c))).toDF("column", "dtype")

    dtypeDf
      .join(nulls, Seq("column"))
      .join(counts, Seq("column"))
      .join(samples, Seq("column"), "left")
      .join(top10, Seq("column"), "left")
      .withColumn("null_pct",
        col("null_count").cast("double") / lit(rows).cast("double"))
      .select("column", "dtype", "null_count", "null_pct", "unique_count",
        "sample_values", "top_10")
  }

  /** Keep at most the K best (cnt desc, value asc) rows per column within
    * each partition — a streaming bounded buffer, so a near-unique column
    * can never flood the downstream window. Correct because `cnt` values
    * are already final (post-aggregation): the global top-K is a subset of
    * the union of per-partition top-Ks. */
  private def boundedTopKPerColumn(grouped: DataFrame, k: Int): DataFrame = {
    val spark = grouped.sparkSession
    import spark.implicits._
    grouped.select(col("column"), col("value"), col("cnt"))
      .as[(String, String, Long)]
      .mapPartitions { it =>
        // per column: bounded heap of size ≤ k holding the best-so-far.
        // "Best" = (cnt desc, value asc); the heap's head must be the
        // WORST kept element (PriorityQueue dequeues the max), so the
        // ordering ranks worse = greater: smaller cnt ranks greater
        // (reverse), larger value ranks greater (natural).
        val heaps = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, String)]]
        val worstFirst: Ordering[(Long, String)] =
          Ordering.Tuple2(Ordering[Long].reverse, Ordering[String])
        it.foreach { case (c, v, n) =>
          val h = heaps.getOrElseUpdate(c,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < k) h.enqueue((n, v))
          else if (worstFirst.lt((n, v), h.head)) { h.dequeue(); h.enqueue((n, v)) }
        }
        heaps.iterator.flatMap { case (c, h) =>
          h.iterator.map { case (n, v) => (c, v, n) }
        }
      }.toDF("column", "value", "cnt")
  }

  /** Keep the first ≤ N rows (in iterator = partition order) per column
    * within each partition — constant memory, no sort, preserves `_ord`
    * so the global first-N resolves exactly downstream. */
  private def firstNPerColumnPerPartition(melted: DataFrame,
                                          n: Int): DataFrame = {
    val spark = melted.sparkSession
    import spark.implicits._
    melted.select(col("_ord"), col("column"), col("value"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val seen = scala.collection.mutable.Map.empty[String, Int]
        it.filter { case (_, c, _) =>
          val k = seen.getOrElse(c, 0)
          if (k < n) { seen(c) = k + 1; true } else false
        }
      }.toDF("_ord", "column", "value")
  }

  /** A1 — summary statistics per numeric column (`df.describe()` twin,
    * `core/utils/data_core.py:107-108`) with oracle-parity numerics: the
    * mean is a decimal-exact sum divided by the count, so it hash-matches
    * across engines (describe()'s stringified stddev does not). One wide
    * agg + a driver-side pivot of #cols rows. */
  def summaryStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        => f.name
    }.toSeq
    if (numCols.isEmpty)
      return Seq.empty[(String, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])]
        .toDF("column", "count", "sum", "mean", "min", "max")
    val aggExprs: Seq[Column] = numCols.flatMap { c =>
      Seq(count(col(c)).as(s"count_$c"),
        sum(col(c).cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast(org.apache.spark.sql.types.DoubleType).as(s"sum_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val r = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    numCols.map { c =>
      val n = r.getAs[Long](s"count_$c")
      def opt(name: String): Option[Double] =
        Option(r.getAs[java.lang.Double](name)).map(_.toDouble)
      val s = opt(s"sum_$c")
      (c, n, s, s.filter(_ => n > 0).map(_ / n),
        opt(s"min_$c"), opt(s"max_$c"))
    }.toDF("column", "count", "sum", "mean", "min", "max")
  }

  /** A4 standalone — top-K value counts for one column, deterministic
    * tie-break (count desc, value asc). Catalyst plans the sort+limit as
    * TakeOrderedAndProject — no global sort at scale. */
  def topKValues(df: DataFrame, column: String, k: Int = 10): DataFrame =
    df.groupBy(Functions.nullSentinel(col(column)).as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc("value"))
      .limit(k)

  /** Pearson correlation from EXACT decimal moments — the oracle-parity
    * form of `corr`. Built-in `corr` accumulates doubles in partition
    * order, so its last bits vary with the partitioning; here the five
    * moments are decimal sums (exact, order-independent) and the FP
    * arithmetic happens once, on the final scalars — same result on any
    * cluster layout, reproducible by any engine with decimal sums.
    * One partial+final hash agg, one shuffle, like any grouped agg. */
  def pearson(df: DataFrame, xCol: String, yCol: String,
              groupCols: Seq[String],
              precision: Int = 18, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // precision/scale must cover the inputs exactly (values with more
    // fractional digits than `scale` get rounded INTO the moments);
    // keep precision ≤ 19 so the squared terms stay within decimal
    // range on other engines too (the DuckDB oracle uses (12,2)).
    def d(c: Column): Column = c.cast(DecimalType(precision, scale))
    val (x, y) = (col(xCol), col(yCol))
    val m = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(d(x)).cast(DoubleType).as("sx"),
      sum(d(y)).cast(DoubleType).as("sy"),
      sum(d(x) * d(x)).cast(DoubleType).as("sxx"),
      sum(d(y) * d(y)).cast(DoubleType).as("syy"),
      sum(d(x) * d(y)).cast(DoubleType).as("sxy"))
    val (n, sx, sy) = (col("n"), col("sx"), col("sy"))
    m.select(groupCols.map(col) ++ Seq(n,
      ((n * col("sxy") - sx * sy) /
        sqrt((n * col("sxx") - sx * sx) * (n * col("syy") - sy * sy)))
        .as("pearson_r")): _*)
  }

  /** Fixed-width histogram: bucket = min(floor(value/width), maxBucket)
    * — explicit bounds, so no pre-pass to find min/max (the two-job
    * alternative) and no driver traffic. One grouped count. */
  def histogram(df: DataFrame, column: String, width: Double,
                maxBucket: Int): DataFrame = {
    val bucket = least(floor(col(column) / width), lit(maxBucket.toLong))
    df.filter(col(column).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), (col("bucket") * width).as("lo"), col("n"))
  }

  /** k-anonymity audit (Sweeney 2002) — for a quasi-identifier column
    * set, the re-identification exposure of a dataset before release:
    * every row whose QI combination is shared by fewer than k rows is
    * a linkage-attack candidate. One row out: `qi` (the audited column
    * set), `k`, `n_rows`, `n_groups`, `min_k` (the smallest
    * equivalence class — the dataset's actual k-anonymity), `n_below_k`
    * (rows in classes smaller than k) and `below_ppm` (exact integer
    * share). The audit a privacy review runs BEFORE an export — next
    * to [[graft.transform.Sanitize]]'s redaction, which fixes direct
    * identifiers but not quasi-identifiers.
    *
    * Scale shape: ONE grouped count over the QI tuple (map-side
    * partials) reduces the corpus to its equivalence classes, then one
    * 1-row aggregate over the class-sized relation. No window, no
    * driver state. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String],
                 k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, s"kAnonymity: bad args $qiCols/$k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(sum(col("_n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("_n")).as("min_k"),
        sum(when(col("_n") < k, col("_n")).otherwise(0L))
          .as("n_below_k"))
      .select(lit(qiCols.mkString(",")).as("qi"), lit(k).as("k"),
        col("n_rows"), col("n_groups"), col("min_k"), col("n_below_k"),
        expr("cast(cast(n_below_k as decimal(38,0)) * 1000000" +
          " div n_rows as bigint)").as("below_ppm"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    * companion: a QI equivalence class can be large (k-anonymous) yet
    * still leak the SENSITIVE attribute if every member shares one
    * value (the homogeneity attack). Audits both published variants in
    * one pass: distinct l-diversity (each class holds ≥ l distinct
    * sensitive values) and entropy l-diversity (each class's sensitive
    * distribution has entropy ≥ ln l). One row out per call: `qi`,
    * `sensitive`, `l`, `n_rows`, `n_groups`, `min_distinct` (the
    * dataset's actual distinct-l), `n_below_l` / `below_ppm` (rows in
    * classes with < l distinct sensitive values), `min_entropy_fx`
    * (smallest class entropy, fixed-point 2³⁰) and `n_below_entropy` /
    * `below_entropy_ppm` (rows in classes whose entropy < ln l).
    *
    * Engine-exact: class entropy follows [[graft.ext.TextOps.tokenEntropy]]'s
    * fixed-point recipe — `H_fx = floor(ln(n)·2³⁰) − (Σ floor(c·ln c·2³⁰))
    * div n` — every float rounds through one floor before any cross-row
    * sum, so the audit hashes identically on any engine/layout.
    *
    * Scale shape: ONE grouped count over (QI, sensitive) with map-side
    * partials, ONE grouped agg down to the classes, ONE 1-row summary.
    * No window, no driver state. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(qiCols.nonEmpty && l >= 1,
      s"lDiversity: bad args $qiCols/$l")
    require(!qiCols.contains(sensitiveCol),
      s"lDiversity: sensitive column $sensitiveCol is in the QI set")
    val fx = lit(1073741824.0) // 2^30
    val lnlFx = floor(call_function("graft_ln", lit(l.toDouble)) * fx)
      .cast("long")
    val cells = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val classes = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("_c")).as("_n"),
        count(lit(1)).as("_d"),
        sum(floor(col("_c").cast("double") *
          call_function("graft_ln", col("_c").cast("double")) * fx)
          .cast("long")).as("_sfx"))
      .withColumn("_hfx",
        floor(call_function("graft_ln", col("_n").cast("double")) * fx)
          .cast("long") - expr("_sfx div _n"))
    classes.agg(sum(col("_n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("_d")).as("min_distinct"),
        sum(when(col("_d") < l, col("_n")).otherwise(0L)).as("n_below_l"),
        min(col("_hfx")).as("min_entropy_fx"),
        sum(when(col("_hfx") < lnlFx, col("_n")).otherwise(0L))
          .as("n_below_entropy"))
      .select(lit(qiCols.mkString(",")).as("qi"),
        lit(sensitiveCol).as("sensitive"), lit(l).as("l"),
        col("n_rows"), col("n_groups"), col("min_distinct"),
        col("n_below_l"),
        expr("cast(cast(n_below_l as decimal(38,0)) * 1000000" +
          " div n_rows as bigint)").as("below_ppm"),
        col("min_entropy_fx"), col("n_below_entropy"),
        expr("cast(cast(n_below_entropy as decimal(38,0)) * 1000000" +
          " div n_rows as bigint)").as("below_entropy_ppm"))
  }

  /** Exact ROC AUC by the Mann–Whitney rank identity — the "is my
    * quality classifier any good" number, computed at corpus scale
    * with NO score collection, NO curve discretization, and exact tie
    * handling: `AUC = (Σ_pos midrank − n₊(n₊+1)/2) / (n₊·n₋)`, where a
    * tie group's midrank is `(first + last)/2` of its rank run.
    * Everything stays integral by carrying DOUBLED midranks
    * (`first + last`), so the result is an exact integer ppm —
    * bit-identical on any engine/layout — alongside the raw pair
    * counts.
    *
    * Scale shape: ONE global rank over (score, id) via the two-pass
    * range-partitioned machinery (a billion distinct scores never
    * meet a single-partition window), ONE score-grain grouped agg for
    * each tie run's (min, max) rank, ONE score-keyed join back, and a
    * 1-row final aggregate. No prefix sum, no window, no driver state.
    * Output: one row — `n_pos`, `n_neg`, `u2` (2·Mann–Whitney U,
    * reported as BIGINT for the oracle's sake: it wraps past
    * n₊·n₋ > 2⁶² — `auc_ppm` itself is computed in DECIMAL(38,0) and
    * stays exact at any scale), `auc_ppm`. Degenerate inputs (a class
    * empty) raise downstream of the integral division by zero in ANSI
    * mode; callers own the "evaluate only when both classes exist"
    * guard. */
  def aucExact(df: DataFrame, scoreCol: String, idCol: String,
               labelCol: String): DataFrame = {
    val ranked = graft.engine.Engine.materialize(
      Ids.assignContiguousIds(
        df.select(col(scoreCol).as("_sc"), col(idCol).as("_id"),
          col(labelCol).cast("boolean").as("_pos")),
        struct(col("_sc"), col("_id")), "_rk", 1L))
    val runs = ranked.groupBy(col("_sc"))
      .agg(min(col("_rk")).as("_first"), max(col("_rk")).as("_last"))
    ranked.join(runs, Seq("_sc"))
      .agg(
        sum(when(col("_pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("_pos"), 0L).otherwise(1L)).as("n_neg"),
        sum(when(col("_pos"),
          (col("_first") + col("_last")).cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("_r2"))
      .select(col("n_pos"), col("n_neg"),
        expr("cast(_r2 - cast(n_pos as decimal(38,0)) * (n_pos + 1)" +
          " as decimal(38,0))").as("u2"))
      .select(col("n_pos"), col("n_neg"),
        col("u2").cast("long").as("u2"),
        expr("cast(u2 * 1000000 div (2 * cast(n_pos as decimal(38,0))" +
          " * n_neg) as bigint)").as("auc_ppm"))
  }

  /** Key-skew audit — the "will this key melt a shuffle" report, one
    * row per candidate key column, everything in EXACT integers:
    * `n_keys`, `n_rows`, `max_n` (heaviest key's row count),
    * `max_share_ppm` (heaviest key's share of all rows),
    * `skew_ratio_ppm` (max/mean group size, ppm — 10⁶ = perfectly
    * uniform), `gini_ppm` (Gini coefficient of the group-size
    * distribution: 0 = uniform, →10⁶ = one key holds everything), and
    * the exact `p50_n`/`p99_n` group sizes at the integer ranks
    * `(n_keys·p + 99) div 100` (the [[graft.ext.SketchOps]] quantile
    * rank convention). This is the pre-flight a 100 TB join/groupBy
    * wants BEFORE the salting/AQE-skew decision, measured on the real
    * key rather than guessed.
    *
    * Scale shape: ONE corpus pass for ALL k candidate columns — the
    * keys are melted with `stack` into a `(key_col, key_string)`
    * relation (k rows per input row, but the grouped count's map-side
    * partials reduce each partition to key-sized state before the
    * exchange, so the single scan dominates at 100 TB, not the melt
    * fan-out). Per-column ascending ranks over the key-sized counts
    * come from [[Ids.assignGroupedRanks]]'s two-pass range-partitioned
    * machinery — a near-unique key column (billions of keys) never
    * funnels through the single-partition window a naive
    * `row_number() OVER (ORDER BY n)` plans, and a mega-column's keys
    * span many partitions. The Gini numerator Σ rank·n runs in
    * DECIMAL(38,0) (rank and size can both be ~2³⁰⁺ at corpus scale;
    * their product overflows BIGINT), and the tie order inside equal
    * sizes cannot change it (equal addends, same rank set) — which is
    * also why melting through `cast(key AS STRING)` is safe: the cast
    * must be INJECTIVE per column — [[meltedKeyCounts]] enforces the
    * type whitelist and IEEE-normalizes float/double keys (so
    * -0.0/0.0 and NaN payloads group exactly as Spark's typed
    * grouping would) — but the string ORDER may differ from the typed
    * order, and only tie-breaking inside equal n depends on it. Key
    * VALUES never appear in the output. Per-column totals are key_col-sized and
    * broadcast. */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame =
    keySkewAcross(Seq(df -> keyCols))

  /** ONE corpus pass per input frame, ONE shared scan-reduced count —
    * the (key_col, key_string, n) relation [[keySkewAcross]] ranks.
    * Package-private so PlanShapeSpec can pin the one-FileScan shape
    * directly (the downstream rank machinery is checkpoint-backed, so
    * the final query's executedPlan no longer shows the scan).
    *
    * The string melt must be INJECTIVE per column, and is — the
    * supported key types are enforced here (exotic keys like
    * binary/array/map, where a string render can merge or reorder
    * values, are rejected loudly). Float/double keys are IEEE-normalized
    * BEFORE the render (`+ 0.0` turns -0.0 into +0.0; every NaN payload
    * renders 'NaN'), so the melted grouping matches Spark's typed
    * grouping, which normalizes both (NormalizeFloatingNumbers). */
  private[graft] def meltedKeyCounts(df: DataFrame,
                                     keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    def supported(dt: DataType): Boolean = dt match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
           LongType | FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
    val stackArgs = keyCols.map { kc =>
      val dt = df.schema(kc).dataType
      require(supported(dt),
        s"keySkew: unsupported key column type `$kc`: ${dt.simpleString}" +
          " (the string melt must be injective; supported:" +
          " string/numeric/boolean/date/timestamp/decimal)")
      val rendered = dt match {
        case FloatType | DoubleType =>
          s"cast((cast(`$kc` as double) + 0.0d) as string)"
        case _ => s"cast(`$kc` as string)"
      }
      s"'${kc.replace("'", "\\'")}', $rendered"
    }.mkString(", ")
    df.select(expr(s"stack(${keyCols.size}, $stackArgs)")
        .as(Seq("key_col", "_k")))
      .groupBy(col("key_col"), col("_k"))
      .agg(count(lit(1)).as("_n"))
  }

  /** [[keySkew]] over SEVERAL frames at once — e.g. the pre-flight for
    * a join audits both sides' key columns in one call. Each frame is
    * scanned once ([[meltedKeyCounts]]); the melted key-sized count
    * relations union and the two-pass rank machinery + per-column
    * aggregates run ONCE for all columns of all frames, so adding an
    * audited column costs a melt row per input row, not another rank
    * pipeline. Key-column NAMES must be distinct across inputs (they
    * are the output's grouping identity). */
  def keySkewAcross(inputs: Seq[(DataFrame, Seq[String])]): DataFrame = {
    require(inputs.nonEmpty && inputs.forall(_._2.nonEmpty),
      "keySkew: at least one key column per input")
    val allNames = inputs.flatMap(_._2)
    require(allNames.distinct.size == allNames.size,
      s"keySkew: key column names must be distinct across inputs, " +
        s"got $allNames")
    val counts = inputs.map { case (df, kc) => meltedKeyCounts(df, kc) }
      .reduce(_ unionAll _)
    val ranked = graft.engine.Engine.materialize(
      Ids.assignGroupedRanks(counts, "key_col",
        Seq(col("_n"), col("_k")), "_rk0", "_ng"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tot = ranked.groupBy(col("key_col")).agg(
      count(lit(1)).as("n_keys"),
      sum(col("_n")).as("n_rows"),
      max(col("_n")).as("max_n"),
      sum(dec(col("_rk0")) * dec(col("_n"))).as("_six"))
    ranked.select(col("key_col"), col("_k"), col("_n"), col("_rk0"))
      .join(broadcast(tot), Seq("key_col"))
      .withColumn("_r50", expr("(n_keys * 50 + 99) div 100"))
      .withColumn("_r99", expr("(n_keys * 99 + 99) div 100"))
      .groupBy(col("key_col"), col("n_keys"), col("n_rows"),
        col("max_n"), col("_six"))
      .agg(max(when(col("_rk0") === col("_r50"), col("_n"))).as("p50_n"),
        max(when(col("_rk0") === col("_r99"), col("_n"))).as("p99_n"))
      .select(col("key_col"), col("n_keys"), col("n_rows"),
        col("max_n"),
        // ppm ratios in DECIMAL(38,0): max_n·n_keys·10⁶ passes 2⁶³
        // long before any 100 TB corpus does.
        expr("cast(cast(max_n as decimal(38,0)) * 1000000" +
          " div n_rows as bigint)").as("max_share_ppm"),
        expr("cast(cast(max_n as decimal(38,0)) * n_keys * 1000000" +
          " div n_rows as bigint)").as("skew_ratio_ppm"),
        expr("cast((2 * _six - cast(n_keys + 1 as decimal(38,0))" +
          " * n_rows) * 1000000" +
          " div (cast(n_keys as decimal(38,0)) * n_rows) as bigint)")
          .as("gini_ppm"),
        col("p50_n"), col("p99_n"))
  }
}
