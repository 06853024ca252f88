package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout planning for data skipping — the write-side half of
  * the 100 TB story. Every scan operator in this engine leans on
  * parquet min/max pruning; whether pruning actually fires is decided
  * when the data is WRITTEN, by how rows map to files. A table sorted
  * by one column skips perfectly on that column and not at all on any
  * other; interleaving the bits of several columns (the Morton /
  * Z-order curve, Morton 1966 — the recipe behind lakehouse
  * `OPTIMIZE ZORDER BY`) buys multi-column skipping at a bounded cost
  * per column. These operators compute the curve value as a pure
  * codegen'd projection, assign equal-width curve ranges as write
  * buckets (what `repartitionByRange` on the curve value would do with
  * known bounds), and AUDIT the result: per-bucket min/max extents of
  * each dimension — exactly the footer stats a scan would prune on —
  * against the same buckets under a single-column sort.
  *
  * Everything is exact integer arithmetic (grid scaling by integral
  * division, bit surgery by shift/mask), so the audit hashes
  * identically on any engine/layout.
  */
object LayoutOps {

  /** Morton/Z-order interleave of two grid coordinates, each already
    * scaled to [0, 2^bits): bit k of `x` lands at position 2k, bit k
    * of `y` at 2k+1. A chain of 2·bits shift/mask/add terms — one
    * codegen'd projection, no UDF. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue2: bits out of range: $bits")
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }.reduce(_ + _)
  }

  /** Three-dimensional Morton interleave — bit k of `x`/`y`/`z` lands
    * at 3k / 3k+1 / 3k+2. The practical ceiling of curve clustering
    * ("cluster on your two or three hottest filter keys"): each added
    * dimension costs every dimension extent tightness, so past three
    * the footer stats stop pruning anything. bits ≤ 20 keeps the value
    * in a long. */
  def zValue3(x: Column, y: Column, z: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"zValue3: bits out of range: $bits")
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 3 * k) +
        shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 3 * k + 1) +
        shiftleft(shiftright(z, k).bitwiseAND(lit(1L)), 3 * k + 2)
    }.reduce(_ + _)
  }

  /** The generated DuckDB twin of [[zValue3]]. Same bits-range
    * contract as the Column side — shifts past bit 62 would wrap. */
  def zValue3Sql(x: String, y: String, z: String, bits: Int): String = {
    require(bits >= 1 && bits <= 20, s"zValue3Sql: bits out of range: $bits")
    (0 until bits).map { k =>
      s"((((($x) >> $k) & 1) << ${3 * k})" +
        s" + (((($y) >> $k) & 1) << ${3 * k + 1})" +
        s" + (((($z) >> $k) & 1) << ${3 * k + 2}))"
    }.mkString(" + ")
  }

  /** [[zOrderAudit]] in three dimensions: per (layout, bucket) rows
    * with grid extents on all three keys and `volume_ppm` (the extent
    * box as an exact-ppm share of the 2^3bits grid). 'linear' buckets
    * by the x cell alone. Same shape: one bounds pass, ONE melted
    * corpus scan, one grouped agg. */
  def zOrderAudit3(df: DataFrame, xCol: String, yCol: String,
                   zCol: String, bits: Int, nBuckets: Int): DataFrame = {
    require(bits >= 1 && bits <= 20, s"zOrderAudit3: bits: $bits")
    require(nBuckets >= 1 && (1L << bits) % nBuckets == 0,
      s"zOrderAudit3: nBuckets $nBuckets must divide 2^$bits")
    val zDiv = (1L << (3 * bits)) / nBuckets
    val lDiv = (1L << bits) / nBuckets
    val bounds = df.agg(
      min(col(xCol)).cast("long").as("_xlo"),
      max(col(xCol)).cast("long").as("_xhi"),
      min(col(yCol)).cast("long").as("_ylo"),
      max(col(yCol)).cast("long").as("_yhi"),
      min(col(zCol)).cast("long").as("_zlo"),
      max(col(zCol)).cast("long").as("_zhi"))
    val cells = df
      .select(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"), col(zCol).cast("long").as("_z0"))
      .crossJoin(broadcast(bounds))
      .withColumn("_sx", gridCell("_x", "_xlo", "_xhi", bits))
      .withColumn("_sy", gridCell("_y", "_ylo", "_yhi", bits))
      .withColumn("_sz", gridCell("_z0", "_zlo", "_zhi", bits))
      .withColumn("_zv", zValue3(col("_sx"), col("_sy"), col("_sz"), bits))
    cells
      .select(expr(s"stack(2, 'zorder3', _zv div $zDiv," +
        s" 'linear', _sx div $lDiv) as (layout, bucket)"),
        col("_sx"), col("_sy"), col("_sz"))
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("_sx")).as("min_x"), max(col("_sx")).as("max_x"),
        min(col("_sy")).as("min_y"), max(col("_sy")).as("max_y"),
        min(col("_sz")).as("min_z"), max(col("_sz")).as("max_z"))
      .withColumn("volume_ppm",
        expr("cast(cast((max_x - min_x + 1) as decimal(38,0))" +
          " * (max_y - min_y + 1) * (max_z - min_z + 1) * 1000000" +
          s" div ${1L << (3 * bits)} as bigint)"))
  }

  /** Scale an integral column onto the [0, 2^bits) grid given explicit
    * bounds columns: `(v - lo) * (2^bits - 1) div (hi - lo)`, with a
    * degenerate single-value range pinned to cell 0. On wide-range
    * domains (hashed ids, nanosecond timestamps) the BIGINT product
    * `(v - lo) * mask` can exceed 2^63 and — under non-ANSI Spark —
    * would silently wrap into garbage cells while the DuckDB twin
    * errors; the scaling multiply therefore widens to decimal(38,0)
    * WHEN the range width makes overflow possible, and keeps the
    * cheap BIGINT arithmetic when `(hi − lo) ≤ 2^63/mask` proves it
    * can't (v ∈ [lo, hi], so `v − lo ≤ hi − lo` bounds the product).
    * Both branches compute the same value where both are exact, so
    * the guard is a pure fast path — the DuckDB twins stay
    * unconditional HUGEINT and hash-identical. Result always in
    * [0, 2^bits): the cast back to bigint is lossless. */
  private def gridCell(v: String, lo: String, hi: String,
                       bits: Int): Column = {
    val mask = (1L << bits) - 1
    val safeWidth = Long.MaxValue / mask
    // Overflow-safe width guard (the naive `hi - lo <= safeWidth`
    // wraps exactly in the wide-range case it exists to detect):
    // lo ≥ 0 → hi − lo can't overflow; lo < 0 → compare as
    // hi ≤ safeWidth + lo, whose right side stays in range.
    val narrow = when(col(lo) >= 0L,
      col(hi) - col(lo) <= lit(safeWidth))
      .otherwise(col(hi) <= lit(safeWidth) + col(lo))
    when(col(hi) > col(lo),
      when(narrow, expr(s"(($v - $lo) * $mask) div ($hi - $lo)"))
        .otherwise(expr(
          s"cast(cast(cast($v as decimal(38,0)) - $lo as decimal(38,0))" +
            s" * $mask div ($hi - $lo) as bigint)")))
      .otherwise(lit(0L))
  }

  /** Z-order vs single-column-sort layout audit over two integral
    * dimensions. Output, one row per (layout, bucket):
    * `layout` ('zorder' | 'linear'), `bucket`, `n` (rows), grid-space
    * extents `min_x/max_x/min_y/max_y` (the footer stats a reader
    * would prune on), and `area_ppm` — the bucket's extent rectangle
    * as an exact-integer ppm share of the full grid. 'linear' buckets
    * by the x grid cell alone (the "table sorted by x" layout).
    *
    * How to read it: the curve property is that every z bucket's
    * extents are BOUNDED IN BOTH dimensions (a contiguous curve range
    * spans ~√nBuckets cells per axis), where the sorted layout is
    * tight in x and spans the FULL y range — so a predicate on y
    * alone skips ~(1 − 1/√nBuckets) of the z buckets and none of the
    * sorted ones. `area_ppm` is the 2-D point-predicate cost (the
    * chance a random point lands inside the bucket's pruning
    * rectangle); on skewed or correlated keys — real tables — extent
    * rectangles overlap, and the per-layout Σ area_ppm exposes that
    * redundancy exactly.
    *
    * Scale shape: one bounds pass (4-value 1-row aggregate, broadcast
    * back), then ONE corpus scan — scaling + interleave are a pure
    * projection, the two layouts melt through one `stack` (the
    * keySkew discipline: no second scan), and one grouped agg with
    * map-side partials lands the bucket-grain audit. At write time the
    * production path is `repartitionByRange(zvalue)` + file-per-range;
    * the audit's buckets are those ranges, computed without a sort.
    *
    * `nBuckets` must divide 2^bits (so both layouts cut equal-width
    * ranges and stay comparable). */
  def zOrderAudit(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, nBuckets: Int): DataFrame =
    curveAudit(df, xCol, yCol, bits, nBuckets, "zorder",
      zValue2(_, _, bits))

  /** [[zOrderAudit]] with the Hilbert curve (native `graft_hilbert`,
    * canonical xy2d walk) as the multi-column layout: a contiguous
    * Hilbert range is a connected region — no quadrant-seam jumps —
    * so bucket extents are never worse and usually tighter than the
    * Morton ranges'. Same output contract, layout = 'hilbert'. */
  def hilbertAudit(df: DataFrame, xCol: String, yCol: String,
                   bits: Int, nBuckets: Int): DataFrame =
    curveAudit(df, xCol, yCol, bits, nBuckets, "hilbert",
      (x, y) => call_function("graft_hilbert", x, y, lit(bits)))

  private def curveAudit(df: DataFrame, xCol: String, yCol: String,
                         bits: Int, nBuckets: Int, curveName: String,
                         curve: (Column, Column) => Column): DataFrame = {
    require(bits >= 1 && bits <= 20, s"curveAudit: bits: $bits")
    require(nBuckets >= 1 && (1L << bits) % nBuckets == 0,
      s"curveAudit: nBuckets $nBuckets must divide 2^$bits")
    val zDiv = (1L << (2 * bits)) / nBuckets
    val lDiv = (1L << bits) / nBuckets
    val bounds = df.agg(
      min(col(xCol)).cast("long").as("_xlo"),
      max(col(xCol)).cast("long").as("_xhi"),
      min(col(yCol)).cast("long").as("_ylo"),
      max(col(yCol)).cast("long").as("_yhi"))
    val cells = df
      .select(col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .crossJoin(broadcast(bounds))
      .withColumn("_sx", gridCell("_x", "_xlo", "_xhi", bits))
      .withColumn("_sy", gridCell("_y", "_ylo", "_yhi", bits))
      .withColumn("_z", curve(col("_sx"), col("_sy")))
    cells
      .select(expr(s"stack(2, '$curveName', _z div $zDiv," +
        s" 'linear', _sx div $lDiv) as (layout, bucket)"),
        col("_sx"), col("_sy"))
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("_sx")).as("min_x"), max(col("_sx")).as("max_x"),
        min(col("_sy")).as("min_y"), max(col("_sy")).as("max_y"))
      .withColumn("area_ppm",
        expr("cast(cast((max_x - min_x + 1) as decimal(38,0))" +
          " * (max_y - min_y + 1) * 1000000" +
          s" div ${1L << (2 * bits)} as bigint)"))
  }

  /** The write side the audits plan for: cluster `df` by a
    * space-filling-curve value over two key columns and land it as
    * `nFiles` range files, each internally sorted by the curve — so
    * every file's parquet footer carries tight min/max on BOTH keys
    * and readers prune on either. `curve` picks Morton
    * ([[zValue2]], default) or Hilbert; bounds come from one 4-value
    * pre-pass (at production scale: catalog stats instead).
    *
    * `repartitionByRange` samples to find balanced range cuts —
    * fine for a WRITE layout (file sizes matter, bit-determinism
    * doesn't; the oracle-checked audits stay on the equal-width
    * path). The curve column is dropped before the write: it is
    * derivable, and the layout benefit lives in the file boundaries,
    * not the data. */
  def writeCurveClustered(df: DataFrame, xCol: String, yCol: String,
                          bits: Int, nFiles: Int, path: String,
                          hilbert: Boolean = false): Unit = {
    require(bits >= 1 && bits <= 20 && nFiles >= 1,
      s"writeCurveClustered: bits=$bits nFiles=$nFiles")
    val bounds = df.agg(
      min(col(xCol)).cast("long").as("_xlo"),
      max(col(xCol)).cast("long").as("_xhi"),
      min(col(yCol)).cast("long").as("_ylo"),
      max(col(yCol)).cast("long").as("_yhi"))
    val keep = df.columns.toSeq
    val withCurve = df.crossJoin(broadcast(bounds))
      .withColumn("_cx", col(xCol).cast("long"))
      .withColumn("_cy", col(yCol).cast("long"))
      .withColumn("_sx", gridCell("_cx", "_xlo", "_xhi", bits))
      .withColumn("_sy", gridCell("_cy", "_ylo", "_yhi", bits))
      .withColumn("_curve",
        if (hilbert) call_function("graft_hilbert", col("_sx"),
          col("_sy"), lit(bits))
        else zValue2(col("_sx"), col("_sy"), bits))
    withCurve
      .repartitionByRange(nFiles, col("_curve"))
      .sortWithinPartitions(col("_curve"))
      .select(keep.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** The generated DuckDB twin of the [[hilbertAudit]] curve value:
    * the xy2d walk unrolled as one chained-subquery pipeline over
    * input columns `sx`/`sy`, producing `hd`. Returns the FROM-able
    * subquery text; `carry` lists extra columns to thread through. */
  def hilbertStepsSql(from: String, carry: Seq[String], bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"hilbertStepsSql: bits $bits")
    val cc = carry.map(c => s"$c, ").mkString
    val init = s"(SELECT ${cc}sx, sy, sx AS hx, sy AS hy," +
      s" CAST(0 AS BIGINT) AS hd FROM $from)"
    (bits - 1 to 0 by -1).foldLeft(init) { (inner, k) =>
      val s = 1L << k
      s"""(SELECT ${cc}sx, sy,
         |  CASE WHEN ry = 0 THEN
         |    CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END
         |    ELSE hx END AS hx,
         |  CASE WHEN ry = 0 THEN
         |    CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END
         |    ELSE hy END AS hy,
         |  hd + ${s * s} * (3 * rx + ry - 2 * rx * ry) AS hd
         |FROM (SELECT ${cc}sx, sy, hx, hy, hd,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM $inner t$k) u$k)""".stripMargin
    }
  }

  /** The generated DuckDB twin of [[zValue2]]: the same shift/mask/add
    * chain rendered as SQL over expressions `x` and `y`. Same
    * bits-range contract as the Column side. */
  def zValue2Sql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"zValue2Sql: bits out of range: $bits")
    (0 until bits).map { k =>
      s"((((($x) >> $k) & 1) << ${2 * k})" +
        s" + (((($y) >> $k) & 1) << ${2 * k + 1}))"
    }.mkString(" + ")
  }
}
