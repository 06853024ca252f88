package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Engine
import graft.functions.Functions
import graft.transform.{Dedupe, Ids, Profile, Sanitize, Skew}

/** Correctness-harness wiring for the transform layer (VERDICT r1 item 10):
  * profile, top-k values, contiguous ids, dedupe-append, export
  * stringification, and parse_flag each get a DuckDB-oracled query so the
  * W/P/F operator rows stop being dark matter.
  */
object TransformQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // ---------------------------------------------------------------------
  // Data-quality gate (Checks.check): five row-local rules in ONE
  // aggregation pass + a uniqueness check. Rules are deliberately strict
  // enough to FAIL on real rows (range capped at 450k, priorities
  // restricted to 1-3) so the violation counts are non-trivial.
  // ---------------------------------------------------------------------
  def tQualityChecks(s: SparkSession, dir: String): DataFrame = {
    import graft.transform.Checks
    Checks.check(t(s, dir, "orders"),
      Seq(Checks.notNull("o_custkey"),
        Checks.inRange("o_totalprice", 0.0, 450000.0),
        Checks.oneOf("o_orderstatus", Seq("F", "O")),
        Checks.matches("o_orderpriority", "^[1-3]-"),
        Checks.nonNegative("o_totalprice")),
      uniqueCols = Seq("o_orderkey"))
  }

  val tQualityChecksSql: String =
    """SELECT rule, "column", n_violations, n_violations = 0 AS pass
      |FROM (
      |  SELECT 'not_null' AS rule, 'o_custkey' AS "column",
      |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_violations
      |  FROM orders
      |  UNION ALL
      |  SELECT 'in_range', 'o_totalprice',
      |    COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
      |      AND (o_totalprice < 0 OR o_totalprice > 450000))
      |  FROM orders
      |  UNION ALL
      |  SELECT 'one_of', 'o_orderstatus',
      |    COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
      |      AND o_orderstatus NOT IN ('F', 'O'))
      |  FROM orders
      |  UNION ALL
      |  SELECT 'matches', 'o_orderpriority',
      |    COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
      |      AND NOT regexp_matches(o_orderpriority, '^[1-3]-'))
      |  FROM orders
      |  UNION ALL
      |  SELECT 'non_negative', 'o_totalprice',
      |    COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
      |      AND o_totalprice < 0)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'unique', 'o_orderkey',
      |    CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
      |  FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
      |        HAVING COUNT(*) > 1))
      |ORDER BY rule, "column"""".stripMargin

  // ---------------------------------------------------------------------
  // W2 profile — the scalar half (null/unique counts) is SQL-expressible;
  // the array half (samples/top-10) is covered by unit + golden tests.
  // ---------------------------------------------------------------------
  def tProfileCounts(s: SparkSession, dir: String): DataFrame =
    Profile.profile(t(s, dir, "customer"))
      .select(col("column").as("col_name"), col("null_count"),
        col("null_pct"), col("unique_count"))
      .orderBy(col("col_name"))

  val tProfileCountsSql: String = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  COUNT(*) - COUNT($c) AS null_count,
         |  CAST(COUNT(*) - COUNT($c) AS DOUBLE) / COUNT(*) AS null_pct,
         |  COUNT(DISTINCT $c) AS unique_count
         |FROM customer""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------------
  // A1 summary statistics (describe() twin with decimal-exact mean).
  // ---------------------------------------------------------------------
  def tSummaryStats(s: SparkSession, dir: String): DataFrame =
    Profile.summaryStats(t(s, dir, "customer"))
      .select(col("column").as("col_name"), col("count"), col("sum"),
        col("mean"), col("min"), col("max"))
      .orderBy(col("col_name"))

  val tSummaryStatsSql: String = {
    val cols = Seq("c_custkey", "c_nationkey", "c_acctbal")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT($c) AS count,
         |  CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) AS sum,
         |  CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / COUNT($c) AS mean,
         |  CAST(MIN($c) AS DOUBLE) AS min, CAST(MAX($c) AS DOUBLE) AS max
         |FROM customer""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------------
  // P2 derived flag columns over a synthesized control-column trio.
  // ---------------------------------------------------------------------
  def tDeriveFlags(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .withColumn("ctl_sanity",
        when(col("c_custkey") % 2 === 0, lit("sim")).otherwise(lit("nao")))
      .withColumn("ctl_dup",
        when(col("c_custkey") % 3 === 0, lit("1")).otherwise(lit("0")))
      .withColumn("ctl_quality",
        when(col("c_custkey") % 5 === 0, lit("TRUE")).otherwise(lit("x")))
    Functions.deriveFlags(base, "ctl_sanity", "ctl_dup", "ctl_quality")
      .select(col("c_custkey"), col("_flag_sanity").as("flag_sanity"),
        col("_flag_dup").as("flag_dup"),
        col("_flag_quality").as("flag_quality"))
      .orderBy(col("c_custkey"))
  }

  val tDeriveFlagsSql: String =
    """SELECT c_custkey,
      |  c_custkey % 2 = 0 AS flag_sanity,
      |  c_custkey % 3 = 0 AS flag_dup,
      |  c_custkey % 5 = 0 AS flag_quality
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // A4 top-K value counts (TakeOrderedAndProject — no global sort).
  // ---------------------------------------------------------------------
  def tTopkValues(s: SparkSession, dir: String): DataFrame =
    Profile.topKValues(t(s, dir, "customer"), "c_mktsegment", k = 10)

  val tTopkValuesSql: String =
    """SELECT COALESCE(CAST(c_mktsegment AS VARCHAR), '__NULL__') AS value,
      |  COUNT(*) AS count
      |FROM customer GROUP BY 1
      |ORDER BY count DESC, value ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // W1 contiguous id assignment — two-pass partition-offset design; the
  // oracle is the definition itself: row_number() - 1 in key order.
  // ---------------------------------------------------------------------
  def tIdsContiguous(s: SparkSession, dir: String): DataFrame =
    Ids.assignContiguousIds(t(s, dir, "customer"), col("c_custkey"))
      .select(col("c_custkey"), col("new_id"))
      .orderBy(col("c_custkey"))

  val tIdsContiguousSql: String =
    """SELECT c_custkey,
      |  ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS new_id
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // J1 dedupe-before-append — broadcast anti join on trimmed string ids.
  // ---------------------------------------------------------------------
  def tDedupeAppend(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    Dedupe.dedupeAppend(c, c.filter(col("c_custkey") % 3 === 0), "c_custkey")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val tDedupeAppendSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey % 3 <> 0 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // W5/W6 export stringification — timestamps → ISO seconds, null → "",
  // everything else cast(string). Ints/strings/dates only (double→string
  // rendering is engine-specific, so o_totalprice stays out).
  // ---------------------------------------------------------------------
  def tStringifyExport(s: SparkSession, dir: String): DataFrame =
    Sanitize.stringifyForExport(
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderdate"), col("o_orderpriority")))
      .orderBy(col("o_orderkey"))

  val tStringifyExportSql: String =
    """SELECT COALESCE(CAST(o_orderkey AS VARCHAR), '') AS o_orderkey,
      |  COALESCE(CAST(o_orderstatus AS VARCHAR), '') AS o_orderstatus,
      |  COALESCE(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), '')
      |    AS o_orderdate,
      |  COALESCE(CAST(o_orderpriority AS VARCHAR), '') AS o_orderpriority
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // S6 SQL passthrough — the SAME SQL string runs through Engine.sql
  // (Catalyst over registered views) and through DuckDB: the facade that
  // replaces the reference's BigQuery delegation, verified end-to-end.
  // ---------------------------------------------------------------------
  val passthroughSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  COUNT(DISTINCT c_nationkey) AS n_nations
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  def tSqlPassthrough(s: SparkSession, dir: String): DataFrame = {
    graft.engine.Engine.registerAll(s, dir)
    graft.engine.Engine.sql(s, passthroughSql)
      .getOrElse(throw new IllegalStateException("passthrough SQL failed"))
  }

  // ---------------------------------------------------------------------
  // Skew-safe salted aggregation — must be bit-identical to the plain
  // grouped sum (decimal partials are associative), which the oracle's
  // UNSALTED sum verifies.
  // ---------------------------------------------------------------------
  def tSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedSumCount(t(s, dir, "lineitem"), "l_returnflag", "l_quantity",
        salts = 16)
      .orderBy(col("l_returnflag"))

  val tSaltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
      |    AS sum_l_quantity,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // F1 parse_flag — the reference's permissive boolean parser
  // (`core/utils/sheets_core.py:61-78`) over a synthesized literal column,
  // including trim, comma-decimal, and null cases.
  // ---------------------------------------------------------------------
  private val flagInputs: Seq[String] =
    Seq("1", "sim", "no", "1,0", "2", "0,9", " y ")

  def tParseFlag(s: SparkSession, dir: String): DataFrame = {
    val raw = flagInputs.zipWithIndex
      .foldRight(lit(null).cast("string")) { case ((v, i), elseC) =>
        when(col("c_custkey") % 8 === i, lit(v)).otherwise(elseC)
      }
    t(s, dir, "customer")
      .withColumn("flag_raw", raw)
      .select(col("c_custkey"), col("flag_raw"),
        Functions.parseFlag(col("flag_raw")).as("flag"))
      .orderBy(col("c_custkey"))
  }

  val tParseFlagSql: String = {
    val cases = flagInputs.zipWithIndex
      .map { case (v, i) => s"WHEN c_custkey % 8 = $i THEN '$v'" }
      .mkString(" ")
    s"""WITH f AS (SELECT c_custkey, CASE $cases END AS flag_raw
       |           FROM customer)
       |SELECT c_custkey, flag_raw,
       |  CASE WHEN flag_raw IS NULL THEN FALSE
       |    WHEN lower(trim(flag_raw))
       |      IN ('1','true','t','sim','s','yes','y') THEN TRUE
       |    WHEN TRY_CAST(replace(lower(trim(flag_raw)), ',', '.')
       |           AS DOUBLE) >= 1.0
       |     AND TRY_CAST(replace(lower(trim(flag_raw)), ',', '.')
       |           AS DOUBLE) < 2.0 THEN TRUE
       |    ELSE FALSE END AS flag
       |FROM f ORDER BY c_custkey""".stripMargin
  }

  // ---------------------------------------------------------------------
  // I/O round-trips (VERDICT r2 item 3) — the S/K layer was oracle-dark:
  // CSV write (K3) → delimiter-sniffed read (S2), and the keyed DSv2
  // write path → pushdown scan (S7), each verified end-to-end by DuckDB
  // reading the SAME on-disk artifact the Spark side produced. Artifacts
  // land under one SF-INDEPENDENT scratch dir, overwritten per run, so
  // the static oracle SQL reads the artifact of whichever SF just ran —
  // valid at the driver's sf0.01 gate AND the extended sf0.1 sweep
  // (r9: basename-keyed paths left the sweep reading stale sf0.01
  // artifacts, 128/130).
  // ---------------------------------------------------------------------
  // Keyed by SPARK_GRAFT_RT_DIR so concurrent runs on one host (parallel
  // bench + verify, two users, different SFs) can isolate their scratch
  // artifacts; the oracle SQL below renders the SAME env value into its
  // read path at dump time (Verify writes oracle_sql.json in this JVM),
  // so query and oracle always agree on the artifact location. Without
  // the override: single-run-per-host, overwritten per run.
  private def rtDir(dir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_RT_DIR", "/tmp/graft_rt/current")

  /** CSV round-trip: project 4 customer columns, write with ';' (K3),
    * sniff the delimiter back (S2) and read (S1). Types are re-cast after
    * the schema-inferred read so both engines land on (long, string,
    * double, string). */
  def tCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = rtDir(dir) + "/customer_csv"
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
      .coalesce(1) // single artifact shard → stable oracle glob
    graft.sinks.Sinks.writeCsv(cust, out, "replace", delimiter = ";")
    graft.sources.Sources.readCsvSniffed(s, out)
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("c_acctbal").cast("double"), col("c_mktsegment"))
  }

  val tCsvRoundtripSql: String =
    s"""SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       |  CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
       |FROM read_csv('${rtDir("")}/customer_csv/*.csv',
       |              delim=';', header=true)""".stripMargin

  /** Keyed-store round-trip: write orders through the DSv2 write path
    * (shard-per-task JSON lines + schema sidecar), scan back through the
    * `graft-keyed` connector with an equality filter + top-N — the
    * pushdown contract the KeyedSourceSpec asserts on the plan, here
    * value-checked against DuckDB reading the same shards. */
  def tKeyedPushdown(s: SparkSession, dir: String): DataFrame = {
    val store = rtDir(dir) + "/orders_keyed"
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .write.format("graft-keyed").mode("overwrite").save(store)
    s.read.format("graft-keyed").load(store)
      .filter(col("o_orderstatus") === "F")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  val tKeyedPushdownSql: String =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
       |FROM read_json('${rtDir("")}/orders_keyed/shard-*.json',
       |               format='newline_delimited')
       |WHERE o_orderstatus = 'F'
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // S9 — scrape-manifest roundtrip: land the first 100 documents as
  // one file each plus a JSON-lines crawl manifest (the shape the
  // reference's Selenium ingest task produces, base_spider.py:5-16),
  // scan them back through the `graft-scrape` DSv2 connector, and
  // oracle url/timestamp/char-count against the ORIGINAL documents
  // table — proving the full land → manifest → distributed-read path
  // preserves content. The landing pass is driver-side by design
  // (crawls ARE driver-side in the reference; bounded at 100 docs);
  // the scan back is executor-side with pruning-aware file IO.
  // ---------------------------------------------------------------------
  def tScrapeManifest(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.scrape.ScrapeManifest
    val land = rtDir(dir) + "/scrape_land"
    val manifest = land + "/manifest.jsonl"
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val fs = new org.apache.hadoop.fs.Path(land)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = docs.map { case (id, text) =>
      val p = new org.apache.hadoop.fs.Path(s"$land/doc_$id.txt")
      val out = fs.create(p, true)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      (s"https://example.com/doc/$id", p.toString, t0.plusSeconds(id))
    }
    ScrapeManifest.write(entries.toIndexedSeq, manifest)
    s.read.format("graft-scrape").option("path", manifest).load()
      .select(col("url"), col("fetched_at"),
        length(col("content")).as("n_chars"))
      .orderBy(col("url"))
  }

  val tScrapeManifestSql: String =
    """SELECT 'https://example.com/doc/' || doc_id AS url,
      |  TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND
      |    AS fetched_at,
      |  length(text) AS n_chars
      |FROM documents WHERE doc_id < 100
      |ORDER BY url""".stripMargin

  // ---------------------------------------------------------------------
  // Winsorization (W3-adjacent numeric cleaning): clip l_extendedprice
  // to its [5%, 95%] exact-percentile band, summarized per returnflag
  // with exact-safe aggregates only (integer clip counts, band edges,
  // min/max of the clipped column — deliberately NO sums of the
  // winsorized doubles: percentile edges carry ~17 significant digits
  // and the decimal-cast accumulator would face manufactured rounding
  // ties; see Queries.scala's header).
  // ---------------------------------------------------------------------
  /** MAD outlier flags over the events value stream: flagged rows
    * only, with the shared robust band. */
  def tMadOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // No spread: the percentile tiers shuffle (large) or reduce to a
    // driver-merged map (small) regardless, so the round-robin
    // exchange + its sort-before-repartition only added cost per
    // subtree evaluation at fixture scale; block-sized files
    // parallelize the scan natively at corpus scale.
    graft.transform.Sanitize.madOutliers(
        graft.engine.Engine.table(s, dir, "events"),
        "value", k = 3.0)
      .filter(col("is_outlier"))
      .select(col("event_id"), col("value").cast("double").as("value"),
        col("_med").as("med"), col("_mad").as("mad"))
      .orderBy(col("event_id"))
  }

  val tMadOutliersSql: String =
    """WITH m AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.5)
      |    AS med FROM events),
      |  d AS (SELECT event_id, CAST(value AS DOUBLE) AS value, med,
      |      abs(CAST(value AS DOUBLE) - med) AS ad
      |    FROM events CROSS JOIN m),
      |  md AS (SELECT quantile_cont(ad, 0.5) AS mad FROM d)
      |SELECT event_id, value, med, mad
      |FROM d CROSS JOIN md
      |WHERE ad > 3.0E0 * 1.4826E0 * mad
      |ORDER BY event_id""".stripMargin

  def tWinsorize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // spread kept (r18 measured): the small-tier exact percentile
    // builds a value->count map per scan task, and 600k lineitem rows
    // over ~3 natural splits is map-build bound — spreading to the
    // core count is a 1.5x win here (3.4 -> 2.2 s solo min), the
    // OPPOSITE of t_mad_outliers' cheaper aggregate where dropping
    // the round-robin exchange won.
    val w = graft.transform.Sanitize.winsorize(
      graft.engine.Engine.spread(
        graft.engine.Engine.table(s, dir, "lineitem")),
      "l_extendedprice", lo = 0.05, hi = 0.95)
    w.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <
          col("l_extendedprice_lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("l_extendedprice") >
          col("l_extendedprice_hi"), 1L).otherwise(0L)).as("n_hi"),
        min(col("l_extendedprice_wins")).as("min_wins"),
        max(col("l_extendedprice_wins")).as("max_wins"),
        first(col("l_extendedprice_lo")).as("p_lo"),
        first(col("l_extendedprice_hi")).as("p_hi"))
      .orderBy(col("l_returnflag"))
  }

  val tWinsorizeSql: String =
    """WITH b AS (SELECT
      |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS plo,
      |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS phi
      |  FROM lineitem),
      |  w AS (SELECT l_returnflag, l_extendedprice, plo, phi,
      |    least(greatest(CAST(l_extendedprice AS DOUBLE), plo), phi)
      |      AS wins
      |  FROM lineitem CROSS JOIN b)
      |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN l_extendedprice < plo THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_lo,
      |  CAST(SUM(CASE WHEN l_extendedprice > phi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hi,
      |  MIN(wins) AS min_wins, MAX(wins) AS max_wins,
      |  ANY_VALUE(plo) AS p_lo, ANY_VALUE(phi) AS p_hi
      |FROM w GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
