package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates for pipeline boundaries — the
  * validation step a training-data run puts between ingest and training
  * (the reference's per-row control flags, `rpa/controle.py` quality/
  * sanity markers, generalized to table-level assertions).
  *
  * Design for scale: every row-local rule (not-null, range, regex,
  * membership) compiles to a conditional-count aggregate, so checking N
  * rules is ONE pass over the data — one partial+final agg, no shuffle
  * of data rows, no per-rule job. Uniqueness is inherently global and
  * runs as its own single groupBy. Results come back as a small report
  * frame (rule, column, n_violations, pass), never as an exception mid-
  * plan — the caller decides whether to gate (`require(report.pass)`),
  * alert (K13), or log.
  */
object Checks {

  /** A named row-level predicate; `violated` marks FAILING rows. */
  final case class Rule(name: String, column: String, violated: Column)

  def notNull(c: String): Rule =
    Rule("not_null", c, col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule("in_range", c, col(c).isNotNull && (col(c) < lo || col(c) > hi))

  def matches(c: String, pattern: String): Rule =
    Rule("matches", c, col(c).isNotNull && !col(c).rlike(pattern))

  def oneOf(c: String, allowed: Seq[String]): Rule =
    Rule("one_of", c, col(c).isNotNull && !col(c).isin(allowed: _*))

  def nonNegative(c: String): Rule =
    Rule("non_negative", c, col(c).isNotNull && col(c) < 0)

  /** Row-level variant of the gate: append a `violations` column — the
    * names of every failing rule (`rule:column`), empty array when the
    * row is clean. A pure projection, so unlike the aggregated
    * [[check]] report it works UNCHANGED on a structured stream
    * (quarantine pattern: `flagRows(...).filter(size($"violations") >
    * 0)` routes bad rows to a side sink while clean rows flow on).
    * Uniqueness is inherently global and stays with [[check]]. */
  def flagRows(df: DataFrame, rules: Seq[Rule],
               outCol: String = "violations"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"flagRows: input already has a '$outCol' column — pass outCol")
    val entries = rules.map(r =>
      when(r.violated, lit(s"${r.name}:${r.column}"))
        .otherwise(lit(null: String)))
    // array_compact, not a filter lambda: this projection is the
    // per-row hot path, and higher-order lambdas evaluate interpreted
    // (same reasoning as TextOps.tokens).
    val flags =
      if (entries.isEmpty) array().cast("array<string>")
      else array_compact(array(entries: _*))
    df.withColumn(outCol, flags)
  }

  /** Run row-local rules in ONE aggregation pass; optionally add
    * uniqueness checks (each a groupBy on its column). Report schema:
    * (rule, column, n_violations, pass) ordered by (rule, column). */
  def check(df: DataFrame, rules: Seq[Rule],
            uniqueCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal: Option[DataFrame] =
      if (rules.isEmpty) None
      else Some {
        val aggs = rules.zipWithIndex.map { case (r, i) =>
          count_if(r.violated).as(s"_v$i")
        }
        val counted = df.agg(aggs.head, aggs.tail: _*)
        // One wide 1-row agg → melt to (rule, column, n) rows with a
        // typed explode-of-structs, entirely inside the plan: `check`
        // stays LAZY (no job runs until the caller acts on the report)
        // and the data is scanned exactly once when it does. Typed
        // Column literals rather than selectExpr string splicing: rule/
        // column names never pass through the SQL parser, so no escaping
        // contract to get wrong under either setting of
        // spark.sql.parser.escapedStringLiterals.
        val entries = rules.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"), lit(r.column).as("column"),
            col(s"_v$i").as("n_violations"))
        }
        counted.select(explode(array(entries: _*)).as("_kv"))
          .select(col("_kv.rule"), col("_kv.column"),
            col("_kv.n_violations"))
      }

    val uniq: Option[DataFrame] =
      if (uniqueCols.isEmpty) None
      else Some(uniqueCols.map { c =>
        df.groupBy(col(c)).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1)
          .agg(coalesce(sum(col("_n") - 1), lit(0L)).as("n_violations"))
          .select(lit("unique").as("rule"), lit(c).as("column"),
            col("n_violations"))
      }.reduce(_ unionByName _))

    val report = (rowLocal.toSeq ++ uniq.toSeq)
      .reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, String, Long)]
        .toDF("rule", "column", "n_violations"))
    report
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"), col("column"))
  }
}
