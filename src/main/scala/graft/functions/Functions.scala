package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scalar column functions (SURVEY §2.8) — all built as `when`-chains /
  * built-in functions so Catalyst folds them into whole-stage codegen;
  * no UDFs anywhere on the hot path.
  */
object Functions {

  /** Truthy literal set accepted by [[parseFlag]]
    * (reference: `core/utils/sheets_core.py:71`). */
  val TruthyLiterals: Seq[String] = Seq("1", "true", "t", "sim", "s", "yes", "y")

  /** F1 — permissive boolean parser (`core/utils/sheets_core.py:61-78`):
    * NA → false; truthy literal set (lowercased, trimmed) → true; else
    * parse as a number with comma-decimal tolerance and accept values whose
    * integer truncation is 1 (i.e. [1, 2)); anything unparseable → false.
    */
  def parseFlag(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    val d = translate(s, ",", ".").try_cast(DoubleType)
    when(c.isNull, lit(false))
      .when(s.isin(TruthyLiterals: _*), lit(true))
      .when(d.isNotNull && d >= 1.0 && d < 2.0, lit(true))
      .otherwise(lit(false))
  }

  /** P2 — derived homologation flag columns
    * (`core/utils/sheets_core.py:86-92`): parse the three control columns
    * into `_flag_sanity`, `_flag_dup`, `_flag_quality`. Pure projection —
    * three `when`-chains fused into the surrounding stage. */
  def deriveFlags(df: org.apache.spark.sql.DataFrame, sanityCol: String,
                  dupCol: String, qualityCol: String)
      : org.apache.spark.sql.DataFrame =
    df.withColumn("_flag_sanity", parseFlag(col(sanityCol)))
      .withColumn("_flag_dup", parseFlag(col(dupCol)))
      .withColumn("_flag_quality", parseFlag(col(qualityCol)))

  /** F3 — normalization used for column/id comparison
    * (`core/utils/sheets_core.py:52-58`). */
  def lowerTrim(c: Column): Column = lower(trim(c.cast("string")))

  /** F4 — stringify with the reference's null sentinel
    * (`core/utils/data_core.py:257`). */
  def nullSentinel(c: Column, sentinel: String = "__NULL__"): Column =
    coalesce(c.cast("string"), lit(sentinel))

  /** F5 — coercing datetime parse: null on failure, mirroring pandas
    * `to_datetime(errors='coerce')` (`core/utils/db_core.py:52`). */
  def coercingTimestamp(c: Column): Column = try_to_timestamp(c.cast("string"))

  /** W5 — ISO-8601 second-resolution formatting applied to timestamp
    * columns before export (`core/utils/sheets_core.py:80-84`). */
  def isoFormat(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
}
