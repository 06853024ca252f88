package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** F1-F5 scalar function semantics vs the reference
  * (`core/utils/sheets_core.py:61-78`, `core/utils/db_core.py:41-53`). */
class FunctionsSpec extends SparkSpec {

  private def flagOf(values: Seq[String]): Seq[Boolean] = {
    import spark.implicits._
    values.toDF("v")
      .select(Functions.parseFlag(col("v")).as("f"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  // Truth table from sheets_core.py:71 — every truthy literal, plus
  // trim/case-insensitivity (the reference strips+lowers first).
  test("parseFlag accepts every truthy literal, trimmed and case-insensitive") {
    val truthy = Functions.TruthyLiterals ++
      Seq("TRUE", " True ", "T", "SIM", " Y ", "YES", "S", " 1 ")
    assert(flagOf(truthy).forall(identity))
  }

  test("parseFlag numeric path truncates to int and accepts exactly 1") {
    // int(float(v)) == 1  →  [1, 2) is true; everything else false.
    assert(flagOf(Seq("1.0", "1.5", "1.999", "1,0", "1,9")).forall(identity))
    assert(!flagOf(Seq("2", "0", "0.9", "-1", "-1.5", "2.0", "0,9")).exists(identity))
  }

  test("parseFlag rejects null, empty, junk, and falsy literals") {
    import spark.implicits._
    val withNull = Seq[Option[String]](None, Some(""), Some("   "),
      Some("no"), Some("n"), Some("false"), Some("nao"), Some("abc"),
      Some("1.2.3")).toDF("v")
    val out = withNull.select(Functions.parseFlag(col("v"))).collect()
    assert(out.forall(!_.getBoolean(0)))
  }

  test("parseFlag passes booleans through") {
    import spark.implicits._
    val out = Seq(true, false).toDF("v")
      .select(Functions.parseFlag(col("v"))).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false))
  }

  test("nullSentinel stringifies with __NULL__ for nulls (data_core.py:257)") {
    import spark.implicits._
    val out = Seq[Option[Int]](Some(7), None).toDF("v")
      .select(Functions.nullSentinel(col("v"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("7", "__NULL__"))
  }

  test("coercingTimestamp parses ISO and coerces junk to null (db_core.py:52)") {
    import spark.implicits._
    val out = Seq("2024-05-01 12:30:00", "not a date", "2024-13-45")
      .toDF("v").select(Functions.coercingTimestamp(col("v"))).collect()
    assert(out(0).getTimestamp(0) != null)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("isoFormat renders second-resolution ISO-8601 (sheets_core.py:80-84)") {
    import spark.implicits._
    val out = Seq(java.sql.Timestamp.valueOf("2024-05-01 12:30:45.678"))
      .toDF("v").select(Functions.isoFormat(col("v"))).collect()
    assert(out(0).getString(0) == "2024-05-01T12:30:45")
  }

  test("lowerTrim normalizes for comparisons (sheets_core.py:52-58)") {
    import spark.implicits._
    val out = Seq("  MiXeD Case  ").toDF("v")
      .select(Functions.lowerTrim(col("v"))).collect()
    assert(out(0).getString(0) == "mixed case")
  }
}
