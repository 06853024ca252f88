package graft

import org.apache.spark.sql.functions._
import graft.transform.Diff

class DiffSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val a = Seq(
      (1L, Option("aa"), 10L),
      (2L, Option("bb"), 20L),
      (3L, Option("cc"), 30L),
      (4L, Option.empty[String], 40L),
      (5L, Option("ee"), 50L)
    ).toDF("id", "txt", "n")
    val b = Seq(
      (1L, Option("aa"), 10L),          // unchanged
      (2L, Option("BB"), 20L),          // changed: txt
      (3L, Option("cc"), 33L),          // changed: n
      (4L, Option.empty[String], 40L),  // unchanged (null <=> null)
      (6L, Option("ff"), 60L)           // added; 5 removed
    ).toDF("id", "txt", "n")
    (a, b)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val (a, b) = fixture
    val out = Diff.snapshotDiff(a, b, "id", Seq("txt", "n"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, "unchanged", ""),
      (2L, "changed", "txt"),
      (3L, "changed", "n"),
      (4L, "unchanged", ""),
      (5L, "removed", ""),
      (6L, "added", "")))
  }

  test("changed_cols lists every differing column in caller order") {
    import spark.implicits._
    val a = Seq((1L, "x", 1L)).toDF("id", "txt", "n")
    val b = Seq((1L, "y", 2L)).toDF("id", "txt", "n")
    val r = Diff.snapshotDiff(a, b, "id", Seq("txt", "n")).collect()(0)
    assert(r.getString(2) == "txt,n")
    // null vs value is a change; the compare is null-safe, not SQL-=
    val bn = Seq((1L, Option.empty[String], Option(2L)))
      .toDF("id", "txt", "n")
    val rn = Diff.snapshotDiff(a, bn, "id", Seq("txt", "n")).collect()(0)
    assert(rn.getString(1) == "changed" && rn.getString(2) == "txt,n")
  }

  test("carry columns surface the new side, falling back for removed") {
    import spark.implicits._
    val a = Seq((1L, "x", "oldsrc"), (2L, "y", "gone"))
      .toDF("id", "txt", "src")
    val b = Seq((1L, "x", "newsrc")).toDF("id", "txt", "src")
    val out = Diff.snapshotDiff(a, b, "id", Seq("txt"),
        carry = Seq("src"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    // src differs but is NOT compared: row 1 stays unchanged, carries new
    assert(out.toSeq == Seq((1L, "unchanged", "newsrc"),
      (2L, "removed", "gone")))
  }

  test("null-key rows classify by presence, not key nullability") {
    import spark.implicits._
    // old side has a null-key row that vanishes; new side gains one.
    // Key-nullability logic would call BOTH 'added'; presence flags
    // must report removed (old side) and added (new side).
    val a = Seq((Option(1L), "x"), (Option.empty[Long], "ghost"))
      .toDF("id", "txt")
    val b = Seq((Option(1L), "x"), (Option.empty[Long], "new"))
      .toDF("id", "txt")
    val out = Diff.snapshotDiff(a, b, "id", Seq("txt"))
      .orderBy("status").collect()
      .map(r => (r.getString(1), r.isNullAt(0)))
    assert(out.toSeq == Seq(("added", true), ("removed", true),
      ("unchanged", false)))
  }

  test("diffSummary groups counts by status and dimension") {
    val (a, b) = fixture
    val d = Diff.snapshotDiff(a, b, "id", Seq("txt", "n"))
      .withColumn("dim", lit("all"))
    val m = Diff.diffSummary(d, "dim").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m == Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }
}
