package graft

import java.nio.file.Files
import graft.sinks.GridSink

/** S8/K11 grid (sheet stand-in) semantics vs `core/utils/sheets_core.py`. */
class GridSinkSpec extends SparkSpec {

  private def tmpFile(): String =
    Files.createTempDirectory("graft-grid").toString + "/sheet.csv"

  test("first append writes the header then rows (sheets_core.py:179-192)") {
    import spark.implicits._
    val path = tmpFile()
    val n = GridSink.appendDedupe(
      Seq(("1", "ana"), ("2", "bo")).toDF("id", "name"), path, "id")
    assert(n == 2)
    val grid = GridSink.readGrid(spark, path)
    assert(grid.columns.toSeq == Seq("id", "name"))
    assert(grid.count() == 2)
  }

  test("append dedupes by trimmed id; empty ids always append (sheets_core.py:176)") {
    import spark.implicits._
    val path = tmpFile()
    GridSink.appendDedupe(Seq(("1", "ana"), ("", "noid")).toDF("id", "name"),
      path, "id")
    val n = GridSink.appendDedupe(
      Seq((" 1 ", "dupe"), ("3", "carl"), ("", "alsonoid"))
        .toDF("id", "name"), path, "id")
    assert(n == 2) // " 1 " trims to existing "1"; empties always land
    val names = GridSink.readGrid(spark, path)
      .collect().map(_.getString(1)).toSet
    assert(names == Set("ana", "noid", "carl", "alsonoid"))
  }

  test("rows align to the grid header; unknown grid columns get empty strings") {
    import spark.implicits._
    val path = tmpFile()
    GridSink.appendDedupe(Seq(("1", "ana", "x")).toDF("id", "name", "extra"),
      path, "id")
    // second frame lacks 'extra' and adds 'junk' (not in header → dropped)
    GridSink.appendDedupe(Seq(("2", "bo", "zzz")).toDF("id", "name", "junk"),
      path, "id")
    val rows = GridSink.readGrid(spark, path).orderBy("id").collect()
    assert(rows(1).getString(0) == "2")
    assert(rows(1).getString(1) == "bo")
    assert(rows(1).getString(2) == "") // 'extra' missing from second frame
  }

  test("id column absent from grid header raises (sheets_core.py:174-175)") {
    import spark.implicits._
    val path = tmpFile()
    GridSink.appendDedupe(Seq(("1", "ana")).toDF("id", "name"), path, "id")
    intercept[GridSink.IdColumnNotInSheet] {
      GridSink.appendDedupe(Seq(("1", "x")).toDF("other", "name"),
        path, "other")
    }
  }

  test("timestamps render as ISO strings in the grid (sheets_core.py:194-209)") {
    import spark.implicits._
    val path = tmpFile()
    GridSink.appendDedupe(
      Seq(("1", java.sql.Timestamp.valueOf("2024-02-03 10:20:30")))
        .toDF("id", "when"), path, "id")
    val v = GridSink.readGrid(spark, path).collect()(0).getString(1)
    assert(v == "2024-02-03T10:20:30")
  }

  test("csv codec round-trips quotes, commas, newlines") {
    val cells = Seq("plain", "with,comma", "with\"quote", "", "tail")
    assert(GridSink.parseCsvLine(GridSink.toCsvLine(cells)) == cells)
  }

  test("applyValidation records a ONE_OF_LIST rule over appended rows; absent column no-ops") {
    import spark.implicits._
    val path = tmpFile()
    val n = GridSink.appendDedupe(
      Seq(("1", "SIM"), ("2", "NAO"), ("3", "talvez"))
        .toDF("id", "homologado"), path, "id")
    assert(GridSink.applyValidation(path, "homologado",
      appendedCount = n))
    assert(!GridSink.applyValidation(path, "no_such_col")) // reference no-op
    val meta = GridSink.readMeta(path)
    assert(meta.rules.size == 1)
    assert(meta.rules.head == GridSink.GridRule("homologado",
      Seq("SIM", "NAO"), 0, 3))
    // enforcement: the off-list cell is the only violation; blanks pass
    assert(GridSink.validateGrid(path) == Seq(("homologado", 2, "talvez")))
  }

  test("grid metadata round-trips hostile strings (brackets, quotes, tabs)") {
    import spark.implicits._
    val path = tmpFile()
    GridSink.appendDedupe(Seq(("1", "v")).toDF("id", "a\"b\tc]d"), path, "id")
    assert(GridSink.applyValidation(path, "a\"b\tc]d",
      allowed = Seq("x]y", "p\"q"), appendedCount = 1))
    GridSink.share(path, Seq("odd]name@x.test"))
    val meta = GridSink.readMeta(path)
    assert(meta.rules.head.column == "a\"b\tc]d")
    assert(meta.rules.head.allowed == Seq("x]y", "p\"q"))
    assert(meta.writers == Seq("odd]name@x.test"))
    GridSink.share(path, Seq("two@x.test"))
    assert(GridSink.readMeta(path).writers ==
      Seq("odd]name@x.test", "two@x.test")) // earlier grants preserved
  }

  test("share grants writer idempotently and collects invalid-email errors") {
    import spark.implicits._
    val path = tmpFile()
    GridSink.appendDedupe(Seq(("1", "a")).toDF("id", "v"), path, "id")
    val errs = GridSink.share(path,
      Seq("ana@x.test", "not-an-email", "ana@x.test", "bo@x.test"))
    assert(errs == Seq(("not-an-email", 400,
      "invalid email address: not-an-email")))
    assert(GridSink.readMeta(path).writers ==
      Seq("ana@x.test", "bo@x.test"))
    GridSink.share(path, Seq("ana@x.test")) // idempotent
    assert(GridSink.readMeta(path).writers ==
      Seq("ana@x.test", "bo@x.test"))
    assert(GridSink.gridUrl(path).startsWith("file://"))
  }
}
