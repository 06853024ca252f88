package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** S1-S5 + P1 + K6 source semantics vs `core/utils/data_core.py:65-105`,
  * `core/utils/db_core.py:74-117`, `core/utils/sheets_core.py:47-59`. */
class SourcesSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  private def writeCsvFile(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), lines.mkString("\n").getBytes("UTF-8"))

  test("sniffDelimiter picks , ; and tab from fixture-style exports (db_core.py:86-95)") {
    val dir = tmp()
    writeCsvFile(s"$dir/comma.csv", Seq("a,b,c", "1,2,3"))
    writeCsvFile(s"$dir/semi.csv", Seq("a;b;c", "1;2;3"))
    writeCsvFile(s"$dir/tab.csv", Seq("a\tb\tc", "1\t2\t3"))
    assert(Sources.sniffDelimiter(spark, s"$dir/comma.csv") == ",")
    assert(Sources.sniffDelimiter(spark, s"$dir/semi.csv") == ";")
    assert(Sources.sniffDelimiter(spark, s"$dir/tab.csv") == "\t")
  }

  test("sniffDelimiter ignores delimiters inside quotes and errors when undecidable") {
    val dir = tmp()
    // header's comma is inside quotes → ',' yields 1 column, ';' wins
    writeCsvFile(s"$dir/tricky.csv", Seq("\"a,x\";b", "1;2"))
    assert(Sources.sniffDelimiter(spark, s"$dir/tricky.csv") == ";")
    writeCsvFile(s"$dir/one.csv", Seq("single_column", "v"))
    intercept[IllegalArgumentException](
      Sources.sniffDelimiter(spark, s"$dir/one.csv"))
  }

  test("readCsvSniffed round-trips a ;-export of the nation fixture") {
    val dir = tmp()
    val nation = graft.engine.Engine.table(spark, fixtureDir, "nation")
    graft.sinks.Sinks.writeCsv(nation.coalesce(1), s"$dir/nation", delimiter = ";")
    val back = Sources.readCsvSniffed(spark, s"$dir/nation")
    assert(back.columns.toSeq == nation.columns.toSeq)
    assert(back.count() == nation.count())
    assert(back.agg(sum("n_nationkey")).collect()(0).getLong(0) ==
      nation.agg(sum("n_nationkey")).collect()(0).getLong(0))
  }

  test("readParquetOrEmpty: missing path is an empty frame (storage.py:181-189)") {
    assert(Sources.readParquetOrEmpty(spark, "/nonexistent/x.parquet").isEmpty)
    assert(Sources.readParquetOrEmpty(spark, s"$fixtureDir/region.parquet")
      .count() == 5)
  }

  test("resolveColumn: exact case-insensitive beats substring; first match wins (sheets_core.py:47-59)") {
    import spark.implicits._
    val df = Seq((1, 2, 3, 4)).toDF("Name", "customer_name", "name_first", "other")
    assert(Sources.resolveColumn(df, " name ") == Some("Name"))
    assert(Sources.resolveColumn(df, "customer") == Some("customer_name"))
    assert(Sources.resolveColumn(df, "nope") == None)
    // substring fallback: first column containing the target
    assert(Sources.resolveColumn(df, "ame_f") == Some("name_first"))
  }

  test("loadFromFile: csv sniff → sanitize → land; junk extension swallowed (db_core.py:74-117)") {
    val dir = tmp()
    writeCsvFile(s"$dir/in.csv", Seq("Bad Col!;9name", "1;x", "2;y"))
    assert(Sources.loadFromFile(spark, s"$dir/in.csv", s"$dir/out", "replace"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.columns.toSeq == Seq("Bad_Col", "col_9name"))
    assert(back.count() == 2)
    // unsupported extension: logged and swallowed, not thrown
    assert(!Sources.loadFromFile(spark, s"$dir/in.txt", s"$dir/out2", "replace"))
  }

  test("load error asymmetry: loadFromFile swallows what loadDataFrame raises " +
      "(db_core.py:116-117 vs db_core.py:366-367)") {
    import spark.implicits._
    // The reference's two load entry points handle the SAME failure
    // differently: the file path wraps everything in try/except-log
    // (db_core.py:116-117) and falls through; the DataFrame path
    // re-raises (db_core.py:366-367). Pin both sides against one
    // identical failure — behavior="fail" (ErrorIfExists) on a target
    // that already has data.
    val dir = tmp()
    writeCsvFile(s"$dir/in.csv", Seq("k,v", "1,x"))
    assert(Sources.loadFromFile(spark, s"$dir/in.csv", s"$dir/out", "replace"))
    val df = Seq((1, "x")).toDF("k", "v")
    intercept[Exception] { // DF path: the write failure propagates
      graft.sinks.Sinks.loadDataFrame(df, s"$dir/out", "fail")
    }
    // File path: the SAME ErrorIfExists failure is logged-and-swallowed
    assert(!Sources.loadFromFile(spark, s"$dir/in.csv", s"$dir/out", "fail"))
    // and the original landed data is untouched by either attempt
    assert(spark.read.parquet(s"$dir/out").count() == 1)
  }

  test("loadBatch loads a manifest and skips missing files (db_core.py:137-185)") {
    val dir = tmp()
    writeCsvFile(s"$dir/a.csv", Seq("k,v", "1,x"))
    val res = Sources.loadBatch(spark,
      Map(s"$dir/a.csv" -> s"$dir/ta", s"$dir/missing.csv" -> s"$dir/tb"))
    assert(res(s"$dir/a.csv"))
    assert(!res(s"$dir/missing.csv"))
    assert(spark.read.parquet(s"$dir/ta").count() == 1)
  }
}
