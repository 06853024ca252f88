package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.Dml

/** K10 UPDATE/DELETE semantics (native twin of `db_core.py:187-200`). */
class DmlSpec extends SparkSpec {

  test("update rewrites matching rows and reports the affected count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0))
      .toDF("k", "tag", "amt").write.parquet(dir)
    val n = Dml.update(spark, dir,
      Map("amt" -> (col("amt") * 2)), col("tag") === "a")
    assert(n == 2)
    val back = spark.read.parquet(dir).orderBy("k").collect()
    assert(back.map(_.getDouble(2)).toSeq == Seq(20.0, 20.0, 60.0))
  }

  test("delete removes matching rows; null predicate rows survive") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    Seq((1, Some("x")), (2, None), (3, Some("drop")))
      .toDF("k", "tag").write.parquet(dir)
    val n = Dml.delete(spark, dir, col("tag") === "drop")
    assert(n == 1)
    assert(spark.read.parquet(dir).select("k").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  private def partFiles(dir: String, part: String): Map[String, Long] = {
    val d = new java.io.File(s"$dir/$part")
    d.listFiles().filter(_.isFile).filterNot(_.getName.startsWith("_"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("partition-bounded update rewrites only the touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    graft.sinks.Sinks.writeParquet(
      Seq(("d1", 1L, 10.0), ("d1", 2L, 20.0), ("d2", 3L, 30.0),
        ("d3", 4L, 40.0)).toDF("day", "id", "v"),
      dir, partitionBy = Seq("day"))
    val before = partFiles(dir, "day=d3")
    val n = Dml.updatePartitioned(spark, dir, "day",
      Map("v" -> (col("v") + 1)), col("id") <= 3)
    assert(n == 3)
    val back = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("v")))
    assert(back.toSeq == Seq((1L, 11.0), (2L, 21.0), (3L, 31.0),
      (4L, 40.0)))
    // d3 held no affected rows: its files must be byte-for-byte untouched.
    assert(partFiles(dir, "day=d3") == before, "untouched partition rewritten")
  }

  test("partition-bounded DML handles null partition values and rejects partition-column assignment") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    graft.sinks.Sinks.writeParquet(
      Seq((Some("d1"), 1L, 1.0), (None, 2L, 2.0), (None, 3L, 3.0))
        .toDF("day", "id", "v"),
      dir, partitionBy = Seq("day"))
    // rows in the null partition live under day=__HIVE_DEFAULT_PARTITION__
    val n = Dml.updatePartitioned(spark, dir, "day",
      Map("v" -> (col("v") * 10)), col("id") === 2L)
    assert(n == 1)
    val back = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("v")))
    assert(back.toSeq == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
    // reassigning the partition column must refuse loudly, not silently
    // drop the assignment
    intercept[IllegalArgumentException] {
      Dml.updatePartitioned(spark, dir, "day",
        Map("day" -> lit("d9")), col("id") === 1L)
    }
  }

  test("partition-bounded DML round-trips two-level partitioning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    graft.sinks.Sinks.writeParquet(
      Seq(("d1", "us", 1L, 1.0), ("d1", "eu", 2L, 2.0),
        ("d2", "us", 3L, 3.0)).toDF("day", "region", "id", "v"),
      dir, partitionBy = Seq("day", "region"))
    val n = Dml.updatePartitioned(spark, dir, "day",
      Map("v" -> (col("v") + 100)), col("id") === 2L)
    assert(n == 1)
    val back = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("v"),
        r.getAs[String]("day"), r.getAs[String]("region")))
    assert(back.toSeq == Seq((1L, 1.0, "d1", "us"),
      (2L, 102.0, "d1", "eu"), (3L, 3.0, "d2", "us")))
  }

  test("assignment to a non-declared partition LEVEL is refused, not erased") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    graft.sinks.Sinks.writeParquet(
      Seq(("d1", "us", 1L), ("d1", "eu", 2L)).toDF("day", "region", "id"),
      dir, partitionBy = Seq("day", "region"))
    // caller declares 'day' but assigns 'region' — the drop of directory
    // columns would silently erase the assignment; must refuse loudly
    intercept[IllegalArgumentException] {
      Dml.updatePartitioned(spark, dir, "day",
        Map("region" -> lit("apac")), col("id") === 2L)
    }
  }

  test("'=' in an ancestor directory is not mistaken for a partition level") {
    import spark.implicits._
    // table root itself lives under .../exp=baseline/ and the DATA has a
    // column named 'exp' — it must survive partition-bounded DML
    val dir = Files.createTempDirectory("graft-dml")
      .toString + "/exp=baseline/t"
    graft.sinks.Sinks.writeParquet(
      Seq(("d1", "a", 1L), ("d2", "b", 2L)).toDF("day", "exp", "id"),
      dir, partitionBy = Seq("day"))
    val n = Dml.deletePartitioned(spark, dir, "day", col("id") === 1L)
    assert(n == 1)
    val back = spark.read.parquet(dir).collect()
    assert(back.length == 1)
    assert(back.head.getAs[String]("exp") == "b") // column not dropped
  }

  test("partition-bounded delete drops rows only in touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    graft.sinks.Sinks.writeParquet(
      Seq(("d1", 1L), ("d1", 2L), ("d2", 3L)).toDF("day", "id"),
      dir, partitionBy = Seq("day"))
    val before = partFiles(dir, "day=d2")
    val n = Dml.deletePartitioned(spark, dir, "day", col("id") === 1L)
    assert(n == 1)
    assert(spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(partFiles(dir, "day=d2") == before)
  }
}
