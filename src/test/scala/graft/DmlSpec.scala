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
    // Crash-leftover swap siblings are DOT-PREFIXED so partition
    // discovery never parses them as a partition value: a leftover
    // old-dir full of pre-update data must be invisible to readers
    // (the un-prefixed form read back as day='d1._dml_old' — silent
    // row duplication).
    val leftover = new java.io.File(dir, ".day=d1._dml_old")
    assert(leftover.mkdir())
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "day=d1")
        .toFile.listFiles().filter(_.getName.endsWith(".parquet"))
        .head.toPath,
      java.nio.file.Paths.get(leftover.toString, "part-junk.parquet"))
    assert(spark.read.parquet(dir).count() == 4,
      "hidden swap leftover leaked into the read")
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

  private def flatFiles(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.isFile)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("file-granular update on a curve-clustered table rewrites only " +
    "files containing matches; the rest carry forward by reference") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    // 4k rows over a 64x64 key grid, curve-clustered into 16 files —
    // every file's footer extents are curve-range-bounded, so a
    // selective 2-D box predicate lands in few files.
    val rows = (0 until 4096).map { i =>
      (i.toLong, (i % 64).toLong, (i / 64).toLong, 1.0)
    }.toDF("id", "x", "y", "amt")
    graft.ext.LayoutOps.writeCurveClustered(rows, "x", "y",
      bits = 6, nFiles = 16, path = dir)
    val before = flatFiles(dir)
    assert(before.size == 16)
    val boxCond = col("x") < 8 && col("y") < 8
    val st = Dml.updateWithStats(spark, dir,
      Map("amt" -> lit(9.0)), boxCond)
    assert(st.affected == 64)
    assert(st.filesTotal == 16)
    assert(st.filesRewritten < 16 && st.filesRewritten >= 1)
    assert(st.filesKept == 16 - st.filesRewritten && st.filesKept > 0)
    // kept files are byte-identical carries (same name, same mtime —
    // hardlinks of the originals), not rewrites
    val after = flatFiles(dir)
    val carried = after.keySet.intersect(before.keySet)
    assert(carried.size == st.filesKept)
    carried.foreach(k => assert(after(k) == before(k)))
    // correctness: exactly the box got the new amount
    val back = spark.read.parquet(dir)
    assert(back.filter(col("amt") === 9.0).count() == 64)
    assert(back.filter(boxCond && col("amt") =!= 9.0).count() == 0)
    assert(back.count() == 4096)
  }

  test("file-granular delete: no-match is a zero-cost no-op; " +
    "matches drop with untouched files carried") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    val rows = (0 until 1024).map { i =>
      (i.toLong, (i % 32).toLong, (i / 32).toLong)
    }.toDF("id", "x", "y")
    graft.ext.LayoutOps.writeCurveClustered(rows, "x", "y",
      bits = 5, nFiles = 8, path = dir)
    val before = flatFiles(dir)
    val miss = Dml.deleteWithStats(spark, dir, col("x") === 999L)
    assert(miss == Dml.DmlFileStats(0L, 8, 0, 8))
    assert(flatFiles(dir) == before) // untouched — no swap at all
    val st = Dml.deleteWithStats(spark, dir,
      col("x") < 4 && col("y") < 4)
    assert(st.affected == 16 && st.filesKept > 0)
    assert(spark.read.parquet(dir).count() == 1024 - 16)
    assert(spark.read.parquet(dir)
      .filter(col("x") < 4 && col("y") < 4).count() == 0)
  }

  test("file groups INSIDE partitions: update matching one file of one " +
    "partition rewrites exactly that file, siblings carry " +
    "byte-identical, other partitions untouched; partition-column " +
    "reassignment still refused") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    // two partitions x 8 id-clustered files each, written one file at
    // a time so every file's id extent is exact and disjoint: id=100
    // can live in exactly one file of day=d1
    val rows = (0 until 1024).map { i =>
      (if (i < 512) "d1" else "d2", i.toLong, 1.0)
    }.toDF("day", "id", "v")
    for (d <- Seq("d1", "d2"); f <- 0 until 8) {
      val lo = (if (d == "d1") 0 else 512) + f * 64
      rows.filter(col("id") >= lo && col("id") < lo + 64)
        .select("id", "v")
        .coalesce(1).write.mode("append").parquet(s"$dir/day=$d")
    }
    // data files only: the append-per-file fixture also leaves .crc
    // sidecars the DML path neither counts nor carries
    def dataFiles(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/$part")
      d.listFiles().filter(_.isFile)
        .filterNot(f => f.getName.startsWith("_") ||
          f.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val d1Before = dataFiles("day=d1")
    val d2Before = dataFiles("day=d2")
    assert(d1Before.size == 8, s"fixture: 8 files, got ${d1Before.size}")
    val st = Dml.updatePartitionedWithStats(spark, dir, "day",
      Map("v" -> lit(7.0)), col("id") === 100L)
    assert(st.affected == 1L)
    assert(st.filesRewritten == 1,
      s"exactly one file rewritten, got $st")
    assert(st.filesTotal == d1Before.size,
      "only the touched partition is listed/counted")
    assert(st.filesKept == d1Before.size - 1)
    // siblings inside day=d1 carry byte-identical (hardlinked: same
    // name, same mtime); day=d2 is never read nor written
    val d1After = dataFiles("day=d1")
    val carried = d1After.keySet.intersect(d1Before.keySet)
    assert(carried.size == st.filesKept)
    carried.foreach(k => assert(d1After(k) == d1Before(k)))
    assert(dataFiles("day=d2") == d2Before)
    // correctness
    val back = spark.read.parquet(dir)
    assert(back.filter(col("v") === 7.0).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(100L))
    assert(back.count() == 1024)
    // delete: same composition
    val st2 = Dml.deletePartitionedWithStats(spark, dir, "day",
      col("id") === 700L)
    assert(st2.affected == 1L && st2.filesRewritten == 1)
    assert(spark.read.parquet(dir).count() == 1023)
    // partition-column reassignment still refused loudly
    intercept[IllegalArgumentException] {
      Dml.updatePartitioned(spark, dir, "day",
        Map("day" -> lit("d9")), col("id") === 1L)
    }
  }

  test("schema-changing assignment falls back to whole-table rewrite " +
    "(mixed file schemas would poison later reads)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dml").toString + "/t"
    Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "v")
      .repartition(3).write.parquet(dir)
    val st = Dml.updateWithStats(spark, dir,
      Map("v" -> lit(2.5)), col("k") === 1L) // int -> double widens
    assert(st == Dml.DmlFileStats(1L, -1, -1, -1))
    val back = spark.read.parquet(dir).orderBy("k").collect()
    assert(back.map(_.getDouble(1)).toSeq == Seq(2.5, 20.0, 30.0))
  }
}
