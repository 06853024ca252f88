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
}
