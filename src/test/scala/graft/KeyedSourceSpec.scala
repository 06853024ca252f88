package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.keyed.KeyedStore

/** S7 — keyed-store DSv2 connector: schema round-trip, correctness vs the
  * plain reader, and REAL pushdown (asserted on the executed plan). */
class KeyedSourceSpec extends SparkSpec {

  private lazy val storePath: String = {
    val dir = Files.createTempDirectory("graft_keyed").toString + "/store"
    val cust = graft.engine.Engine.table(spark, fixtureDir, "customer")
    KeyedStore.write(cust, dir)
    dir
  }

  private def keyed(): DataFrame =
    spark.read.format("graft-keyed").load(storePath)

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("schema round-trip + full-scan parity with the json baseline") {
    val viaKeyed = keyed()
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
    assert(viaKeyed.schema == baseline.schema)
    assert(viaKeyed.count() == baseline.count())
    assert(viaKeyed.orderBy("c_custkey").collect().map(_.toSeq).toSeq ==
      baseline.orderBy("c_custkey").collect().map(_.toSeq).toSeq)
  }

  test("equality filters are pushed into the scan and evaluated correctly") {
    val q = keyed().filter(col("c_mktsegment") === "BUILDING")
    assert(scanDesc(q).contains("EqualTo(c_mktsegment,BUILDING)"))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    assert(q.count() == baseline.count())
  }

  test("non-equality predicates are NOT pushed; Spark evaluates them post-scan") {
    val q = keyed().filter(col("c_acctbal") > 0)
    assert(!scanDesc(q).contains("GreaterThan"))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .filter(col("c_acctbal") > 0)
    assert(q.count() == baseline.count())
  }

  test("limit pushdown reaches the scan") {
    val q = keyed().limit(7)
    assert(scanDesc(q).contains("pushedLimit=Some(7)"))
    assert(q.count() == 7)
  }

  test("top-N pushdown: single-key order + limit, results match full sort") {
    val q = keyed().orderBy(desc("c_acctbal")).limit(5)
      .select("c_custkey", "c_acctbal")
    assert(scanDesc(q).contains("pushedTopN=[c_acctbal DESC] LIMIT 5"))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .orderBy(desc("c_acctbal")).limit(5).select("c_custkey", "c_acctbal")
    assert(q.collect().map(_.getDouble(1)).toSeq ==
      baseline.collect().map(_.getDouble(1)).toSeq)
  }

  test("top-N pushdown: composite order (metric desc, id asc tie-break)") {
    val q = keyed().orderBy(desc("c_mktsegment"), asc("c_custkey")).limit(6)
      .select("c_custkey", "c_mktsegment")
    assert(scanDesc(q).contains(
      "pushedTopN=[c_mktsegment DESC, c_custkey ASC] LIMIT 6"), scanDesc(q))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .orderBy(desc("c_mktsegment"), asc("c_custkey")).limit(6)
      .select("c_custkey", "c_mktsegment")
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      baseline.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("top-N pushdown composes with a pushed equality filter") {
    val q = keyed().filter(col("c_mktsegment") === "BUILDING")
      .orderBy(desc("c_acctbal"), asc("c_custkey")).limit(5)
      .select("c_custkey", "c_acctbal")
    assert(scanDesc(q).contains(
      "pushedTopN=[c_acctbal DESC, c_custkey ASC] LIMIT 5"), scanDesc(q))
    assert(scanDesc(q).contains("EqualTo(c_mktsegment,BUILDING)"))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .orderBy(desc("c_acctbal"), asc("c_custkey")).limit(5)
      .select("c_custkey", "c_acctbal")
    assert(q.collect().map(_.getLong(0)).toSeq ==
      baseline.collect().map(_.getLong(0)).toSeq)
  }

  test("top-N with a non-column sort level is declined, results still right") {
    val q = keyed().orderBy(desc("c_acctbal"),
        (col("c_custkey") + 1).asc).limit(4)
      .select("c_custkey", "c_acctbal")
    assert(scanDesc(q).contains("pushedTopN=None"), scanDesc(q))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .orderBy(desc("c_acctbal"), (col("c_custkey") + 1).asc).limit(4)
      .select("c_custkey", "c_acctbal")
    assert(q.collect().map(_.getLong(0)).toSeq ==
      baseline.collect().map(_.getLong(0)).toSeq)
  }

  test("column pruning reaches the scan") {
    val q = keyed().select("c_custkey", "c_name")
    assert(scanDesc(q).contains("required=[c_custkey,c_name]"))
    assert(q.columns.toSeq == Seq("c_custkey", "c_name"))
    assert(q.count() == keyed().count())
  }

  test("DSv2 write path: append and overwrite round-trip through the store") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_keyed_w").toString + "/s"
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    a.write.format("graft-keyed").mode("append").save(dir)
    assert(spark.read.format("graft-keyed").load(dir).count() == 2)
    Seq((3L, "z")).toDF("id", "v")
      .write.format("graft-keyed").mode("append").save(dir)
    val appended = spark.read.format("graft-keyed").load(dir)
    assert(appended.count() == 3)
    Seq((9L, "only")).toDF("id", "v")
      .write.format("graft-keyed").mode("overwrite").save(dir)
    val replaced = spark.read.format("graft-keyed").load(dir).collect()
    assert(replaced.length == 1 && replaced(0).getLong(0) == 9L)
  }

  test("DSv2 write escapes JSON special characters losslessly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_keyed_e").toString + "/s"
    val tricky = "quote\" slash\\ newline\n tab\t done"
    Seq((1L, tricky)).toDF("id", "v")
      .write.format("graft-keyed").mode("append").save(dir)
    val back = spark.read.format("graft-keyed").load(dir).collect()(0)
    assert(back.getString(1) == tricky)
  }

  test("conjunctive equality filters compose (the reference's filter dict)") {
    val q = keyed().filter(col("c_mktsegment") === "BUILDING" &&
      col("c_nationkey") === 3L)
    val d = scanDesc(q)
    assert(d.contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(d.contains("EqualTo(c_nationkey,3)"))
    val baseline = graft.engine.Engine.table(spark, fixtureDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") === 3L)
    assert(q.collect().map(_.toSeq).toSet ==
      baseline.collect().map(_.toSeq).toSet)
  }
}
