package graft

import org.apache.spark.sql.functions._
import graft.sinks.Sinks
import graft.sources.Sources

/** JDBC round-trip against embedded Derby (in-JVM, zero egress — Spark
  * ships the Derby jars and a DerbyDialect). Covers the reference's
  * result-store contract: `fail|replace|append` load behaviors plus
  * read-back fidelity. */
class JdbcSpec extends SparkSpec {

  private val dbDir = s"/tmp/graft_derby_${System.nanoTime()}"
  private val url = s"jdbc:derby:$dbDir;create=true"

  test("writeJdbc replace → readJdbc round-trips values") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", -3.25), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    assert(Sinks.writeJdbc(df, url, "t_roundtrip", "replace"))
    val back = Sources.readJdbc(spark, url, "t_roundtrip")
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "alpha", 10.5), (2L, "beta", -3.25),
        (3L, "gamma", 0.0)))
  }

  test("append adds rows; replace drops and recreates") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "tag")
    val b = Seq((2L, "y")).toDF("id", "tag")
    Sinks.writeJdbc(a, url, "t_modes", "replace")
    Sinks.writeJdbc(b, url, "t_modes", "append")
    assert(Sources.readJdbc(spark, url, "t_modes").count() == 2)
    Sinks.writeJdbc(b, url, "t_modes", "replace")
    assert(Sources.readJdbc(spark, url, "t_modes").count() == 1)
  }

  test("fail behavior raises when the table exists") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "tag")
    Sinks.writeJdbc(df, url, "t_fail", "replace")
    intercept[Exception] { Sinks.writeJdbc(df, url, "t_fail", "fail") }
  }

  test("empty frame skips the write (guard), like the file sinks") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "tag")
    assert(!Sinks.writeJdbc(empty, url, "t_never_created", "replace"))
    intercept[Exception] {
      Sources.readJdbc(spark, url, "t_never_created").collect()
    }
  }

  test("equality filter is pushed into the remote query") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "tag")
    Sinks.writeJdbc(df, url, "t_push", "replace")
    val q = Sources.readJdbc(spark, url, "t_push").filter(col("id") === 7L)
    // JDBCRelation reports pushed filters in the executed plan string.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed filter in JDBC scan:\n$plan")
    assert(q.collect().map(_.getString(1)).toSeq == Seq("n7"))
  }
}
