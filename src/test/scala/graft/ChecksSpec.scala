package graft

import graft.transform.Checks

/** Data-quality gate semantics: violation counts per rule, one-pass
  * row-local evaluation, uniqueness as excess-row count. */
class ChecksSpec extends SparkSpec {

  private def frame() = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),    // range + non_negative violation
      (3L, None, "bad value"),   // null + regex violation
      (3L, Some(999.0), "ok"),   // duplicate id + range violation
      (4L, Some(50.0), "weird")  // one_of + regex violation
    ).toDF("id", "v", "status")
  }

  test("row-local rules count violations correctly in one pass") {
    val report = Checks.check(frame(),
      Seq(Checks.notNull("v"),
        Checks.inRange("v", 0.0, 100.0),
        Checks.oneOf("status", Seq("ok", "bad value")),
        Checks.matches("status", "^(ok|weird)$"),
        Checks.nonNegative("v")),
      uniqueCols = Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(report(("not_null", "v")) == ((1L, false)))
    assert(report(("in_range", "v")) == ((2L, false))) // -5 and 999
    assert(report(("one_of", "status")) == ((1L, false))) // weird
    assert(report(("matches", "status")) == ((1L, false))) // bad value
    assert(report(("non_negative", "v")) == ((1L, false)))
    assert(report(("unique", "id")) == ((1L, false))) // one excess row
    assert(report.size == 6)
  }

  test("clean data passes every rule; unique col with no dupes passes") {
    import spark.implicits._
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val report = Checks.check(clean,
      Seq(Checks.notNull("v"), Checks.nonNegative("v")),
      uniqueCols = Seq("id")).collect()
    assert(report.length == 3)
    assert(report.forall(_.getBoolean(3)))
    assert(report.forall(_.getLong(2) == 0L))
  }

  test("row-local rules compile to a single aggregation (one scan)") {
    import spark.implicits._
    val df = frame()
    val rules = Seq(Checks.notNull("v"), Checks.inRange("v", 0, 100),
      Checks.nonNegative("v"))
    // The one-pass contract is structural: all rules fold into one agg()
    // call over the input — probe via the logical plan of that agg.
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.functions.count_if(r.violated).as(s"_v$i")
    }
    val plan = df.agg(aggs.head, aggs.tail: _*)
      .queryExecution.optimizedPlan.toString
    assert("Aggregate".r.findAllIn(plan).length == 1, plan)
  }

  test("empty rule list with no unique cols yields an empty report") {
    assert(Checks.check(frame(), Nil).isEmpty)
  }

  test("flagRows marks each violating rule per row; clean rows get an empty array") {
    import spark.implicits._
    val df = Seq((1, "ok"), (-5, null.asInstanceOf[String]), (200, "ok"))
      .toDF("qty", "status")
    val flagged = Checks.flagRows(df,
      Seq(Checks.nonNegative("qty"), Checks.inRange("qty", 0, 100),
        Checks.notNull("status")))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](2).toSet).toMap
    assert(flagged(1) == Set.empty)
    assert(flagged(-5) == Set("non_negative:qty", "in_range:qty",
      "not_null:status"))
    assert(flagged(200) == Set("in_range:qty"))
  }

  test("flagRows is a stateless projection usable on a stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Int]
    val q = Checks.flagRows(stream.toDF().toDF("qty"),
        Seq(Checks.nonNegative("qty")))
      .writeStream.format("memory").queryName("flags")
      .outputMode("append").start()
    stream.addData(1, -2, 3)
    q.processAllAvailable(); q.stop()
    val bad = spark.sql("SELECT qty FROM flags WHERE size(violations) > 0")
      .collect().map(_.getInt(0)).toSeq
    assert(bad == Seq(-2))
  }

  test("hostile rule/column names survive the melt (no SQL-literal parsing)") {
    import spark.implicits._
    val hostile = "a'b\\c\td"
    val df = Seq(Some(1), None).toDF(hostile)
    val report = Checks.check(df, Seq(Checks.notNull(hostile))).collect()
    assert(report.length == 1)
    assert(report(0).getString(1) == hostile)
    assert(report(0).getLong(2) == 1L)
  }
}
