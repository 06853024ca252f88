package graft

import org.apache.spark.sql.functions._
import graft.transform.Synth

/** W7 empirical synthesizer: schema fidelity, marginal plausibility,
  * determinism. */
class SynthSpec extends SparkSpec {

  private lazy val cust =
    graft.engine.Engine.table(spark, fixtureDir, "customer")

  test("sample matches the source schema and row count") {
    val s = Synth.sample(cust, 500)
    assert(s.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      cust.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(s.count() == 500)
  }

  test("numeric marginals stay within the observed range") {
    val s = Synth.sample(cust, 500)
    val bounds = cust.agg(min("c_acctbal"), max("c_acctbal")).collect()(0)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val out = s.agg(min("c_acctbal"), max("c_acctbal")).collect()(0)
    assert(out.getDouble(0) >= lo - 1e-6 && out.getDouble(1) <= hi + 1e-6)
  }

  test("categorical values are drawn from observed values, roughly in proportion") {
    val observed = cust.select("c_mktsegment").distinct()
      .collect().map(_.getString(0)).toSet
    val s = Synth.sample(cust, 2000)
    val sampled = s.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet.subsetOf(observed))
    // every observed segment (5 roughly-equal ones) should appear
    assert(sampled.keySet == observed)
    sampled.values.foreach(c => assert(c > 100, s"skewed draw: $sampled"))
  }

  test("same seed → identical sample; different seed → different") {
    val a = Synth.sample(cust, 100, seed = 7).collect().map(_.toSeq).toSeq
    val b = Synth.sample(cust, 100, seed = 7).collect().map(_.toSeq).toSeq
    val c = Synth.sample(cust, 100, seed = 8).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a != c)
  }

  test("timestamp columns synthesize within the observed span") {
    val orders = graft.engine.Engine.table(spark, fixtureDir, "orders")
    val s = Synth.sample(orders, 300)
    val src = orders.agg(min("o_orderdate"), max("o_orderdate")).collect()(0)
    val out = s.agg(min("o_orderdate"), max("o_orderdate")).collect()(0)
    assert(!out.isNullAt(0) && !out.isNullAt(1))
    // fixture generations flip between TIMESTAMP and TIMESTAMP_NTZ
    // parquet types; compare on epoch millis either way
    def ms(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i) match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case o => fail(s"unexpected timestamp class: ${o.getClass}")
    }
    assert(ms(out, 0) >= ms(src, 0))
    assert(ms(out, 1) <= ms(src, 1))
  }
}
