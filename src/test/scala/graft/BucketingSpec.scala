package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing
import graft.transform.Skew

/** Bucketed co-located joins (no Exchange) + salted aggregation parity. */
class BucketingSpec extends SparkSpec {

  test("joining two same-bucketed tables plans WITHOUT a shuffle") {
    val orders = graft.engine.Engine.table(spark, fixtureDir, "orders")
    val customer = graft.engine.Engine.table(spark, fixtureDir, "customer")
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_custkey", "custkey"),
      "b_orders", "custkey", 8)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "custkey"),
      "b_customer", "custkey", 8)
    // disable size-based broadcast so the plan shows the sort-merge path
    // a large-×-large join would take — THAT is where bucketing removes
    // the shuffle (a broadcast join would hide it at fixture scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer",
        "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness vs the plain (shuffled) join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == expected)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals the plain aggregation bit-for-bit") {
    val li = graft.engine.Engine.table(spark, fixtureDir, "lineitem")
    val salted = Skew.saltedSumCount(li, "l_returnflag", "l_quantity")
      .orderBy("l_returnflag").collect().map(_.toSeq)
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")
          .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("sum_l_quantity"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals the plain join on a hot-key distribution") {
    import spark.implicits._
    // 90% of left rows share one hot key — the within-key skew AQE's
    // per-partition splitting cannot break.
    val left = spark.range(2000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("lv"))
    val right = Seq((7L, "hot"), (0L, "zero"), (10L, "ten"), (999L, "x"))
      .toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length && salted.toSeq == plain.toSeq)
  }
}
