package graft

import org.apache.spark.sql.functions._

/** The HOF-dot-product optimizer rule: fires on the exact idiom, leaves
  * everything else alone, preserves results bit-for-bit. */
class RewriteRuleSpec extends SparkSpec {

  private def hofDot(a: String, b: String) =
    aggregate(
      zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("rewrites aggregate(zip_with(*,+)) into graft_dot") {
    // parquet-backed source: a literal Seq would be constant-folded into a
    // LocalRelation before the plan can be inspected
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val q = emb.select(hofDot("embedding", "embedding").as("dot"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    val viaScala = emb.select("embedding").collect()(0).getSeq[Float](0)
      .map(_.toDouble).foldLeft(0.0)((acc, x) => acc + x * x)
    assert(q.collect()(0).getDouble(0) == viaScala)
  }

  test("rewritten idiom equals the native dot on fixture embeddings") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .limit(50)
    val viaIdiom = emb.select(col("vec_id"),
        hofDot("embedding", "embedding").as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    val viaNative = emb.select(col("vec_id"),
        graft.ext.SimilarityOps.dot(col("embedding"), col("embedding"))
          .as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    assert(viaIdiom.toSeq == viaNative.toSeq)
  }

  test("does NOT fire on a different seed or non-product combine") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
    val seeded = df.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, x) => acc + x).as("v"))
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(seeded.collect()(0).getDouble(0) == 1.0 + 3.0 + 8.0)
    val sum = df.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") + y.cast("double")),
      lit(0.0), (acc, x) => acc + x).as("v"))
    assert(!sum.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("null and length-mismatch semantics survive the rewrite") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 2f), Seq(3f)),          // length mismatch → null
      (Seq(1f, 2f), null)              // null array → null
    ).toDF("a", "b")
    val out = df.select(hofDot("a", "b").as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
