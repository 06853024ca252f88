package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-cost triage for curriculumStages (r17): price the
  * tf/vocab-join difficulty pass and the two-pass contiguous ranking
  * separately. `tools/run.sh graft.tools.CurrProbe /tmp/sf10` */
object CurrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Engine.session(
      "graft-curr-probe", Some("local[32]"), 32)
    import spark.implicits._
    def noop(df: DataFrame, label: String): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val docs = graft.engine.Engine.table(spark, dir, "documents")
    val tf = graft.engine.Engine.spread(docs)
      .select($"doc_id".as("_id"),
        explode(graft.ext.TextOps.tokens($"text")).as("_term"))
      .groupBy($"_id", $"_term").agg(count(lit(1)).as("_tf"))
    noop(tf, "tf agg")
    val cnt = tf.groupBy($"_term").agg(sum($"_tf").as("_c"))
    val dfx = tf.join(cnt, Seq("_term"))
      .groupBy($"_id")
      .agg(sum($"_tf" * floor(lit(1073741824.0) /
        $"_c".cast("double")).cast("long")).as("_fx"))
    noop(dfx, "difficulty (tf + cnt join + agg)")
    val alld = docs.select($"doc_id")
      .join(dfx, $"doc_id" === $"_id", "left")
      .select($"doc_id", coalesce($"_fx", lit(0L)).as("difficulty_fx"))
    val t0 = System.nanoTime
    val ranked = graft.transform.Ids.assignContiguousIds(alld,
      struct($"difficulty_fx", $"doc_id"), "_rank")
    noop(ranked, "rank (assignContiguousIds)")
    println(f"rank incl build: ${(System.nanoTime - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
