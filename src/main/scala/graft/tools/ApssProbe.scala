package graft.tools

import org.apache.spark.sql.functions._

/** APSS scale probe (r11 verdict stretch ask): evidence that the
  * prefix-filter + representative-per-distinct-text discipline holds
  * under replicated duplicate mass. For a given fixture dir, reports:
  *
  *  - corpus rows vs distinct-text representatives (the duplicate mass)
  *  - postings / prefix-postings row counts (the indexed fraction)
  *  - CANDIDATE pair count after the prefix join (the number the
  *    pruning bound controls — under pure replication it must stay at
  *    the sf0.1 level, because replicas collapse into identity classes
  *    before the quadratic stages)
  *  - the UNPRUNED candidate bound Σ_t C(df_rep(t), 2) a full posting
  *    self-join would enumerate over the same representatives
  *  - output pair count and end-to-end wall of the registered
  *    x_dedup_apss shape (forced via count, output is corpus-sized
  *    under replication by definition: every qualifying representative
  *    pair fans out to all cross/intra copies)
  *
  * Usage: tools/run.sh graft.tools.ApssProbe [sfDir] */
object ApssProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10")
    val spark = graft.engine.Engine.session(
      "graft-apss-probe", Some("local[32]"), 32)
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[apss] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.engine.Engine.table(spark, dir, "documents")
    println("[apss] corpus rows: " + docs.count())
    val (w, _, prefix, classes) = tm("apssPostings (setup)") {
      graft.ext.DedupOps.apssPostings(
        docs, "doc_id", "text", tNum = 3, tDen = 5, gramN = 3,
        idfScale = 1000L)
    }
    println("[apss] representatives: " +
      classes.select(col("_rid")).distinct().count())
    val wN = w.count()
    val pN = prefix.count()
    println(s"[apss] postings rows: $wN, prefix rows: $pN " +
      f"(${100.0 * pN / wN}%.1f%% indexed)")
    val cand = tm("candidate join") {
      val full = w.select(col("_t"), col("_id").as("_fid"))
      prefix.join(full, Seq("_t"))
        .filter(col("_pid") =!= col("_fid"))
        .select(least(col("_pid"), col("_fid")).as("_a"),
          greatest(col("_pid"), col("_fid")).as("_b"))
        .distinct().count()
    }
    println("[apss] PRUNED candidate pairs (one-sided witness): " + cand)
    val cand2 = tm("candidate join (dual witness)") {
      val full = w.select(col("_t"), col("_id").as("_fid"))
      prefix.join(full, Seq("_t"))
        .filter(col("_pid") =!= col("_fid"))
        .select(least(col("_pid"), col("_fid")).as("_a"),
          greatest(col("_pid"), col("_fid")).as("_b"),
          (col("_pid") < col("_fid")).as("_wlo"))
        .groupBy(col("_a"), col("_b"))
        .agg(max(col("_wlo")).as("_hasLo"),
          min(col("_wlo")).as("_notHi"))
        .filter(col("_hasLo") && !col("_notHi"))
        .count()
    }
    println("[apss] PRUNED candidate pairs (dual witness): " + cand2)
    val unpruned = w.groupBy(col("_t")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)
    println("[apss] unpruned bound Sigma C(df_rep,2): " + unpruned)
    val out = tm("full x_dedup_apss shape (count-forced)") {
      graft.ext.DedupOps.allPairsCosine(docs, "doc_id", "text",
        tNum = 3, tDen = 5, gramN = 3).count()
    }
    println("[apss] output pairs: " + out)
    spark.stop()
  }
}
