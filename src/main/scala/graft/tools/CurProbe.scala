package graft.tools

import org.apache.spark.sql.functions._

/** Stage-timing probe for the composed curation pipeline (outlier
  * triage at sf1/sf10 — the x_curation query is the recorded
  * artifact; this decomposes its wall time by stage so scale work
  * lands where the seconds are):
  * `tools/run.sh graft.tools.CurProbe [sfDir]`.
  * Stages mirror xCuration's construction: model training (NB, LM,
  * benchmark grams), the ONE materialized wide gate pass, the two
  * dedup keep lists over the survivors, and the final disposition
  * count. Each timed behind the previous stage's materialization, so
  * a stage's number is ITS OWN cost, not its lineage replay. */
object CurProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Engine.session(
      "graft-cur-probe", Some("local[32]"), 32)
    import graft.jobs.CurationJob
    import graft.ext.{DedupOps, TextOps}
    import graft.transform.Checks
    val eng = graft.engine.Engine
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[cur-probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val base = d.select(col("doc_id"), col("text"), col("n_chars"))
    val corpus = base.unionAll(base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"),
        col("n_chars")))
    val nb = timed("nb_train")(TextOps.nbTrainHashed(d, "text",
      col("lang") === "en"))
    val lm = timed("lm_train")(TextOps.lmTrainHashed(
      d.filter(col("source") === "src0"), "text"))
    val grams = timed("bench_grams")(DedupOps.benchmarkGramHashes(
      d.filter(col("doc_id") >= 10 && col("doc_id") < 20), "text"))
    val cfg = CurationJob.Config(
      idCol = "doc_id", textCol = "text",
      rules = Seq(Checks.inRange("n_chars", 60.0, 100000.0)),
      allowedLangs = Seq("en"),
      maxDupTokenFrac = 0.65, maxTopBigramFrac = 0.06,
      exactDedup = true, nearDupThreshold = 0.8,
      benchGramHashes = grams, nbModel = Some(nb), lmModel = Some(lm),
      maxMeanNll = 3.65)
    val flagCols = Seq("_quar", "_badlang", "_rep", "_contam",
      "_lowq", "_influent")
    val pre = timed("narrow_gate_pass")(eng.materialize(
      CurationJob.gateFrame(corpus, cfg)
        .select(col("doc_id") +: TextOps.fingerprint(col("text"))
          .as("_fp") +: flagCols.map(col): _*)))
    val s4n = pre.filter(!col("_quar") && !col("_badlang") && !col("_rep"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col("doc_id"))
    val exKeep = timed("exact_keep_fp_grain")(eng.materialize(
      s4n.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).select(col("doc_id").as("_ekid"))))
    val pop = timed("pop_semi_join")(eng.materialize(
      corpus.select(col("doc_id"), col("text"))
        .join(broadcast(exKeep.select(col("_ekid").as("doc_id"))),
          Seq("doc_id"), "left_semi")))
    val nearKeep = timed("near_keep_list")(eng.materialize(
      DedupOps.dedupeNearMinhashDistinct(pop, "doc_id", "text",
          threshold = 0.8)
        .select(col("doc_id").as("_nkid"))))
    System.err.println(s"[cur-probe] keeps: exact=${exKeep.count()} " +
      s"near=${nearKeep.count()}")
    val disp = timed("full_disposition")(
      CurationJob.disposition(corpus, cfg)
        .groupBy(col("status")).agg(count(lit(1))).collect().toSeq)
    System.err.println(s"[cur-probe] disposition: $disp")
    spark.stop()
  }
}
