package graft.tools
import org.apache.spark.sql.functions._
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.engine.Engine.session("graft-gate-probe", Some("local[32]"), 32)
    import graft.jobs.CurationJob
    import graft.ext.{DedupOps, TextOps}
    import graft.transform.Checks
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[gate-probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val base = d.select(col("doc_id"), col("text"), col("n_chars"))
    val corpus = base.unionAll(base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"), col("n_chars")))
    val nb = TextOps.nbTrainHashed(d, "text", col("lang") === "en")
    val lm = TextOps.lmTrainHashed(d.filter(col("source") === "src0"), "text")
    val grams = DedupOps.benchmarkGramHashes(d.filter(col("doc_id") >= 10 && col("doc_id") < 20), "text")
    val cfg = CurationJob.Config(idCol="doc_id", textCol="text",
      rules=Seq(Checks.inRange("n_chars", 60.0, 100000.0)), allowedLangs=Seq("en"),
      maxDupTokenFrac=0.65, maxTopBigramFrac=0.06, exactDedup=true, nearDupThreshold=0.8,
      benchGramHashes=grams, nbModel=Some(nb), lmModel=Some(lm), maxMeanNll=3.65)
    val g = CurationJob.gateFrame(corpus, cfg)
    timed("gate_compute_only (count)") {
      g.select(col("_quar"), col("_badlang"), col("_rep"), col("_contam"), col("_lowq"), col("_influent"))
        .groupBy().agg(count(when(col("_rep"), 1)), count(when(col("_lowq"), 1))).collect()
    }
    val narrow = g.select(col("doc_id"), TextOps.fingerprint(col("text")).as("_fp"),
      col("_quar"), col("_badlang"), col("_rep"), col("_contam"), col("_lowq"), col("_influent"))
    timed("narrow_count_force") {
      narrow.groupBy().agg(count(col("_fp")), count(when(col("_rep"), 1))).collect()
    }
    for (f <- Seq("_quar", "_badlang", "_rep", "_contam", "_lowq", "_influent"))
      timed(s"flag_$f") {
        g.groupBy().agg(count(when(col(f), 1))).collect()
      }
    timed("all_six_flags_agg") {
      g.groupBy().agg(count(when(col("_quar"),1)), count(when(col("_badlang"),1)),
        count(when(col("_rep"),1)), count(when(col("_contam"),1)),
        count(when(col("_lowq"),1)), count(when(col("_influent"),1))).collect()
    }
    spark.stop()
  }
}
