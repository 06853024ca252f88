package graft.tools

import org.apache.spark.sql.functions.col

/** Decompose the ANN index build + search cost at a given sf dir:
  * `tools/run.sh graft.tools.AnnProbe [sfDir]`. Times sampleVectors,
  * the encode projection, the persisted write, the load, and the
  * ivfTopKSampledWithIndex search separately — outlier triage for the
  * x_sim_* family. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Engine.session(
      "graft-ann-probe", Some("local[32]"), 32)
    val emb = graft.sources.Sources.readParquet(spark, s"$dir/embeddings.parquet")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val st = time("build(state incl. encode plan)") {
      graft.ext.SimilarityOps.buildAnnIndexState(
        emb, "vec_id", "embedding", dim = 64)
    }
    time("encode.count")(println("  codes rows: " + st.codes.count()))
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-ann-probe").toString
    // replicate loadOrTrain's train branch step by step
    import spark.implicits._
    val stT = time("  train: buildAnnIndexState") {
      graft.ext.SimilarityOps.buildAnnIndexState(
        emb, "vec_id", "embedding", 64)
    }
    val quant =
      stT.cents.zipWithIndex.map { case (v, i) => ("centroid", i, v) } ++
        stT.cws.zipWithIndex.map { case (v, i) => ("codeword", i, v) }
    time("  train: quantizer write") {
      quant.toDF("role", "pos", "vec")
        .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/q2")
    }
    time("  train: codes write") {
      stT.codes.write.mode("overwrite").parquet(s"$stateDir/c2")
    }
    val st2 = time("loadOrTrain#1 (train+write)") {
      graft.jobs.AnnIndexJob.loadOrTrain(spark, emb, stateDir,
        "vec_id", "embedding", dim = 64)._1
    }
    val st3 = time("loadOrTrain#2 (load)") {
      graft.jobs.AnnIndexJob.loadOrTrain(spark, emb, stateDir,
        "vec_id", "embedding", dim = 64)._1
    }
    (1 to 3).foreach { i =>
      time(s"search ivfTopKSampledWithIndex run$i") {
        graft.ext.SimilarityOps.ivfTopKSampledWithIndex(
          emb.filter(col("vec_id") < 10), emb, st3,
          "vec_id", "embedding", k = 5, nProbe = 4).count()
      }
    }
    spark.stop()
  }
}
