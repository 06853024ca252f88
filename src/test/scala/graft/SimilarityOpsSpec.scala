package graft

import org.apache.spark.sql.functions._
import graft.ext.SimilarityOps

/** §2.10 similarity search: exact brute-force baseline + LSH recall. */
class SimilarityOpsSpec extends SparkSpec {

  test("cosine on known vectors") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 1f), Seq(1f, 0f))).toDF("a", "b")
    val out = df.select(SimilarityOps.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK: planted nearest neighbor ranks first, self excluded") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.99f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f))).toDF("id", "vec")
    val top = SimilarityOps.bruteForceTopK(
        corpus.filter(col("id") === 0), corpus, "id", "vec", 2)
      .collect()
    assert(top.length == 2)
    assert(top.map(_.getAs[Long]("neighbor_id")).toSet.contains(1L))
    val first = top.find(_.getAs[Int]("rnk") == 1).get
    assert(first.getAs[Long]("neighbor_id") == 1L)
    assert(!top.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("annTopK recall vs brute force on the embeddings fixture") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilarityOps.bruteForceTopK(queries, emb,
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val approx = SimilarityOps.annTopK(queries, emb,
        "vec_id", "embedding", 5, dim = 64, bits = 4, tables = 8)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random-uniform fixture vectors are a worst case for LSH; the planted
    // structure still yields useful recall at these (bits, tables)
    assert(recall >= 0.3, s"recall $recall too low")
  }

  test("ivfTopK recall vs brute force on the embeddings fixture") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilarityOps.bruteForceTopK(queries, emb,
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val ivf = SimilarityOps.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(ivf.size == exact.size) // full top-k emitted per query
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("ivfTopKSampled recall vs brute force; deterministic across runs") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilarityOps.bruteForceTopK(queries, emb,
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    def run() = SimilarityOps.ivfTopKSampled(queries, emb, "vec_id",
        "embedding", k = 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val ivf = run()
    assert(ivf.size == exact.size) // full top-k emitted per query
    val recall = (exact & ivf).size.toDouble / exact.size
    // sampled centroids quantize worse than k-means; probing 4/16 cells
    // of a random-uniform fixture still recovers a useful fraction
    assert(recall >= 0.3, s"recall $recall too low")
    assert(run() == ivf)
  }

  test("pqTopK: ADC ranking approximates exact L2 top-k; deterministic") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    // exact L2 reference (PQ estimates L2 distance, not cosine)
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_cv"))
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(asc("_d2"), asc("neighbor_id"))
    val exact = c.join(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (SimilarityOps.dot(col("_qv"), col("_qv"))
          - lit(2.0) * SimilarityOps.dot(col("_qv"), col("_cv"))
          + SimilarityOps.dot(col("_cv"), col("_cv"))).as("_d2"))
      .withColumn("rnk", row_number().over(exactW))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    def run() = SimilarityOps.pqTopK(queries, emb, "vec_id", "embedding",
        k = 5, dim = 64, m = 4, nCodewords = 16)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val pq = run()
    assert(pq.size == exact.size) // full top-k emitted per query
    val recall = (exact & pq).size.toDouble / exact.size
    // 16 sampled codewords per 16-dim subspace on uniform vectors is a
    // coarse code; structure still yields useful recall
    assert(recall >= 0.2, s"recall $recall too low")
    assert(run() == pq)
  }

  test("pqTopK clamps the codebook to a small corpus instead of crashing") {
    import spark.implicits._
    val tiny = Seq.tabulate(6)(i =>
      (i.toLong, Seq.tabulate(8)(j => (i + j).toFloat))).toDF("id", "vec")
    val out = SimilarityOps.pqTopK(tiny.filter(col("id") < 2), tiny,
        "id", "vec", k = 3, dim = 8, m = 2, nCodewords = 16)
      .collect()
    assert(out.nonEmpty) // 6 < 16 codewords: clamped, not IndexOOB
  }

  test("ivfPqTopK composes cell probing with PQ ranking consistently") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    def run() = SimilarityOps.ivfPqTopK(queries, emb, "vec_id",
        "embedding", k = 5, dim = 64, nCentroids = 16, nProbe = 4)
      .collect().map(r => ((r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")), r.getAs[Double]("est_d2"))).toMap
    val ivfpq = run()
    assert(ivfpq.nonEmpty)
    assert(run() == ivfpq) // deterministic
    // the ADC estimate must agree with the full-scan PQ ranking wherever
    // both consider the same (query, neighbor) pair
    val pqFull = SimilarityOps.pqTopK(queries, emb, "vec_id", "embedding",
        k = 2000, dim = 64, m = 4, nCodewords = 16)
      .collect().map(r => ((r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")), r.getAs[Double]("est_d2"))).toMap
    ivfpq.foreach { case (pair, est) =>
      assert(pqFull(pair) == est, s"ADC mismatch for $pair")
    }
  }

  test("annTopK output is deterministic across runs") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
    def run() = SimilarityOps.annTopK(q, emb, "vec_id", "embedding", 3,
      dim = 64).collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("hardNegatives: most-similar DIFFERENT-label vectors, same-label excluded") {
    import spark.implicits._
    // Query 0 (label A) is nearly parallel to 1 (label A) and 2
    // (label B), orthogonal to 3 (label B). The mining must SKIP the
    // same-label near-twin (1) and rank the different-label near-twin
    // (2) first — that is the whole point of hard negatives.
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f), "A"), (1L, Seq(0.999f, 0.01f, 0f), "A"),
      (2L, Seq(0.99f, 0.1f, 0f), "B"), (3L, Seq(0f, 1f, 0f), "B"),
      (4L, Seq(0f, 0f, 1f), "C")).toDF("id", "vec", "lab")
    val got = SimilarityOps.hardNegatives(
        corpus.filter(col("id") === 0), corpus, "id", "vec", "lab", k = 3)
      .collect().map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("neighbor_id")))
      .toMap
    assert(got == Map(1 -> 2L, 2 -> 3L, 3 -> 4L), got)
  }

  test("hardNegativesAnn recall vs exact miner on the fixture embeddings") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilarityOps.hardNegatives(queries, emb,
        "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val ann = SimilarityOps.hardNegativesAnn(queries, emb,
        "vec_id", "embedding", "label", k = 3, dim = 64,
        bits = 4, tables = 8, oversample = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    // every ANN result must be a genuinely different-label pair;
    // recall is a fixture property of the LSH tables, not a guarantee
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qs = queries.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ann.foreach { case (q, n) =>
      assert(qs(q) != labels(n), s"same-label pair leaked: $q -> $n")
    }
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN hard-negative recall $recall too low")
  }

  test("embeddingCovariance: hand-computed moments, merge-path invariance") {
    import spark.implicits._
    // Dyadic coordinates → every fixed-point floor is exact.
    val vecs = Seq(Array(0.5, -0.25), Array(0.25, 0.5), Array(-0.5, 0.75))
    val df = vecs.toDF("embedding")
    val out = SimilarityOps.embeddingCovariance(df, "embedding", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 4)
    val S = 1073741824.0
    def fx(d: Double) = math.floor(d * S).toLong
    def gramF(i: Int, j: Int) = vecs.map(v => fx(v(i) * v(j))).sum
    def sumF(i: Int) = vecs.map(v => fx(v(i))).sum
    for (i <- 0 until 2; j <- 0 until 2) {
      val (n, gf, cov) = out((i, j))
      assert(n == 3L)
      assert(gf == gramF(i, j), s"gram($i,$j)")
      val mi = (sumF(i).toDouble / S) / 3.0
      val mj = (sumF(j).toDouble / S) / 3.0
      assert(cov == (gf.toDouble / S) / 3.0 - mi * mj, s"cov($i,$j)")
    }
    // covariance matrix is symmetric (dyadic inputs → exact equality)
    assert(out((0, 1))._3 == out((1, 0))._3)
  }

  test("graft_gram aggregates with map-side partials, layout-independent") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .select(col("embedding"))
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilarityOps.embeddingCovariance(d, "embedding", 64)
        .orderBy(col("i"), col("j")).collect().map(_.toSeq).toSeq
    val base = run(emb)
    assert(base.length == 4096)
    assert(base == run(emb.repartition(13)),
      "fixed-point buffers must merge identically across layouts")
    val plan = SimilarityOps.embeddingCovariance(emb, "embedding", 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_gram"),
      s"map-side partial aggregation must survive:\n$plan")
  }

  test("pcaProject: dominant direction first, variance ordering, determinism") {
    import spark.implicits._
    // Data stretched along (1,1,0)/√2 with small noise off-axis: the
    // top component must align with it and carry most of the variance.
    val base = Seq(3.0, -2.0, 1.5, -1.0, 2.5, -3.0, 0.5, -0.5)
    val vecs = base.zipWithIndex.map { case (t, i) =>
      val eps = 0.05 * ((i % 3) - 1)
      Array(t / math.sqrt(2) + eps, t / math.sqrt(2) - eps, 2 * eps)
    }
    val df = vecs.toDF("embedding")
    val out = SimilarityOps.pcaProject(df, "embedding", dim = 3, k = 2)
      .select("pc1", "pc2").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(out.map(_._1).toSeq)
    val v2 = variance(out.map(_._2).toSeq)
    assert(v1 > v2, s"pc1 variance $v1 must dominate pc2 $v2")
    // pc1 recovers the stretch parameter (up to sign and centering):
    // correlation with `base` is essentially ±1
    val m1 = out.map(_._1).sum / out.length
    val mb = base.sum / base.size
    val corr = base.zip(out.map(_._1)).map { case (b, p) =>
      (b - mb) * (p - m1)
    }.sum / math.sqrt(base.map(b => (b - mb) * (b - mb)).sum *
      out.map(p => (p._1 - m1) * (p._1 - m1)).sum)
    assert(math.abs(corr) > 0.999, s"pc1 must track the planted axis: $corr")
    // deterministic across runs and layouts
    val again = SimilarityOps.pcaProject(df.repartition(5), "embedding",
        dim = 3, k = 2).select("pc1", "pc2").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // row order follows the layout; the projected VALUES must be
    // bit-identical
    assert(out.toSeq.sorted == again.toSeq.sorted)
  }

  test("semDedup: keep rule, cross-cell immunity, tie-break") {
    import spark.implicits._
    // Two well-separated clusters; centroids are the 2 lowest-id
    // vectors, so cell 0 ≈ e1-direction, cell 1 ≈ e2-direction.
    //  - 1 (on e1, csim 1.0) vs 3 (slightly off e1): near-dup pair in
    //    cell 0 → the HIGHER-centroid-sim member (1) is dropped, the
    //    farther-from-center copy (3) kept (the paper's keep rule).
    //  - 2 and 4: cluster-2 members, not near-dups of each other.
    //  - 5: exact clone of 3 → cosine 1.0, csim ties → higher id drops.
    //  - 6: e2-ish vector in cell 1 — near-dup of nothing.
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)),
      (3L, Array(0.999, 0.01, 0.0)),
      (4L, Array(0.05, 0.9, 0.3)),
      (5L, Array(0.999, 0.01, 0.0)),
      (6L, Array(0.3, 0.85, 0.0))).toDF("id", "v")
    val kept = SimilarityOps.semDedup(vecs, "id", "v",
        nCentroids = 2, tau = 0.98)
      .select("id").collect().map(_.getLong(0)).toSet
    // 1 dropped (dominated by 3: csim(3) < csim(1) = 1.0);
    // 5 dropped (clone of 3, csim equal, higher id).
    // cell 1 pairwise cosines (2-4 ≈ 0.95, 2-6 ≈ 0.94, 4-6 ≈ 0.91)
    // all stay below tau = 0.98 → 2, 4, 6 kept.
    assert(kept == Set(2L, 3L, 4L, 6L))
  }

  test("semDedup is layout-independent and keeps appended columns") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilarityOps.semDedup(d, "vec_id", "v", nCentroids = 8, tau = 0.95)
        .select("vec_id", "cell", "centroid_sim")
        .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    val base = run(emb)
    assert(base == run(emb.repartition(7)))
    assert(base.nonEmpty)
  }

  test("semDedupScaled == fixed semDedup when the derived k matches") {
    // same arithmetic contract (d2, tie rules, csim rounding, drop
    // rule); at a size where max(min, ceil(n/target)) == nCentroids the
    // two forms must keep identical survivors with identical cells
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val fixed = SimilarityOps.semDedup(emb, "vec_id", "v",
        nCentroids = 16, tau = 0.95)
      .select("vec_id", "cell", "centroid_sim")
      .collect().map(_.toSeq).toSet
    val scaled = SimilarityOps.semDedupScaled(emb, "vec_id", "v",
        targetCellSize = 128, minCentroids = 16, tau = 0.95)
      .select("vec_id", "cell", "centroid_sim")
      .collect().map(_.toSeq).toSet
    assert(scaled == fixed)
  }

  test("semDedupScaled rep tier == member grain on a clone-heavy corpus, " +
      "both assignment tiers") {
    import spark.implicits._
    // Clone mass the rep tier must collapse WITHOUT changing the
    // answer: embeddings ∪ 5 exact copies of each of the first 10
    // vectors (fresh ids above 20000). Zero vectors need no branch of
    // their own: Spark 4's ANSI DIVIDE_BY_ZERO covers DOUBLE division,
    // so a zero vector errors the csim attach loudly at EITHER grain —
    // "every scored vector has nonzero norm", the fact the rep tier's
    // non-rep-never-survives argument leans on, is enforced by the
    // engine itself (pinned by the zero-vector test below).
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val clones = (1 to 5).map(r =>
      emb.filter(col("id") < 10)
        .select((col("id") + lit(20000L * r)).as("id"), col("v")))
      .reduce(_ unionAll _)
    val corpus = emb.unionAll(clones)
    for (mode <- Seq("broadcast", "bucketed")) {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getDouble(2))
      val rep = SimilarityOps.semDedupScaled(corpus, "id", "v",
          targetCellSize = 64, minCentroids = 8, tau = 0.95,
          assignMode = mode, dim = dim, bits = 4, tables = 8)
        .select("id", "cell", "centroid_sim").collect().map(key).toSet
      val mem = SimilarityOps.semDedupScaledMemberGrain(corpus, "id", "v",
          targetCellSize = 64, minCentroids = 8, tau = 0.95,
          assignMode = mode, dim = dim, bits = 4, tables = 8)
        .select("id", "cell", "centroid_sim").collect().map(key).toSet
      assert(rep == mem, s"rep tier diverged under assignMode=$mode")
      assert(rep.nonEmpty)
      // Clone semantics: of each identical-vector class only the
      // minimum id can survive, and it competes like any other vector.
      assert(!rep.exists(_._1 >= 20000L))
    }
  }

  test("semDedupScaled: a zero vector errors LOUDLY at either grain — " +
    "ANSI DIVIDE_BY_ZERO covers double division in Spark 4, so the " +
    "nonzero-norm premise of the rep==member argument is engine-enforced") {
    import spark.implicits._
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val zeros = Seq(30000L).toDF("id")
      .select(col("id"), array_repeat(lit(0.0), dim).as("v"))
    val corpus = emb.unionAll(zeros)
    val eRep = intercept[Exception] {
      SimilarityOps.semDedupScaled(corpus, "id", "v",
        targetCellSize = 64, minCentroids = 8, tau = 0.95).count()
    }
    val eMem = intercept[Exception] {
      SimilarityOps.semDedupScaledMemberGrain(corpus, "id", "v",
        targetCellSize = 64, minCentroids = 8, tau = 0.95).count()
    }
    for (e <- Seq(eRep, eMem)) {
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.getMessage != null) &&
        chain(e).flatMap(t => Option(t.getMessage)).mkString
          .contains("DIVIDE_BY_ZERO"),
        s"expected DIVIDE_BY_ZERO, got: ${e.getMessage}")
    }
  }

  test("semDedupScaled derives constant-size cells as the corpus grows") {
    import spark.implicits._
    // k = max(min, ceil(n/target)): pin the derivation and the ~target
    // mean cell size at two corpus sizes — the r9 sf1 quadratic came
    // from a FIXED k densifying cells 10x
    val rnd = new scala.util.Random(11)
    def corpus(n: Int) = (0 until n)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("id", "v")
    for (n <- Seq(64, 256)) {
      val out = SimilarityOps.semDedupScaled(corpus(n), "id", "v",
        targetCellSize = 16, minCentroids = 1, tau = 0.9999)
      val cells = out.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1))
      val k = math.max(1, (n + 15) / 16)
      assert(cells.map(_._1).forall(c => c >= 0 && c < k),
        s"n=$n cells out of range: ${cells.toSeq}")
      // near-unit tau → nothing deduped; all n rows distribute over k
      // cells: mean occupancy equals the target by construction
      assert(out.count() == n)
      val mean = n.toDouble / cells.length
      assert(cells.length <= k && mean <= 3.0 * 16,
        s"n=$n k=$k got ${cells.length} cells, mean $mean")
    }
  }

  test("semDedupScaled: negative-d2 cell decode keeps the row (pmod, " +
      "not truncated %)") {
    import spark.implicits._
    // For a vector nearly identical to its centroid, the left-to-right
    // d2 = v·v − 2·v·c + c·c can round NEGATIVE; graft_dbits is then
    // negative and so is the packed key dbits·k + cell. A truncated `%`
    // decode returns cell − k and the row silently VANISHES from the
    // assignment (neither survivor nor suppressed). Find — with the
    // exact sequential double arithmetic graft_dot uses — a
    // perturbation whose d2 goes negative, and assert the row stays.
    def sdot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def d2(a: Array[Double], c: Array[Double]): Double =
      sdot(a, a) - 2.0 * sdot(a, c) + sdot(c, c)
    val c0 = Array.tabulate(64)(i => 5.0 + 0.01 * i) // far cluster
    val c1 = Array.tabulate(64)(i => 0.1 + 0.001 * i)
    // at |eps| ~ 1e-9 the exact d2 (Σeps² ≈ 2e-17) sits far below the
    // sequential-sum rounding noise (~ulp(1.1)·√64 ≈ 1e-15), so the
    // float sign is effectively a coin flip — a short seeded search
    // deterministically lands a negative one
    val x = (for (scale <- Iterator(1e-9, 1e-10, 1e-8);
                  s <- (0 until 500).iterator) yield {
      val rnd = new scala.util.Random(s)
      c1.map(v => v + (rnd.nextDouble() - 0.5) * scale)
    }).find(cand => d2(cand, c1) < 0.0)
      .getOrElse(fail("fixture search found no negative-d2 perturbation"))
    assert(d2(x, c1) < 0.0 && d2(x, c0) > 1.0) // argmin is cell 1
    val corpus = Seq((0L, c0), (1L, c1), (2L, x)).toDF("id", "v")
    val af = SimilarityOps.semDedupAssignFrame(corpus, "id", "v",
      targetCellSize = 1000000, minCentroids = 2,
      assignMode = "broadcast", dim = 0, bits = 4, tables = 8,
      seed = 42L)
    val cells = af.select("_aid", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.size == 3, s"row lost from the assignment: $cells")
    assert(cells(2L) == 1, s"negative-d2 row decoded the wrong cell: $cells")
    // and end to end: the near-identical pair dedupes normally (id 2
    // dominated by id 1 — csim tie at round-6, lower id survives)
    val kept = SimilarityOps.semDedupScaled(corpus, "id", "v",
        targetCellSize = 1000000, minCentroids = 2, tau = 0.95)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L))
  }

  test("semDedupScaled bucketed tier: orphan fallback assigns every row") {
    import spark.implicits._
    // -c flips EVERY hyperplane sign vs c, so it shares no bucket with
    // the single centroid in any table — the orphan fallback must still
    // assign it (exactly) rather than dropping it from the corpus.
    val c = Array.tabulate(64)(i => 0.3 + 0.002 * i)
    val corpus = Seq((0L, c), (1L, c.map(-_))).toDF("id", "v")
    val af = SimilarityOps.semDedupAssignFrame(corpus, "id", "v",
      targetCellSize = 1000000, minCentroids = 1,
      assignMode = "bucketed", dim = 64, bits = 4, tables = 8,
      seed = 42L)
    val cells = af.select("_aid", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == Map(0L -> 0, 1L -> 0), s"got $cells")
  }

  test("semDedupScaled bucketed tier: full coverage, valid cells, " +
      "layout-independent") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = emb.count()
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilarityOps.semDedupAssignFrame(d, "vec_id", "v",
        targetCellSize = 128, minCentroids = 16,
        assignMode = "bucketed", dim = 64, bits = 4, tables = 8,
        seed = 42L)
    val af = run(emb)
    val rows = af.select("_aid", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    // every vector assigned exactly once (no orphan loss, no duplicate
    // assignment from the candidate union), every cell in range
    assert(rows.length == n, s"${rows.length} of $n assigned")
    assert(rows.map(_._1).distinct.length == n)
    assert(rows.forall { case (_, cl) => cl >= 0 && cl < 16 })
    val again = run(emb.repartition(7)).select("_aid", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("semDedupScaled assignMode guards: unknown mode and bucketed " +
      "without dim are loud") {
    import spark.implicits._
    val df = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      SimilarityOps.semDedupScaled(df, "id", "v", assignMode = "magic")
    }
    intercept[IllegalArgumentException] {
      // bucketed needs the vector dim for its hyperplane literals
      SimilarityOps.semDedupScaled(df, "id", "v", assignMode = "bucketed")
    }
  }

  test("kmeansLloydFx separates two obvious clusters and is layout-exact") {
    import spark.implicits._
    // ids 0/1 seed the two centroids; points sit near (0,0) and (10,10).
    val pts = Seq(
      (0L, Seq(0.0, 0.5)), (1L, Seq(10.0, 10.5)),
      (2L, Seq(0.25, 0.0)), (3L, Seq(9.75, 10.0)),
      (4L, Seq(0.5, 0.25)), (5L, Seq(10.5, 9.75))
    ).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      SimilarityOps.kmeansLloydFx(d, "id", "v", k = 2, dim = 2,
        iters = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val out = run(pts)
    assert(out.map(_._2).toSeq == Seq(0, 1, 0, 1, 0, 1))
    // round-2+ centroids are member means: cluster 0 ≈ (0.25, 0.25) —
    // the fixed-point distance to (0,0.5) is engine-exactly this:
    val c0 = Array(0.25, 0.25)
    val expect0 = (math.floor((0.0 - c0(0)) * (0.0 - c0(0)) *
      1073741824.0) + math.floor((0.5 - c0(1)) * (0.5 - c0(1)) *
      1073741824.0)).toLong
    assert(out.head._3 == expect0)
    assert(run(pts.repartition(5)).toSeq == out.toSeq)
  }

  test("mutualTopK keeps only reciprocated pairs, once each") {
    import spark.implicits._
    // 1↔2 are mutual nearest; 3 points at 1 but 1's list (k=1) holds
    // only 2, so 3's edge is one-directional and must drop.
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.99, 0.14)),
      (3L, Seq(0.8, -0.6))
    ).toDF("id", "v")
    val out = SimilarityOps.mutualTopK(vecs, "id", "v", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3)))
    assert(out.toSeq == Seq((1L, 2L, 1, 1)))
    // k=2 admits every reciprocated pair in this tiny clique
    val k2 = SimilarityOps.mutualTopK(vecs, "id", "v", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k2 == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("mmrRerank survives NaN pairwise sims (overflowed vectors)") {
    import spark.implicits._
    // vectors 2 and 3 overflow: their mutual dot is inf + (-inf) =
    // NaN (ANSI allows inf/inf; a zero divisor would have failed in
    // bruteForceTopK already). Once 2 is chosen, 3's max-sim-to-chosen
    // is NaN, its MMR score is NaN, and the greedy must STOP after
    // rank 2 instead of remove(-1)
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.9, 0.1)),
      (2L, Seq(1e200, 1e200)),
      (3L, Seq(1e200, -1e200))
    ).toDF("id", "v")
    val out = SimilarityOps.mmrRerank(corpus.filter(col("id") === 0),
        corpus, "id", "v", k = 3, lambda = 0.5, nCand = 8)
      .orderBy(col("rnk"))
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 2L)))
  }

  test("mutualTopKAnn recall vs the exact miner on fixture embeddings") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val exact = SimilarityOps.mutualTopK(emb, "vec_id", "embedding",
        k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityOps.mutualTopKAnn(emb, "vec_id", "embedding",
        k = 5, dim = 64, bits = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // every ANN pair is reciprocated WITHIN the ANN lists by
    // construction; against the exact pair set we require the usual
    // fixture recall bar
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"mutual recall $recall (${ann.size} ann, " +
      s"${exact.size} exact)")
  }

  test("quantizeInt8: exact codes at the range edges, hand-checked error") {
    import spark.implicits._
    // dim0 range [0,2], dim1 range [10,30]: edge vectors code to 0/255
    // with ZERO reconstruction error; the midpoint codes to 128 both
    val vecs = Seq(
      (0L, Seq(0.0, 10.0)),
      (1L, Seq(1.0, 20.0)),
      (2L, Seq(2.0, 30.0))
    ).toDF("id", "v")
    val out = SimilarityOps.quantizeInt8(vecs, "id", "v", dim = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(out(0) == ((0L, 0L, 0, 0, 0L)))
    assert(out(2) == ((2L, 510L, 255, 255, 0L)))
    // midpoint: both dims floor(127.5+0.5)=128; error via the same chain
    val d0 = (0.0 + 128.0 * 2.0 / 255.0) - 1.0
    val d1 = (10.0 + 128.0 * 20.0 / 255.0) - 20.0
    val expErr = (math.floor(d0 * d0 * 1073741824.0) +
      math.floor(d1 * d1 * 1073741824.0)).toLong
    assert(out(1) == ((1L, 256L, 128, 128, expErr)))
    val re = SimilarityOps.quantizeInt8(vecs.repartition(3), "id", "v", 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(re.toSeq == out.toSeq)
  }

  test("quantizeInt8 rejects ragged corpora in BOTH directions") {
    import spark.implicits._
    // longer-than-dim: silently-truncated tail (r9 guard)
    val long = Seq((0L, Seq(0.0, 1.0, 2.0)), (1L, Seq(3.0, 4.0, 5.0)))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      SimilarityOps.quantizeInt8(long, "id", "v", dim = 2)
    }
    // MIXED exact-dim and shorter: max(size)==dim passes the old guard
    // while short vectors null-poison trailing-dim stats (review fix)
    val ragged = Seq((0L, Seq(0.0, 1.0)), (1L, Seq(3.0)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.quantizeInt8(ragged, "id", "v", dim = 2)
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
  }

  test("mmrRerank trades relevance for diversity; k bounded; layout-exact") {
    import spark.implicits._
    // query 0 = (1,0,0); candidates 1 and 2 are near-clones of each
    // other (equally relevant), candidate 3 mirrors 1 across the query
    // axis — same relevance as 1 but far from it. Pure relevance ranks
    // (1,2,3); MMR must demote 2 (sim to the first pick ≈ 1, so
    // rel−sim ≈ −0.05) below 3 (rel−sim = 0.95−0.8 = +0.15).
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.3, 0.0)),
      (2L, Seq(0.9, 0.3, 0.01)),
      (3L, Seq(0.9, -0.3, 0.0))
    ).toDF("id", "v")
    val out = SimilarityOps.mmrRerank(corpus.filter(col("id") === 0),
        corpus, "id", "v", k = 3, lambda = 0.5, nCand = 8)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
    // k caps output even when fewer remain diverse
    val k2 = SimilarityOps.mmrRerank(corpus.filter(col("id") === 0),
      corpus, "id", "v", k = 2, lambda = 0.5, nCand = 8).count()
    assert(k2 == 2)
    // layout independence
    val re = SimilarityOps.mmrRerank(
        corpus.repartition(5).filter(col("id") === 0),
        corpus.repartition(3), "id", "v", k = 3, lambda = 0.5,
        nCand = 8)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(re.toSeq == out.toSeq)
  }

  test("rrfFuse: fixed-point scores, one-sided hits, rank tie-break") {
    import spark.implicits._
    // query 1: doc 10 ranks 1st in A and 2nd in B; doc 20 only in A;
    // doc 30 only in B (rank 1) — fused order must be 10, 30, 20.
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF(
      "query_id", "neighbor_id", "rnk")
    val b = Seq((1L, 10L, 2), (1L, 30L, 1)).toDF(
      "query_id", "neighbor_id", "rnk")
    val out = SimilarityOps.rrfFuse(a, b, kRrf = 60, k = 10)
      .orderBy(col("rnk")).collect()
    def c(r: Int): Long = 1073741824L / (60L + r)
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((10L, c(1) + c(2)), (30L, c(1)), (20L, c(2))))
    // one-sided rows carry a null rank on the absent side
    val d20 = out.find(_.getLong(2) == 20L).get
    assert(d20.getInt(4) == 2 && d20.isNullAt(5))
    val d30 = out.find(_.getLong(2) == 30L).get
    assert(d30.isNullAt(4) && d30.getInt(5) == 1)
    // equal fused score ties break by neighbor id: two docs each only
    // in one list at the same rank
    val t1 = Seq((2L, 7L, 3)).toDF("query_id", "neighbor_id", "rnk")
    val t2 = Seq((2L, 5L, 3)).toDF("query_id", "neighbor_id", "rnk")
    val tied = SimilarityOps.rrfFuse(t1, t2, kRrf = 60, k = 10)
      .orderBy(col("rnk")).collect()
    assert(tied.map(_.getLong(2)).toSeq == Seq(5L, 7L))
  }

  test("rrfFuse collapses duplicate list entries to their best rank") {
    import spark.implicits._
    // malformed inputs (concatenated lists with repeated pairs) must
    // fuse identically to their best-rank-deduped form — duplicates
    // fanning out through the full-outer join would inflate rrf_fx and
    // emit duplicate fused rows
    val a = Seq((1L, 10L, 1), (1L, 10L, 4), (1L, 20L, 2))
      .toDF("query_id", "neighbor_id", "rnk")
    val b = Seq((1L, 10L, 2), (1L, 30L, 1), (1L, 30L, 5))
      .toDF("query_id", "neighbor_id", "rnk")
    val out = SimilarityOps.rrfFuse(a, b, kRrf = 60, k = 10)
      .orderBy(col("rnk")).collect()
    def c(r: Int): Long = 1073741824L / (60L + r)
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((10L, c(1) + c(2)), (30L, c(1)), (20L, c(2))))
  }

  test("mutualJoin: a hub in every top-k list reciprocates at most k pairs") {
    import spark.implicits._
    // hub id 0 appears in ALL n query lists, but its own list names
    // only k neighbors — mutuality must cap its pairs at k, the core
    // anti-hub claim of mutual-NN mining
    val n = 20
    val k = 3
    val hubList = (1 to k).map(j => (0L, j.toLong, j, 0.9))
    val others = (1 to n).flatMap { q =>
      // every other query ranks the hub first, then two arbitrary ids
      Seq((q.toLong, 0L, 1, 0.9),
        (q.toLong, ((q % n) + 1).toLong, 2, 0.5),
        (q.toLong, ((q + 1) % n + 1).toLong, 3, 0.4))
        .filter { case (a, b, _, _) => a != b }
    }
    val topk = (hubList ++ others)
      .toDF("query_id", "neighbor_id", "rnk", "score")
    val pairs = SimilarityOps.mutualJoin(topk).collect()
    val hubPairs = pairs.filter(r =>
      r.getLong(0) == 0L || r.getLong(1) == 0L)
    assert(hubPairs.length <= k,
      s"hub reciprocated ${hubPairs.length} > $k pairs")
    // and the hub's reciprocated pairs are exactly its own k neighbors
    // (each of which ranked the hub back)
    assert(hubPairs.map(_.getLong(1)).toSet.subsetOf(
      (1 to k).map(_.toLong).toSet))
    // once-per-pair: no (a, b) with a >= b
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("mmrRerank refuses nCand > 64 (O(nCand²) per-query state)") {
    import spark.implicits._
    val df = Seq((0L, Array.fill(4)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.mmrRerank(df, df, "vec_id", "embedding",
        k = 3, nCand = 65)
    }
    assert(e.getMessage.contains("nCand"))
  }

  test("embeddingCoverage: missing docs, orphan vecs, dup vec rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "web"), (2L, "web"), (3L, "web"),   // 2 of 3 embedded
      (10L, "book"), (11L, "book")             // 0 of 2 embedded
    ).toDF("doc_id", "source")
    val emb = Seq(1L, 2L, 2L, 99L)             // dup row for 2; 99 orphan
      .map(i => (i, Seq(0.1f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.embeddingCoverage(docs, emb,
        "doc_id", "source", "vec_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // duplicate vec rows must NOT double-count doc 2
    assert(out("web") == ((3L, 2L, 1L, 666666L, 1L)))
    assert(out("book") == ((2L, 0L, 2L, 0L, 1L)))
  }

  test("semanticDecontaminate: leak flags at 1.0, ties break to min id") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f)),      // verbatim leak of the bench vector
      (2L, Seq(0f, 1f)),      // orthogonal
      (3L, Seq(0.8f, 0.6f))   // sim 0.8 — similar but below tau
    ).toDF("id", "vec")
    val bench = Seq((100L, Seq(1f, 0f)), (101L, Seq(1f, 0f)))
      .toDF("bid", "bvec")
    val out = SimilarityOps.semanticDecontaminate(corpus, bench,
        "id", "vec", "bid", "bvec", tau = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 3)
    assert(out(1L) == ((1.0, 100L, true)))   // tie 100 vs 101 → min id
    assert(out(2L) == ((0.0, 100L, false)))
    assert(out(3L) == ((0.8, 100L, false)))
    // empty benchmark: vacuous screen reports NOTHING (documented)
    val none = SimilarityOps.semanticDecontaminate(corpus,
      bench.filter(col("bid") < 0L), "id", "vec", "bid", "bvec", 0.95)
    assert(none.count() == 0L)
  }

  test("MRR audit: reciprocal-rank algebra; a perfect index scores " +
      "1e6 everywhere") {
    val out = graft.ExtQueries.xSimMrr(spark, fixtureDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("ann_rank"), r.getAs[Long]("mrr_ppm")))
    assert(out.length == 10)
    for ((q, (rk, mrr)) <- out) {
      if (rk == 0L) assert(mrr == 0L, s"q$q")
      else assert(mrr == 1000000L / rk, s"q$q rank $rk mrr $mrr")
    }
    // perfect index (the brute tier audited against itself): the true
    // NN is always at rank 1
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val truth1 = SimilarityOps.bruteForceTopK(q, emb,
        "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id").as("truth_id"))
    val self = SimilarityOps.bruteForceTopK(q, emb,
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id").as("truth_id"),
        col("rnk"))
    val joined = truth1.join(self, Seq("query_id", "truth_id"))
      .collect().map(_.getAs[Int]("rnk"))
    assert(joined.length == 5 && joined.forall(_ == 1))
  }

  test("signProjectTopK: useful recall vs brute force; exact scores on " +
    "shared pairs; deterministic") {
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilarityOps.bruteForceTopK(queries, emb,
        "vec_id", "embedding", 5)
      .collect().map(r => ((r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")), r.getAs[Double]("score"))).toMap
    def run() = SimilarityOps.signProjectTopK(queries, emb,
        "vec_id", "embedding", k = 5, dOut = 16, shortlist = 20)
      .collect().map(r => ((r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id")), r.getAs[Double]("score"))).toMap
    val proj = run()
    assert(proj.size == exact.size) // full top-k emitted per query
    val recall = (exact.keySet & proj.keySet).size.toDouble / exact.size
    // 16-dim JL shortlist of 20 over 64-dim uniform vectors: coarse,
    // but must beat random (5/500 per slot)
    assert(recall >= 0.3, s"recall $recall too low")
    // wherever both tiers report a pair, the RERANKED score is the
    // exact round-6 cosine — identical by construction
    (exact.keySet & proj.keySet).foreach { pair =>
      assert(exact(pair) == proj(pair), s"score drift on $pair")
    }
    assert(run() == proj)
  }

  test("silhouetteFx: tight clusters score high, boundary points low; " +
    "agrees with kmeansLloydFx on cluster and own-distance") {
    import spark.implicits._
    // two tight clusters far apart + one point midway; k=2 seeds from
    // vec_id 0 (cluster A) and 1 (cluster B — put one B member first)
    val dim = 4
    def v(base: Double, eps: Double) =
      Array.fill(dim)((base + eps).toFloat)
    val vecs = Seq(
      (0L, v(0.0, 0.00)), (1L, v(1.0, 0.00)),
      (2L, v(0.0, 0.01)), (3L, v(0.0, -0.01)),
      (4L, v(1.0, 0.01)), (5L, v(1.0, -0.01)),
      (6L, v(0.5, 0.0))) // midway: boundary point
      .toDF("vec_id", "embedding")
    val sil = SimilarityOps.silhouetteFx(vecs, "vec_id", "embedding",
        k = 2, dim = dim, iters = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // tight members: a tiny, b huge → s near 1e6
    Seq(0L, 2L, 3L).foreach(i => assert(sil(i)._4 > 900000L, s"vec $i"))
    Seq(1L, 4L, 5L).foreach(i => assert(sil(i)._4 > 900000L, s"vec $i"))
    // the midway point scores far lower than any tight member
    assert(sil(6L)._4 < 500000L && sil(6L)._4 < sil(0L)._4 - 400000L,
      s"boundary ${sil(6L)}")
    // cluster + own-centroid distance agree with the clustering query
    val km = SimilarityOps.kmeansLloydFx(vecs, "vec_id", "embedding",
        k = 2, dim = dim, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
      .toMap
    sil.foreach { case (id, (cl, a, b, _)) =>
      assert(km(id) == ((cl, a)), s"vec $id: kmeans ${km(id)} vs ($cl, $a)")
      assert(b >= a)
    }
  }

  test("signProject: exact in-memory mirror, JL cosine preservation, " +
    "layout independence") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimilarityOps.signProject(df, "vec_id", "embedding", 16)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == 40 * 16)
    // mirror: sign(j,i) from the portable md5 60-bit convention
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    def proj(v: Array[Float]): Array[Long] =
      Array.tabulate(16) { j =>
        v.zipWithIndex.map { case (x, i) =>
          val s = 1L - 2L * (h60(s"sp:$j:$i") % 2L)
          s * math.floor(x.toDouble * 16777216.0).toLong
        }.sum
      }
    vecs.foreach { case (id, v) =>
      val want = proj(v)
      (0 until 16).foreach(j => assert(got((id, j)) == want(j),
        s"vec $id dim $j"))
    }
    // JL sanity: projected cosine tracks original cosine (error
    // O(1/sqrt(16)) — assert a loose band over all pairs)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val pairs = for (a <- 0 until 10; b <- (a + 1) until 10) yield (a, b)
    val errs = pairs.map { case (a, b) =>
      val o = cos(vecs(a)._2.map(_.toDouble), vecs(b)._2.map(_.toDouble))
      val p = cos(proj(vecs(a)._2).map(_.toDouble),
        proj(vecs(b)._2).map(_.toDouble))
      math.abs(o - p)
    }
    assert(errs.max < 0.6 && errs.sum / errs.size < 0.25,
      s"JL drift too large: mean=${errs.sum / errs.size} max=${errs.max}")
    // layout independence: same values from a repartitioned input
    val again = SimilarityOps.signProject(df.repartition(13), "vec_id",
        "embedding", 16).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again == got)
  }

  test("abttProject: fixed-point component tracks the dominant " +
    "direction, projections center, layout-independent") {
    import spark.implicits._
    // corpus with one dominant axis: x-axis variance >> others, plus a
    // common offset (the "common mean" ABTT removes)
    val dim = 8
    val rows = (0 until 200).map { i =>
      val big = (i % 21).toDouble - 10.0           // dominant spread
      val small = ((i * 7) % 5).toDouble / 10.0    // minor spread
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d == 0) 3.0 + big else if (d == 1) 1.0 + small else 0.5f)
          .toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = SimilarityOps.abttProject(df, "vec_id", "embedding", dim,
      iters = 8).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 200)
    // the signed projection of (x - mu) onto ~e0 is ~big - mean(big):
    // ranking by proj must match ranking by the dominant coordinate
    val byProj = out.toSeq.sortBy(_._2).map(_._1)
    val byBig = rows.sortBy(r => (r._2(0).toDouble, r._1)).map(_._1)
    // same extremes (ties inside equal big-values may reorder)
    assert(rows(byProj.head.toInt)._2(0) == byBig.map(i => rows(i.toInt)._2(0)).min)
    assert(rows(byProj.last.toInt)._2(0) == byBig.map(i => rows(i.toInt)._2(0)).max)
    // centered projections roughly sum to zero (fixed-point truncation
    // leaves at most a few ulps per row)
    val total = out.values.map(BigInt(_)).sum
    assert(total.abs < BigInt(200L * 4096L),
      s"projections not centered: $total")
    // layout independence: bit-identical from a repartitioned input
    val again = SimilarityOps.abttProject(df.repartition(13), "vec_id",
      "embedding", dim, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("abttProject building blocks: Spark decimal div truncates " +
    "toward zero (the BigInt/DuckDB-`//` contract)") {
    val r = spark.sql("SELECT cast(-7 as decimal(38,0)) div 2 AS a," +
      " cast(7 as decimal(38,0)) div -2 AS b").collect()(0)
    assert(r.getLong(0) == -3L && r.getLong(1) == -3L)
    // and the driver-side mirror
    assert(BigInt(-7) / BigInt(2) == BigInt(-3))
  }

  test("embeddingMoments: hand moments, dead dimension, outlier mass, " +
    "layout-independent") {
    import spark.implicits._
    // dim 0: values {0.5 x3, -0.5} → mean .25, var .1875
    // dim 1: constant 0.25 → var 0, sd 0, no outliers
    // dim 2: {0,0,0, 0.9} — 0.9 is beyond 3 sigma of the rest? sd of
    // {0,0,0,.9}: mean .225, var .0759; just assert counts consistent
    val rows = Seq(
      (1L, Array(0.5f, 0.25f, 0.0f)),
      (2L, Array(0.5f, 0.25f, 0.0f)),
      (3L, Array(0.5f, 0.25f, 0.0f)),
      (4L, Array(-0.5f, 0.25f, 0.9f)))
    val out = SimilarityOps.embeddingMoments(
      rows.toDF("vec_id", "embedding"), "embedding", dim = 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val fx = 1073741824.0
    // dim 0 mean: (3*floor(.5 fx) + floor(-.5 fx)) div 4 = fx/4
    assert(out(0)._2 == (fx / 4).toLong)
    // dim 0 var_fx ≈ .1875 fx (within a few ulps of truncation)
    assert(math.abs(out(0)._3 - 0.1875 * fx) <= 4)
    // dim 1: constant → var 0 (clamped), sd 0, and NO outliers (the
    // |x - mean| > 3 sd test is strict: 0 > 0 is false)
    assert(out(1)._3 == 0L && out(1)._4 == 0L && out(1)._5 == 0L)
    // sd_fx = floor(sqrt(var_fx * fx)) for dim 0
    assert(out(0)._4 ==
      math.floor(math.sqrt(out(0)._3.toDouble * fx)).toLong)
    // n everywhere 4
    assert(out.values.forall(_._1 == 4L))
    // layout independence
    val again = SimilarityOps.embeddingMoments(
      rows.toDF("vec_id", "embedding").repartition(5), "embedding", 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(again == out)
  }

  test("topComponentFixed: sign fix pins the first nonzero coordinate " +
    "positive; degenerate zero matrix keeps the start vector") {
    // 2x2, diagonal [4, 1] at 2^30 scale: gram = n * diag * fx
    val fx = 1073741824L
    val n = 4L
    val gram = Seq(4 * n * fx, 0L, 0L, 1 * n * fx)
    val v = SimilarityOps.topComponentFixed(n, Seq(0L, 0L), gram, 2, 8)
    assert(v(0) == BigInt(fx)) // e0 dominant, normalized to 2^30
    assert((v(1) * 1000 / v(0)).toInt.abs <= 1) // ~0 after 8 rounds
    val vz = SimilarityOps.topComponentFixed(3L, Seq(0L, 0L),
      Seq(0L, 0L, 0L, 0L), 2, 4)
    assert(vz.toSeq == Seq(BigInt(fx), BigInt(fx))) // all-ones start
  }
}
