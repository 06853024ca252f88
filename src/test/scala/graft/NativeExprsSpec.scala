package graft

import org.apache.spark.sql.functions._
import graft.ext.SimilarityOps

/** Equivalence pins for the compiled argmin kernels
  * ([[graft.expressions.NearestIndexLit]] /
  * [[graft.expressions.KmeansTop2Fx]]) against the compositional
  * `array_sort(struct...)` reference formulations they replaced — the
  * kernels must reproduce the struct ordering (doubles via
  * SQLOrderingUtil semantics, longs exact, ties to the lowest id)
  * bit-for-bit, because the DuckDB twins rank by exactly that order. */
class NativeExprsSpec extends SparkSpec {

  private def emb = spark.read
    .parquet(s"$fixtureDir/embeddings.parquet")

  test("graft_nearest == sorted cellStructs on the embeddings fixture " +
    "(cell assignment, float input)") {
    val cents = (0 until 16).map(i =>
      emb.filter(col("vec_id") === i).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toIndexedSeq)
    val both = emb.select(col("vec_id"),
      call_function("graft_nearest", col("embedding"),
        typedlit(cents.map(_.toSeq)), lit(0)).as("fast"),
      element_at(array_sort(
        SimilarityOps.cellStructs(col("embedding"), cents)), 1)
        .getField("c").as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    assert(both.filter(col("fast").isNull).count() == 0)
  }

  test("graft_nearest: subspace offsets match the sliced compositional " +
    "form, ties break to the lowest candidate") {
    import spark.implicits._
    // 4-dim vectors, 2-dim subspaces; candidates 1 and 2 are identical
    // so every row ties between them -> index 1 must win over 2.
    val df = Seq(
      (0L, Seq(1.0, 2.0, 3.0, 4.0)),
      (1L, Seq(-1.0, 0.5, 0.0, 2.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("id", "v")
    val cands = Seq(
      IndexedSeq(9.0, 9.0), IndexedSeq(0.1, 0.2),
      IndexedSeq(0.1, 0.2), IndexedSeq(3.0, 4.0))
    for (off <- Seq(0, 2)) {
      val ref = df.select(col("id"),
        element_at(array_sort(SimilarityOps.cellStructs(
          slice(col("v"), off + 1, 2), cands)), 1)
          .getField("c").as("ref"),
        call_function("graft_nearest", col("v"),
          typedlit(cands.map(_.toSeq)), lit(off)).as("fast"))
      assert(ref.filter(col("fast") =!= col("ref")).count() == 0,
        s"offset $off")
    }
    // the planted tie: a row equidistant to candidates 1 and 2
    val tied = df.select(call_function("graft_nearest", col("v"),
      typedlit(Seq(Seq(0.1, 0.2), Seq(0.1, 0.2))), lit(0)))
      .collect().map(_.getInt(0))
    assert(tied.forall(_ == 0))
  }

  test("graft_nearest null contract: null array -> null, short vector " +
    "-> null, null element -> null") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, 2.0, 3.0)), (1L, null),
      (2L, Seq(1.0))).toDF("id", "v")
    val out = df.select(col("id"),
      call_function("graft_nearest", col("v"),
        typedlit(Seq(Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0))), lit(0))
        .as("c")).orderBy(col("id")).collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("graft_kmeans_top2 == sorted kmeansCellsFx on the embeddings " +
    "fixture, including non-contiguous centroid ids") {
    val raw = (0 until 4).map { i =>
      emb.filter(col("vec_id") === i).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
    }
    // non-contiguous ids (a cluster died mid-Lloyd): 0, 2, 5, 9
    val cents = Seq(0, 2, 5, 9).zip(raw)
    val v = col("embedding").cast("array<double>")
    val both = emb.select(col("vec_id"),
      call_function("graft_kmeans_top2", v,
        typedlit(cents.map(_._1)),
        typedlit(cents.map(_._2.toSeq))).as("fast"),
      array_sort(SimilarityOps.kmeansCellsFx(v, cents, 64)).as("ref"))
    val bad = both.filter(
      col("fast").getField("c1") =!=
        element_at(col("ref"), 1).getField("c") ||
      col("fast").getField("d1") =!=
        element_at(col("ref"), 1).getField("d") ||
      col("fast").getField("c2") =!=
        element_at(col("ref"), 2).getField("c") ||
      col("fast").getField("d2") =!=
        element_at(col("ref"), 2).getField("d"))
    assert(bad.count() == 0)
  }

  test("graft_kmeans_top2: distance ties rank by centroid id; single " +
    "centroid yields the (-1, MaxValue) second-place sentinel") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, 1.0))).toDF("id", "v")
    // centroids 3 and 7 identical -> equal distance -> c1=3, c2=7
    val r = df.select(call_function("graft_kmeans_top2", col("v"),
      typedlit(Seq(3, 7)),
      typedlit(Seq(Seq(0.0, 0.0), Seq(0.0, 0.0))))).collect()(0)
      .getStruct(0)
    assert(r.getInt(0) == 3 && r.getInt(2) == 7)
    assert(r.getLong(1) == r.getLong(3))
    val single = df.select(call_function("graft_kmeans_top2", col("v"),
      typedlit(Seq(0)), typedlit(Seq(Seq(0.0, 0.0))))).collect()(0)
      .getStruct(0)
    assert(single.getInt(0) == 0)
    assert(single.getInt(2) == -1 && single.getLong(3) == Long.MaxValue)
  }

  test("graft_kmeans_top2 matches the fixed-point formula exactly on a " +
    "hand-computed row") {
    import spark.implicits._
    val df = Seq((0L, Seq(0.5, -0.25))).toDF("id", "v")
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val r = df.select(call_function("graft_kmeans_top2", col("v"),
      typedlit(Seq(0, 1)), typedlit(cents))).collect()(0).getStruct(0)
    def fx(v: Seq[Double], c: Seq[Double]): Long =
      v.zip(c).map { case (a, b) =>
        math.floor((a - b) * (a - b) * 1073741824.0).toLong }.sum
    assert(r.getInt(0) == 0 &&
      r.getLong(1) == fx(Seq(0.5, -0.25), cents(0)))
    assert(r.getInt(2) == 1 &&
      r.getLong(3) == fx(Seq(0.5, -0.25), cents(1)))
  }

  test("graft_maxcos == max(struct(round(cosine,6), -bid)) join form " +
    "on the embeddings fixture") {
    val bench = emb.filter(col("vec_id") % 29 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("_v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    val fast = SimilarityOps.semanticDecontaminateLit(
      emb, "vec_id", "embedding", bench, tau = 0.95)
    val ref = SimilarityOps.semanticDecontaminate(emb,
      emb.filter(col("vec_id") % 29 === 0),
      "vec_id", "embedding", "vec_id", "embedding", tau = 0.95)
    val joined = fast.select(col("vec_id"), col("max_sim").as("fs"),
        col("bench_id").as("fb"), col("contaminated").as("fc"))
      .join(ref.select(col("vec_id"), col("max_sim").as("rs"),
        col("bench_id").as("rb"), col("contaminated").as("rc")),
        Seq("vec_id"), "full")
    assert(joined.filter(col("fs") =!= col("rs") ||
      col("fb") =!= col("rb") || col("fc") =!= col("rc") ||
      col("fs").isNull || col("rs").isNull).count() == 0)
    assert(fast.count() == emb.count())
  }

  test("graft_maxcos: rounded-sim ties break to the smallest id, " +
    "scaled copies tie exactly, short vectors -> null") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(3.0, 4.0)))
      .toDF("id", "v")
    // candidates 7 and 9 are positive scalings of each other ->
    // identical cosine to anything -> id 7 must win; candidate 20 is
    // the self-direction of row 0.
    val bench = Seq(
      (7L, Seq(2.0, 1.0)), (9L, Seq(4.0, 2.0)), (20L, Seq(5.0, 5.0)))
    val out = SimilarityOps.semanticDecontaminateLit(
        df, "id", "v", bench, tau = 0.95)
      .orderBy(col("id")).collect()
    assert(out(0).getLong(2) == 20L && out(0).getDouble(1) == 1.0 &&
      out(0).getBoolean(3))
    // row 1 vs scaled twins: cos identical -> smallest id 7
    val tie = SimilarityOps.semanticDecontaminateLit(
        df.filter(col("id") === 1L), "id", "v",
        Seq((7L, Seq(2.0, 1.0)), (9L, Seq(4.0, 2.0))), tau = 0.5)
      .collect()(0)
    assert(tie.getLong(2) == 7L)
    val short = SimilarityOps.semanticDecontaminateLit(
        Seq((5L, Seq(1.0, 2.0, 3.0))).toDF("id", "v"), "id", "v",
        bench, tau = 0.5).collect()(0)
    assert(short.isNullAt(1) && short.isNullAt(2) && short.isNullAt(3))
    intercept[IllegalArgumentException] {
      SimilarityOps.semanticDecontaminateLit(df, "id", "v",
        Seq.empty, tau = 0.5)
    }
  }

}
