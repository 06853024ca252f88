package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.10):
  * brute-force cosine top-k as the exact baseline, plus the two classic
  * ANN layouts — random-hyperplane LSH (Charikar, STOC 2002; the
  * sign-random-projection family) and IVF inverted files (Jégou et al.,
  * "Product quantization for nearest neighbor search", TPAMI 2011 — the
  * coarse-quantizer half, without PQ codes).
  *
  * All arithmetic runs through `zip_with`/`aggregate` higher-order
  * functions on `array<float>` columns cast element-wise to double — same
  * operand order as the DuckDB oracle (`list_dot_product` on double lists),
  * so scores agree to rounding.
  *
  * Scale shapes: brute force is (broadcast queries) × (corpus scan) — one
  * pass over the corpus, no corpus shuffle, per-query top-k held in the
  * window agg. LSH replaces the full scan with bucket-joined candidates:
  * only (bucket, id) pairs shuffle, and each query compares against its
  * Hamming-adjacent buckets instead of the whole corpus.
  */
object SimilarityOps {

  /** Double-precision dot product of two float-array columns (implicit
    * element-wise cast to double, so multiplication happens in double on
    * both engines). Native codegen'd expression
    * ([[graft.expressions.DotProduct]]) — the `zip_with`+`aggregate`
    * formulation pays one interpreted lambda call per element. Same
    * sequential accumulation order as the DuckDB oracle. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (self excluded), deterministically ordered by
    * (rounded score desc, corpus id asc). Rounding to 6 decimals makes the
    * ranking key identical across engines.
    *
    * The query side is broadcast (queries are the small side by contract);
    * corpus partitions stream once through the scoring projection; the
    * per-query top-k is a window over (query, score) — at 1000 executors
    * this is a map-side scan plus one shuffle of scored pairs only.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms are computed ONCE per row on each side (a narrow projection
    // before the join) instead of once per (query, neighbor) pair —
    // identical arithmetic, |Q|+|C| instead of |Q|·|C| norm evaluations.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      norm(col(vecCol)).as("_cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6)
          .as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** Hard-negative mining for contrastive/embedding training (the
    * in-batch-negatives upgrade — e.g. DPR, Karpukhin et al. 2020 §3.2:
    * the negatives that actually teach are the most-similar vectors
    * with a DIFFERENT label, not random ones): per query, the top-k
    * highest-cosine corpus vectors whose `labelCol` differs. Same
    * scoring/tie-break contract as [[bruteForceTopK]] (round-6 scores,
    * neighbor-id tiebreak), so the oracle twin is hash-exact.
    *
    * This is the exact/bounded variant (|Q| broadcast by contract, one
    * corpus scan); at corpus scale mine through [[hardNegativesAnn]],
    * which oversamples an ANN candidate set and label-filters it. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("_ql"), col(vecCol).as("_qv"),
      norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("_cl"), col(vecCol).as("_cv"),
      norm(col(vecCol)).as("_cn"))
    val scored = c.join(broadcast(q), col("_ql") =!= col("_cl"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6)
          .as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** [[hardNegatives]] at scale: LSH-bucketed candidates oversampled to
    * `k · oversample` per query, label-filtered, then re-ranked down to
    * k. Recall vs the exact miner is a fixture property
    * (SimilarityOpsSpec), not a guarantee — the standard ANN trade. */
  def hardNegativesAnn(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String, labelCol: String,
                       k: Int, dim: Int, bits: Int = 4, tables: Int = 8,
                       oversample: Int = 4): DataFrame = {
    val labels = corpus.select(col(idCol).as("_nid"),
      col(labelCol).as("_cl"))
    val qLabels = queries.select(col(idCol).as("_qid"),
      col(labelCol).as("_ql"))
    val cand = annTopK(queries, corpus, idCol, vecCol,
        k = k * oversample, dim = dim, bits = bits, tables = tables)
      .join(broadcast(qLabels), col("query_id") === col("_qid"))
      .join(labels, col("neighbor_id") === col("_nid"))
      .filter(col("_ql") =!= col("_cl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    cand.withColumn("_rnk2", row_number().over(w))
      .filter(col("_rnk2") <= k)
      .select(col("query_id"), col("_rnk2").as("rnk"),
        col("neighbor_id"), col("score"))
  }

  /** Deterministic random hyperplanes: `bits` planes of dimension `dim`,
    * components uniform in [-1, 1) from a seeded PRNG. Driver-side
    * literals — they fold into the plan, nothing is broadcast at runtime. */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bit LSH bucket of a vector under one table's hyperplanes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeLit) > 0,
        call_function("shiftleft", lit(1L), lit(i))).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Sign-pattern blocking buckets for near-identical vectors: table t's
    * bucket is the sign bitmask of `bitsPerTable` consecutive components.
    * Identical vectors share every bucket with certainty; a 0.99-cosine
    * near-dup flips a sign only where a component sits within ε of zero,
    * and disjoint component subsets give independent chances to collide.
    * Unlike hyperplane projections this costs `dim` comparisons per row —
    * no dot products — so bucketing 10⁹ vectors is a cheap projection. */
  def signBuckets(vec: Column, dim: Int, bitsPerTable: Int = 16): Column =
    array((0 until dim / bitsPerTable).map { t =>
      (0 until bitsPerTable).map { i =>
        when(element_at(vec, t * bitsPerTable + i + 1) > 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*)

  /** Embedding-cosine near-duplicate pairs (the §2.10 "embedding-cosine
    * near-dup" dedup variant): candidates from sign-pattern bucket
    * collisions (any of dim/bitsPerTable disjoint tables), then exact
    * cosine ≥ threshold on the candidates only.
    *
    * Scale shape: the bucket join carries ONLY (table, bucket, id) — never
    * vectors — and pairs are deduped before vectors are re-attached by two
    * id joins, so the heavy payload crosses the network once per surviving
    * candidate, and the all-pairs cross product never materializes. With
    * 2^16 buckets per table, random buckets stay near-singleton even at
    * millions of vectors. */
  def nearDupPairsEmbedding(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dim: Int,
                            bitsPerTable: Int = 16): DataFrame = {
    val vecs = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val blocks = vecs.select(col("_id"),
        posexplode(signBuckets(col("_v"), dim, bitsPerTable)))
      .withColumnsRenamed(Map("pos" -> "_tbl", "col" -> "_bkt"))
    val l = blocks.select(col("_tbl"), col("_bkt"), col("_id").as("id_a"))
    val r = blocks.select(col("_tbl"), col("_bkt"), col("_id").as("id_b"))
    val pairs = l.join(r, Seq("_tbl", "_bkt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(vecs.select(col("_id").as("id_a"), col("_v").as("_av")),
        Seq("id_a"))
      .join(vecs.select(col("_id").as("id_b"), col("_v").as("_bv")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("_av"), col("_bv")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Apply embedding near-dup dedup: keep the lowest-id member of every
    * duplicate cluster (higher ids anti-joined out). */
  def dedupeByEmbedding(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, dim: Int): DataFrame = {
    // anti join on the loser-id set; AQE picks broadcast vs shuffled hash
    // from the runtime size (the dup fraction is data-dependent).
    val losers = nearDupPairsEmbedding(df, idCol, vecCol, threshold, dim)
      .select(col("id_b").as("_loser")).distinct()
    df.join(losers, col(idCol) === col("_loser"), "left_anti")
  }

  /** IVF (inverted-file) approximate top-k: k-means partitions the corpus
    * into `nCentroids` cells; each query probes its `nProbe` nearest cells
    * and ranks only those cells' vectors by exact cosine.
    *
    * The other classic ANN layout besides LSH ([[annTopK]]): better for
    * clustered embedding spaces (cells adapt to the data), at the cost of
    * a training pass. Scale shape: training samples the corpus; cell
    * assignment is one projection; the probe join touches
    * nProbe/nCentroids of the corpus per query instead of all of it.
    * Distances use ||q−c||² = q·q − 2·q·c + c·c over the broadcast
    * centroid table (tiny). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L, maxIter: Int = 5,
              trainSampleRows: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val fv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"),
      array_to_vector(col(vecCol).cast("array<double>")).as("_fv"))
    // Train on a bounded subset (classic IVF: centroids only need the
    // distribution, not every vector) — at 10⁹ corpus rows a full-fit
    // k-means would dominate the whole query. First-N via limit is
    // deterministic and shuffle-light; callers with pathologically
    // ordered corpora should pre-shuffle once upstream.
    val trainSet = fv.select(col("_fv")).limit(trainSampleRows)
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setMaxIter(maxIter).setFeaturesCol("_fv").setPredictionCol("_cell")
      .fit(trainSet)
    val cells = model.transform(fv).select(col("neighbor_id"), col("_cv"),
      col("_cell"))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (v, i) => (i, v.toArray) })
      .toDF("_cell", "_centroid")
    // per query: nProbe nearest cells by L2 distance to the centroid
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val probeWin = Window.partitionBy(col("query_id"))
      .orderBy(asc("_d2"), asc("_cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_d2",
        dot(col("_qv"), col("_qv"))
          - lit(2.0) * dot(col("_qv"), col("_centroid"))
          + dot(col("_centroid"), col("_centroid")))
      .withColumn("_pr", row_number().over(probeWin))
      .filter(col("_pr") <= nProbe)
      .select(col("query_id"), col("_qv"), col("_cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    cells.join(broadcast(probes), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_qv"), col("_cv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  // ---- shared sampled-quantizer helpers (IVF cells / PQ codebooks) ----
  // One definition of the codebook sampling, the literal-folded distance
  // and the argmin encodings, shared by ivfTopKSampled / pqTopK /
  // ivfPqTopK: the three layouts MUST stay arithmetically identical
  // (the IVFADC spec asserts its ADC estimates equal pqTopK's, and the
  // DuckDB oracles reproduce these exact expressions).

  /** The `n` lowest-id corpus vectors as driver-side double arrays —
    * bounded collect, same contract as the LSH hyperplane literals.
    * Returns min(n, |corpus|) vectors; callers clamp their codebook /
    * centroid counts to what the corpus can supply. */
  private def sampleVectors(corpus: DataFrame, idCol: String,
                            vecCol: String, n: Int): Seq[IndexedSeq[Double]] = {
    val s = corpus
      .select(col(idCol).cast("long").as("_cid"),
        col(vecCol).cast("array<double>").as("_cv"))
      .orderBy(col("_cid")).limit(n)
      .collect().toSeq.map(_.getSeq[Double](1).toIndexedSeq)
    require(s.nonEmpty, "sampled quantizer needs a non-empty corpus")
    s
  }

  /** ||v − c||² = v·v − 2·v·c + c·c against a literal vector — the
    * exact left-to-right accumulation the DuckDB twins reproduce. */
  private def d2ToLit(v: Column, c: IndexedSeq[Double]): Column = {
    val cl = array(c.map(lit): _*)
    dot(v, v) - lit(2.0) * dot(v, cl) + dot(cl, cl)
  }

  /** (distance², cell) structs for every centroid; array_sort orders
    * lexicographically — nearest cell first, ties to the lowest cell.
    * QUERY-side only (top-nProbe needs the partial sort of a bounded
    * input); corpus-grain argmin goes through [[nearestLit]] — the
    * struct-sort tree is too large to JIT at millions of rows
    * (measured 225 µs/row vs ~1 µs for the compiled kernel).
    * Package-private as the reference formulation NativeExprsSpec pins
    * the kernel against. */
  private[graft] def cellStructs(v: Column,
                                 cents: Seq[IndexedSeq[Double]]): Column =
    array(cents.zipWithIndex.map { case (cvec, i) =>
      struct(d2ToLit(v, cvec).as("d"), lit(i).as("c"))
    }: _*)

  /** Argmin index against literal candidate vectors — the compiled
    * [[graft.expressions.NearestIndexLit]] kernel; bit-identical to
    * `element_at(array_sort(cellStructs(v, cands)), 1).getField("c")`
    * including the double ordering and lowest-index tie-break (pinned
    * in NativeExprsSpec). `offset` selects a subspace window for the
    * PQ per-subspace codeword argmin. */
  private def nearestLit(v: Column, cands: Seq[IndexedSeq[Double]],
                         offset: Int): Column =
    call_function("graft_nearest", v,
      typedlit(cands.map(_.toSeq)), lit(offset))

  /** Subspace `mi` of a PQ codeword-source vector. */
  private def pqCodeword(src: IndexedSeq[Double], mi: Int,
                         sub: Int): IndexedSeq[Double] =
    src.slice(mi * sub, (mi + 1) * sub)

  /** Nearest-codeword id for subspace `mi` (tie → lowest codeword) —
    * the [[nearestLit]] kernel on the `[mi·sub, (mi+1)·sub)` window. */
  private def pqCodeCol(v: Column, mi: Int, sub: Int,
                        cws: Seq[IndexedSeq[Double]]): Column =
    nearestLit(v, cws.map(cw => pqCodeword(cw, mi, sub)), mi * sub)

  /** ADC lookup table for subspace `mi`: distance to every codeword. */
  private def pqDistTable(v: Column, mi: Int, sub: Int,
                          cws: Seq[IndexedSeq[Double]]): Column =
    array(cws.map(cw => d2ToLit(slice(v, mi * sub + 1, sub),
      pqCodeword(cw, mi, sub))): _*)

  /** IVF top-k with a DETERMINISTIC sampled coarse quantizer: cells are
    * the Voronoi regions of the `nCentroids` lowest-id corpus vectors.
    * Sampled centroids are the classic cheap alternative to a k-means fit
    * (quantization is slightly worse, the inverted-file structure — cell
    * assignment, nProbe probing, candidate join — is identical), and
    * every step is exactly reproducible in SQL, so unlike [[ivfTopK]]
    * this layout is oracle-checkable end-to-end.
    *
    * Scale shape: the centroid rows are collected driver-side (bounded:
    * nCentroids rows, same contract as the LSH hyperplane literals) and
    * fold into the plan as constants — cell assignment and probe
    * selection are narrow SHUFFLE-FREE projections with no training job;
    * the probe join then touches ~nProbe/nCentroids of the corpus per
    * query. Distances compare by ||q−c||² = q·q − 2·q·c + c·c with the
    * same left-to-right accumulation as the DuckDB twin, ties broken by
    * cell id. */
  def ivfTopKSampled(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int, nCentroids: Int = 16,
                     nProbe: Int = 4): DataFrame = {
    val cents = sampleVectors(corpus, idCol, vecCol, nCentroids)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"),
      nearestLit(col(vecCol), cents, 0).as("_cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(transform(
          slice(array_sort(cellStructs(col(vecCol), cents)), 1, nProbe),
          s => s.getField("c"))).as("_cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    c.join(broadcast(q), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_qv"), col("_cv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** Product-quantization top-k with asymmetric distance (the PQ/ADC
    * half of Jégou et al., TPAMI 2011, complementing [[ivfTopKSampled]]'s
    * coarse quantizer): the vector splits into `m` subspaces; each
    * subspace has `nCodewords` codewords (the subvectors of the
    * nCodewords lowest-id corpus vectors — deterministic sampled
    * codebooks, same rationale as the sampled IVF centroids); a corpus
    * vector stores only its m codeword ids; a query computes one m ×
    * nCodewords distance table and ranks every corpus vector by the sum
    * of table lookups — never touching the corpus floats.
    *
    * Scale shape: encoding is a narrow shuffle-free projection against
    * literal codebooks (the classic O(dim·nCodewords) per row); the
    * search scans CODES (m small ints per vector — a 64-float vector
    * compresses to 4 bytes here) with the query tables broadcast, so the
    * ranking pass reads ~1/64th the bytes of brute force. The estimated
    * distance sums the m lookups in fixed subspace order, so results
    * reproduce bit-for-bit across engines. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int, m: Int = 4,
             nCodewords: Int = 16): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    // clamped: a corpus smaller than nCodewords yields that many codewords
    val cws = sampleVectors(corpus, idCol, vecCol, nCodewords)
    val codes = corpus.select(col(idCol).as("neighbor_id") +:
      (0 until m).map(mi =>
        pqCodeCol(col(vecCol), mi, sub, cws).as(s"_cw$mi")): _*)
    // per-query ADC tables: _dt<mi>[cw] = d2(query subvector, codeword)
    val q = queries.select(col(idCol).as("query_id") +:
      (0 until m).map(mi =>
        pqDistTable(col(vecCol), mi, sub, cws).as(s"_dt$mi")): _*)
    val est = (0 until m).map(mi =>
      element_at(col(s"_dt$mi"), col(s"_cw$mi") + lit(1))).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("est_d2"), asc("neighbor_id"))
    codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(est, 6).as("est_d2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("est_d2"))
  }

  /** The full inverted-file + product-quantization layout (IVFADC,
    * Jégou et al. TPAMI 2011 §IV): the sampled coarse quantizer
    * ([[ivfTopKSampled]]'s cells) restricts the search to `nProbe` cells,
    * and PQ codes ([[pqTopK]]'s codebooks) rank the candidates by
    * asymmetric distance — so the query touches ~nProbe/nCentroids of
    * the corpus AND reads only m bytes per candidate. This is the layout
    * a billion-vector index actually deploys; both halves are the
    * deterministic sampled variants, so results are exactly reproducible.
    *
    * Composition note: cell assignment and PQ encoding are independent
    * narrow projections over the corpus (one pass computes both); the
    * probe join carries (cell, codes) — never floats. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, dim: Int, nCentroids: Int = 16,
                nProbe: Int = 4, m: Int = 4,
                nCodewords: Int = 16): DataFrame =
    ivfPqTopKWithIndex(queries,
      buildAnnIndexState(corpus, idCol, vecCol, dim, nCentroids, m,
        nCodewords),
      idCol, vecCol, k, nProbe)

  // ---- persistable ANN index state (r13 verdict ask #4) --------------
  // The sampled quantizer params and the encoded corpus are
  // deterministic pure functions of (corpus, params), but retraining
  // them per session re-pays the corpus encode pass at daily cadence.
  // The near-dup band index (DedupOps.buildNearDupIndex) set the
  // pattern: materialize the trained state as parquet keyed by
  // (params, corpus-version), load-or-train in a job
  // (jobs.AnnIndexJob), search off the loaded tables. The *WithIndex
  // entry points below are the EXACT search arithmetic of their
  // train-inline twins — the inline forms now delegate to them, so the
  // two paths cannot drift.

  /** Trained ANN index state: the sampled coarse centroids and PQ
    * codebooks (tiny, plan-literal-sized — held driver-side, the same
    * contract as the LSH hyperplane literals) plus the encoded corpus
    * (`neighbor_id`, `_cell`, `_cw0..{m-1}` — m small ints per vector,
    * floats dropped). */
  case class AnnIndexState(dim: Int, nCentroids: Int, m: Int,
                           nCodewords: Int,
                           cents: Seq[IndexedSeq[Double]],
                           cws: Seq[IndexedSeq[Double]],
                           codes: DataFrame)

  /** Train the sampled-quantizer index: one bounded driver-side sample
    * for the quantizer params, ONE corpus pass computing cell + codes
    * (a narrow shuffle-free projection — floats never shuffle). */
  def buildAnnIndexState(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, nCentroids: Int = 16, m: Int = 4,
                         nCodewords: Int = 16): AnnIndexState = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sample = sampleVectors(corpus, idCol, vecCol,
      math.max(nCentroids, nCodewords))
    val st0 = AnnIndexState(dim, nCentroids, m, nCodewords,
      sample.take(nCentroids), sample.take(nCodewords), corpus.limit(0))
    st0.copy(codes = encodeWithState(corpus, idCol, vecCol, st0))
  }

  /** Encode a corpus (or a new BATCH at daily cadence) against a
    * trained state's FROZEN quantizer: the same one-pass cell + codes
    * projection [[buildAnnIndexState]] runs at train time, so appended
    * rows are bit-identical to what a from-scratch encode with the
    * same params would produce — the append path of
    * [[graft.jobs.AnnIndexJob]] leans on exactly this determinism. */
  def encodeWithState(corpus: DataFrame, idCol: String, vecCol: String,
                      st: AnnIndexState): DataFrame = {
    val sub = st.dim / st.m
    corpus.select(
      col(idCol).as("neighbor_id") +:
        nearestLit(col(vecCol), st.cents, 0).as("_cell") +:
        (0 until st.m).map(mi =>
          pqCodeCol(col(vecCol), mi, sub, st.cws).as(s"_cw$mi")): _*)
  }

  /** IVFADC search off a trained/loaded index — [[ivfPqTopK]]'s exact
    * probe join, fixed-order ADC estimate, and ranking. */
  def ivfPqTopKWithIndex(queries: DataFrame, st: AnnIndexState,
                         idCol: String, vecCol: String, k: Int,
                         nProbe: Int = 4): DataFrame = {
    val sub = st.dim / st.m
    val q = queries.select(
      col(idCol).as("query_id") +:
        explode(transform(
          slice(array_sort(cellStructs(col(vecCol), st.cents)), 1, nProbe),
          s => s.getField("c"))).as("_cell") +:
        (0 until st.m).map(mi =>
          pqDistTable(col(vecCol), mi, sub, st.cws).as(s"_dt$mi")): _*)
    val est = (0 until st.m).map(mi =>
      element_at(col(s"_dt$mi"), col(s"_cw$mi") + lit(1))).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("est_d2"), asc("neighbor_id"))
    st.codes.join(broadcast(q), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(est, 6).as("est_d2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("est_d2"))
  }

  /** Sampled-IVF search off a loaded index: cell assignments come from
    * the index (skipping the per-session assignment pass); the exact
    * cosine rerank joins the corpus floats back by id — identical
    * arithmetic to [[ivfTopKSampled]]. */
  def ivfTopKSampledWithIndex(queries: DataFrame, corpus: DataFrame,
                              st: AnnIndexState, idCol: String,
                              vecCol: String, k: Int,
                              nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("_cv"))
      .join(st.codes.select(col("neighbor_id"), col("_cell")),
        Seq("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(transform(
          slice(array_sort(cellStructs(col(vecCol), st.cents)), 1, nProbe),
          s => s.getField("c"))).as("_cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    c.join(broadcast(q), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_qv"), col("_cv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** PQ/ADC search off a loaded index — [[pqTopK]]'s exact estimate
    * and ranking over the index's code columns (the `_cell` column
    * rides along unused). */
  def pqTopKWithIndex(queries: DataFrame, st: AnnIndexState,
                      idCol: String, vecCol: String, k: Int): DataFrame = {
    val sub = st.dim / st.m
    val q = queries.select(col(idCol).as("query_id") +:
      (0 until st.m).map(mi =>
        pqDistTable(col(vecCol), mi, sub, st.cws).as(s"_dt$mi")): _*)
    val est = (0 until st.m).map(mi =>
      element_at(col(s"_dt$mi"), col(s"_cw$mi") + lit(1))).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("est_d2"), asc("neighbor_id"))
    st.codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(est, 6).as("est_d2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("est_d2"))
  }

  /** Recall@k ship gate over TWO top-k lists: per query, how much of
    * `truth` (the exact top-k) the `ann` list recovered — the metric a
    * deployment checks before swapping the exact scan for an index,
    * and re-checks after every index append (appends against a frozen
    * quantizer can only degrade recall). Both inputs carry
    * (`query_id`, `neighbor_id`); output adds exact-integer
    * `recall_ppm`. List-sized joins only — the corpus is never
    * re-touched. */
  def topKRecall(truth: DataFrame, ann: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val a = ann.select(col("query_id"), col("neighbor_id"))
    val nTruth = t.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"))
    val nAnn = a.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_ann"))
    val nHit = t.join(a, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    nTruth.join(nAnn, Seq("query_id"), "left")
      .join(nHit, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_ann", "n_hit"))
      .withColumn("recall_ppm", expr("n_hit * 1000000 div n_truth"))
  }

  /** MRR ship gate: reciprocal rank (ppm, 0 on a miss) of the TRUE
    * nearest neighbor inside the `ann` top-k — the ranking-quality
    * half of the gate. `truth1` carries (`query_id`, `truth_id`) =
    * the exact top-1; `ann` carries (`query_id`, `neighbor_id`,
    * `rnk`). */
  def topKMrr(truth1: DataFrame, ann: DataFrame): DataFrame =
    truth1.select(col("query_id"), col("truth_id"))
      .join(ann.select(col("query_id"),
        col("neighbor_id").as("truth_id"),
        col("rnk").cast("long").as("ann_rank")),
        Seq("query_id", "truth_id"), "left")
      .na.fill(0L, Seq("ann_rank"))
      .withColumn("mrr_ppm", when(col("ann_rank") > 0,
        expr("1000000 div ann_rank")).otherwise(lit(0L)))

  /** LSH-bucketed approximate top-k: `tables` independent hash tables of
    * `bits` hyperplanes each; candidates = corpus vectors sharing a bucket
    * with the query in ANY table; exact cosine re-ranks candidates.
    *
    * Recall/cost dial: more bits → smaller buckets (fewer candidates,
    * lower recall); more tables → higher recall (union of probes). At
    * billions of vectors: bits ~ log2(n/target_bucket_size), tables 4-16.
    *
    * Scale shape (the [[nearDupPairsEmbedding]] discipline): bucket rows
    * carry ONLY (table, bucket, id) — never vectors — so the candidate
    * join and the pair dedup shuffle three small columns; the dim-float
    * payloads are re-attached AFTER the dedup, queries by broadcast and
    * the corpus by one id equi-join, crossing the network once per
    * surviving candidate. (The first cut carried both vectors through
    * the ×tables explode and the dedup — 5× slower at 10³ vectors,
    * fatal at 10⁹.) */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, bits: Int = 4,
              tables: Int = 8, seed: Long = 42L): DataFrame =
    annTopKImpl(queries, corpus, idCol, vecCol, k, dim, bits, tables,
      seed, broadcastQueries = true)

  /** [[annTopK]] with the corpus itself as the query side (every-vector
    * top-k, the mutual-kNN substrate): IDENTICAL results, but nothing
    * broadcasts — with queries == corpus the broadcast tier would ship
    * the whole corpus (bucket rows AND vectors) to every executor and
    * materialize it on the driver, which is exactly the OOM the
    * broadcast contract exists to prevent. Here the candidate stage is
    * a shuffle equi-join on (table, bucket) carrying id-only rows, and
    * both vector re-attachments are id equi-joins — every exchange is
    * corpus-sized, none is driver-sized. */
  def annTopKSelf(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, dim: Int, bits: Int = 4,
                  tables: Int = 8, seed: Long = 42L): DataFrame =
    annTopKImpl(df, df, idCol, vecCol, k, dim, bits, tables,
      seed, broadcastQueries = false)

  private def annTopKImpl(queries: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, k: Int,
                          dim: Int, bits: Int, tables: Int, seed: Long,
                          broadcastQueries: Boolean): DataFrame = {
    val allPlanes = (0 until tables)
      .map(t => hyperplanes(dim, bits, seed + t))
    def bucketed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"),
        posexplode(array(allPlanes.map(p => lshBucket(col(vecCol), p)): _*)))
        .withColumnsRenamed(Map("pos" -> "_tbl", "col" -> "_bkt"))
    def qSide(df: DataFrame): DataFrame =
      if (broadcastQueries) broadcast(df) else df
    val qb = bucketed(queries, "query")
    val cb = bucketed(corpus, "neighbor")
    val cand = cb.join(qSide(qb), Seq("_tbl", "_bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_queryv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_neighborv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    cand.join(qSide(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_queryv"), col("_neighborv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** SemDeDup — semantic deduplication by cluster-blocked embedding
    * cosine (Abbas et al. 2023, arXiv:2303.09540): assign every vector
    * to its nearest centroid cell, compare pairs only WITHIN a cell, and
    * where a pair exceeds `tau` keep the member with the LOWER cosine
    * similarity to its cell centroid (the paper's keep rule — the item
    * farther from the cluster center is the more "informative" copy;
    * ties break to the lower id). Returns the kept rows with their cell
    * and centroid-similarity columns.
    *
    * Drop rule (pairwise dominance, no transitive closure — matches the
    * paper's per-cluster duplicate-group handling and this file's
    * drop-the-dominated convention): x is dropped iff some same-cell y
    * has round-6 cos(x,y) > tau and (csim(y), id(y)) < (csim(x), id(x))
    * lexicographically. The minimal member of every duplicate group
    * always survives.
    *
    * Cells come from the deterministic sampled quantizer (Voronoi
    * regions of the `nCentroids` lowest-id vectors, folded into the plan
    * as literals — [[ivfTopKSampled]]'s contract), so assignment is a
    * shuffle-free projection, there is no training job, and the whole
    * op reproduces exactly in SQL. A k-means assignment (the
    * [[ivfTopK]] path) plugs into the identical pair/keep stage when
    * cluster adaptivity matters more than oracle-checkability.
    *
    * Scale shape: ONE shuffle, on the cell key, carrying (id, vec,
    * csim); the pair space is within-cell quadratic BY DESIGN (the
    * paper's trade: nCentroids bounds cell population — size cells to
    * ~10⁴-10⁵ vectors at 100 TB); the keeper decision needs no global
    * state, so cells dedupe independently and in parallel. For corpora
    * whose cells still overflow, [[dedupeByEmbedding]]'s sign-pattern
    * sub-blocking composes inside a cell unchanged. */
  /** Embedding covariance matrix in ONE corpus pass — the PCA /
    * whitening / decorrelation foundation: the custom typed aggregate
    * [[graft.expressions.GramMatrixFixed]] folds each partition's rows
    * into a single `(n, Σx, Σxxᵀ)` fixed-point buffer (map-side
    * partials, only dim²+dim+1 longs per task cross the network), and
    * this wrapper unpacks it to (i, j, n, gram_fixed, cov) rows with
    * cov = G/n − μᵢμⱼ. Deterministic to the bit across layouts and
    * engines (integer buffer sums; the cov doubles are a fixed chain of
    * correctly-rounded ops). Consumers eigendecompose the d×d result
    * driver-side — at any corpus scale that matrix is tiny. */
  def embeddingCovariance(df: DataFrame, vecCol: String,
                          dim: Int): DataFrame = {
    val g = df.agg(call_function("graft_gram",
      col(vecCol).cast("array<double>"), lit(dim)).as("_g"))
    val scale = 1073741824.0 // 2^30, the aggregate's fixed-point scale
    def m(si: Column, n: Column) =
      (si.cast("double") / lit(scale)) / n.cast("double")
    g.select(col("_g.n").as("n"), col("_g.sums").as("_s"),
        posexplode(col("_g.gram")).as(Seq("_pos", "gram_fixed")))
      .select(
        (col("_pos") / lit(dim)).cast("int").as("i"),
        pmod(col("_pos"), lit(dim)).cast("int").as("j"),
        col("n"), col("gram_fixed"),
        (((col("gram_fixed").cast("double") / lit(scale)) /
          col("n").cast("double")) -
          m(element_at(col("_s"), (col("_pos") / lit(dim)).cast("int") + 1),
            col("n")) *
            m(element_at(col("_s"),
              pmod(col("_pos"), lit(dim)).cast("int") + 1), col("n")))
          .as("cov"))
  }

  /** PCA projection of an embedding column onto its top-k principal
    * components — dimensionality reduction before ANN / clustering /
    * visualization. The covariance comes from [[embeddingCovariance]]
    * (ONE corpus pass; the d×d matrix is driver-tiny at any corpus
    * scale), the eigensolve is a deterministic driver-side power
    * iteration with deflation (fixed start vector, fixed iteration
    * count — same inputs, same components, every run), and the
    * components fold into the plan as literals, so the projection
    * itself is a narrow codegen'd `graft_dot` projection: centered
    * vector · component, no shuffle, stream-safe like every
    * literal-folded op here. Library-level (the eigensolve has no SQL
    * analog to oracle against); the covariance input IS oracled
    * (x_embed_cov) and the projection properties are unit-tested
    * (variance ordering, component orthonormality, determinism). */
  def pcaProject(df: DataFrame, vecCol: String, dim: Int,
                 k: Int): DataFrame = {
    require(k >= 1 && k <= dim, s"bad k=$k for dim=$dim")
    // ONE corpus aggregate: the raw graft_gram struct carries n, Σx and
    // Σxxᵀ — both the covariance matrix and the mean derive from it
    // driver-side with the exact double chain embeddingCovariance uses
    // (x_fixed/scale/n − μᵢμⱼ), so the components are bit-identical to
    // the two-pass formulation this replaces.
    val g = df.agg(call_function("graft_gram",
        col(vecCol).cast("array<double>"), lit(dim)).as("_g"))
      .select(col("_g.n"), col("_g.sums"), col("_g.gram")).collect()(0)
    require(g.getLong(0) > 0, "pcaProject needs a non-empty corpus")
    val scale = 1073741824.0 // 2^30, the aggregate's fixed-point scale
    val n = g.getLong(0).toDouble
    val sums = g.getSeq[Long](1)
    val gram = g.getSeq[Long](2)
    val mean = sums.map(_.toDouble / scale / n).toArray
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      gram(i * dim + j).toDouble / scale / n -
        (sums(i).toDouble / scale / n) * (sums(j).toDouble / scale / n)
    }
    // Deterministic power iteration + deflation (fixed 1/sqrt(dim)
    // start, 200 rounds — overkill for separation at d ≤ a few
    // thousand; ties/degenerate spectra resolve deterministically to
    // whatever the fixed start converges to).
    def eigen(a: Array[Array[Double]]): (Double, Array[Double]) = {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var it = 0
      while (it < 200) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => a(i)(j) * v(j)).sum)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm == 0.0) return (0.0, v)
        v = w.map(_ / nrm)
        it += 1
      }
      val lam = (0 until dim).map(i =>
        v(i) * (0 until dim).map(j => a(i)(j) * v(j)).sum).sum
      (lam, v)
    }
    val comps = Array.ofDim[Array[Double]](k)
    val work = cov.map(_.clone())
    var c = 0
    while (c < k) {
      val (lam, v) = eigen(work)
      comps(c) = v
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { work(i)(j) -= lam * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    // (v − μ)·c = v·c − μ·c, and μ·c is a driver-side constant — the
    // projection stays a pure codegen'd graft_dot (no interpreted
    // zip_with centering in the hot path).
    val projCols = comps.zipWithIndex.map { case (comp, ci) =>
      val meanDot = mean.zip(comp).foldLeft(0.0) {
        case (acc, (m, cc)) => acc + m * cc
      }
      (dot(col(vecCol).cast("array<double>"),
        array(comp.map(lit).toSeq: _*)) - lit(meanDot)).as(s"pc${ci + 1}")
    }
    df.select((df.columns.map(col).toSeq ++ projCols.toSeq): _*)
  }

  /** Lloyd's k-means over an embedding column, ENGINE-EXACT: unlike
    * [[ivfTopK]]'s ML-backed training pass (float math, seed-dependent),
    * every step here is reproducible bit-for-bit on any engine, so the
    * clustering itself is an oracle-checkable operator — the clustering
    * a curation pipeline uses for cluster-balanced sampling or
    * SemDeDup-style pruning, with an audit trail.
    *
    * Determinism by construction, round by round:
    *  - init: the first `k` vectors by id (no RNG);
    *  - distances: `Σ_dims floor((v_i−c_i)²·2³⁰)` — per-dim IEEE ops are
    *    correctly rounded, the scale shift and floor are exact, and the
    *    64-term BIGINT sum is order-free; argmin ties break by centroid
    *    id;
    *  - centroid update: per-(cluster, dim) sums of `floor(v_i·2³⁰)` as
    *    BIGINT, then INTEGER division by the member count and an exact
    *    `/2³⁰` exponent shift — so the next round's centroids are
    *    identical doubles everywhere. Clusters that lose every member
    *    drop out (standard Lloyd's degeneracy, deterministic here).
    *
    * Scale shape: each round is (a) one narrow assignment projection —
    * k·d literal multiply-adds per row, whole-stage codegen, NO shuffle
    * — and (b) one (cluster, dim)-grouped aggregate with map-side
    * partials whose result is k·d longs to the driver (the only driver
    * state; 4×64 here). The update round carries `_v` THROUGH the
    * assignment projection (never re-joining the corpus to itself to
    * re-fetch it — [[kmeansUpdateFrame]] is join-free by construction
    * and PlanShapeSpec pins it). Rounds are a fixed small count. At
    * 10⁹ rows this is the textbook distributed Lloyd's layout.
    */
  def kmeansLloydFx(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int, iters: Int = 2): DataFrame = {
    require(k >= 1 && iters >= 1 && dim >= 1,
      s"k/dim/iters must be >= 1: $k/$dim/$iters")
    val vecs = df.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    val cents = kmeansCentroidsFx(df, idCol, vecCol, k, dim, iters)
    vecs.withColumn("_best", kmeansTop2Col(col("_v"), cents))
      .select(col("_id").as(idCol), col("_best").getField("c1")
        .as("cluster"), col("_best").getField("d1").as("dist_fx"))
  }

  /** The trained centroid table of [[kmeansLloydFx]]'s rounds (driver-
    * tiny: k·dim doubles) — shared with [[silhouetteFx]] so the audit
    * scores the SAME model the clustering query ships. */
  private[graft] def kmeansCentroidsFx(df: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int,
      iters: Int): Seq[(Int, Array[Double])] = {
    require(k >= 1 && iters >= 1 && dim >= 1,
      s"k/dim/iters must be >= 1: $k/$dim/$iters")
    val vecs = df.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    val init = vecs.orderBy(col("_id")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }.toSeq
    var cents = init
    var round = 1
    while (round < iters) {
      // centroid update: fixed-point component sums, integer-divided by
      // the member count — k·(dim+2) values back to the driver, one row
      // per surviving cluster.
      val sums = kmeansUpdateFrame(vecs, cents, dim).collect()
      cents = sums.toSeq.map { r =>
        val n = r.getLong(dim + 1)
        val comp = Array.tabulate(dim)(i =>
          (r.getLong(i + 1) / n).toDouble / 1073741824.0)
        (r.getInt(0), comp)
      }.sortBy(_._1)
      round += 1
    }
    cents
  }

  /** Simplified (centroid-based) silhouette of the [[kmeansLloydFx]]
    * clustering (Rousseeuw 1987's coefficient in the
    * O(n·k) centroid form — Hruschka et al. 2004 — instead of the
    * O(n²) pairwise one): per vector, `a` = fixed-point distance to
    * its OWN centroid, `b` = distance to the nearest OTHER centroid,
    * `s = (b − a)/max(a, b)` in exact integer ppm (positive = well
    * placed, ≈ 0 = on a boundary, negative = likely mis-clustered).
    * The standard "did k make sense" audit, sharing the exact centroid
    * table with the clustering query so audit and model cannot drift.
    *
    * Scale shape: centroids are plan literals; the whole audit is ONE
    * narrow codegen'd projection per row (the k·dim argmin cell array,
    * sorted, first two entries) — no join, no shuffle, no window; the
    * ppm ratio runs in DECIMAL(38,0). */
  def silhouetteFx(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, dim: Int, iters: Int = 2): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2: $k")
    val cents = kmeansCentroidsFx(df, idCol, vecCol, k, dim, iters)
    // a cluster that EMPTIES during a Lloyd round drops from the
    // centroid table — with < 2 survivors there is no "nearest other
    // centroid" and element_at(_, 2) would go null instead of loud
    require(cents.length >= 2,
      s"silhouette: only ${cents.length} cluster(s) survived the " +
        "Lloyd rounds — no second centroid to measure separation against")
    df.select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_c", kmeansTop2Col(col("_v"), cents))
      .select(col("_id").as(idCol),
        col("_c").getField("c1").as("cluster"),
        col("_c").getField("d1").as("a_fx"),
        col("_c").getField("d2").as("b_fx"))
      .withColumn("silhouette_ppm",
        when(greatest(col("a_fx"), col("b_fx")) > 0L,
          expr("cast(cast(b_fx - a_fx as decimal(38,0)) * 1000000" +
            " div greatest(a_fx, b_fx) as bigint)"))
          .otherwise(lit(0L)))
  }

  /** Top-2 fixed-point cells against literal centroids — the compiled
    * [[graft.expressions.KmeansTop2Fx]] kernel shared by the assignment
    * and update rounds of [[kmeansLloydFx]] and by [[silhouetteFx]];
    * bit-identical to sorting [[kmeansCellsFx]] (pinned in
    * NativeExprsSpec). */
  private def kmeansTop2Col(v: Column,
                            cents: Seq[(Int, Array[Double])]): Column =
    call_function("graft_kmeans_top2", v,
      typedlit(cents.map(_._1)),
      typedlit(cents.map(_._2.toSeq)))

  /** (fixed-point distance, cluster) structs against literal centroids —
    * the compositional reference formulation [[kmeansTop2Col]] is pinned
    * against in NativeExprsSpec. */
  private[graft] def kmeansCellsFx(v: Column,
                                   cents: Seq[(Int, Array[Double])],
                                   dim: Int): Column =
    array(cents.map { case (c, cv) =>
      struct((0 until dim).map { i =>
        val d = element_at(v, i + 1) - lit(cv(i))
        floor(d * d * lit(1073741824.0)).cast("long")
      }.reduce(_ + _).as("d"), lit(c).as("c"))
    }: _*)

  /** One Lloyd's update round as a single frame over a `(_id, _v)`
    * projection: the argmin assignment computed once per row (centroids
    * are plan literals), `_v` carried THROUGH it, then ONE
    * (cluster)-grouped WIDE aggregate — dim fixed-point component sums
    * as separate columns plus the member count, so k rows × (dim+2)
    * columns come back. No join anywhere, and deliberately no
    * posexplode either: a Generate would multiply the corpus ×dim in
    * row count AND (via ExtractGenerator's outer Project) re-evaluate
    * the k·dim argmin once per exploded element. Package-private so
    * PlanShapeSpec can pin the join-free, Generate-free shape.
    * Output schema: (cluster, _s0 … _s{dim-1}, _n). */
  private[graft] def kmeansUpdateFrame(vecs: DataFrame,
      cents: Seq[(Int, Array[Double])], dim: Int): DataFrame = {
    val assigned = vecs.select(
      kmeansTop2Col(col("_v"), cents).getField("c1").as("cluster"),
      col("_v"))
    val sums = (0 until dim).map(i =>
      sum(floor(element_at(col("_v"), i + 1) * lit(1073741824.0))
        .cast("long")).as(s"_s$i"))
    assigned.groupBy(col("cluster"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("_n")): _*)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * merge two retrievers' ranked lists into one, scoring each hit
    * `Σ 1/(kRrf + rank)` over the lists that returned it. The standard
    * way to combine sparse (BM25) and dense (embedding) retrieval for
    * RAG context selection — rank-based, so no score calibration
    * between retrievers is needed.
    *
    * Both inputs carry `(query_id, neighbor_id, rnk)`; lists may cover
    * different corpus subsets (e.g. a dense index built over only part
    * of the corpus) — a hit missing from one list simply contributes
    * nothing from it. Each (query_id, neighbor_id) is expected AT MOST
    * ONCE per list (what every ranker here produces); inputs that
    * violate it — concatenated or unranked lists — are defensively
    * collapsed to their BEST (minimum) rank per pair before fusion, so
    * duplicates can neither inflate `rrf_fx` through the full-outer
    * join nor emit duplicate fused rows. Scores are EXACT fixed-point: each contribution
    * is `floor(2³⁰/(kRrf+rnk))` — for ranks ≤ ~10⁶ the double divide
    * is correctly rounded far below the floor boundary, so the floored
    * value equals true integer division on every engine — summed as
    * BIGINT, making the fused ordering engine- and layout-exact (ties
    * broken by neighbor id).
    *
    * Scale shape: the inputs are per-query top-k lists (tiny relative
    * to the corpora that produced them), so the fusion itself is one
    * equi-join + one bounded per-query window — negligible next to the
    * retrieval passes. Fusing k-by-query lists never touches the
    * corpus again. */
  def rrfFuse(listA: DataFrame, listB: DataFrame, kRrf: Int = 60,
              k: Int = 10): DataFrame = {
    require(kRrf >= 1, s"kRrf must be >= 1: $kRrf")
    require(k >= 1, s"k must be >= 1: $k")
    def contrib(rnk: Column): Column =
      floor(lit(1073741824.0) / (lit(kRrf) + rnk.cast("double")))
        .cast("long")
    // best-rank collapse: a no-op aggregate on well-formed top-k lists
    // (per-query k rows — negligible), a correctness guard on malformed
    // ones: duplicate (query, neighbor) entries would otherwise fan out
    // through the full-outer join and inflate rrf_fx.
    val a = listA.select(col("query_id"), col("neighbor_id"),
        col("rnk").as("_rnk_a"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("_rnk_a")).as("_rnk_a"))
    val b = listB.select(col("query_id"), col("neighbor_id"),
        col("rnk").as("_rnk_b"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("_rnk_b")).as("_rnk_b"))
    val fused = a.join(b, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        col("_rnk_a"), col("_rnk_b"),
        (coalesce(contrib(col("_rnk_a")), lit(0L)) +
          coalesce(contrib(col("_rnk_b")), lit(0L))).as("rrf_fx"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("rrf_fx"), asc("neighbor_id"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("rrf_fx"), col("_rnk_a").as("rank_a"),
        col("_rnk_b").as("rank_b"))
  }

  /** Mutual k-nearest-neighbor pairs: (a, b) such that b is in a's
    * top-k AND a is in b's top-k — the margin-free core of
    * mutual-NN pair mining (Artetxe & Schwenk 2019's bitext mining,
    * also the pairing step of dataset distillation matchers). Mutuality
    * is a much stronger signal than one-directional nearness: hub
    * vectors appear in many top-k lists but reciprocate few.
    *
    * Built on the [[bruteForceTopK]] contract (round-6 scores, id
    * tie-breaks), so the pair set is engine-exact. The cosine is
    * symmetric under the shared `graft_dot` accumulation order, so one
    * score per pair suffices. This exact form scans |C|² pairs —
    * bounded-corpus audit tier; at scale run the same mutuality join
    * over [[annTopK]] lists (LSH candidates), which keeps both
    * directions approximate but the join identical. */
  def mutualTopK(df: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame =
    mutualJoin(bruteForceTopK(df, df, idCol, vecCol, k))

  /** The reciprocity join shared by the exact and ANN mutual miners:
    * keep (a, b) iff both directions appear in the top-k list frame,
    * once per pair (id_a < id_b), with both ranks. A hub id appearing
    * in MANY top-k lists can still reciprocate at most k pairs — its
    * own list only names k neighbors (SimilarityOpsSpec property).
    * Package-private for that property test. */
  private[graft] def mutualJoin(topk: DataFrame): DataFrame = {
    val fwd = topk.select(col("query_id").as("id_a"),
      col("neighbor_id").as("id_b"), col("rnk").as("rnk_ab"),
      col("score"))
    val rev = topk.select(col("query_id").as("_rq"),
      col("neighbor_id").as("_rn"), col("rnk").as("rnk_ba"))
    fwd.join(rev,
        col("id_a") === col("_rn") && col("id_b") === col("_rq"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("rnk_ab"), col("rnk_ba"),
        col("score"))
  }

  /** [[mutualTopK]] at corpus scale: the identical reciprocity join,
    * but over [[annTopKSelf]]'s LSH-bucketed lists — no |C|² scan AND
    * no corpus broadcast (the query side IS the corpus here, so the
    * broadcast tier would driver-materialize it; the self variant
    * keeps every exchange corpus-sized). Each direction is approximate
    * (standard ANN trade), the mutuality filter is exact over whatever
    * the lists contain. Recall vs the exact miner is a fixture
    * property (SimilarityOpsSpec), not a guarantee. */
  def mutualTopKAnn(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int, bits: Int = 4,
                    tables: Int = 8): DataFrame =
    mutualJoin(annTopKSelf(df, idCol, vecCol, k = k, dim = dim,
      bits = bits, tables = tables))

  /** Per-dimension scalar quantization of an embedding column to int8
    * codes — the storage/bandwidth op that turns a 100 TB float32
    * embedding table into a 25 TB one (4× smaller scans for every ANN
    * probe, the first lever production vector stores pull).
    *
    * Codes: `clamp(floor((x−mn)·255/(mx−mn) + 0.5), 0, 255)` per
    * dimension, with corpus-wide per-dim (mn, mx). Determinism: min and
    * max are order-free (no float-sum issue), the quantize chain is one
    * fixed association of correctly-rounded IEEE ops, and the returned
    * checksum/error metrics are order-free integer sums — all
    * engine-exact. Degenerate dims (mx = mn) code to 0.
    *
    * Scale shape: ONE wide aggregate of 2·dim `min/max(element_at)`
    * exprs — the corpus is read at native width (no Generate node
    * multiplying the row count ×dim before partial aggregation;
    * PlanShapeSpec pins the explode-free stats subtree), map-side
    * partials, one 2·dim-column row to the driver — the quantizer
    * itself, persisted with the table in production. Then one
    * shuffle-free codegen'd projection with the 2·dim bounds folded in
    * as plan literals. Reports per vector: the code checksum, code
    * extremes, and the fixed-point squared reconstruction error. */
  /** The per-dim (min, max) bounds of a `(_id, _v)` projection as ONE
    * wide aggregate row — `_mn0, _mx0, …, _mn{dim-1}, _mx{dim-1}`.
    * Deliberately NOT posexplode+groupBy(pos): a Generate node would
    * multiply the corpus ×dim in row count before partial aggregation.
    * Package-private so PlanShapeSpec can pin the explode-free shape. */
  private[graft] def quantizeStatsFrame(vecs: DataFrame,
                                        dim: Int): DataFrame = {
    // probes are size-guarded: under ANSI (Spark 4 default) a bare
    // element_at past the end of a SHORT vector would kill the whole
    // stats job with an opaque executor ArrayIndexOutOfBounds before
    // quantizeInt8's ragged-corpus require can produce a real message
    def at(i: Int): Column =
      when(size(col("_v")) > i, element_at(col("_v"), i + 1))
    val aggs = (0 until dim).flatMap(i => Seq(
      min(at(i)).as(s"_mn$i"),
      max(at(i)).as(s"_mx$i"))) ++ Seq(
      max(size(col("_v"))).as("_maxlen"),
      min(size(col("_v"))).as("_minlen"))
    vecs.groupBy().agg(aggs.head, aggs.tail: _*)
  }

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String,
                   dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val vecs = df.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    val row = quantizeStatsFrame(vecs, dim).collect()(0)
    // longer vectors would be SILENTLY truncated by the per-dim probes
    // (the r9-review regression the old posexplode path caught by row
    // count) — and in a RAGGED corpus mixing exact-dim and shorter
    // vectors, max(size) alone still passes while the short vectors
    // feed nulls into trailing-dim min/max (stats over partial data,
    // null-quantized tails). Both directions must fail loudly:
    require(row.isNullAt(2 * dim) || row.getInt(2 * dim) == dim,
      s"quantizeInt8: vectors have up to ${row.getInt(2 * dim)} dims, " +
        s"expected dim=$dim")
    require(row.isNullAt(2 * dim + 1) || row.getInt(2 * dim + 1) == dim,
      s"quantizeInt8: corpus is ragged — shortest vector has " +
        s"${row.getInt(2 * dim + 1)} dims, expected dim=$dim")
    val stats = (0 until dim).map { i =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"quantizeInt8: no values for dim ${i + 1} — empty corpus or " +
          s"vectors shorter than dim=$dim")
      (i, row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    def codeAt(i: Int): Column = {
      val (_, mn, mx) = stats(i)
      require(!mn.isNaN && !mx.isNaN, s"NaN bound in dim ${i + 1}")
      if (mx > mn)
        least(lit(255L), greatest(lit(0L),
          floor((element_at(col("_v"), i + 1) - lit(mn)) * lit(255.0) /
            (lit(mx) - lit(mn)) + lit(0.5)).cast("long")))
      else lit(0L)
    }
    // materialize the codes array ONCE — the floor-chain per dim is
    // deep, and deriving sum/min/max/error each from fresh copies
    // would 4x the expression tree (risking codegen method limits at
    // higher dims); downstream reads are cheap element_at lookups.
    val coded = vecs.withColumn("_codes",
      array((0 until dim).map(codeAt): _*))
    def cAt(i: Int): Column = element_at(col("_codes"), i + 1)
    def errAt(i: Int): Column = {
      val (_, mn, mx) = stats(i)
      val deq =
        if (mx > mn)
          lit(mn) + cAt(i).cast("double") * (lit(mx) - lit(mn)) /
            lit(255.0)
        else lit(mn)
      val d = deq - element_at(col("_v"), i + 1)
      floor(d * d * lit(1073741824.0)).cast("long")
    }
    val codeSum = (0 until dim).map(cAt).reduce(_ + _)
    val codeMin = least((0 until dim).map(cAt): _*)
    val codeMax = greatest((0 until dim).map(cAt): _*)
    val errSum = (0 until dim).map(errAt).reduce(_ + _)
    coded.select(col("_id").as(idCol), codeSum.as("code_sum"),
      codeMin.cast("int").as("code_min"),
      codeMax.cast("int").as("code_max"), errSum.as("err_fx"))
  }

  /** Sign random projection (Achlioptas 2003's ±1 database-friendly
    * Johnson–Lindenstrauss family; Charikar 2002 context): project
    * `dIn`-dim embeddings to `dOut` dims with a DETERMINISTIC ±1
    * matrix — `sign(j,i) = 1 − 2·(h60("sp:j:i") mod 2)`, the portable
    * md5 convention ([[graft.ext.SketchOps.h60]]) — so the projection
    * is a pure function of the vector, identical on any engine, run,
    * or layout, with no materialized matrix to ship. Dot products (and
    * so cosines) are preserved in expectation with error O(1/√dOut);
    * at dIn = 64 → dOut = 16 this is the 4× ANN-scan-size lever next
    * to [[quantizeInt8]]'s int8 coding.
    *
    * Exactness: components pin to fixed point FIRST
    * (`xq = floor(x·2²⁴)`, one correctly-rounded double multiply from
    * the float), then everything is ±1·integer BIGINT sums — order-free,
    * bit-identical everywhere. Output is the sparse relational form
    * (id, dim, comp) — dOut rows per vector.
    *
    * Scale shape: a PURE PROJECTION — one compiled pass per row
    * ([[graft.expressions.SignProjectFx]]: quantize the dIn components
    * once, then dIn·dOut ±1-weighted long MACs against the
    * construction-derived sign matrix), followed only by the dOut-row
    * posexplode into the relational form. No join, no aggregate, no
    * exchange, no window; the d·dOut flop count (the projection's
    * inherent cost) runs as compiled long arithmetic. */
  def signProject(vecs: DataFrame, idCol: String, vecCol: String,
                  dOut: Int, dIn: Int = 64): DataFrame = {
    require(dOut >= 1 && dIn >= 1, s"dOut/dIn must be >= 1: $dOut/$dIn")
    // The sign matrix is d·dOut values TOTAL — compute it ONCE
    // driver-side (same portable md5 convention, bit-identical result)
    // and fold it into the plan as literal coefficients. The first cut
    // derived each sign with an in-plan md5 per (element, out-dim):
    // at sf10 that was 205M md5 calls plus a 205M-row explode through
    // a 3.2M-group aggregate — 216.8 s for what is, with literal
    // signs, a NARROW PROJECTION (the kmeansCellsFx shape: a
    // dIn-term codegen'd sum per out-dim, no Generate, no exchange
    // beyond the final explode of dOut rows per vector). Measured
    // 216.8 → 2.8 s at sf10, values identical.
    // One compiled pass per row ([[graft.expressions.SignProjectFx]]):
    // quantize the dIn components once, dIn·dOut ±1-weighted long MACs
    // against the construction-derived sign matrix. The compositional
    // forms measured at sf10: per-(i, j) in-plan md5 216.8 s,
    // literal-sign expression tree (interpreted eval) 31.7 s, this
    // compiled loop 1.4 s — identical values throughout.
    graft.engine.Engine.spread(vecs)
      .select(col(idCol).as("_vid"),
        posexplode(call_function("graft_sign_project",
          col(vecCol).cast("array<double>"), lit(dOut), lit(dIn))))
      .select(col("_vid").as(idCol), col("pos").as("dim"),
        col("col").as("comp"))
  }

  /** Project → shortlist → exact rerank: the production pattern that
    * makes [[signProject]] an ANN accelerator — score candidates with
    * the dOut-dim ±1-projected INTEGER dot product (dOut/d of the
    * exact scan's flops; JL preserves the ordering approximately),
    * keep a per-query shortlist, then rerank ONLY the shortlist with
    * the exact round-6 cosine ([[bruteForceTopK]]'s contract), so the
    * reported top-k scores are identical to the exact tier's wherever
    * the shortlist contains them.
    *
    * Everything deterministic and engine-exact: projected components
    * are order-free fixed-point BIGINTs, the shortlist dot rides
    * DECIMAL(38,0) (a 2³⁰-scale component squared times dOut passes
    * 2⁶³), shortlist ties break by neighbor id, rerank ties by
    * (round-6 score desc, id).
    *
    * Scale shape: the coarse stage joins SPARSE (id, dim, comp) rows
    * on `dim` and collapses to (query, neighbor) partials map-side —
    * the only corpus-sized exchange carries projected partial sums,
    * never raw vectors; full vectors re-attach by id ONLY for the
    * per-query shortlist (the ids-only discipline). NOTE (r11 advice):
    * the coarse stage is still an ALL-PAIRS scorer — it cuts per-pair
    * flops to dOut/dIn but the |Q|·|C| pair count is unchanged, so the
    * win holds only for bounded query sets (the bench posture). For
    * large |Q|, put a bucketed candidate screen in front — e.g.
    * [[annTopK]]'s LSH hyperplane buckets or [[signBuckets]] — and run
    * this project→rerank chain per bucket. Both per-query
    * windows carry LITERAL rank bounds, so InferWindowGroupLimit
    * inserts the Partial map-side prune — every partition forwards at
    * most `shortlist` (resp. k) rows per query to the window shuffle;
    * a corpus-sized query partition never ships (plan-pinned). */
  def signProjectTopK(queries: DataFrame, corpus: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      dOut: Int = 16, shortlist: Int = 20): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist >= k >= 1: $shortlist/$k")
    val qp = signProject(queries, idCol, vecCol, dOut)
      .select(col(idCol).as("query_id"), col("dim"),
        col("comp").as("_qc"))
    val cp = signProject(corpus, idCol, vecCol, dOut)
      .select(col(idCol).as("neighbor_id"), col("dim"),
        col("comp").as("_cc"))
    val pd = qp.join(cp, Seq("dim"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("_qc").cast("decimal(38,0)") *
        col("_cc").cast("decimal(38,0)")).as("_pdot"))
    val sw = Window.partitionBy(col("query_id"))
      .orderBy(desc("_pdot"), asc("neighbor_id"))
    val cand = pd.withColumn("_prnk", row_number().over(sw))
      .filter(col("_prnk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"), norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"), norm(col(vecCol)).as("_cn"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    cand.join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6)
          .as("score"))
      .withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("score"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998): greedily pick `k` of the top-`nCand` candidates,
    * each step maximizing `λ·rel(q,d) − (1−λ)·max_{s∈chosen} sim(d,s)`
    * — the diversification pass that keeps a RAG context window from
    * filling with near-duplicates of one passage.
    *
    * The greedy is inherently sequential per query, so this is the one
    * similarity operator built on the typed-Dataset group API rather
    * than Columns — but only the per-query top-k lists and their
    * candidate-pair similarities ever enter the group stage (N + N²/2
    * rows per query; the corpus never does), shuffled once on
    * query_id. Engine-exactness: every cosine is computed and rounded
    * to 6 decimals by the SAME Column contract as [[bruteForceTopK]]
    * BEFORE the group stage; inside the greedy only dyadic-λ
    * multiply/subtract/compare remain (correctly-rounded IEEE ops),
    * ties break by candidate id — so a SQL twin can replay the
    * selection step for step. */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int = 3, lambda: Double = 0.5,
                nCand: Int = 8): DataFrame = {
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1: $nCand/$k")
    // per-query group state is O(nCand²) pairwise sims (plus the
    // candidate list) held in one executor task's heap — 64 caps it at
    // ~2k map entries/query. MMR past a few dozen candidates stops
    // diversifying anything anyway; re-rank a tighter retrieval list
    // instead of raising the cap.
    require(nCand <= 64,
      s"nCand > 64 builds O(nCand²) per-query state: $nCand")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cand = bruteForceTopK(queries, corpus, idCol, vecCol, nCand)
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("_nv"))
    val cv = cand.join(vecs, Seq("neighbor_id"))
    val a = cv.select(col("query_id"), col("neighbor_id").as("_ida"),
      col("_nv").as("_va"))
    val b = cv.select(col("query_id"), col("neighbor_id").as("_idb"),
      col("_nv").as("_vb"))
    val pairs = a.join(b, Seq("query_id"))
      .filter(col("_ida") < col("_idb"))
      .select(col("query_id"), col("_ida"), col("_idb"),
        round(dot(col("_va"), col("_vb")) /
          (norm(col("_va")) * norm(col("_vb"))), 6).as("_sim"))
    val candDs = cand.select(col("query_id").cast("long").as("_1"),
        col("neighbor_id").cast("long").as("_2"),
        col("score").cast("double").as("_3"))
      .as[(Long, Long, Double)]
    val pairDs = pairs.select(col("query_id").cast("long").as("_1"),
        col("_ida").cast("long").as("_2"),
        col("_idb").cast("long").as("_3"),
        col("_sim").cast("double").as("_4"))
      .as[(Long, Long, Long, Double)]
    candDs.groupByKey(_._1).cogroup(pairDs.groupByKey(_._1)) {
      (q, ci, pi) =>
        val sim = new scala.collection.mutable.HashMap[(Long, Long),
          Double]
        pi.foreach(p => sim((p._2, p._3)) = p._4)
        def s(x: Long, y: Long): Double =
          if (x < y) sim((x, y)) else sim((y, x))
        val remaining = scala.collection.mutable.ArrayBuffer(
          ci.map(c => (c._2, c._3)).toArray.sortBy(x => (-x._2, x._1))
            .toIndexedSeq: _*)
        val chosen = scala.collection.mutable.ArrayBuffer[Long]()
        val out = scala.collection.mutable.ArrayBuffer[
          (Long, Int, Long, Double, Double)]()
        var rnk = 1
        while (rnk <= k && remaining.nonEmpty) {
          var bi = -1
          var bm = Double.NegativeInfinity
          var bid = Long.MaxValue
          var i = 0
          while (i < remaining.length) {
            val (id, rel) = remaining(i)
            val ms =
              if (chosen.isEmpty) 0.0 else chosen.map(c => s(id, c)).max
            val m = lambda * rel - (1.0 - lambda) * ms
            if (m > bm || (m == bm && id < bid)) {
              bm = m; bid = id; bi = i
            }
            i += 1
          }
          if (bi < 0) {
            // every remaining candidate scored NaN (zero-norm or
            // NaN-poisoned vectors): nothing is selectable under a
            // deterministic order — stop instead of remove(-1)
            rnk = k + 1
          } else {
            val (id, rel) = remaining.remove(bi)
            out += ((q, rnk, id, rel, bm))
            chosen += id
            rnk += 1
          }
        }
        out.iterator
    }.toDF("query_id", "rnk", "neighbor_id", "relevance", "mmr")
  }

  /** SemDeDup (Abbas et al. 2023) with a SIZE-DERIVED centroid count —
    * the scale-true form of [[semDedup]]. A FIXED centroid count makes
    * within-cell pair work quadratic in the corpus (10× rows → 10×
    * denser cells → ~100× pairs; measured 9.3× wall for 10× data at r9
    * sf1). Here `nCentroids = max(minCentroids, ⌈n / targetCellSize⌉)`,
    * so cells hold ~`targetCellSize` vectors at ANY corpus size and the
    * pair stage stays LINEAR (n · targetCellSize comparisons).
    *
    * The centroid table is therefore no longer driver-literal-foldable
    * (its size grows with the corpus), and the nearest-cell argmin is
    * TIERED on k (see [[semDedupAssignFrame]]): the exact broadcast
    * BNLJ while the centroid table broadcasts (but its n·k flops are
    * O(n²/targetCellSize) — quadratic in the corpus), and the
    * linear-work hyperplane-bucket equi-join ([[annTopKSelf]]'s
    * blocking) above that, which trades exact-nearest for
    * candidate-nearest assignment (the IVF trade) while leaving the
    * pair stage unchanged. `assignMode = "auto"` switches at k = 65536;
    * `"broadcast"`/`"bucketed"` pin a tier (the bucketed tier needs
    * `dim`, and its `bits`/`tables` size the candidate sets).
    *
    * Same arithmetic contract as [[semDedup]] (d2 = v·v − 2·v·c + c·c
    * left-to-right, ties to the lowest cell, cosine rounded to 6, drop
    * rule by (centroid_sim, id) dominance), so the DuckDB oracle mirrors
    * it with a dynamically-derived LIMIT — in BOTH tiers: the bucketed
    * candidate generation is deterministic seeded-hyperplane arithmetic
    * that the oracle reproduces bit-for-bit (`x_dedup_semantic_lsh`).
    * Returns the SURVIVOR set as
    * `(idCol, vecCol: array<double>, cell, centroid_sim)`; callers
    * needing more columns join back on the id. */
  def semDedupScaled(df: DataFrame, idCol: String, vecCol: String,
                     targetCellSize: Int = 128, minCentroids: Int = 16,
                     tau: Double = 0.99, assignMode: String = "auto",
                     dim: Int = 0, bits: Int = 4, tables: Int = 8,
                     seed: Long = 42L): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1): $tau")
    // REPRESENTATIVE tier (r15 sf10: ~105× at 100× clone mass —
    // identical texts carry identical vectors, so both the n·k scoring
    // pass and the within-cell pair join were quadratic in copies):
    // assignment and centroid_sim are pure functions of the VECTOR, so
    // score one rep per distinct vector; k and the id-ranked centroid
    // sample stay member-grain (they are functions of the corpus, not
    // of its distinct support). The survivor rule then collapses in
    // closed form — bit-equal to member grain, argued kill-case by
    // kill-case below and pinned in SimilarityOpsSpec; the registered
    // queries' member-grain DuckDB twins stay unchanged as the
    // end-to-end proof.
    val rows = graft.engine.Engine.spread(
      df.select(col(idCol).cast("long").as("_oid"),
        col(vecCol).cast("array<double>").as("_ov")))
    // One vector-keyed shuffle builds the identity classes; each class
    // keyed by its minimum member id. Exact array equality - no hash
    // fingerprint, so no collision risk in a correctness-bearing tier.
    val reps = rows.groupBy(col("_ov")).agg(min(col("_oid")).as("_rid"))
    val assigned = graft.engine.Engine.materialize(
      semDedupAssignCore(
        rows.select(col("_oid").as("_aid"), col("_ov").as("_av")),
        reps.select(col("_rid").as("_aid"), col("_ov").as("_av")),
        targetCellSize, minCentroids, assignMode, dim, bits, tables,
        seed))
    val b = assigned.select(col("_aid").as("_bid"), col("_av").as("_bv"),
      col("_an").as("_bn"), col("cell").as("_bcell"),
      col("centroid_sim").as("_bcsim"))
    // Rep-grain survivor rule - the member-grain survivor set IS the
    // rep survivor set. (1) A non-rep member m never survives: its rep
    // shares cell and csim, has the smaller id, and their cosine is the
    // round-6 self-cosine of the shared vector - exactly 1.0 > tau,
    // because every scored vector has nonzero norm: Spark 4's ANSI
    // DIVIDE_BY_ZERO covers DOUBLE division too (verified - `cast(0.0
    // as double)/cast(0.0 as double)` raises, it does NOT yield NaN as
    // it did pre-ANSI), so a zero vector errors the csim attach loudly
    // at EITHER grain before any survivor logic runs; tau < 1 by the
    // require above. The loud-error path is spec-pinned in
    // SimilarityOpsSpec.
    // (2) The rep is killed iff some DISTINCT vector's class B in its
    // cell has cos > tau and better (csim, id) - the member-grain
    // "exists any member of B with smaller id" reduces to B's minimum
    // id, which IS rid_B; members of the rep's OWN class never kill it
    // (equal csim, larger id). So the anti-join of reps against reps
    // with rep ids returns the final answer outright - surviving ids
    // are class minima at either grain. Pinned against
    // [[semDedupScaledMemberGrain]] in SimilarityOpsSpec.
    assigned.join(b,
        col("cell") === col("_bcell") && col("_aid") =!= col("_bid") &&
          round(dot(col("_av"), col("_bv")) / (col("_an") * col("_bn")),
            6) > tau &&
          (col("_bcsim") < col("centroid_sim") ||
            (col("_bcsim") === col("centroid_sim") &&
              col("_bid") < col("_aid"))),
        "left_anti")
      .select(col("_aid").as(idCol), col("_av").as(vecCol),
        col("cell"), col("centroid_sim"))
  }

  /** Member-grain form of [[semDedupScaled]] — every corpus row scored
    * and self-joined directly; kept as the rep-tier equivalence proof
    * SimilarityOpsSpec pins against, not as a production path. */
  private[graft] def semDedupScaledMemberGrain(
      df: DataFrame, idCol: String, vecCol: String,
      targetCellSize: Int = 128, minCentroids: Int = 16,
      tau: Double = 0.99, assignMode: String = "auto",
      dim: Int = 0, bits: Int = 4, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1): $tau")
    val assigned = graft.engine.Engine.materialize(
      semDedupAssignFrame(df, idCol, vecCol, targetCellSize,
        minCentroids, assignMode, dim, bits, tables, seed))
    val b = assigned.select(col("_aid").as("_bid"), col("_av").as("_bv"),
      col("_an").as("_bn"), col("cell").as("_bcell"),
      col("centroid_sim").as("_bcsim"))
    assigned.join(b,
        col("cell") === col("_bcell") && col("_aid") =!= col("_bid") &&
          round(dot(col("_av"), col("_bv")) / (col("_an") * col("_bn")),
            6) > tau &&
          (col("_bcsim") < col("centroid_sim") ||
            (col("_bcsim") === col("centroid_sim") &&
              col("_bid") < col("_aid"))),
        "left_anti")
      .select(col("_aid").as(idCol), col("_av").as(vecCol),
        col("cell"), col("centroid_sim"))
  }

  /** PRE-materialization assignment frame of [[semDedupScaled]] —
    * `(_aid, _av, _an, cell, centroid_sim)`, one row per corpus vector.
    * Package-private so PlanShapeSpec can pin the ASSIGNMENT plan shape
    * directly: `Engine.materialize` truncates lineage to a
    * `Scan ExistingRDD`, so any assertion on the registered query's
    * final plan certifies only the post-checkpoint suffix (the r10
    * suite-red lesson — the BNLJ pin failed against a plan that could
    * not contain it by construction).
    *
    * Two assignment tiers, selected by `assignMode`:
    *  - `"broadcast"` — the EXACT nearest-centroid argmin: corpus ×
    *    centroids through one BroadcastNestedLoopJoin, n·k dot
    *    products. Right while k = ⌈n/targetCellSize⌉ broadcasts
    *    comfortably (k ≲ 6·10⁴ ⇒ n ≲ 8·10⁶ at the default cell size);
    *    beyond that the flop count — O(n²/targetCellSize) — is the
    *    scale killer the bucketed tier exists to remove.
    *  - `"bucketed"` — the IVF-style sign-bucket equi-join
    *    ([[annTopKSelf]]'s blocking): hash both sides into `tables`
    *    independent hyperplane-LSH tables, take (vector, centroid)
    *    CANDIDATE pairs from shared buckets only (an equi-join on
    *    (table, bucket) carrying ids — no vectors in flight), argmin
    *    over each vector's candidates, and resolve the rare
    *    bucket-orphan vectors exactly against the centroid table with
    *    the TINY orphan side broadcast (never the centroid table, which
    *    this tier exists to keep un-broadcast). Work is
    *    n · E[candidate cells] — linear in n for fixed table geometry;
    *    size `bits` ≈ log₂(k / target-candidates-per-table) as k grows.
    *    Assignment becomes approximate-nearest-centroid (the IVF
    *    trade); the within-cell pair stage is UNCHANGED. Requires
    *    `dim` (hyperplanes are driver-side plan literals).
    *  - `"auto"` — broadcast while k ≤ 65536, bucketed above.
    * Both tiers share the packed-decimal argmin (graft_dbits — hash
    * aggregate, map-side partials) and the Euclidean-pmod cell decode. */
  private[graft] def semDedupAssignFrame(
      df: DataFrame, idCol: String, vecCol: String,
      targetCellSize: Int, minCentroids: Int, assignMode: String,
      dim: Int, bits: Int, tables: Int, seed: Long): DataFrame = {
    require(targetCellSize >= 1 && minCentroids >= 1,
      s"bad targetCellSize=$targetCellSize minCentroids=$minCentroids")
    require(Set("auto", "broadcast", "bucketed")(assignMode),
      s"assignMode must be auto|broadcast|bucketed: $assignMode")
    // spread BEFORE the assignment: a replicated fixture lands as one
    // ~100 MB parquet split, and the flop-heavy scoring pass would run
    // on ONE core (the first sf10 probe spent minutes exactly so — 31
    // of 32 executor threads parked). No-op on real multi-split
    // corpora, the Engine.spread contract.
    val proj = graft.engine.Engine.spread(
      df.select(col(idCol).cast("long").as("_aid"),
        col(vecCol).cast("array<double>").as("_av")))
    semDedupAssignCore(proj, proj, targetCellSize, minCentroids,
      assignMode, dim, bits, tables, seed)
  }

  /** The assignment engine under both grains: `members` (all `(_aid,
    * _av)` corpus rows) decides n, k, and the lowest-id-k centroid
    * sample — corpus-level quantities; `scored` is the row set that
    * actually pays the nearest-centroid scoring (the whole corpus at
    * member grain, one rep per distinct vector in [[semDedupScaled]]'s
    * rep tier). Output: one `(_aid, _av, _an, cell, centroid_sim)` row
    * per `scored` row. */
  private def semDedupAssignCore(
      members: DataFrame, scored: DataFrame, targetCellSize: Int,
      minCentroids: Int, assignMode: String, dim: Int, bits: Int,
      tables: Int, seed: Long): DataFrame = {
    require(targetCellSize >= 1 && minCentroids >= 1,
      s"bad targetCellSize=$targetCellSize minCentroids=$minCentroids")
    require(Set("auto", "broadcast", "bucketed")(assignMode),
      s"assignMode must be auto|broadcast|bucketed: $assignMode")
    val n = members.count()
    require(n > 0, "semDedupScaled needs a non-empty corpus")
    val k = math.min(
      math.max(minCentroids.toLong,
        (n + targetCellSize - 1) / targetCellSize),
      n).toInt
    val bucketed = assignMode == "bucketed" ||
      (assignMode == "auto" && k > 65536)
    if (bucketed) require(dim >= 1,
      s"bucketed assignment needs the vector dim for its hyperplane " +
      s"literals: dim=$dim")
    // lowest-id k MEMBER vectors as the sampled centroids
    // ([[sampleVectors]]' determinism contract — the sample is a
    // corpus-grain quantity, so duplicates stay in), indexed 0..k−1 by
    // the TWO-PASS contiguous rank ([[graft.transform.Ids
    // .assignContiguousIds]]) — r10 ran `row_number` over an
    // unpartitioned window on the k-row set, a single-task stage whose
    // input GROWS with the corpus (k = n/128); the two-pass form
    // range-partitions by id, so no stage anywhere sees more than a
    // partition's rows.
    val cents = graft.transform.Ids
      .assignContiguousIds(members, col("_aid"), "_cellL", 0L)
      .filter(col("_cellL") < k)
      .select(col("_cellL").cast("int").as("_cell"),
        col("_av").as("_cv"))
    // self-dots once per SIDE (|scored| + k evaluations, the
    // bruteForceTopK discipline); the scoring pass computes ONLY the
    // packed argmin key — no cosine, no rounding, no vectors in flight
    val proj2 = scored.withColumn("_avv", dot(col("_av"), col("_av")))
    val cents2 = cents.withColumn("_cvv", dot(col("_cv"), col("_cv")))
    val amin =
      if (bucketed)
        semDedupAssignBucketed(proj2, cents2, k, dim, bits, tables, seed)
      else semDedupAssignExact(proj2, cents2, k)
    val centsSim = cents2.select(col("_cell").as("cell"),
      col("_cv"), col("_cvv"))
    // csim attach: one k-row join per scored row — broadcast in the
    // exact tier, a plain cell equi-join in the bucketed tier (whose
    // premise is that k no longer broadcasts)
    proj2.join(amin, Seq("_aid"))
      .join(if (bucketed) centsSim else broadcast(centsSim), Seq("cell"))
      .select(col("_aid"), col("_av"),
        sqrt(col("_avv")).as("_an"), col("cell"),
        round(dot(col("_av"), col("_cv")) /
          (sqrt(col("_avv")) * sqrt(col("_cvv"))), 6)
          .as("centroid_sim"))
  }

  /** Packed argmin key over (d2, cell) as ONE fixed-width `min`:
    * min(struct(...)) and min_by both carry struct buffers, which are
    * not mutable-fixed-width, so Spark silently plans a SortAggregate
    * that SORTS the whole scored join output (the first sf10 probe
    * stalled exactly there, spilling 312M wide rows). Packing the
    * order-preserving double bits (graft_dbits, codegen'd) with the
    * cell index into a DECIMAL(38,0) — 19 digits of bits · k + cell
    * ≪ 38 digits — keeps the lexicographic (d2, cell) order and
    * hash-aggregates with map-side partials. Exact: dbits is a
    * total-order bijection on doubles. d2 = v·v − 2·v·c + c·c
    * left-to-right (the oracle's operand order). */
  private def semDedupEnc(k: Int): Column = {
    val d2 = col("_avv") - lit(2.0) * dot(col("_av"), col("_cv")) +
      col("_cvv")
    (call_function("graft_dbits", d2).cast("decimal(38,0)") *
      lit(k) + col("_cell")).as("_enc")
  }

  /** Cell decode with pmod, NOT `%`: for a vector nearly identical to
    * its centroid, float rounding can make d2 slightly NEGATIVE, so
    * graft_dbits — a total-order encoding — and hence the packed key
    * `_e = dbits·k + cell` are negative too. Spark's decimal `%` is
    * truncated (sign of the dividend), so `_e % k` would return
    * `cell − k` and the inner join back to the centroid table would
    * silently DROP the row (neither survivor nor suppressed) — the
    * core dedup case, invisible to fixtures whose duplicates differ by
    * a fat perturbation. Euclidean `pmod` recovers the true cell for
    * either sign (`_e = dbits·k + cell`, `0 ≤ cell < k` exactly). */
  private def semDedupDecode(k: Int): Column =
    pmod(col("_e"), lit(k)).cast("int").as("cell")

  /** Exact broadcast-tier assignment: corpus × centroids BNLJ, argmin
    * collapsed to one row per vector by map-side grouped partials. */
  private def semDedupAssignExact(proj2: DataFrame, cents2: DataFrame,
                                  k: Int): DataFrame =
    proj2.crossJoin(broadcast(cents2))
      .select(col("_aid"), semDedupEnc(k))
      .groupBy(col("_aid")).agg(min(col("_enc")).as("_e"))
      .select(col("_aid"), semDedupDecode(k))

  /** Bucketed-tier CANDIDATE pairs `(_aid, _cell)`: both sides hashed
    * into `tables` hyperplane-LSH tables (driver-literal planes, the
    * [[annTopKImpl]] geometry), candidates from shared buckets via an
    * id-only equi-join on (table, bucket), deduped before any vector is
    * re-attached. Package-private so PlanShapeSpec can pin the shape:
    * no BroadcastNestedLoopJoin, no CartesianProduct — the n·k cross
    * product never forms in this tier. */
  private[graft] def semDedupCandidates(
      proj2: DataFrame, cents2: DataFrame, dim: Int, bits: Int,
      tables: Int, seed: Long): DataFrame = {
    val allPlanes = (0 until tables)
      .map(t => hyperplanes(dim, bits, seed + t))
    def bucketRows(d: DataFrame, idc: String, vc: String): DataFrame =
      d.select(col(idc),
        posexplode(array(allPlanes.map(p =>
          lshBucket(col(vc), p)): _*)))
        .withColumnsRenamed(Map("pos" -> "_tbl", "col" -> "_bkt"))
    bucketRows(proj2, "_aid", "_av")
      .join(bucketRows(cents2, "_cell", "_cv"), Seq("_tbl", "_bkt"))
      .select(col("_aid"), col("_cell"))
      .dropDuplicates("_aid", "_cell")
  }

  /** Bucketed-tier assignment: argmin over each vector's candidate
    * cells, then the rare bucket-orphan vectors (no shared bucket with
    * any centroid) resolved exactly with the ORPHAN side broadcast into
    * the BNLJ — the centroid table stays partitioned, as this tier
    * requires. The candidate argmin is materialized once so the orphan
    * anti-join does not recompute the bucket join. */
  private def semDedupAssignBucketed(
      proj2: DataFrame, cents2: DataFrame, k: Int, dim: Int, bits: Int,
      tables: Int, seed: Long): DataFrame = {
    val cand = semDedupCandidates(proj2, cents2, dim, bits, tables, seed)
    val amin0 = graft.engine.Engine.materialize(
      cand.join(proj2, Seq("_aid")).join(cents2, Seq("_cell"))
        .select(col("_aid"), semDedupEnc(k))
        .groupBy(col("_aid")).agg(min(col("_enc")).as("_e"))
        .select(col("_aid"), semDedupDecode(k)))
    val orphans = proj2.join(amin0, Seq("_aid"), "left_anti")
    val fallback = broadcast(orphans).crossJoin(cents2)
      .select(col("_aid"), semDedupEnc(k))
      .groupBy(col("_aid")).agg(min(col("_enc")).as("_e"))
      .select(col("_aid"), semDedupDecode(k))
    amin0.unionByName(fallback)
  }

  /** Fixed-centroid SemDeDup — explicit `nCentroids` control for
    * bounded experiments; production corpora should use
    * [[semDedupScaled]] (a fixed cell count is quadratic in within-cell
    * pair work as the corpus grows). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int = 16, tau: Double = 0.99): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1): $tau")
    val cents = sampleVectors(df, idCol, vecCol, nCentroids)
    // Original columns ride along; `cell`/`centroid_sim` are appended
    // output columns (callers must not already use those names).
    val assigned = df
      .withColumn("cell", nearestLit(col(vecCol), cents, 0))
      .withColumn("centroid_sim", element_at(
        array(cents.map(c => round(cosine(col(vecCol),
          array(c.map(lit): _*)), 6)): _*),
        col("cell") + 1))
    val b = assigned.select(col(idCol).as("_bid"), col(vecCol).as("_bv"),
      col("cell").as("_bcell"), col("centroid_sim").as("_bcsim"))
    assigned.join(b,
        col("cell") === col("_bcell") && col(idCol) =!= col("_bid") &&
          round(cosine(col(vecCol), col("_bv")), 6) > tau &&
          (col("_bcsim") < col("centroid_sim") ||
            (col("_bcsim") === col("centroid_sim") &&
              col("_bid") < col(idCol))),
        "left_anti")
  }

  /** Embedding-coverage audit: the referential-integrity report run
    * BEFORE building any vector index — per document group, how many
    * documents have an embedding row, how many are missing (un-embedded
    * docs silently vanish from every ANN/semantic-dedup result), and
    * corpus-wide, how many embedding rows point at no document (orphan
    * vectors inflate index size and can surface deleted content).
    *
    * Output grain: one row per `groupCol` value with
    * `(n_docs, n_embedded, n_missing, cov_ppm)` — coverage in integer
    * parts-per-million via floor division, engine-exact — plus the
    * global `n_orphan_vecs` carried on every row (1-row broadcast).
    *
    * Scale shape: the embedding side reduces to a DISTINCT id
    * projection (duplicate vec rows must not double-count coverage)
    * before a left join on the doc key — co-partitioned with the
    * grouped count; the orphan side is one anti-join of ids only.
    * Nothing carries vectors; both shuffles are id-sized. */
  def embeddingCoverage(docs: DataFrame, embeddings: DataFrame,
                        idCol: String, groupCol: String,
                        vecIdCol: String): DataFrame = {
    val emIds = embeddings.select(col(vecIdCol).as("_eid")).distinct()
    val j = docs.select(col(idCol).as("_eid"), col(groupCol))
      .join(emIds.withColumn("_has", lit(1)), Seq("_eid"), "left")
    val per = j.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), count(col("_has")).as("n_embedded"))
      .withColumn("n_missing", col("n_docs") - col("n_embedded"))
      .withColumn("cov_ppm",
        expr("(n_embedded * 1000000) div n_docs"))
    val orphans = emIds.join(docs.select(col(idCol).as("_eid")),
        Seq("_eid"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_vecs"))
    per.crossJoin(broadcast(orphans))
  }

  /** Semantic decontamination: flag every corpus vector whose cosine
    * similarity to ANY benchmark/eval vector exceeds `tau` — the
    * embedding-level complement of the n-gram screen
    * ([[graft.ext.DedupOps.decontaminate]]); paraphrased benchmark
    * leakage that shares no 8-gram still lands within a tight cosine
    * ball of the eval item. Reports per corpus vector the max benchmark
    * similarity (round-6 contract), the closest benchmark id (ties →
    * smallest id), and the `contaminated` verdict, so the same output
    * serves both the audit report (distribution of near-benchmark mass)
    * and the filter (anti-join on `contaminated`).
    *
    * Scale shape: the benchmark side is small by contract (eval suites)
    * and broadcasts; the corpus streams ONCE through a
    * BroadcastNestedLoopJoin and the per-vector argmax is a
    * `max(struct(sim, -bench_id))` grouped aggregate — map-side partials
    * collapse the corpus×B join output to one row per corpus vector
    * before the only shuffle, so nothing per-candidate ever crosses the
    * network. An EMPTY benchmark yields an empty result (a vacuous
    * screen reports nothing, it does not pass everything) — callers
    * gating on `contaminated` must treat "no benchmark" upstream. */
  def semanticDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, vecCol: String,
                            benchIdCol: String, benchVecCol: String,
                            tau: Double): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1): $tau")
    // Norms hoisted out of the pair stream: cosine(a,b) evaluates
    // three graft_dot kernels per (corpus, bench) pair, but ‖a‖ is
    // constant across a corpus row's B pairs and ‖b‖ across the whole
    // scan — precomputing both sides cuts the pair-stage flops 3×
    // (identical doubles: the same sqrt(dot(x,x)) expression evaluates
    // once instead of B (resp. N) times, and IEEE ops are
    // deterministic).
    val bench = benchmark.select(col(benchIdCol).as("_bid"),
      col(benchVecCol).as("_bv"))
      .withColumn("_bn", norm(col("_bv")))
    val sim = round(
      dot(col(vecCol), col("_bv")) / (col("_an") * col("_bn")), 6)
    corpus.withColumn("_an", norm(col(vecCol)))
      .crossJoin(broadcast(bench))
      .select(col(idCol),
        struct(sim.as("s"), (-col("_bid")).as("nb")).as("_sb"))
      .groupBy(col(idCol))
      .agg(max(col("_sb")).as("_m"))
      .select(col(idCol),
        col("_m.s").as("max_sim"),
        (-col("_m.nb")).as("bench_id"),
        (col("_m.s") > tau).as("contaminated"))
  }

  /** [[semanticDecontaminate]] against a DRIVER-HELD benchmark — the
    * registered-query / production-screen form: eval suites are small
    * and fixed-size by contract (the x_decontam_semantic framing), so
    * the (id, vector) rows fold into the plan as literals and the
    * corpus streams through ONE compiled projection
    * ([[graft.expressions.MaxCosLit]]) — no join materializing a
    * corpus×B pair row (whose per-pair array copies, not the flops,
    * dominate the join form), no aggregation, no shuffle at all.
    * Output schema and every value bit-identical to the DataFrame
    * form (kernel semantics pinned in NativeExprsSpec); the empty
    * benchmark refuses loudly rather than pass everything, matching
    * the join form's empty-result contract in spirit and failing
    * closed. Benchmark vectors must share one dimension; corpus
    * vectors of any other length yield null sim/verdict (the join
    * form's null-dot behavior). */
  def semanticDecontaminateLit(corpus: DataFrame, idCol: String,
                               vecCol: String,
                               bench: Seq[(Long, Seq[Double])],
                               tau: Double): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1): $tau")
    require(bench.nonEmpty,
      "semanticDecontaminateLit: empty benchmark (a vacuous screen)")
    val sorted = bench.sortBy(_._1)
    require(sorted.map(_._1).distinct.size == sorted.size,
      "semanticDecontaminateLit: duplicate benchmark ids")
    val m = call_function("graft_maxcos", col(vecCol),
      typedlit(sorted.map(_._1)), typedlit(sorted.map(_._2)))
    corpus.select(col(idCol), m.as("_m"))
      .select(col(idCol),
        col("_m.s").as("max_sim"),
        col("_m.bid").as("bench_id"),
        (col("_m.s") > tau).as("contaminated"))
  }

  /** Fixed-point dominant eigenvector of the corpus covariance — the
    * ORACLE-CHECKABLE eigensolve [[pcaProject]]'s doc concedes it
    * lacks: every step is exact integer arithmetic (BigInt, division
    * truncating toward zero — the semantics Spark's `div` and DuckDB's
    * `//` share), so the same unrolled iteration replays bit-for-bit
    * in SQL. From the one-pass `graft_gram` buffer: `M_ij = G_ij/n −
    * (S_i/n)(S_j/n)/2³⁰` (≈ cov·2³⁰), power iteration from the
    * all-ones vector with L∞ normalization (`v ← (M v)·2³⁰ / max|Mv|`
    * — no square roots, everything stays rational), a FIXED iteration
    * count (parity needs identical steps, not convergence), and a
    * deterministic sign fix (first nonzero coordinate positive).
    * Returns (n, S, v_fx at 2³⁰ scale). */
  private[graft] def topComponentFixed(
      n: Long, sums: Seq[Long], gram: Seq[Long], dim: Int,
      iters: Int): Array[BigInt] = {
    require(n > 0, "topComponentFixed needs a non-empty corpus")
    val fx = BigInt(1073741824L) // 2^30
    val bn = BigInt(n)
    val mu = sums.map(s => BigInt(s) / bn).toArray
    val m = Array.tabulate(dim, dim) { (i, j) =>
      BigInt(gram(i * dim + j)) / bn - (mu(i) * mu(j)) / fx
    }
    var v = Array.fill(dim)(fx)
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = BigInt(0); var j = 0
        while (j < dim) { acc += m(i)(j) * v(j); j += 1 }
        acc
      }
      val mx = w.map(_.abs).max
      if (mx > 0) v = w.map(x => (x * fx) / mx)
      t += 1
    }
    val firstNz = v.indexWhere(_ != 0)
    if (firstNz >= 0 && v(firstNz) < 0) v = v.map(-_)
    v
  }

  /** All-but-the-top embedding post-processing (Mu & Viswanath 2018,
    * ICLR) — the projection step: isotropy-restoring cleanup removes
    * the common mean and the dominant component(s) before any cosine
    * is trusted; this operator computes each vector's signed
    * projection onto the fixed-point dominant component,
    * `proj = (x − μ)·v`, the quantity the cleanup subtracts
    * (`x' = x − μ − proj·v`) and the audit ranks outliers by.
    *
    * Engine-exact end to end: the component comes from
    * [[topComponentFixed]], and the per-vector projection is
    * `(Σ_i floor(x_i·2³⁰)·v_i − Σ_i (S_i/n)·v_i) / 2³⁰` — per-element
    * floors before any cross-row arithmetic, DECIMAL(38,0)
    * accumulation, truncating division — so the output hashes
    * identically on any engine/layout.
    *
    * Scale shape: ONE `graft_gram` corpus pass (dim²+dim+1 longs to
    * the driver — tiny at any corpus scale), a driver-side d×d
    * eigensolve, then the component folds into the plan as a literal
    * array: the projection is explode → literal lookup → one grouped
    * sum on the vector id. No join against anything corpus-sized. */
  def abttProject(df: DataFrame, idCol: String, vecCol: String,
                  dim: Int, iters: Int = 8): DataFrame = {
    require(dim >= 1 && iters >= 1, s"abttProject: bad dim/iters")
    val g = df.agg(call_function("graft_gram",
        col(vecCol).cast("array<double>"), lit(dim)).as("_g"))
      .select(col("_g.n"), col("_g.sums"), col("_g.gram")).collect()(0)
    val n = g.getLong(0)
    val sums = g.getSeq[Long](1)
    val v = topComponentFixed(n, sums, g.getSeq[Long](2), dim, iters)
    val bn = BigInt(n)
    val muv = sums.zip(v).map { case (s, vi) => (BigInt(s) / bn) * vi }
      .foldLeft(BigInt(0))(_ + _)
    val vLit = array(v.map(x => lit(x.toLong)): _*)
    df.select(col(idCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
      .select(col(idCol),
        (floor(col("_x") * lit(1073741824.0)).cast("decimal(38,0)") *
          element_at(vLit, col("_i") + 1).cast("decimal(38,0)")).as("_t"))
      .groupBy(col(idCol))
      .agg(sum(col("_t")).as("_num"))
      .select(col(idCol),
        expr(s"cast((_num - cast('$muv' as decimal(38,0)))" +
          " div 1073741824 as bigint)").as("proj_fx"))
      .withColumn("proj",
        col("proj_fx").cast("double") / lit(1073741824.0))
  }

  /** Per-dimension embedding health audit — the feature-space
    * pre-flight an ANN/clustering pipeline runs before trusting
    * distances: per dimension `i`, the exact-fixed-point mean and
    * variance, the standard deviation, and the 3σ-outlier mass. Dead
    * dimensions (sd ≈ 0), exploding ones (outlier_ppm high), and
    * mean-offset dimensions (|mean| ≫ 0 — what [[abttProject]]'s
    * common-mean removal fixes) all read straight off the 64-row
    * result.
    *
    * Engine-exact: per-element floors (`floor(x·2³⁰)`,
    * `floor(x²·2³⁰)`) before any cross-row sum, truncating integer
    * division for the moments, variance clamped at 0 (truncation can
    * leave a constant dimension a few ulps negative), and
    * `sd_fx = floor(sqrt(var_fx·2³⁰))` — the int→double cast and the
    * sqrt are both correctly rounded IEEE ops, identical everywhere.
    *
    * Scale shape: ONE exploded corpus pass → dim-grain grouped agg
    * (map-side partials), then the outlier pass re-reads the corpus
    * against the broadcast 64-row moment table. Output: `i`, `n`,
    * `mean_fx`, `var_fx`, `sd_fx`, `n_outlier`, `outlier_ppm`. */
  def embeddingMoments(df: DataFrame, vecCol: String,
                       dim: Int): DataFrame = {
    require(dim >= 1, s"embeddingMoments: bad dim $dim")
    val fx = 1073741824.0
    val ex = df.select(
        posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
      .select(col("_i"),
        floor(col("_x") * lit(fx)).cast("long").as("_xfx"),
        floor(col("_x") * col("_x") * lit(fx)).cast("long").as("_gfx"))
    val mom = ex.groupBy(col("_i"))
      .agg(count(lit(1)).as("n"), sum(col("_xfx")).as("_sfx"),
        sum(col("_gfx")).as("_g2"))
      .withColumn("mean_fx", expr("_sfx div n"))
      .withColumn("var_fx",
        greatest(expr("_g2 div n - cast((cast(mean_fx as decimal(38,0))" +
          " * mean_fx) div 1073741824 as bigint)"), lit(0L)))
      .withColumn("sd_fx",
        expr("cast(floor(sqrt(cast(cast(var_fx as decimal(38,0))" +
          " * 1073741824 as double))) as bigint)"))
      .select(col("_i"), col("n"), col("mean_fx"), col("var_fx"),
        col("sd_fx"))
    ex.join(broadcast(mom), Seq("_i"))
      .groupBy(col("_i"), col("n"), col("mean_fx"), col("var_fx"),
        col("sd_fx"))
      .agg(sum(when(abs(col("_xfx") - col("mean_fx")) >
        lit(3L) * col("sd_fx"), 1L).otherwise(0L)).as("n_outlier"))
      .select(col("_i").as("i"), col("n"), col("mean_fx"),
        col("var_fx"), col("sd_fx"), col("n_outlier"),
        expr("cast(cast(n_outlier as decimal(38,0)) * 1000000" +
          " div n as bigint)").as("outlier_ppm"))
  }

  /** The generated DuckDB twin of [[topComponentFixed]] +
    * [[abttProject]] over a table `embeddings(vec_id, embedding)` —
    * the unrolled power iteration as `iters` CTE triples, HUGEINT
    * arithmetic throughout (`//` truncates toward zero, matching the
    * driver's BigInt ops). */
  def abttProjectSql(dim: Int, iters: Int): String = {
    val fx = "1073741824"
    // AS MATERIALIZED is load-bearing: each step references its
    // predecessor twice, and DuckDB's default CTE inlining would
    // duplicate the whole upstream subtree 2^iters times.
    val steps = (1 to iters).map { t =>
      val pv = if (t == 1) "v0" else s"v${t - 1}"
      s"""  w$t AS MATERIALIZED (SELECT mm.i, SUM(mm.m * $pv.v) AS w
         |    FROM mm JOIN $pv ON $pv.i = mm.j GROUP BY mm.i),
         |  x$t AS MATERIALIZED (SELECT MAX(ABS(w)) AS mx FROM w$t),
         |  v$t AS MATERIALIZED (SELECT w$t.i,
         |      CASE WHEN x$t.mx = 0 THEN $pv.v
         |        ELSE (w$t.w * $fx) // x$t.mx END AS v
         |    FROM w$t JOIN $pv ON $pv.i = w$t.i CROSS JOIN x$t)"""
        .stripMargin
    }.mkString(",\n")
    val vl = s"v$iters"
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS n
       |    FROM e),
       |  idx AS (SELECT CAST(i AS INTEGER) AS i FROM range($dim) r(i)),
       |  sm AS MATERIALIZED (SELECT i,
       |      CAST(SUM(CAST(FLOOR(v[i + 1] * $fx.0) AS BIGINT))
       |        AS HUGEINT) AS sf
       |    FROM e, idx GROUP BY i),
       |  g AS MATERIALIZED (SELECT i1.i AS i, i2.i AS j,
       |      CAST(SUM(CAST(FLOOR(v[i1.i + 1] * v[i2.i + 1] * $fx.0)
       |        AS BIGINT)) AS HUGEINT) AS gf
       |    FROM e, idx i1, idx i2 GROUP BY 1, 2),
       |  mm AS MATERIALIZED (SELECT g.i, g.j,
       |      (g.gf // n) - (((si.sf // n) * (sj.sf // n)) // $fx) AS m
       |    FROM g JOIN sm si ON si.i = g.i JOIN sm sj ON sj.i = g.j
       |    CROSS JOIN ns),
       |  v0 AS (SELECT i, CAST($fx AS HUGEINT) AS v FROM idx),
       |$steps,
       |  sg AS (SELECT CASE WHEN (SELECT v FROM $vl
       |        WHERE i = (SELECT MIN(i) FROM $vl WHERE v <> 0)) < 0
       |      THEN -1 ELSE 1 END AS sgn),
       |  vf AS (SELECT i, v * sgn AS v FROM $vl CROSS JOIN sg),
       |  muv AS (SELECT SUM((sm.sf // n) * vf.v) AS mv
       |    FROM sm JOIN vf ON vf.i = sm.i CROSS JOIN ns),
       |  p AS (SELECT e.vec_id,
       |      SUM(CAST(CAST(FLOOR(e.v[vf.i + 1] * $fx.0) AS BIGINT)
       |        AS HUGEINT) * vf.v) AS num
       |    FROM e, vf GROUP BY e.vec_id)
       |SELECT p.vec_id,
       |  CAST((p.num - muv.mv) // $fx AS BIGINT) AS proj_fx,
       |  CAST(CAST((p.num - muv.mv) // $fx AS BIGINT) AS DOUBLE)
       |    / $fx.0 AS proj
       |FROM p CROSS JOIN muv
       |ORDER BY p.vec_id""".stripMargin
  }
}
