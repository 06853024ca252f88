package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.10):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
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

  /** Double-precision dot product of two float-array columns (element-wise
    * cast first, so multiplication happens in double on both engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_qv"), col("_cv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
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
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0,
        call_function("shiftleft", lit(1L), lit(i))).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding-cosine near-duplicate pairs (the §2.10 "embedding-cosine
    * near-dup" dedup variant): candidates from LSH bucket collisions
    * (any of `tables` hash tables), then exact cosine ≥ threshold.
    * Identical vectors always share every bucket, so true duplicates are
    * found with certainty; the bucket join shuffles only
    * (table, bucket, id, vector) — never the all-pairs cross product. */
  def nearDupPairsEmbedding(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dim: Int, bits: Int = 4,
                            tables: Int = 8,
                            seed: Long = 42L): DataFrame = {
    val allPlanes = (0 until tables)
      .map(t => hyperplanes(dim, bits, seed + t))
    def bucketed(side: String): DataFrame =
      df.select(col(idCol).as(s"id_$side"), col(vecCol).as(s"_${side}v"),
        posexplode(array(allPlanes.map(p => lshBucket(col(vecCol), p)): _*)))
        .withColumnsRenamed(Map("pos" -> "_tbl", "col" -> "_bkt"))
    bucketed("a").join(bucketed("b"), Seq("_tbl", "_bkt"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        cosine(col("_av"), col("_bv")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Apply embedding near-dup dedup: keep the lowest-id member of every
    * duplicate cluster (higher ids anti-joined out). */
  def dedupeByEmbedding(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, dim: Int): DataFrame = {
    val losers = nearDupPairsEmbedding(df, idCol, vecCol, threshold, dim)
      .select(col("id_b").as("_loser")).distinct()
    df.join(losers, col(idCol) === col("_loser"), "left_anti")
  }

  /** LSH-bucketed approximate top-k: `tables` independent hash tables of
    * `bits` hyperplanes each; candidates = corpus vectors sharing a bucket
    * with the query in ANY table; exact cosine re-ranks candidates.
    *
    * Recall/cost dial: more bits → smaller buckets (fewer candidates,
    * lower recall); more tables → higher recall (union of probes). At
    * billions of vectors: bits ~ log2(n/target_bucket_size), tables 4-16.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, bits: Int = 4,
              tables: Int = 8, seed: Long = 42L): DataFrame = {
    val allPlanes = (0 until tables)
      .map(t => hyperplanes(dim, bits, seed + t))
    def bucketed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"_${side}v"),
        posexplode(array(allPlanes.map(p => lshBucket(col(vecCol), p)): _*)))
        .withColumnsRenamed(Map("pos" -> "_tbl", "col" -> "_bkt"))
    val qb = bucketed(queries, "query")
    val cb = bucketed(corpus, "neighbor")
    val cand = cb.join(broadcast(qb), Seq("_tbl", "_bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_queryv"), col("_neighborv")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }
}
