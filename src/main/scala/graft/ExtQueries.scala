package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Engine
import graft.ext.{DedupOps, Multimodal, SimilarityOps, TextOps}

/** Query surface for the LLM-pipeline extension operators (SURVEY §2.10)
  * over the `documents` and `embeddings` fixtures. Each SQL-expressible op
  * carries a DuckDB oracle; the hash-seeded ops (MinHash/SimHash/LSH —
  * xxhash64 has no DuckDB twin) are registered rows-only and covered by
  * unit tests on constructed near-duplicates instead.
  *
  * Every query ends in a deterministic ORDER BY so result hashing is
  * row-order-independent across engines.
  */
object ExtQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Shared tokenizer in DuckDB form (contract in [[TextOps.tokens]]). */
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared fixed-point BM25 scoring chain (contract in
    * [[TextOps.bm25TopK]]): expects a `q(qid, qtext)` relation in
    * scope, yields per-(qid, doc_id) fixed-point term rows
    * `sc(qid, doc_id, fx)`. Used verbatim by BOTH the BM25 oracle and
    * the RRF-hybrid oracle so the two twins cannot drift. */
  private val bm25ScoreCtesSql: String = {
    val qtoksSql = toksSql.replace("(text)", "(qtext)")
    s"""tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  d AS (SELECT doc_id, toks, len(toks) AS dl FROM tok),
       |  stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM d),
       |  qt AS (SELECT qid, unnest(list_distinct($qtoksSql)) AS term
       |         FROM q),
       |  qv AS (SELECT DISTINCT term FROM qt),
       |  post AS (SELECT doc_id, dl, term, COUNT(*) AS tf
       |    FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d) e
       |    JOIN qv USING (term)
       |    GROUP BY doc_id, term, dl),
       |  dfs AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
       |  sc AS (SELECT qt.qid, post.doc_id,
       |      CAST(FLOOR(
       |        ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |                 / (CAST(df AS DOUBLE) + 0.5))
       |        * ((CAST(tf AS DOUBLE) * 2.25)
       |           / (CAST(tf AS DOUBLE)
       |              + 1.25 * (0.25 + (0.75 * CAST(dl AS DOUBLE))
       |                        / (CAST(sumdl AS DOUBLE)
       |                           / CAST(n AS DOUBLE)))))
       |        * 1073741824.0) AS BIGINT) AS fx
       |    FROM post
       |    JOIN dfs USING (term)
       |    JOIN qt USING (term)
       |    CROSS JOIN stats)""".stripMargin
  }

  /** Bigram-shingle CTE (contract in [[TextOps.shingles]], n=2): expects
    * a `tok(doc_id, toks)` relation in scope, yields `t(doc_id, sh)`. */
  private val shingleCteSql =
    """t AS (SELECT doc_id,
      |      list_distinct(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i+1])) AS sh
      |    FROM tok WHERE len(toks) >= 2)""".stripMargin

  /** Exact Jaccard of two shingle sets `a.sh` / `b.sh` (DuckDB form). */
  private val jaccardSql =
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)" +
      " / len(list_distinct(list_concat(a.sh, b.sh)))"

  /** documents ∪ clones-of-first-50 (ids offset by 10000): a corpus with
    * KNOWN duplicates, so dedup queries provably find something. */
  private def clonedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  private val clonedDocsSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, text FROM documents
      |  WHERE doc_id < 50""".stripMargin

  /** Connected components of the minhash-0.8 near-dup graph over
    * [[clonedDocs]] — computed ONCE per (session, fixture dir) and
    * shared by the four CC-family queries (`x_dedup_cc` /
    * `x_dedup_resolve` / `x_dedup_sizes` / `x_split_leakage`). The
    * candidate pipeline (tokenize → signatures → band join) plus the
    * iterative closure is the most expensive subtree in the suite, and
    * within a session its input is immutable, so each consumer
    * recomputing it was pure waste; at corpus scale it is the
    * difference between one and four full near-dup passes. The
    * returned frame is checkpoint-backed (connectedComponents
    * materializes its fixpoint), so reuse replays no lineage. */
  private val ccCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]())
  private val stagesCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DedupOps.RepStages]())

  /** The rep-grain MinHash stages under the cloned corpus,
    * session-cached: the CC family consumes the closure, the LPA
    * community query the weighted supernode vote — both now run at
    * REPRESENTATIVE grain (r13 verdict ask #1: the clone-expanded pair
    * set carried ~100× the edges of the rep graph for answers that are
    * a deterministic function of the rep graph plus class sizes), and
    * both start from this one shared LSH pipeline. Frames inside are
    * materialized (checkpoint-backed), so each consumer replays no
    * lineage. */
  private def clonedDocStages(s: SparkSession,
                              dir: String): DedupOps.RepStages =
    graft.engine.SessionCaches.memo(stagesCache, (s, dir))( {
      val st = DedupOps.minhashRepStages(clonedDocs(s, dir), "doc_id",
        "text", shingleN = 2, numPerm = 64, bands = 16, threshold = 0.8)
      DedupOps.RepStages(st.classes, st.shing,
        graft.engine.Engine.materialize(st.repPairs))
    })

  private def clonedDocsComponents(s: SparkSession,
                                   dir: String): DataFrame =
    graft.engine.SessionCaches.memo(ccCache, (s, dir))(
      DedupOps.componentsFromStages(clonedDocStages(s, dir),
        threshold = 0.8))

  // ---------------------------------------------------------------------
  // Exact dedup: hash-groupBy on the md5 text fingerprint, keep min id.
  // One shuffle, partial agg; the 50 planted clones must all be dropped.
  // ---------------------------------------------------------------------
  def xDedupExact(s: SparkSession, dir: String): DataFrame =
    DedupOps.exactByText(clonedDocs(s, dir), "doc_id", "text")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val xDedupExactSql: String =
    s"""WITH corpus AS ($clonedDocsSql)
       |SELECT doc_id, fp FROM (
       |  SELECT doc_id, md5(lower(trim(text))) AS fp,
       |    ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
       |                       ORDER BY doc_id) AS rn
       |  FROM corpus) x
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // N-gram (bigram) Jaccard near-dup pairs — the exact, O(n²) verification
  // twin of the LSH path, bounded to doc_id < 100. Top-100 most similar
  // pairs; the raw-double jaccard (same integer operands both engines) is
  // bit-identical.
  // ---------------------------------------------------------------------
  def xDedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(col("doc_id") < 100 && TextOps.tokenCount(col("text")) >= 2)
    DedupOps.jaccardPairs(docs, "doc_id", "text", n = 2)
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
      .limit(100)
  }

  val xDedupJaccardSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks
       |             FROM documents WHERE doc_id < 100),
       |  $shingleCteSql
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  $jaccardSql AS jaccard
       |FROM t a JOIN t b ON a.doc_id < b.doc_id
       |ORDER BY jaccard DESC, id_a, id_b LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // MinHash-LSH near-dup pairs on the cloned corpus (rows-only: xxhash64
  // signatures have no DuckDB twin). Every planted clone pair must surface
  // with est_jaccard 1.0; unit tests assert that plus organic recall.
  // ---------------------------------------------------------------------
  def xDedupMinhash(s: SparkSession, dir: String): DataFrame =
    DedupOps.nearDupPairsMinhash(clonedDocs(s, dir), "doc_id", "text",
        shingleN = 2, numPerm = 64, bands = 16, threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** Exact-Jaccard twin of the LSH pipeline at threshold 0.8, where the
    * 16-band/4-row S-curve makes candidate recall certain for this
    * corpus: a pair at exactly J=0.8 collides in ≥1 band with
    * p = 1-(1-0.8⁴)¹⁶ ≈ 0.99978 over random hashes, the corpus' only
    * qualifying pairs are the planted clones at J=1.0 (collide with
    * certainty), and the hashes are FIXED (seeded xxhash64) — so the LSH
    * result is deterministically equal to the exact all-pairs answer,
    * which is what DuckDB computes here. Verified, not assumed: the
    * driver hash-compares every row. */
  val xDedupMinhashSql: String =
    s"""WITH corpus AS ($clonedDocsSql),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  $shingleCteSql
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  $jaccardSql AS jaccard
       |FROM t a JOIN t b ON a.doc_id < b.doc_id
       |WHERE $jaccardSql >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // SimHash near-dup pairs, Hamming ≤ 3, pigeonhole block join. Uses the
  // portable 60-bit md5-derived hash (DedupOps.nearDupPairsSimhashPortable)
  // so the WHOLE pipeline — token hash, per-bit majority vote, 4×15-bit
  // block join, Hamming filter — has an exact DuckDB twin; the xxhash64
  // fast path stays the library default, unit-tested on planted clones.
  // ---------------------------------------------------------------------
  def xDedupSimhash(s: SparkSession, dir: String): DataFrame =
    DedupOps.nearDupPairsSimhashPortable(clonedDocs(s, dir), "doc_id",
        "text", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Full DuckDB twin of the portable SimHash pipeline. `CAST(SUM(..) AS
    * BIGINT)` guards against DuckDB's HUGEINT promotion (the r4
    * t_quality_checks lesson); hamming is cast to INTEGER to match
    * Spark's `bit_count`. */
  val xDedupSimhashSql: String =
    s"""WITH corpus AS ($clonedDocsSql),
       |  tok AS (SELECT doc_id, unnest($toksSql) AS t FROM corpus),
       |  th AS (SELECT doc_id,
       |      ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |  bs AS (SELECT doc_id, b,
       |      CASE WHEN CAST(SUM(((h >> CAST(b AS INTEGER)) & 1) * 2 - 1)
       |                     AS BIGINT) > 0
       |           THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
       |           ELSE CAST(0 AS BIGINT) END AS bv
       |    FROM th, range(60) r(b) GROUP BY doc_id, b),
       |  shx AS (SELECT doc_id, CAST(SUM(bv) AS BIGINT) AS sh
       |    FROM bs GROUP BY doc_id),
       |  blk AS (SELECT doc_id, sh, b AS blk,
       |      (sh >> CAST(b * 15 AS INTEGER)) & 32767 AS bv
       |    FROM shx, range(4) r(b)),
       |  cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |      CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |    FROM blk a JOIN blk b
       |      ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM cand
       |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // Brute-force cosine top-5 for the first 10 query vectors — the exact
  // ANN baseline. Broadcast queries × one corpus scan; per-query top-k.
  // ---------------------------------------------------------------------
  def xSimTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xSimTopkSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |  sc AS (SELECT query_id, vec_id AS neighbor_id,
      |      round(list_dot_product(qv, v)
      |        / (sqrt(list_dot_product(qv, qv))
      |           * sqrt(list_dot_product(v, v))), 6) AS score
      |    FROM q, e WHERE vec_id <> query_id),
      |  r AS (SELECT query_id, neighbor_id, score,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |                         ORDER BY score DESC, neighbor_id) AS rnk
      |    FROM sc)
      |SELECT query_id, rnk, neighbor_id, score FROM r
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // Hard-negative mining (DPR-style): for the first 20 query vectors,
  // the top-3 most-similar embeddings with a DIFFERENT label — the
  // negatives that actually teach a contrastive model. Same scoring
  // contract as x_sim_topk, plus the label exclusion.
  // ---------------------------------------------------------------------
  def xEmbedNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.hardNegatives(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", "label", k = 3)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xEmbedNegativesSql: String =
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  q AS (SELECT vec_id AS query_id, label AS ql, v AS qv
      |    FROM e WHERE vec_id < 20),
      |  sc AS (SELECT query_id, vec_id AS neighbor_id,
      |      round(list_dot_product(qv, v)
      |        / (sqrt(list_dot_product(qv, qv))
      |           * sqrt(list_dot_product(v, v))), 6) AS score
      |    FROM q, e WHERE label <> ql),
      |  r AS (SELECT query_id, neighbor_id, score,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |                         ORDER BY score DESC, neighbor_id) AS rnk
      |    FROM sc)
      |SELECT query_id, rnk, neighbor_id, score FROM r
      |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // Hybrid retrieval via reciprocal-rank fusion: per query document
  // (ids 0-3, which carry both text and an embedding under the shared
  // id space), fuse the BM25 top-20 (query = the document's own text —
  // more-like-this retrieval) with the dense cosine top-20. The two
  // lists deliberately cover DIFFERENT corpus subsets (BM25 ranks every
  // document; the dense index holds only vecs 0-499) — the fusion
  // contract handles one-sided hits, which is exactly the
  // partially-built-dense-index shape a production migration runs
  // through. Ranks on both sides are engine-exact (fixed-point BM25
  // sums; round-6 cosine), so the fused fixed-point ordering is too.
  // ---------------------------------------------------------------------
  def xHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val qdocs = docs.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val sparse = TextOps.bm25TopK(docs, qdocs, "doc_id", "text",
        "qid", "qtext", k = 20)
      .select(col("qid").as("query_id"), col("doc_id").as("neighbor_id"),
        col("rnk"))
    val dense = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 4), emb, "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    SimilarityOps.rrfFuse(sparse, dense, kRrf = 60, k = 10)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xHybridRrfSql: String = {
    s"""WITH q AS (SELECT doc_id AS qid, text AS qtext FROM documents
       |    WHERE doc_id < 4),
       |  $bm25ScoreCtesSql,
       |  bagg AS (SELECT qid, doc_id, CAST(SUM(fx) AS BIGINT) AS sfx
       |    FROM sc GROUP BY qid, doc_id),
       |  sr AS (SELECT qid, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY sfx DESC, doc_id) AS rnk
       |    FROM bagg QUALIFY rnk <= 20),
       |  e AS (SELECT vec_id,
       |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |    FROM embeddings),
       |  dq AS (SELECT vec_id AS query_id, v AS qv FROM e
       |    WHERE vec_id < 4),
       |  dsc AS (SELECT query_id, vec_id AS neighbor_id,
       |      round(list_dot_product(qv, v)
       |        / (sqrt(list_dot_product(qv, qv))
       |           * sqrt(list_dot_product(v, v))), 6) AS score
       |    FROM dq, e WHERE vec_id <> query_id),
       |  dr AS (SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM dsc QUALIFY rnk <= 20),
       |  f AS (SELECT COALESCE(s.qid, d.query_id) AS query_id,
       |      COALESCE(s.doc_id, d.neighbor_id) AS neighbor_id,
       |      s.rnk AS rank_a, d.rnk AS rank_b,
       |      COALESCE(CAST(FLOOR(1073741824.0
       |          / (60 + CAST(s.rnk AS DOUBLE))) AS BIGINT), 0)
       |        + COALESCE(CAST(FLOOR(1073741824.0
       |          / (60 + CAST(d.rnk AS DOUBLE))) AS BIGINT), 0) AS rrf_fx
       |    FROM sr s FULL OUTER JOIN dr d
       |      ON s.qid = d.query_id AND s.doc_id = d.neighbor_id),
       |  r AS (SELECT query_id, neighbor_id, rank_a, rank_b, rrf_fx,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY rrf_fx DESC, neighbor_id) AS rnk
       |    FROM f QUALIFY rnk <= 10)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id,
       |  CAST(rrf_fx AS BIGINT) AS rrf_fx,
       |  CAST(rank_a AS INTEGER) AS rank_a,
       |  CAST(rank_b AS INTEGER) AS rank_b
       |FROM r ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // LSH-bucketed approximate top-5 (rows-only; recall vs brute force is
  // unit-tested). Same output shape as the exact baseline.
  // ---------------------------------------------------------------------
  def xSimAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.annTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, dim = 64, bits = 4, tables = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Double literal pinned to DOUBLE in DuckDB: a bare decimal literal
    * parses as DECIMAL (different rounding on the cast); an exponent
    * suffix forces the DOUBLE parser, which round-trips `Double.toString`
    * exactly — so both engines see bit-identical hyperplane components. */
  private def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  /** Per-table LSH bucket rows over a CTE `e(vec_id, v)` — the
    * generated UNION ALL every ANN oracle twin shares. The hyperplanes
    * are the SAME seeded driver-side literals the Spark plan folds in
    * (`SimilarityOps.hyperplanes`), embedded as double literals via
    * [[dlit]], so bucket assignment reproduces bit-for-bit. */
  private def lshBucketsSql(dim: Int, bits: Int, tables: Int,
                            seed: Long): String =
    (0 until tables).map { tb =>
      val planes = SimilarityOps.hyperplanes(dim, bits, seed + tb)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        val planeList = p.map(dlit).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $planeList) > 0 " +
          s"THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $tb AS tbl, $bucket AS bkt FROM e"
    }.mkString("\nUNION ALL\n")

  /** Full DuckDB twin of [[xSimAnn]]: generated buckets
    * ([[lshBucketsSql]]), candidate bucket join, and exact-cosine
    * rerank all reproduce bit-for-bit, making the ANN path end-to-end
    * hash-checkable rather than rows-only. */
  val xSimAnnSql: String = {
    val perTable = lshBucketsSql(dim = 64, bits = 4, tables = 8,
      seed = 42L)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  eb AS ($perTable),
       |  cand AS (SELECT DISTINCT q.vec_id AS query_id,
       |      c.vec_id AS neighbor_id
       |    FROM eb q JOIN eb c ON q.tbl = c.tbl AND q.bkt = c.bkt
       |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |  sc AS (SELECT query_id, neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM cand
       |    JOIN e qv ON qv.vec_id = cand.query_id
       |    JOIN e cv ON cv.vec_id = cand.neighbor_id),
       |  r AS (SELECT query_id, neighbor_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM sc)
       |SELECT query_id, rnk, neighbor_id, score FROM r
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // IVF approximate top-5 via the deterministic sampled coarse quantizer
  // (cells = Voronoi regions of the 16 lowest-id corpus vectors): unlike
  // the k-means fit (float reduce order varies → no bit-exact twin;
  // ivfTopK stays recall-unit-tested in SimilarityOpsSpec), every step —
  // centroid choice, L2 cell assignment, nProbe probing, cosine rerank —
  // reproduces exactly in DuckDB. Same output shape as the exact
  // baseline, so a user can swap ANN layouts without code changes.
  // ---------------------------------------------------------------------
  /** Session-cached PERSISTED ANN index over the embeddings fixture:
    * the first sim-family query trains the sampled-quantizer state and
    * writes it to a state dir ([[graft.jobs.AnnIndexJob]]); the state
    * served to every query is then the LOADED one (quantizer + codes
    * read back from parquet), so the x_sim_ivf / x_sim_pq /
    * x_sim_ivfadc oracle rows certify search-off-loaded-index
    * end-to-end — cross-run reuse at daily cadence is the same load
    * path with a persistent stateDir (JobsSpec pins load == retrain
    * bit-equality). */
  private val annCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), SimilarityOps.AnnIndexState]())

  private def annState(s: SparkSession,
                       dir: String): SimilarityOps.AnnIndexState =
    graft.engine.SessionCaches.memo(annCache, (s, dir))( {
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft-ann-state").toString
      val emb = t(s, dir, "embeddings")
      graft.jobs.AnnIndexJob.loadOrTrain(s, emb, stateDir,
        "vec_id", "embedding", dim = 64) // train + persist
      val (loaded, wasLoaded) = graft.jobs.AnnIndexJob.loadOrTrain(s,
        emb, stateDir, "vec_id", "embedding", dim = 64)
      assert(wasLoaded, "ann state must load from the persisted key")
      loaded
    })

  def xSimIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.ivfTopKSampledWithIndex(emb.filter(col("vec_id") < 10),
        emb, annState(s, dir), "vec_id", "embedding", k = 5, nProbe = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Full DuckDB twin of [[xSimIvf]]: centroids are the 16 lowest-vec_id
    * embeddings (ROW_NUMBER−1 = cell id, matching the Spark literal
    * order), distances use the identical q·q − 2·q·c + c·c form with
    * sequential double accumulation, ties break by cell id. */
  val xSimIvfSql: String = {
    val (nCent, nProbe, k) = (16, 4, 5)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  cent AS (SELECT CAST(rn - 1 AS INTEGER) AS cell, cv FROM (
       |    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
       |    FROM e ORDER BY vec_id LIMIT $nCent)),
       |  ad AS (SELECT e.vec_id, c.cell,
       |      list_dot_product(e.v, e.v)
       |        - 2 * list_dot_product(e.v, c.cv)
       |        + list_dot_product(c.cv, c.cv) AS d2
       |    FROM e, cent c),
       |  rk AS (SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |                         ORDER BY d2, cell) AS rn FROM ad),
       |  asgn AS (SELECT vec_id AS neighbor_id, cell FROM rk WHERE rn = 1),
       |  pr AS (SELECT vec_id AS query_id, cell FROM rk
       |    WHERE vec_id < 10 AND rn <= $nProbe),
       |  sc AS (SELECT p.query_id, a.neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM pr p JOIN asgn a ON p.cell = a.cell
       |    JOIN e qv ON qv.vec_id = p.query_id
       |    JOIN e cv ON cv.vec_id = a.neighbor_id
       |    WHERE a.neighbor_id <> p.query_id),
       |  r AS (SELECT query_id, neighbor_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM sc)
       |SELECT query_id, rnk, neighbor_id, score FROM r
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Product-quantization (ADC) approximate top-5: deterministic sampled
  // codebooks (subvectors of the 16 lowest-id corpus vectors), 4×16-dim
  // subspaces, estimated distance = fixed-order sum of 4 table lookups.
  // Every step reproduces exactly in DuckDB; ranking uses the rounded
  // estimate so cross-engine order is stable.
  // ---------------------------------------------------------------------
  def xSimPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.pqTopKWithIndex(emb.filter(col("vec_id") < 10),
        annState(s, dir), "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xSimPqSql: String = {
    val (nCw, mSub, sub, k) = (16, 4, 16, 5)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  cb AS (SELECT CAST(rn - 1 AS INTEGER) AS cwid, cv FROM (
       |    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
       |    FROM e ORDER BY vec_id LIMIT $nCw)),
       |  subv AS (SELECT e.vec_id, CAST(mm.range AS INTEGER) AS m,
       |      e.v[mm.range * $sub + 1 : mm.range * $sub + $sub] AS sv
       |    FROM e, range($mSub) mm),
       |  cbs AS (SELECT cb.cwid, CAST(mm.range AS INTEGER) AS m,
       |      cb.cv[mm.range * $sub + 1 : mm.range * $sub + $sub] AS csv
       |    FROM cb, range($mSub) mm),
       |  d AS (SELECT subv.vec_id, subv.m, cbs.cwid,
       |      list_dot_product(subv.sv, subv.sv)
       |        - 2 * list_dot_product(subv.sv, cbs.csv)
       |        + list_dot_product(cbs.csv, cbs.csv) AS d2
       |    FROM subv JOIN cbs ON subv.m = cbs.m),
       |  codes AS (SELECT vec_id, m, cwid FROM (
       |    SELECT vec_id, m, cwid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |                         ORDER BY d2, cwid) AS rn FROM d)
       |    WHERE rn = 1),
       |  cwt AS (SELECT c0.vec_id, c0.cwid AS cw0, c1.cwid AS cw1,
       |      c2.cwid AS cw2, c3.cwid AS cw3
       |    FROM codes c0
       |    JOIN codes c1 ON c1.vec_id = c0.vec_id AND c1.m = 1
       |    JOIN codes c2 ON c2.vec_id = c0.vec_id AND c2.m = 2
       |    JOIN codes c3 ON c3.vec_id = c0.vec_id AND c3.m = 3
       |    WHERE c0.m = 0),
       |  qd AS (SELECT vec_id AS query_id, m, cwid, d2 FROM d
       |    WHERE vec_id < 10),
       |  sc AS (SELECT qd0.query_id, cwt.vec_id AS neighbor_id,
       |      round(qd0.d2 + qd1.d2 + qd2.d2 + qd3.d2, 6) AS est_d2
       |    FROM cwt
       |    JOIN qd qd0 ON qd0.m = 0 AND qd0.cwid = cwt.cw0
       |    JOIN qd qd1 ON qd1.m = 1 AND qd1.cwid = cwt.cw1
       |      AND qd1.query_id = qd0.query_id
       |    JOIN qd qd2 ON qd2.m = 2 AND qd2.cwid = cwt.cw2
       |      AND qd2.query_id = qd0.query_id
       |    JOIN qd qd3 ON qd3.m = 3 AND qd3.cwid = cwt.cw3
       |      AND qd3.query_id = qd0.query_id
       |    WHERE cwt.vec_id <> qd0.query_id),
       |  r AS (SELECT query_id, neighbor_id, est_d2,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY est_d2, neighbor_id) AS rnk
       |    FROM sc)
       |SELECT query_id, rnk, neighbor_id, est_d2 FROM r
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // IVFADC — the composed billion-vector layout (coarse quantizer
  // restricts to nProbe cells, PQ codes rank candidates by asymmetric
  // distance). Both halves are the deterministic sampled variants already
  // oracled separately (x_sim_ivf, x_sim_pq); this row certifies the
  // COMPOSITION: cells and codes from one corpus pass, probe join on
  // cell, fixed-order 4-lookup ADC estimate. Centroids and codebooks are
  // the same 16 lowest-id vectors on both engines.
  // ---------------------------------------------------------------------
  def xSimIvfadc(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.ivfPqTopKWithIndex(emb.filter(col("vec_id") < 10),
        annState(s, dir), "vec_id", "embedding", k = 5, nProbe = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xSimIvfadcSql: String = {
    val (nCent, nProbe, k, mSub, sub) = (16, 4, 5, 4, 16)
    // e/rk/d are each referenced more than once → AS MATERIALIZED, or
    // DuckDB inlines the whole upstream chain per reference.
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  cent AS MATERIALIZED (
       |    SELECT CAST(rn - 1 AS INTEGER) AS cell, cv FROM (
       |    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
       |    FROM e ORDER BY vec_id LIMIT $nCent)),
       |  ad AS (SELECT e.vec_id, c.cell,
       |      list_dot_product(e.v, e.v)
       |        - 2 * list_dot_product(e.v, c.cv)
       |        + list_dot_product(c.cv, c.cv) AS d2
       |    FROM e, cent c),
       |  rk AS MATERIALIZED (SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |                         ORDER BY d2, cell) AS rn FROM ad),
       |  asgn AS (SELECT vec_id AS neighbor_id, cell FROM rk WHERE rn = 1),
       |  pr AS (SELECT vec_id AS query_id, cell FROM rk
       |    WHERE vec_id < 10 AND rn <= $nProbe),
       |  subv AS (SELECT e.vec_id, CAST(mm.range AS INTEGER) AS m,
       |      e.v[mm.range * $sub + 1 : mm.range * $sub + $sub] AS sv
       |    FROM e, range($mSub) mm),
       |  cbs AS (SELECT cent.cell AS cwid, CAST(mm.range AS INTEGER) AS m,
       |      cent.cv[mm.range * $sub + 1 : mm.range * $sub + $sub] AS csv
       |    FROM cent, range($mSub) mm),
       |  d AS MATERIALIZED (SELECT subv.vec_id, subv.m, cbs.cwid,
       |      list_dot_product(subv.sv, subv.sv)
       |        - 2 * list_dot_product(subv.sv, cbs.csv)
       |        + list_dot_product(cbs.csv, cbs.csv) AS d2
       |    FROM subv JOIN cbs ON subv.m = cbs.m),
       |  codes AS (SELECT vec_id, m, cwid FROM (
       |    SELECT vec_id, m, cwid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |                         ORDER BY d2, cwid) AS rn FROM d)
       |    WHERE rn = 1),
       |  cwt AS (SELECT c0.vec_id, c0.cwid AS cw0, c1.cwid AS cw1,
       |      c2.cwid AS cw2, c3.cwid AS cw3
       |    FROM codes c0
       |    JOIN codes c1 ON c1.vec_id = c0.vec_id AND c1.m = 1
       |    JOIN codes c2 ON c2.vec_id = c0.vec_id AND c2.m = 2
       |    JOIN codes c3 ON c3.vec_id = c0.vec_id AND c3.m = 3
       |    WHERE c0.m = 0),
       |  qd AS MATERIALIZED (SELECT vec_id AS query_id, m, cwid, d2
       |    FROM d WHERE vec_id < 10),
       |  sc AS (SELECT p.query_id, a.neighbor_id,
       |      round(qd0.d2 + qd1.d2 + qd2.d2 + qd3.d2, 6) AS est_d2
       |    FROM pr p JOIN asgn a ON p.cell = a.cell
       |    JOIN cwt ON cwt.vec_id = a.neighbor_id
       |    JOIN qd qd0 ON qd0.query_id = p.query_id AND qd0.m = 0
       |      AND qd0.cwid = cwt.cw0
       |    JOIN qd qd1 ON qd1.query_id = p.query_id AND qd1.m = 1
       |      AND qd1.cwid = cwt.cw1
       |    JOIN qd qd2 ON qd2.query_id = p.query_id AND qd2.m = 2
       |      AND qd2.cwid = cwt.cw2
       |    JOIN qd qd3 ON qd3.query_id = p.query_id AND qd3.m = 3
       |      AND qd3.cwid = cwt.cw3
       |    WHERE a.neighbor_id <> p.query_id),
       |  r AS (SELECT query_id, neighbor_id, est_d2,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY est_d2, neighbor_id) AS rnk
       |    FROM sc)
       |SELECT query_id, rnk, neighbor_id, est_d2 FROM r
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Composed corpus dedup (exact → MinHash-LSH) on the cloned corpus.
  // Threshold 0.85: at 64 perms / 16 bands the banded-LSH miss
  // probability for a true J ≥ 0.85 pair is (1−0.85⁴)¹⁶ ≈ 7e-6, so the
  // LSH candidate set provably contains every pair the exact all-pairs
  // Jaccard finds — making the DuckDB twin (exact dedup keep-min-id, then
  // exact-Jaccard losers removed) a faithful oracle. At 0.5 the recall
  // dips to ~0.65 and the approximate result has no exact twin (that
  // regime stays covered by x_dedup_minhash's pair-level output + units).
  // ---------------------------------------------------------------------
  def xDedupCorpus(s: SparkSession, dir: String): DataFrame =
    DedupOps.dedupeCorpus(clonedDocs(s, dir), "doc_id", "text",
        threshold = 0.85)
      .select(col("doc_id")).orderBy(col("doc_id"))

  val xDedupCorpusSql: String =
    s"""WITH corpus AS ($clonedDocsSql),
       |  surv AS (SELECT doc_id, text FROM (
       |      SELECT doc_id, text,
       |        ROW_NUMBER() OVER (PARTITION BY lower(trim(text))
       |                           ORDER BY doc_id) AS rn
       |      FROM corpus) WHERE rn = 1),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM surv),
       |  $shingleCteSql,
       |  losers AS (SELECT DISTINCT b.doc_id FROM t a
       |    JOIN t b ON a.doc_id < b.doc_id
       |    WHERE $jaccardSql >= 0.85)
       |SELECT doc_id FROM surv
       |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Embedding-cosine near-dup dedup: clones of the first 25 vectors are
  // planted; the LSH-prefiltered exact-cosine path must drop exactly the
  // clones (random fixture vectors never reach cosine 0.99 organically),
  // which the brute-force DuckDB oracle verifies.
  // ---------------------------------------------------------------------
  def xDedupEmbed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val corpus = e.unionAll(e.filter(col("vec_id") < 25)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    SimilarityOps.dedupeByEmbedding(corpus, "vec_id", "embedding",
        threshold = 0.99, dim = 64)
      .select(col("vec_id"))
      .orderBy(col("vec_id"))
  }

  val xDedupEmbedSql: String =
    """WITH corpus AS (
      |    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |    FROM embeddings
      |  UNION ALL
      |    SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |    FROM embeddings WHERE vec_id < 25),
      |  losers AS (SELECT DISTINCT b.vec_id FROM corpus a
      |    JOIN corpus b ON a.vec_id < b.vec_id
      |    WHERE list_dot_product(a.v, b.v)
      |      / (sqrt(list_dot_product(a.v, a.v))
      |         * sqrt(list_dot_product(b.v, b.v))) >= 0.99)
      |SELECT vec_id FROM corpus
      |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Text quality metrics + token/subword counts — one narrow projection.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // Flesch reading-ease readability in exact ppm fixed point: the
  // comprehension-level quality gate (206.835 − 1.015·ASL − 84.6·ASW),
  // sentences = [.!?]+ runs clamped ≥1, syllables = vowel groups —
  // truncating division at each of the three steps, same order both
  // engines, so scores hash-exact. One codegen'd projection.
  // ---------------------------------------------------------------------
  def xTextReadability(s: SparkSession, dir: String): DataFrame =
    TextOps.readabilityReport(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  val xTextReadabilitySql: String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len($toksSql) AS BIGINT) AS n_words,
       |    GREATEST(CAST(1 AS BIGINT),
       |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
       |      AS n_sentences,
       |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
       |      AS BIGINT) AS n_syllables
       |  FROM documents)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  206835000 - (1015 * ((n_words * 1000000) // n_sentences)) // 1000
       |    - (84600 * ((n_syllables * 1000000)
       |        // GREATEST(CAST(1 AS BIGINT), n_words))) // 1000
       |    AS fre_ppm
       |FROM t ORDER BY doc_id""".stripMargin

  def xTextStats(s: SparkSession, dir: String): DataFrame =
    // n_subwords rides the same per-distinct-text fan-out as the
    // quality columns (the interpreted aggregate HOF is the row's
    // dominant cost — it must not run per clone copy).
    TextOps.fanOutPerText(
        graft.engine.Engine.spread(t(s, dir, "documents")), "text")(tc =>
        TextOps.qualityMetricsCols(tc) :+
          ("n_subwords" -> TextOps.subwordCount(tc)))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("n_subwords"), col("alnum_ratio"), col("avg_token_len"),
        col("stopword_ratio"), col("quality_ok"))
      .orderBy(col("doc_id"))

  val xTextStatsSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks,
       |    length(text) AS n_chars,
       |    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(n_chars AS BIGINT) AS n_chars,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(list_sum(list_transform(toks,
       |    x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT)
       |    AS n_subwords,
       |  CASE WHEN n_chars > 0
       |       THEN CAST(n_alnum AS DOUBLE) / n_chars ELSE 0.0 END
       |    AS alnum_ratio,
       |  CASE WHEN len(toks) > 0
       |       THEN CAST(n_alnum AS DOUBLE) / len(toks) ELSE 0.0 END
       |    AS avg_token_len,
       |  CASE WHEN len(toks) > 0
       |       THEN CAST(len(list_filter(toks, x -> list_contains(
       |         ['the','a','an','and','or','of','to','in','is','it'], x)))
       |         AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
       |  (len(toks) >= 5
       |   AND (CASE WHEN n_chars > 0
       |             THEN CAST(n_alnum AS DOUBLE) / n_chars ELSE 0.0 END) >= 0.5
       |   AND (CASE WHEN len(toks) > 0
       |             THEN CAST(n_alnum AS DOUBLE) / len(toks) ELSE 0.0 END)
       |       BETWEEN 2 AND 12) AS quality_ok
       |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Language ID: marker-token scoring, alphabetical-first argmax.
  // ---------------------------------------------------------------------
  def xTextLangid(s: SparkSession, dir: String): DataFrame =
    TextOps.languageId(t(s, dir, "documents"), "text")
      .select(col("doc_id") +: col("pred_lang") +:
        TextOps.LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
      .orderBy(col("doc_id"))

  val xTextLangidSql: String = {
    val scoreExprs = TextOps.LangMarkers.map { case (l, ms) =>
      val list = ms.map(m => s"'$m'").mkString("[", ",", "]")
      s"CAST(len(list_filter(toks, x -> list_contains($list, x))) AS BIGINT) AS score_$l"
    }.mkString(",\n    ")
    val langs = TextOps.LangMarkers.map(_._1)
    val maxExpr = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val caseExpr = langs
      .map(l => s"WHEN score_$l = m THEN '$l'")
      .mkString("CASE ", " ", " END")
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  sc AS (SELECT doc_id,
       |    $scoreExprs
       |  FROM tok),
       |  mx AS (SELECT *, $maxExpr AS m FROM sc)
       |SELECT doc_id, $caseExpr AS pred_lang,
       |  ${langs.map(l => s"score_$l").mkString(", ")}
       |FROM mx ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Text cleaning: planted URLs / emails / casing must wash out; the
  // whole pipeline is one regex projection mirrored in DuckDB.
  // ---------------------------------------------------------------------
  def xTextClean(s: SparkSession, dir: String): DataFrame = {
    // spread: the regex-chain projection must not inherit a 1-split scan
    val dirty = graft.engine.Engine.spread(t(s, dir, "documents"))
      .withColumn("t",
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" visit http://ex.com/page now"))
          .when(col("doc_id") % 3 === 1,
            lit(" mail Bob.Smith@example.com ok"))
          .otherwise(lit(" PLAIN Tail"))))
    dirty.select(col("doc_id"), TextOps.cleanText(col("t")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  val xTextCleanSql: String =
    """WITH dirty AS (SELECT doc_id, text ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' visit http://ex.com/page now'
      |         WHEN doc_id % 3 = 1 THEN ' mail Bob.Smith@example.com ok'
      |         ELSE ' PLAIN Tail' END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  lower(trim(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(t,
      |    'https?://[^ ]+', ' ', 'g'),
      |    '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', ' ', 'g'),
      |    '[^ -~]', ' ', 'g'),
      |    ' +', ' ', 'g'))) AS cleaned
      |FROM dirty ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Document fingerprinting (md5 of normalized text).
  // ---------------------------------------------------------------------
  def xTextFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val xTextFingerprintSql: String =
    """SELECT doc_id, md5(lower(trim(text))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Quality filtering: the composed keep/drop decision per language —
  // the filter step of a training-data pipeline, verified end-to-end.
  // ---------------------------------------------------------------------
  def xTextFilter(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityMetrics(t(s, dir, "documents"), "text")
      .filter(col("quality_ok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"))

  val xTextFilterSql: String =
    s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks,
       |    length(text) AS n_chars,
       |    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum
       |  FROM documents),
       |  m AS (SELECT lang, CAST(len(toks) AS BIGINT) AS n_tokens,
       |      (len(toks) >= 5
       |       AND (CASE WHEN n_chars > 0
       |            THEN CAST(n_alnum AS DOUBLE) / n_chars ELSE 0.0 END) >= 0.5
       |       AND (CASE WHEN len(toks) > 0
       |            THEN CAST(n_alnum AS DOUBLE) / len(toks) ELSE 0.0 END)
       |           BETWEEN 2 AND 12) AS ok
       |    FROM t)
       |SELECT lang, COUNT(*) AS n_kept,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM m WHERE ok GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // Sequence packing: 512-token concat-and-chunk bins per source; the
  // per-bin doc/token totals are fully window-expressible on both sides.
  // ---------------------------------------------------------------------
  def xTextPack(s: SparkSession, dir: String): DataFrame = {
    val withCounts = t(s, dir, "documents")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
    TextOps.assignPackedBins(withCounts, "doc_id", "n_tokens", "source",
        maxTokens = 512)
      .groupBy(col("source"), col("pack_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy(col("source"), col("pack_bin"))
  }

  val xTextPackSql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |  b AS (SELECT source, n_tokens,
       |      CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
       |        ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        / 512) AS BIGINT) AS pack_bin
       |    FROM t)
       |SELECT source, pack_bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
       |FROM b GROUP BY source, pack_bin
       |ORDER BY source, pack_bin""".stripMargin

  // ---------------------------------------------------------------------
  // Multimodal: synthesize payload+meta, batched feature extraction
  // (rows-only: the stub decoder is JVM-side). Meta fields + first feature
  // component exposed; determinism is what's asserted.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // Dictionary sentiment (SURVEY §2.10): explode → broadcast lexicon join
  // → re-agg. Integer weights make the score sum order-independent, so
  // the DuckDB twin (the same lexicon rendered as a CASE) matches by hash.
  // ---------------------------------------------------------------------
  def xTextSentiment(s: SparkSession, dir: String): DataFrame =
    TextOps.sentiment(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  val xTextSentimentSql: String = {
    val lex = TextOps.DefaultLexicon.toSeq.sortBy(_._1)
    val cases = lex.map { case (w, v) => s"WHEN '$w' THEN $v" }.mkString(" ")
    val words = lex.map { case (w, _) => s"'$w'" }.mkString(", ")
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  sc AS (SELECT doc_id, len(toks) AS n_tokens,
       |      coalesce(list_sum(list_transform(toks,
       |        t -> CASE WHEN t IN ($words) THEN 1 ELSE 0 END)), 0) AS n_hits,
       |      coalesce(list_sum(list_transform(toks,
       |        t -> CASE t $cases ELSE 0 END)), 0) AS score
       |    FROM tok)
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |  CAST(n_hits AS BIGINT) AS n_hits, CAST(score AS BIGINT) AS score,
       |  CAST(CASE WHEN score > 0 THEN 1 WHEN score < 0 THEN -1
       |       ELSE 0 END AS INT) AS polarity,
       |  CASE WHEN n_tokens > 0 THEN CAST(score AS DOUBLE) / n_tokens
       |       ELSE 0.0 END AS score_norm
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Feature buckets 6/7 (byte values 96-127: lowercase ASCII) carry real
    * signal on text-backed payloads — buckets 0/1 (control chars) are all
    * zero and would make the value check vacuous. The float32 histogram is
    * widened to double BEFORE rounding so the oracle (FLOAT division in
    * DuckDB, then widen) sees bit-identical doubles. Fixture text is pure
    * ASCII, so byte offsets == char offsets and the byte histogram is a
    * character-class count DuckDB can reproduce with regexes. */
  def xMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Multimodal.extractFeatures(
        Multimodal.withSyntheticMedia(docs, "doc_id", "text"), "media")
      .select(col("doc_id"), col("media_meta.mime").as("mime"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        col("media_meta.n_bytes").as("n_bytes"),
        round(element_at(col("features"), 7).cast("double"), 6).as("f6"),
        round(element_at(col("features"), 8).cast("double"), 6).as("f7"))
      .orderBy(col("doc_id"))
  }

  val xMediaFeaturesSql: String =
    """SELECT doc_id, 'image/fake' AS mime,
      |  CAST(doc_id % 64 + 1 AS INT) AS width,
      |  CAST(doc_id % 48 + 1 AS INT) AS height,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  round(CAST(CAST(length(regexp_replace(text, '[^\x60-\x6f]', '', 'g'))
      |    AS FLOAT) / CAST(length(text) AS FLOAT) AS DOUBLE), 6) AS f6,
      |  round(CAST(CAST(length(regexp_replace(text, '[^\x70-\x7f]', '', 'g'))
      |    AS FLOAT) / CAST(length(text) AS FLOAT) AS DOUBLE), 6) AS f7
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Multimodal frame sampling: every 4th 32-byte chunk; md5 + length per
  // frame are byte-exact against the DuckDB string oracle (fixture text is
  // pure ASCII so char offsets == byte offsets).
  // ---------------------------------------------------------------------
  def xFrameSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Multimodal.sampleFrames(
        Multimodal.withSyntheticMedia(docs, "doc_id", "text"),
        "doc_id", "media", frameBytes = 32, stride = 4)
      .select(col("doc_id"), col("frame_no"),
        md5(col("frame")).as("frame_md5"),
        length(col("frame")).cast("long").as("frame_len"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val xFrameSampleSql: String =
    """WITH t AS (SELECT doc_id, text,
      |    CAST(ceil(length(text) / 32.0) AS BIGINT) AS nf FROM documents),
      |  u AS (SELECT doc_id, unnest(list_transform(
      |      range(0, greatest(nf - 1, 0) + 1, 4),
      |      i -> struct_pack(fn := i / 4,
      |        fmd5 := md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)),
      |        flen := length(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)))))
      |      AS f
      |    FROM t)
      |SELECT doc_id, CAST(f.fn AS INTEGER) AS frame_no, f.fmd5 AS frame_md5,
      |  CAST(f.flen AS BIGINT) AS frame_len
      |FROM u ORDER BY doc_id, frame_no""".stripMargin

  // ---------------------------------------------------------------------
  // Media near-dup pairs by shared frame fingerprints
  // (Multimodal.frameDedupPairs): synthetic media over docs < 100 plus
  // CLIPPED twins (first half of the payload, +20000) — clips share
  // every aligned sampled frame, so min-normalized overlap stays ~10^6
  // while a byte-level hash of the whole payload misses them. The twin
  // replays the chunk/md5/overlap algebra.
  //
  // ASCII-fixture assumption (shared with x_frame_sample): the engine
  // chunks the UTF-8 media PAYLOAD by bytes; the twin chunks the text
  // by characters (length/substr). Identical only while the fixture
  // generator emits ASCII-only text, where chars == bytes — if it ever
  // emits non-ASCII, switch the twin to octet_length + BLOB slicing.
  // ---------------------------------------------------------------------
  def xMediaDedup(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameDedupPairs(
        Multimodal.withSyntheticMedia(truncatedTwinDocs(s, dir),
          "doc_id", "text"),
        "doc_id", "media", frameBytes = 32, stride = 4,
        tauPpm = 500000L)
      .orderBy(col("id_a"), col("id_b"))

  val xMediaDedupSql: String =
    s"""WITH corpus AS (
      |    $truncatedTwinSql),
      |  t AS (SELECT doc_id, text,
      |    CAST(ceil(length(text) / 32.0) AS BIGINT) AS nf FROM corpus),
      |  fp AS (SELECT DISTINCT doc_id, fmd5 FROM (
      |    SELECT doc_id, unnest(list_transform(
      |        range(0, greatest(nf - 1, 0) + 1, 4),
      |        i -> md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 32))))
      |      AS fmd5
      |    FROM t)),
      |  sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      |    FROM fp GROUP BY doc_id),
      |  pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |      CAST(COUNT(*) AS BIGINT) AS n_shared
      |    FROM fp a JOIN fp b
      |      ON a.fmd5 = b.fmd5 AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2)
      |SELECT id_a, id_b, sa.n AS n_a, sb.n AS n_b, n_shared,
      |  n_shared * 1000000 // least(sa.n, sb.n) AS overlap_ppm
      |FROM pr JOIN sz sa ON sa.doc_id = id_a
      |  JOIN sz sb ON sb.doc_id = id_b
      |WHERE n_shared * 1000000 // least(sa.n, sb.n) >= 500000
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // PERCEPTUAL media near-dup (Multimodal.perceptualDedupPairs): docs
  // < 100 plus RE-ENCODED twins — byte-REVERSED payloads (+20000) that
  // share not a single 32-byte frame with their original, so the exact
  // frame tier (x_media_dedup) misses them entirely, while their byte
  // histograms are permutation-identical (L1 = 0). The sign-projected
  // signature, Hamming-band blocking, and fixed-order double L1 verify
  // all reproduce exactly in DuckDB (shared perceptualWeights
  // literals; left-associated IEEE sums; floor-ppm threshold). tau =
  // 100 ppm sits an order of magnitude under the closest cross-doc
  // pair (~500 ppm at sf0.01), so exactly the planted re-encodes pass.
  // ASCII-fixture assumption shared with x_media_dedup: engine buckets
  // payload BYTES, twin buckets text CHARS.
  // ---------------------------------------------------------------------
  def xMediaNeardup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val corpus = d.filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 20000).as("doc_id"),
          reverse(col("text")).as("text")))
    val feats = Multimodal.extractFeatures(
      Multimodal.withSyntheticMedia(corpus, "doc_id", "text"), "media")
    Multimodal.perceptualDedupPairs(feats, "doc_id", "features",
        bits = 16, bands = 4, seed = 42L, tauL1Ppm = 100L)
      .orderBy(col("id_a"), col("id_b"))
  }

  val xMediaNeardupSql: String = {
    val (dim, bits, bands, seed, tau) = (16, 16, 4, 42L, 100L)
    val r = bits / bands
    val w = Multimodal.perceptualWeights(dim, bits, seed)
    // 16-bucket byte-class histogram as float32 count/len widened to
    // double (the decodeStub contract; bucket 0 starts at \x01 — a
    // VARCHAR cannot hold NUL)
    val fCols = (0 until dim).map { i =>
      val lo = if (i == 0) 1 else i * 16
      val hi = i * 16 + 15
      f"CAST(CAST(length(regexp_replace(text, '[^\\x$lo%02x-\\x$hi%02x]', '', 'g')) AS FLOAT) / CAST(length(text) AS FLOAT) AS DOUBLE) AS f$i"
    }.mkString(",\n      ")
    val bitCols = (0 until bits).map { t =>
      val sum = (0 until dim).map(i =>
        s"f$i * ${w(t)(i)}.0").mkString(" + ")
      s"($sum) >= 0 AS bit$t"
    }.mkString(",\n      ")
    val bandCols = (0 until bands).map { b =>
      val v = (0 until r).map(j =>
        s"CASE WHEN bit${b * r + j} THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      s"CAST($v AS BIGINT) AS b$b"
    }.mkString(",\n      ")
    val bandStructs = (0 until bands).map(b =>
      s"struct_pack(band := $b, v := b$b)").mkString(", ")
    val l1 = (0 until dim).map(i =>
      s"abs(a.f$i - b.f$i)").mkString(" + ")
    s"""WITH corpus AS (
       |    SELECT doc_id, text FROM documents WHERE doc_id < 100
       |    UNION ALL
       |    SELECT doc_id + 20000 AS doc_id, reverse(text) AS text
       |    FROM documents WHERE doc_id < 30),
       |  h AS MATERIALIZED (SELECT doc_id,
       |      $fCols
       |    FROM corpus),
       |  bt AS (SELECT *,
       |      $bitCols
       |    FROM h),
       |  sg AS MATERIALIZED (SELECT *,
       |      $bandCols
       |    FROM bt),
       |  bd AS (SELECT doc_id, unnest([$bandStructs]) AS s FROM sg),
       |  bd2 AS (SELECT doc_id, s.band AS band, s.v AS v FROM bd),
       |  cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |    FROM bd2 x JOIN bd2 y ON x.band = y.band AND x.v = y.v
       |    WHERE x.doc_id < y.doc_id),
       |  vf AS (SELECT id_a, id_b,
       |      CAST(FLOOR(($l1) * 1000000.0) AS BIGINT) AS l1_ppm
       |    FROM cand JOIN sg a ON a.doc_id = id_a
       |    JOIN sg b ON b.doc_id = id_b)
       |SELECT id_a, id_b, l1_ppm FROM vf
       |WHERE l1_ppm <= $tau ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Connected components over the minhash-0.8 near-dup graph: pairwise
  // edges collapsed into duplicate CLUSTERS (the keep-one-per-cluster
  // prerequisite). Spark runs iterative min-label propagation; the
  // oracle computes the transitive closure with a recursive CTE and
  // takes min(reachable) — two independent algorithms, same fixpoint.
  // ---------------------------------------------------------------------
  def xDedupCc(s: SparkSession, dir: String): DataFrame =
    clonedDocsComponents(s, dir)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy(col("doc_id"))

  /** Shared CTE chain: cloned corpus → minhash-0.8-equivalent exact
    * edges → transitive closure → `comp(doc_id, component)`. */
  private val ccCtesSql: String =
    s"""corpus AS ($clonedDocsSql),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  $shingleCteSql,
       |  edges AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |    FROM t a JOIN t b ON a.doc_id < b.doc_id
       |    WHERE $jaccardSql >= 0.8),
       |  bidir AS (SELECT id_a AS src, id_b AS dst FROM edges
       |    UNION SELECT id_b, id_a FROM edges
       |    UNION SELECT id_a, id_a FROM edges
       |    UNION SELECT id_b, id_b FROM edges),
       |  reach AS (
       |    WITH RECURSIVE r(src, dst) AS (
       |      SELECT src, dst FROM bidir
       |      UNION
       |      SELECT r.src, b.dst FROM r JOIN bidir b ON r.dst = b.src
       |    ) SELECT * FROM r),
       |  comp AS (SELECT src AS doc_id, MIN(dst) AS component
       |    FROM reach GROUP BY src)""".stripMargin

  val xDedupCcSql: String =
    s"""WITH $ccCtesSql
       |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Label-propagation communities over the same near-dup graph: the
  // community structure CC can't see (a spurious bridge chains two
  // genuine clusters into one component; LPA lets them keep separate
  // labels). Synchronous, fixed 4 rounds, min-label tie-break. The
  // engine runs the vote at REPRESENTATIVE grain (class-size-weighted
  // blow-up LPA over the shared rep stages — edges never clone-expand,
  // labels do); the twin keeps computing the member-grain sync LPA
  // over the expanded graph as MATERIALIZED CTEs on the SHARED
  // ccCtesSql block, so the green row IS the blow-up == member-grain
  // equivalence proof.
  // ---------------------------------------------------------------------
  def xGraphLpa(s: SparkSession, dir: String): DataFrame =
    DedupOps.communitiesFromStages(clonedDocStages(s, dir),
        threshold = 0.8, rounds = 4)
      .select(col("id").as("doc_id"), col("community"))
      .orderBy(col("doc_id"))

  val xGraphLpaSql: String = {
    val rounds = (1 to 4).map { r =>
      val pl = if (r == 1) "l0" else s"l${r - 1}"
      s"""  c$r AS MATERIALIZED (SELECT b.src, l.label,
         |      CAST(COUNT(*) AS BIGINT) AS c
         |    FROM bidir b JOIN $pl l ON l.id = b.dst
         |    GROUP BY 1, 2),
         |  l$r AS MATERIALIZED (SELECT src AS id, label FROM (
         |      SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src
         |        ORDER BY c DESC, label ASC) AS rn FROM c$r) x
         |    WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ccCtesSql,
       |  l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label
       |    FROM bidir),
       |$rounds
       |SELECT id AS doc_id, label AS community FROM l4
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Fixed-point PageRank over the same near-dup graph: the centrality
  // weighting a curation pipeline uses to rank documents inside a
  // cluster by how embedded they are (and sources by reputation).
  // Ranks are longs scaled 2^30, contributions truncate-divide by
  // degree, the damped update is exact integer percent — so the
  // ITERATION itself is oracle-checked (the ABTT eigensolve
  // discipline). The engine iterates at REPRESENTATIVE grain
  // (pageRankBlowupFx — class-shared ranks, class-constant degrees;
  // edges never clone-expand) while the twin unrolls 6 member-grain
  // rounds as MATERIALIZED CTEs over the SHARED ccCtesSql edges
  // (cache-served) — the green row is the blow-up equivalence proof.
  // ---------------------------------------------------------------------
  def xGraphPagerank(s: SparkSession, dir: String): DataFrame =
    DedupOps.pagerankFromStages(clonedDocStages(s, dir),
        threshold = 0.8, rounds = 6)
      .select(col("id").as("doc_id"), col("pr_fx"))
      .orderBy(col("doc_id"))

  val xGraphPagerankSql: String = {
    val one = 1L << 30
    val base = 15L * one / 100L
    val rounds = (1 to 6).map { r =>
      s"""  p$r AS MATERIALIZED (SELECT b.dst AS id,
         |      CAST($base + (85 * SUM(p.pr // d.deg)) // 100 AS BIGINT)
         |        AS pr
         |    FROM bidir2 b JOIN p${r - 1} p ON p.id = b.src
         |    JOIN deg d ON d.src = b.src
         |    GROUP BY b.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ccCtesSql,
       |  bidir2 AS (SELECT id_a AS src, id_b AS dst FROM edges
       |    UNION SELECT id_b, id_a FROM edges),
       |  deg AS MATERIALIZED (SELECT src,
       |      CAST(COUNT(*) AS BIGINT) AS deg
       |    FROM bidir2 GROUP BY src),
       |  p0 AS (SELECT src AS id, CAST($one AS BIGINT) AS pr FROM deg),
       |$rounds
       |SELECT id AS doc_id, pr AS pr_fx FROM p6
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // CROSS-RUN incremental clustering (the daily-crawl cadence): day 1 =
  // the documents table, clustered and its labels persisted; day 2 = the
  // 50 clones arriving as a new batch. The engine generates only
  // batch-touching candidate pairs against the day-1 band index
  // (DedupOps.incrementalNearDupPairsMinhash) and merges them into the
  // persisted labels by frontier contraction
  // (DedupOps.incrementalComponents) — history is never re-clustered.
  // The oracle is the FULL recluster over the two-day corpus (the same
  // recursive closure as x_dedup_cc), so the green row IS the
  // incremental == full-recluster equivalence proof.
  // ---------------------------------------------------------------------
  def xDedupIncrementalCc(s: SparkSession, dir: String): DataFrame = {
    val day1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val day2 = day1.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    // Day-1 closure at REP grain AND the history index from ONE
    // corpus pass (componentsAndIndexNearMinhash): the r13 sf10 long
    // pole was the clone-expanded pair set; the r14 residual was
    // shingling day 1 twice — once for the closure, once for
    // buildNearDupIndex inside the pair stage.
    val (day1Labels, day1Index) = DedupOps.componentsAndIndexNearMinhash(
      day1, "doc_id", "text", shingleN = 2, numPerm = 64, bands = 16,
      threshold = 0.8)
    val newPairs = DedupOps.incrementalNearDupPairsWithIndex(day2,
      day1Index, "doc_id", "text", shingleN = 2, numPerm = 64,
      bands = 16, threshold = 0.8)
    DedupOps.incrementalComponents(day1Labels, newPairs)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy(col("doc_id"))
  }

  val xDedupIncrementalCcSql: String = xDedupCcSql

  // ---------------------------------------------------------------------
  // Cluster resolution end-to-end: keep the best copy per near-dup
  // cluster, preferring LONGEST text (planted clones tie on identical
  // text → lowest id, the original, survives). The oracle resolves the
  // same clusters via the recursive closure + a window argmax.
  // ---------------------------------------------------------------------
  def xDedupResolve(s: SparkSession, dir: String): DataFrame = {
    val corpus = clonedDocs(s, dir)
      .withColumn("quality", length(col("text")))
    DedupOps.resolveClustersWith(corpus, "doc_id",
        clonedDocsComponents(s, dir), "quality")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val xDedupResolveSql: String =
    s"""WITH $ccCtesSql
       |SELECT doc_id FROM (
       |  SELECT c.doc_id,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY coalesce(comp.component, c.doc_id)
       |      ORDER BY length(c.text) DESC, c.doc_id) AS rk
       |  FROM corpus c LEFT JOIN comp ON c.doc_id = comp.doc_id)
       |WHERE rk = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Cluster-cohesion audit (DedupOps.clusterCohesion): per multi-member
  // near-dup cluster, min/mean pairwise Jaccard among members — the
  // "did transitive closure over-merge by chaining" alarm. Clusters
  // come from the same cached minhash-0.8 component closure as
  // x_dedup_cc; the twin re-derives them recursively and replays the
  // pair algebra in integer ppm.
  // ---------------------------------------------------------------------
  def xDedupCohesion(s: SparkSession, dir: String): DataFrame =
    DedupOps.clusterCohesion(clonedDocs(s, dir), "doc_id", "text",
        clonedDocsComponents(s, dir), n = 2)
      .orderBy(col("component"))

  val xDedupCohesionSql: String =
    s"""WITH $ccCtesSql,
       |  m AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
       |    FROM comp GROUP BY component HAVING COUNT(*) >= 2),
       |  mem AS (SELECT comp.doc_id, comp.component
       |    FROM comp JOIN m USING (component)),
       |  ts AS (SELECT mem.doc_id, mem.component, t.sh
       |    FROM mem JOIN t ON t.doc_id = mem.doc_id),
       |  pj AS (SELECT a.component,
       |      CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
       |        THEN CAST(FLOOR(
       |          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / len(list_distinct(list_concat(a.sh, b.sh)))
       |          * 1000000.0) AS BIGINT)
       |        ELSE NULL END AS j_ppm
       |    FROM ts a JOIN ts b
       |      ON a.component = b.component AND a.doc_id < b.doc_id),
       |  agg AS (SELECT component,
       |      CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |      MIN(j_ppm) AS min_jaccard_ppm,
       |      CAST(SUM(j_ppm) AS BIGINT) // COUNT(*) AS avg_jaccard_ppm
       |    FROM pj GROUP BY component)
       |SELECT agg.component, m.n_members, n_pairs, min_jaccard_ppm,
       |  avg_jaccard_ppm
       |FROM agg JOIN m USING (component)
       |ORDER BY component""".stripMargin

  // ---------------------------------------------------------------------
  // Fuzzy matching at edit distance ≤ 1 over customer names, via
  // deletion-neighborhood blocking + levenshtein verification — at the
  // REP-GRAIN contract (r15 sf10's one DNF was the member-grain id-pair
  // list: output SIZE quadratic in clone copies): one row per verified
  // DISTINCT-name pair with both sides' member counts. The oracle is
  // the NAIVE all-pairs levenshtein join over the distinct names —
  // affordable in DuckDB at sf0.01, and a semantically independent
  // check that the blocked candidate set loses no pair.
  // ---------------------------------------------------------------------
  /** Customer-name (_id, _s) relation + the MATERIALIZED verified
    * edit-1 pair stage, session-cached: the pair stage (deletion-
    * variant explode → bucket join → levenshtein verify) is the
    * expensive subtree both fuzzy queries consume, and within a
    * session its input is immutable — the clonedDocStages discipline
    * applied to the fuzzy family. */
  /** Like stagesCache: keyed on (session, dir) with NO invalidation —
    * sound under the bench's immutable-input discipline, but a
    * mid-session rewrite of the customer table (this engine ships Dml
    * rewrite sinks) would serve stale pairs, and entries live until
    * session close. Library use outside the bench should clear on
    * table rewrite (r16 advice note). */
  private val fuzzyCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (DataFrame, DataFrame)]())

  private def fuzzyStages(s: SparkSession,
                          dir: String): (DataFrame, DataFrame) =
    graft.engine.SessionCaches.memo(fuzzyCache, (s, dir))( {
      val strs = t(s, dir, "customer")
        .filter(col("c_name").isNotNull)
        .select(col("c_custkey").as("_id"), col("c_name").as("_s"))
      (strs, graft.engine.Engine.materialize(
        DedupOps.fuzzyStrPairsEdit1(strs)))
    })

  def xFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val (strs, pairs) = fuzzyStages(s, dir)
    DedupOps.fuzzyPairsEdit1RepFrom(strs, pairs)
      .orderBy(col("str_a"), col("str_b"))
  }

  val xFuzzyMatchSql: String =
    """WITH s AS (SELECT c_name AS str, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM customer GROUP BY c_name)
      |SELECT a.str AS str_a, b.str AS str_b,
      |  levenshtein(a.str, b.str) AS dist, a.n AS n_a, b.n AS n_b
      |FROM s a JOIN s b ON a.str < b.str
      |WHERE levenshtein(a.str, b.str) <= 1
      |ORDER BY str_a, str_b""".stripMargin

  // ---------------------------------------------------------------------
  // The id↔string class map completing the rep-grain fuzzy contract:
  // strings participating in the edit-≤1 graph (pair endpoints or
  // multi-member clone classes) with member count and minimum id.
  // ---------------------------------------------------------------------
  def xFuzzyClasses(s: SparkSession, dir: String): DataFrame = {
    val (strs, pairs) = fuzzyStages(s, dir)
    DedupOps.fuzzyClassesEdit1From(strs, pairs)
      .orderBy(col("str"))
  }

  val xFuzzyClassesSql: String =
    """WITH s AS (SELECT c_name AS str, CAST(COUNT(*) AS BIGINT) AS n_ids,
      |    MIN(c_custkey) AS min_id
      |  FROM customer GROUP BY c_name),
      |  p AS (SELECT a.str AS sa, b.str AS sb FROM s a JOIN s b
      |    ON a.str < b.str WHERE levenshtein(a.str, b.str) <= 1)
      |SELECT str, n_ids, min_id FROM s
      |WHERE n_ids >= 2 OR str IN (SELECT sa FROM p)
      |  OR str IN (SELECT sb FROM p)
      |ORDER BY str""".stripMargin

  // ---------------------------------------------------------------------
  // Member-grain fuzzy expansion over a BOUNDED id slice — the
  // equivalence pin for the rep-grain contract: the full id-pair list
  // (ids, strings, dist) on c_custkey < 1500, where the output stays
  // small at every scale factor (replica ids live above 10⁸), checked
  // against the naive all-pairs twin. Proves the classes×pairs
  // expansion algebra without ever owing the unbounded quadratic list.
  // ---------------------------------------------------------------------
  def xFuzzyExpand(s: SparkSession, dir: String): DataFrame =
    DedupOps.fuzzyPairsEdit1(
        t(s, dir, "customer").filter(col("c_custkey") < 1500),
        "c_custkey", "c_name")
      .orderBy(col("id_a"), col("id_b"))

  val xFuzzyExpandSql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  a.c_name AS str_a, b.c_name AS str_b,
      |  levenshtein(a.c_name, b.c_name) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE a.c_custkey < 1500 AND b.c_custkey < 1500
      |  AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // PII redaction: fixture text carries no PII, so each document is
  // salted with a deterministic contact blurb (email, NNN-NNNN phone,
  // long numeric ref) which redactPii must then scrub. Patterns are
  // RE2-safe so Java regex (Spark) and RE2 (DuckDB) rewrite identically.
  // ---------------------------------------------------------------------
  private def contactBlurb(idCol: Column, textCol: Column): Column =
    concat(textCol, lit(" contact user"), idCol.cast("string"),
      lit("@mail-"), (idCol % 7).cast("string"),
      lit(".example.com or 555-"),
      lpad(((idCol * 7919) % 10000).cast("string"), 4, "0"),
      lit(" ref "), (idCol * 104729).cast("string"))

  def xTextRedact(s: SparkSession, dir: String): DataFrame =
    // spread: the regex-chain projection must not inherit a 1-split scan
    graft.engine.Engine.spread(t(s, dir, "documents"))
      .select(col("doc_id"),
        TextOps.redactPii(contactBlurb(col("doc_id"), col("text")))
          .as("redacted"))
      .orderBy(col("doc_id"))

  val xTextRedactSql: String =
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(
      |    text || ' contact user' || doc_id || '@mail-' || (doc_id % 7)
      |         || '.example.com or 555-'
      |         || lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0')
      |         || ' ref ' || (doc_id * 104729),
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      |    '[0-9]{5,}', '[NUM]', 'g') AS redacted
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Deterministic train/valid/test split: membership is a pure function
  // of md5(doc_id) (Split.hashSplit), so the same document lands in the
  // same split on every run, engine, and cluster layout — which is
  // exactly why the DuckDB oracle can recompute the full assignment.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // Stratified sample: exactly 20 docs per language, selected by md5(id)
  // rank — layout-independent, and the oracle recomputes the identical
  // selection. Small strata would be kept whole (none here).
  // ---------------------------------------------------------------------
  def xSampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.transform.Split
      .stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", 20)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  val xSampleStratifiedSql: String =
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20
      |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Domain-mixture sample: per-source targets incl. a clamped stratum
  // (src2 asks 40 of 25) and implicit whitelist drops (all other
  // sources). Same md5-rank determinism as the stratified sampler.
  // ---------------------------------------------------------------------
  def xSampleMixture(s: SparkSession, dir: String): DataFrame =
    graft.transform.Split
      .mixtureSample(t(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 15, "src1" -> 10, "src2" -> 40))
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))

  val xSampleMixtureSql: String =
    """SELECT source, doc_id FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= CASE source WHEN 'src0' THEN 15 WHEN 'src1' THEN 10
      |                        WHEN 'src2' THEN 40 ELSE 0 END
      |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Temperature-weighted language rebalance (α = 0.5): quotas ∝ √n_i
  // over a 100-doc budget — en's 43.6% raw share flattens to ~30%,
  // the low-resource langs rise. Quota arithmetic is exact integer
  // fixed-point end to end (see Split.temperatureSample), so the
  // oracle reproduces the selected set hash-exactly.
  // ---------------------------------------------------------------------
  def xSampleTemperature(s: SparkSession, dir: String): DataFrame =
    graft.transform.Split.temperatureSample(
        t(s, dir, "documents"), "lang", "doc_id", budget = 100)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val xSampleTemperatureSql: String =
    """WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |  fx AS (SELECT lang,
      |      CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1073741824.0)
      |           AS BIGINT) AS fx
      |    FROM n),
      |  tot AS (SELECT CAST(SUM(fx) AS BIGINT) AS t FROM fx),
      |  quota AS (SELECT lang, (100 * fx) // t AS q
      |    FROM fx CROSS JOIN tot),
      |  r AS (SELECT doc_id, lang,
      |      ROW_NUMBER() OVER (PARTITION BY lang
      |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |    FROM documents)
      |SELECT doc_id, lang FROM r JOIN quota USING (lang)
      |WHERE rn <= q ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Benchmark decontamination: survivors of the corpus after dropping
  // every document sharing a word trigram with the "benchmark" (docs
  // 0-19 standing in for an eval set). Broadcast semi join on the
  // benchmark's distinct trigram set.
  // ---------------------------------------------------------------------
  def xDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    DedupOps.decontaminate(docs, docs.filter(col("doc_id") < 20),
        "doc_id", "text", n = 3)
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  val xDecontaminateSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tri AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
       |    FROM tok),
       |  bad AS (SELECT DISTINCT doc_id FROM tri
       |    WHERE g IN (SELECT g FROM tri WHERE doc_id < 20))
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // The FULL streaming-ingest DAG as its batch twin (StreamIngestJob.
  // routedTransform — every stage is stateless/stream-static by
  // construction, so the same code path is both the micro-batch body
  // and this oracled query): quality quarantine (n_chars ∉ [60, 100k])
  // → history dedup vs docs 0-9 (Bloom tier-1 + exact anti-join) →
  // benchmark decontamination vs docs 10-19 (trigram overlap) → token
  // blocklist ("slow fast" bigram) → bigram-LM fluency gate (src0
  // model, mean NLL ≤ 3.65) → deterministic md5 split. Output is the
  // routing disposition: quarantined rows keep status 'quarantined',
  // survivors carry their split; rows dropped mid-pipeline are absent.
  // ---------------------------------------------------------------------
  /** The src0-trained bigram LM and the docs-10..19 benchmark gram
    * hashes, session-cached: x_stream_ingest and x_curation train the
    * IDENTICAL literal structures (same slice, same params), and each
    * training is a full corpus-slice pass collected to the driver —
    * the lmSumsCache discipline (r17 verdict ask #2: "share the
    * Bloom/LM literal structures already built for the batch ops").
    * Warm hits surface in the bench artifact via SessionCaches. */
  private val lmSrc0Cache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), TextOps.LmModel]())
  private def lmSrc0(s: SparkSession, dir: String): TextOps.LmModel =
    graft.engine.SessionCaches.memo(lmSrc0Cache, (s, dir))(
      TextOps.lmTrainHashed(
        t(s, dir, "documents").filter(col("source") === "src0"), "text"))

  private val benchGramsCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Array[Long]]())
  private def benchGrams(s: SparkSession, dir: String): Array[Long] =
    graft.engine.SessionCaches.memo(benchGramsCache, (s, dir))(
      DedupOps.benchmarkGramHashes(
        t(s, dir, "documents")
          .filter(col("doc_id") >= 10 && col("doc_id") < 20), "text"))

  def xStreamIngest(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.StreamIngestJob
    import graft.transform.Checks
    val docs = t(s, dir, "documents")
    val hist = docs.filter(col("doc_id") < 10)
    val (bad, kept) = StreamIngestJob.routedTransform(docs, "doc_id",
      "text",
      rules = Seq(Checks.inRange("n_chars", 60.0, 100000.0)),
      benchGramHashes = benchGrams(s, dir),
      blockedPhrases = Seq("slow fast"),
      testFrac = 0.05, validFrac = 0.05,
      lmModel = Some(lmSrc0(s, dir)), maxMeanNll = 3.65,
      dedupIndex = Some(DedupOps.buildDedupIndex(hist, "text")))
    bad.select(col("doc_id"), lit("quarantined").as("status"))
      .unionByName(kept.select(col("doc_id"), col("split").as("status")))
      .orderBy(col("doc_id"))
  }

  val xStreamIngestSql: String =
    s"""WITH tok AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  quar AS (SELECT doc_id FROM documents
       |    WHERE n_chars IS NOT NULL
       |      AND (n_chars < 60 OR n_chars > 100000)),
       |  tri AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
       |    FROM tok),
       |  contam AS (SELECT DISTINCT doc_id FROM tri
       |    WHERE g IN (SELECT g FROM tri
       |                WHERE doc_id >= 10 AND doc_id < 20)),
       |  grams AS (SELECT doc_id, source, unnest(
       |      list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g
       |    FROM tok WHERE len(toks) >= 2),
       |  blocked AS (SELECT DISTINCT doc_id FROM grams
       |    WHERE g = 'slow fast'),
       |  uni AS (SELECT w1, COUNT(*) AS c1 FROM (
       |      SELECT unnest(toks) AS w1 FROM tok WHERE source = 'src0')
       |    GROUP BY w1),
       |  vs AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS v FROM uni),
       |  bi AS (SELECT g, COUNT(*) AS c12 FROM grams
       |    WHERE source = 'src0' GROUP BY g),
       |  sc AS (SELECT doc_id,
       |      CAST(FLOOR((0.0 - ln(
       |        (CAST(COALESCE(c12, 0) AS DOUBLE) + 1.0)
       |          / (CAST(COALESCE(c1, 0) AS DOUBLE) + v)))
       |        * 1073741824.0) AS BIGINT) AS fx
       |    FROM grams d
       |    LEFT JOIN uni ON string_split(d.g, ' ')[1] = uni.w1
       |    LEFT JOIN bi ON d.g = bi.g
       |    CROSS JOIN vs),
       |  influent AS (SELECT doc_id FROM sc GROUP BY doc_id
       |    HAVING (CAST(CAST(SUM(fx) AS BIGINT) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE)) / 1073741824.0 > 3.65),
       |  kept AS (SELECT d.doc_id FROM documents d
       |    WHERE d.doc_id NOT IN (SELECT doc_id FROM quar)
       |      AND d.text NOT IN (SELECT text FROM documents
       |                         WHERE doc_id < 10)
       |      AND d.doc_id NOT IN (SELECT doc_id FROM contam)
       |      AND d.doc_id NOT IN (SELECT doc_id FROM blocked)
       |      AND d.doc_id NOT IN (SELECT doc_id FROM influent))
       |SELECT doc_id, 'quarantined' AS status FROM quar
       |UNION ALL
       |SELECT doc_id,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
       |         THEN 'test'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
       |         THEN 'valid'
       |       ELSE 'train' END AS status
       |FROM kept
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // The FULL batch curation pipeline as ONE call (jobs.CurationJob —
  // the r11 verdict's composed-job ask): over the cloned corpus,
  // rule quarantine (n_chars ∉ [60, 100k]) → langid gate (keep 'en') →
  // Gopher repetition gate (0.65/0.06) → exact dedup (min id per
  // fingerprint) → MinHash-0.8 near-dup drop → trigram decontamination
  // vs docs 10-19 → trained-NB quality gate (lang='en' trusted) →
  // bigram-LM fluency gate (src0 model, mean NLL ≤ 3.65) → md5 split.
  // Output is the per-document DISPOSITION (first failing stage or the
  // split) — every input row exactly once; the twin replays all nine
  // stages in the same order, so the green row proves the composition,
  // not just the pieces.
  // ---------------------------------------------------------------------
  def xCuration(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.CurationJob
    import graft.transform.Checks
    val d = t(s, dir, "documents")
    val base = d.select(col("doc_id"), col("text"), col("n_chars"))
    val corpus = base.unionAll(base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"),
        col("n_chars")))
    val cfg = CurationJob.Config(
      idCol = "doc_id", textCol = "text",
      rules = Seq(Checks.inRange("n_chars", 60.0, 100000.0)),
      allowedLangs = Seq("en"),
      maxDupTokenFrac = 0.65, maxTopBigramFrac = 0.06,
      exactDedup = true,
      nearDupThreshold = 0.8,
      benchGramHashes = benchGrams(s, dir),
      nbModel = Some(TextOps.nbTrainHashed(d, "text",
        col("lang") === "en")),
      lmModel = Some(lmSrc0(s, dir)),
      maxMeanNll = 3.65)
    CurationJob.disposition(corpus, cfg).orderBy(col("doc_id"))
  }

  val xCurationSql: String = {
    val scoreExprs = TextOps.LangMarkers.map { case (l, ms) =>
      val list = ms.map(m => s"'$m'").mkString("[", ",", "]")
      s"CAST(len(list_filter(toks, x -> list_contains($list, x)))" +
        s" AS BIGINT) AS score_$l"
    }.mkString(",\n    ")
    val langs = TextOps.LangMarkers.map(_._1)
    val maxExpr = langs.map(l => s"score_$l")
      .mkString("greatest(", ", ", ")")
    val predExpr = langs.map(l => s"WHEN score_$l = m THEN '$l'")
      .mkString("CASE ", " ", " END")
    s"""WITH corpus AS (
       |    SELECT doc_id, text, n_chars FROM documents
       |    UNION ALL
       |    SELECT doc_id + 10000 AS doc_id, text, n_chars
       |    FROM documents WHERE doc_id < 50),
       |  ctok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  quar AS (SELECT doc_id FROM corpus
       |    WHERE n_chars IS NOT NULL
       |      AND (n_chars < 60 OR n_chars > 100000)),
       |  lsc AS (SELECT doc_id,
       |    $scoreExprs
       |  FROM ctok),
       |  lmx AS (SELECT *, $maxExpr AS m FROM lsc),
       |  nonlang AS (SELECT doc_id FROM lmx
       |    WHERE ($predExpr) <> 'en'),
       |  tg AS (SELECT doc_id, unnest(toks) AS g FROM ctok),
       |  tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
       |  tsr AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |      MAX(c) AS mx, COUNT(*) AS d FROM tc GROUP BY 1),
       |  bgl AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g FROM ctok),
       |  bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bgl GROUP BY 1, 2),
       |  bsr AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |      MAX(c) AS mx, COUNT(*) AS d FROM bc GROUP BY 1),
       |  repbad AS (SELECT tsr.doc_id
       |    FROM tsr LEFT JOIN bsr ON tsr.doc_id = bsr.doc_id
       |    WHERE (1.0 - CAST(tsr.d AS DOUBLE) / tsr.n) > 0.65
       |       OR COALESCE(CAST(bsr.mx AS DOUBLE) / bsr.n, 0.0) > 0.06),
       |  s4 AS (SELECT c.doc_id, c.text FROM corpus c
       |    WHERE c.doc_id NOT IN (SELECT doc_id FROM quar)
       |      AND c.doc_id NOT IN (SELECT doc_id FROM nonlang)
       |      AND c.doc_id NOT IN (SELECT doc_id FROM repbad)),
       |  ek AS (SELECT doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
       |    FROM s4),
       |  exdup AS (SELECT doc_id FROM ek WHERE rn > 1),
       |  sht AS (SELECT doc_id,
       |      list_distinct(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS sh
       |    FROM ctok WHERE len(toks) >= 2),
       |  sh5 AS (SELECT s.doc_id, s.sh FROM sht s
       |    JOIN ek ON s.doc_id = ek.doc_id WHERE ek.rn = 1),
       |  losers AS (SELECT DISTINCT b.doc_id FROM sh5 a JOIN sh5 b
       |    ON a.doc_id < b.doc_id
       |    WHERE $jaccardSql >= 0.8),
       |  ctri AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
       |    FROM ctok),
       |  dtok AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  btri AS (SELECT DISTINCT
       |      unnest(list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
       |    FROM dtok WHERE doc_id >= 10 AND doc_id < 20),
       |  contam AS (SELECT DISTINCT doc_id FROM ctri
       |    WHERE g IN (SELECT g FROM btri)),
       |  b AS (SELECT doc_id, (lang = 'en') AS pos, text
       |    FROM documents),
       |  tkd AS (SELECT doc_id, pos, unnest($toksSql) AS tkn FROM b),
       |  cnt AS (SELECT tkn,
       |      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |      CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
       |    FROM tkd GROUP BY tkn),
       |  tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
       |      CAST(SUM(cp) AS BIGINT) AS np,
       |      CAST(SUM(cn) AS BIGINT) AS nn FROM cnt),
       |  nd AS (SELECT
       |      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS dp,
       |      CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS dn
       |    FROM b),
       |  lam AS (SELECT tkn, CAST(FLOOR(
       |      (ln(CAST(cp + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))
       |       - ln(CAST(cn + 1 AS DOUBLE) / CAST(nn + v AS DOUBLE)))
       |      * 1073741824.0) AS BIGINT) AS lam
       |    FROM cnt CROSS JOIN tot),
       |  pr AS (SELECT CAST(FLOOR(
       |      (ln(CAST(dp AS DOUBLE)) - ln(CAST(dn AS DOUBLE)))
       |      * 1073741824.0) AS BIGINT) AS prior FROM nd),
       |  ctk AS (SELECT doc_id, unnest(toks) AS tkn FROM ctok),
       |  csc AS (SELECT doc_id, CAST(SUM(lam) AS BIGINT) AS sl
       |    FROM ctk JOIN lam USING (tkn) GROUP BY doc_id),
       |  lowq AS (SELECT c.doc_id
       |    FROM corpus c LEFT JOIN csc ON c.doc_id = csc.doc_id
       |    CROSS JOIN pr
       |    -- text IS NOT NULL mirrors the engine's null semantics:
       |    -- nbScoreCol yields NULL for NULL text and when() treats
       |    -- NULL as not-low-quality, while a bare COALESCE would
       |    -- score a NULL-text doc prior-only here.
       |    WHERE prior + COALESCE(sl, 0) <= 0 AND c.text IS NOT NULL),
       |  dgrams AS (SELECT doc_id, source,
       |      unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g
       |    FROM dtok WHERE len(toks) >= 2),
       |  uni AS (SELECT w1, COUNT(*) AS c1 FROM (
       |      SELECT unnest(toks) AS w1 FROM dtok WHERE source = 'src0')
       |    GROUP BY w1),
       |  vs AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS v FROM uni),
       |  bi AS (SELECT g, COUNT(*) AS c12 FROM dgrams
       |    WHERE source = 'src0' GROUP BY g),
       |  cgr AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g
       |    FROM ctok WHERE len(toks) >= 2),
       |  lsc2 AS (SELECT doc_id,
       |      CAST(FLOOR((0.0 - ln(
       |        (CAST(COALESCE(c12, 0) AS DOUBLE) + 1.0)
       |          / (CAST(COALESCE(c1, 0) AS DOUBLE) + v)))
       |        * 1073741824.0) AS BIGINT) AS fx
       |    FROM cgr d
       |    LEFT JOIN uni ON string_split(d.g, ' ')[1] = uni.w1
       |    LEFT JOIN bi ON d.g = bi.g
       |    CROSS JOIN vs),
       |  influent AS (SELECT doc_id FROM lsc2 GROUP BY doc_id
       |    HAVING (CAST(CAST(SUM(fx) AS BIGINT) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE)) / 1073741824.0 > 3.65)
       |SELECT doc_id, CASE
       |    WHEN doc_id IN (SELECT doc_id FROM quar)
       |      THEN 'quarantined'
       |    WHEN doc_id IN (SELECT doc_id FROM nonlang)
       |      THEN 'non_target_lang'
       |    WHEN doc_id IN (SELECT doc_id FROM repbad)
       |      THEN 'repetitive'
       |    WHEN doc_id IN (SELECT doc_id FROM exdup)
       |      THEN 'exact_dup'
       |    WHEN doc_id IN (SELECT doc_id FROM losers)
       |      THEN 'near_dup'
       |    WHEN doc_id IN (SELECT doc_id FROM contam)
       |      THEN 'contaminated'
       |    WHEN doc_id IN (SELECT doc_id FROM lowq)
       |      THEN 'low_quality'
       |    WHEN doc_id IN (SELECT doc_id FROM influent)
       |      THEN 'influent'
       |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
       |      THEN 'test'
       |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
       |      THEN 'valid'
       |    ELSE 'train' END AS status
       |FROM corpus ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Graded contamination report vs the doc<20 "benchmark": per-doc
  // distinct-trigram count, benchmark-overlap count, and the exact
  // overlap fraction — the numbers a threshold-based decontamination
  // policy is tuned on.
  // ---------------------------------------------------------------------
  def xDecontamStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    DedupOps.contaminationStats(docs, docs.filter(col("doc_id") < 20),
        "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  val xDecontamStatsSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tri AS (SELECT DISTINCT doc_id,
       |      unnest(list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
       |    FROM tok),
       |  bg AS (SELECT DISTINCT g FROM tri WHERE doc_id < 20)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(COUNT(CASE WHEN g IN (SELECT g FROM bg) THEN 1 END)
       |    AS BIGINT) AS n_overlap,
       |  CAST(COUNT(CASE WHEN g IN (SELECT g FROM bg) THEN 1 END)
       |    AS DOUBLE) / COUNT(*) AS overlap_frac
       |FROM tri GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Repeated-span report on the cloned corpus: 5-token windows occurring
  // in ≥2 distinct documents (the planted clones guarantee hits), with
  // doc/occurrence counts — top 100 by spread, deterministic ties.
  // ---------------------------------------------------------------------
  def xTextSpans(s: SparkSession, dir: String): DataFrame =
    TextOps.repeatedSpans(clonedDocs(s, dir), "doc_id", "text",
        n = 5, minDocs = 2)
      .orderBy(desc("n_docs"), desc("n_occurrences"), asc("gram"))
      .limit(100)

  val xTextSpansSql: String =
    s"""WITH corpus AS ($clonedDocsSql),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  g AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks) - 3),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |             || ' ' || toks[i+3] || ' ' || toks[i+4])) AS gram
       |    FROM tok)
       |SELECT gram, n_docs, n_occurrences FROM (
       |  SELECT gram, COUNT(DISTINCT doc_id) AS n_docs,
       |    COUNT(*) AS n_occurrences
       |  FROM g GROUP BY gram)
       |WHERE n_docs >= 2
       |ORDER BY n_docs DESC, n_occurrences DESC, gram LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // Span-level duplicate REMOVAL on the cloned corpus (Lee et al. 2021
  // §4): every token position covered by a 5-gram occurring in >= 2
  // distinct docs is stripped; the planted clones (docs 0-49 + copies)
  // are fully covered and must drop out entirely, naturally-repeating
  // spans get cut from otherwise-unique docs. Hash compares the full
  // reassembled token stream.
  // ---------------------------------------------------------------------
  def xTextSpanremove(s: SparkSession, dir: String): DataFrame =
    TextOps.removeRepeatedSpans(clonedDocs(s, dir), "doc_id", "text",
        n = 5, minDocs = 2)
      .orderBy(col("doc_id"))

  val xTextSpanremoveSql: String = {
    val n = 5
    s"""WITH corpus AS ($clonedDocsSql),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  tp AS (SELECT doc_id,
       |      unnest(range(1, len(toks) + 1)) AS i,
       |      unnest(toks) AS tk FROM tok),
       |  w AS (SELECT doc_id,
       |      unnest(range(1, len(toks) - $n + 2)) AS st,
       |      unnest(list_transform(range(1, len(toks) - $n + 2),
       |        i -> array_to_string(toks[i : i + $n - 1], ' '))) AS gram
       |    FROM tok WHERE len(toks) >= $n),
       |  dup AS (SELECT gram FROM w GROUP BY gram
       |    HAVING COUNT(DISTINCT doc_id) >= 2),
       |  cov AS (SELECT DISTINCT doc_id,
       |      unnest(range(st, st + $n)) AS i
       |    FROM w WHERE gram IN (SELECT gram FROM dup)),
       |  kept AS (SELECT tp.doc_id, tp.i, tp.tk FROM tp
       |    WHERE NOT EXISTS (SELECT 1 FROM cov
       |      WHERE cov.doc_id = tp.doc_id AND cov.i = tp.i))
       |SELECT doc_id, array_to_string(list(tk ORDER BY i), ' ') AS text
       |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Feature-hashing document embedding (TextOps.hashEmbed): text →
  // 64-dim signed-count vector with no model; exact integer counts
  // per dimension, L2 weights from the sqrt of an exact integer so
  // the twin reproduces both columns bit-for-bit. Bounded to
  // doc_id < 50 — the audit slice convention — to keep the dump
  // row-count sane (50 docs × ≤64 dims).
  // ---------------------------------------------------------------------
  def xTextHashembed(s: SparkSession, dir: String): DataFrame =
    TextOps.hashEmbed(
        t(s, dir, "documents").filter(col("doc_id") < 50),
        "doc_id", "text", dim = 64)
      .orderBy(col("doc_id"), col("j"))

  val xTextHashembedSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS t
       |    FROM documents WHERE doc_id < 50),
       |  hv AS (SELECT doc_id,
       |      ('0x' || substr(md5(t), 1, 15))::BIGINT % 64 AS j,
       |      CASE WHEN ('0x' || substr(md5('s:' || t), 1, 15))::BIGINT
       |        % 2 = 0 THEN 1 ELSE -1 END AS s
       |    FROM tok),
       |  w AS (SELECT doc_id, j, CAST(SUM(s) AS BIGINT) AS w
       |    FROM hv GROUP BY 1, 2 HAVING SUM(s) <> 0),
       |  n AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
       |    FROM w GROUP BY 1)
       |SELECT w.doc_id, j, w,
       |  CAST(w AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)) AS wn
       |FROM w JOIN n USING (doc_id)
       |ORDER BY doc_id, j""".stripMargin

  // ---------------------------------------------------------------------
  // T5-style span corruption (TextOps.spanCorrupt): encoder/decoder
  // training pairs from hash-deterministic masking — the twin rebuilds
  // the identical mask from the same md5 positions and replays the
  // run-collapse with windows (the Spark side is a window-free pure
  // projection; the oracle does not need to be scale-true).
  // ---------------------------------------------------------------------
  def xTextSpancorrupt(s: SparkSession, dir: String): DataFrame =
    TextOps.spanCorrupt(t(s, dir, "documents"), "doc_id", "text",
        ratePermille = 150)
      .orderBy(col("doc_id"))

  val xTextSpancorruptSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tp AS (SELECT doc_id, unnest(range(0, len(toks))) AS i,
       |      unnest(toks) AS tk FROM tok),
       |  f AS (SELECT doc_id, i, tk,
       |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |        CAST(i AS VARCHAR)), 1, 15))::BIGINT % 1000) < 150 AS m
       |    FROM tp),
       |  r AS (SELECT doc_id, i, tk, m,
       |      m AND NOT COALESCE(LAG(m) OVER
       |        (PARTITION BY doc_id ORDER BY i), FALSE) AS st FROM f),
       |  k AS (SELECT *, SUM(CASE WHEN st THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY doc_id ORDER BY i) AS kk FROM r),
       |  agg AS (SELECT doc_id,
       |      string_agg(CASE WHEN NOT m THEN tk
       |          WHEN st THEN '<extra_id_' || CAST(kk - 1 AS VARCHAR)
       |            || '>' END, ' ' ORDER BY i)
       |        FILTER (WHERE NOT m OR st) AS input_text,
       |      string_agg(CASE WHEN st THEN '<extra_id_' ||
       |            CAST(kk - 1 AS VARCHAR) || '> ' || tk
       |          ELSE tk END, ' ' ORDER BY i)
       |        FILTER (WHERE m) AS target_text,
       |      CAST(COALESCE(MAX(kk), 0) AS BIGINT) AS n_spans,
       |      CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
       |        AS n_masked
       |    FROM k GROUP BY doc_id)
       |SELECT t.doc_id, COALESCE(input_text, '') AS input_text,
       |  COALESCE(target_text, '') AS target_text,
       |  COALESCE(n_spans, 0) AS n_spans,
       |  COALESCE(n_masked, 0) AS n_masked
       |FROM tok t LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Per-doc duplicated-window fraction on the cloned corpus (the
  // measurement half of Lee et al. 2021; TextOps.dupWindowFraction):
  // planted clones read 1000000 ppm, unique docs report exactly the
  // mass of their naturally-repeating 5-grams. Exact integer counting
  // shared with the removal path via graft_strip_covered.
  // ---------------------------------------------------------------------
  def xTextDupfrac(s: SparkSession, dir: String): DataFrame =
    TextOps.dupWindowFraction(clonedDocs(s, dir), "doc_id", "text",
        n = 5, minDocs = 2)
      .orderBy(col("doc_id"))

  val xTextDupfracSql: String = {
    val n = 5
    s"""WITH corpus AS ($clonedDocsSql),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  w AS (SELECT doc_id,
       |      unnest(range(1, len(toks) - $n + 2)) AS st,
       |      unnest(list_transform(range(1, len(toks) - $n + 2),
       |        i -> array_to_string(toks[i : i + $n - 1], ' '))) AS gram
       |    FROM tok WHERE len(toks) >= $n),
       |  dup AS (SELECT gram FROM w GROUP BY gram
       |    HAVING COUNT(DISTINCT doc_id) >= 2),
       |  cov AS (SELECT doc_id, CAST(COUNT(DISTINCT i) AS BIGINT)
       |      AS n_dup FROM (SELECT doc_id,
       |        unnest(range(st, st + $n)) AS i
       |      FROM w WHERE gram IN (SELECT gram FROM dup))
       |    GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_tokens,
       |  CASE WHEN len(toks) > 0
       |    THEN COALESCE(n_dup, 0) * 1000000 // len(toks)
       |    ELSE 0 END AS dup_ppm
       |FROM tok t LEFT JOIN cov USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Gopher-style repetition signals per document: duplicate/top token and
  // bigram fractions — exact integer-count divisions, so the doubles are
  // bit-identical across engines.
  // ---------------------------------------------------------------------
  def xTextRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Shared Gopher-stats CTE chain (DuckDB form) — yields a
    * `stats(doc_id, dup_token_frac, top_token_frac, dup_bigram_frac,
    * top_bigram_frac)` relation over `documents`. */
  private val repStatsCtesSql: String =
    s"""tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tg AS (SELECT doc_id, unnest(toks) AS g FROM tok),
       |  tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
       |  ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |      MAX(c) AS mx, COUNT(*) AS d FROM tc GROUP BY 1),
       |  bgl AS (SELECT doc_id,
       |      unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g FROM tok),
       |  bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bgl GROUP BY 1, 2),
       |  bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |      MAX(c) AS mx, COUNT(*) AS d FROM bc GROUP BY 1),
       |  stats AS (SELECT ts.doc_id,
       |    1.0 - CAST(ts.d AS DOUBLE) / ts.n AS dup_token_frac,
       |    CAST(ts.mx AS DOUBLE) / ts.n AS top_token_frac,
       |    COALESCE(1.0 - CAST(bs.d AS DOUBLE) / bs.n, 0.0)
       |      AS dup_bigram_frac,
       |    COALESCE(CAST(bs.mx AS DOUBLE) / bs.n, 0.0) AS top_bigram_frac
       |  FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id)""".stripMargin

  val xTextRepetitionSql: String =
    s"""WITH $repStatsCtesSql
       |SELECT doc_id, dup_token_frac, top_token_frac,
       |  dup_bigram_frac, top_bigram_frac
       |FROM stats ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Gopher repetition gate: survivors under the dup-token / top-bigram
  // ceilings. The fractions are exact integer divisions (proven
  // bit-identical by x_text_repetition), so the > comparisons agree
  // across engines. Anti-join on violators keeps stats-less documents.
  // ---------------------------------------------------------------------
  def xTextRepfilter(s: SparkSession, dir: String): DataFrame =
    TextOps.repetitionFilter(t(s, dir, "documents"), "doc_id", "text",
        maxDupTokenFrac = 0.65, maxTopBigramFrac = 0.06)
      .select(col("doc_id")).orderBy(col("doc_id"))

  val xTextRepfilterSql: String =
    s"""WITH $repStatsCtesSql
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM stats
       |  WHERE dup_token_frac > 0.65 OR top_bigram_frac > 0.06)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // C4 boilerplate removal on a corpus with planted recurring lines (nav
  // header on every 3rd doc, cookie footer on every 2nd; every 97th doc
  // is boilerplate-ONLY and must drop out entirely). Hash compares the
  // full cleaned text, so line order and reassembly are both checked.
  // ---------------------------------------------------------------------
  def xTextBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 97 === 0, lit("accept all cookies"))
        .otherwise(concat(
          when(col("doc_id") % 3 === 0, lit("nav home about contact\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 2 === 0, lit("\naccept all cookies"))
            .otherwise(lit("")))).as("text"))
    TextOps.removeBoilerplate(corpus, "doc_id", "text", minDocs = 3)
      .orderBy(col("doc_id"))
  }

  val xTextBoilerplateSql: String =
    """WITH corpus AS (SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0 THEN 'accept all cookies'
      |      ELSE CASE WHEN doc_id % 3 = 0
      |          THEN 'nav home about contact' || chr(10) ELSE '' END
      |        || text
      |        || CASE WHEN doc_id % 2 = 0
      |          THEN chr(10) || 'accept all cookies' ELSE '' END
      |    END AS text FROM documents),
      |  tok AS (SELECT doc_id, string_split(text, chr(10)) AS ls
      |    FROM corpus WHERE text IS NOT NULL),
      |  l AS (SELECT doc_id, unnest(ls) AS line FROM tok),
      |  b AS (SELECT trim(line) AS nl FROM l GROUP BY 1
      |    HAVING COUNT(DISTINCT doc_id) >= 3 AND trim(line) <> ''),
      |  bl AS (SELECT COALESCE(list(nl), CAST([] AS VARCHAR[])) AS bls
      |    FROM b),
      |  kept AS (SELECT doc_id,
      |      list_filter(ls, x -> NOT list_contains(bls, trim(x))) AS ks
      |    FROM tok, bl)
      |SELECT doc_id, array_to_string(ks, chr(10)) AS text FROM kept
      |WHERE len(ks) > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // BPE tokenizer training, BATCHED rounds (r11: replaces the 32
  // sequential single-merge rounds — a real tokenizer runs tens of
  // thousands of merges, and one driver-synchronized recount PER MERGE
  // is the depth wall): each of the 8 rounds recounts pairs once, takes
  // the top-24 window, and applies every candidate independent of all
  // higher-ranked window candidates (disjoint {x, y, xy} symbol sets),
  // pushing effective depth to ~10 merges per recount. The DuckDB twin
  // reproduces the window, the anti-join independence rule, and the
  // list_reduce replace chain exactly, so the full merge table (rank,
  // pair, round-start freq) hash-matches at any selection yield.
  // ---------------------------------------------------------------------
  private val (bpeRounds, bpeWindow) = (16, 40)

  /** Trained merge table, computed ONCE per (session, dir) and shared
    * by the three tokenizer-chain queries (`x_text_bpe_encode` /
    * `x_text_fertility` both re-applied the full driver-loop trainer —
    * the ccCache argument, for the second-most-expensive subtree). */
  private val bpeCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Seq[String]]())
  private def trainedMerges(s: SparkSession, dir: String): Seq[String] =
    graft.engine.SessionCaches.memo(bpeCache, (s, dir))(
      TextOps.bpeMergesBatched(t(s, dir, "documents"), "text",
          rounds = bpeRounds, window = bpeWindow)
        .orderBy(col("merge_rank"))
        .select(col("pair")).collect().map(_.getString(0)).toSeq)

  def xTextBpe(s: SparkSession, dir: String): DataFrame =
    TextOps.bpeMergesBatched(t(s, dir, "documents"), "text",
        rounds = bpeRounds, window = bpeWindow)
      .orderBy(col("merge_rank"))

  /** The batched BPE trainer CTE chain (DuckDB form), shared by the
    * trainer and encoder oracles: per round `n`, `p$n` (pair counts),
    * `top$n` (ranked window), `sel$n` (independent candidates via one
    * NOT EXISTS against higher-ranked window rows), `w${n+1}` (the
    * word-frequency list after applying `sel$n` in rank order through
    * `list_reduce` — the padded two-pass replace per pair). Every stage
    * referenced more than once is MATERIALIZED — inlined, the chain
    * expands exponentially. */
  private def bpeStageCtes(rounds: Int, window: Int): String = {
    def symsOf(t: String): String =
      s"[string_split($t.pr, ' ')[1], string_split($t.pr, ' ')[2], " +
        s"replace($t.pr, ' ', '')]"
    val w0 =
      s"""w0 AS MATERIALIZED (SELECT ' ' || array_to_string(
         |    list_transform(range(1, len(w) + 1),
         |      i -> substr(w, CAST(i AS INTEGER), 1)), ' ') || ' ' AS s,
         |    CAST(COUNT(*) AS BIGINT) AS f
         |  FROM (SELECT unnest($toksSql) AS w FROM documents)
         |  GROUP BY w)""".stripMargin
    val stages = (0 until rounds).map { n =>
      s"""p$n AS MATERIALIZED (SELECT pr, CAST(SUM(f) AS BIGINT) AS ff FROM (
         |    SELECT f, unnest(CASE WHEN len(sy) < 2
         |        THEN CAST([] AS VARCHAR[])
         |        ELSE list_transform(range(1, len(sy)),
         |          i -> sy[i] || ' ' || sy[i+1]) END) AS pr
         |    FROM (SELECT f, string_split(trim(s), ' ') AS sy FROM w$n))
         |    GROUP BY pr),
         |  top$n AS MATERIALIZED (SELECT pr, ff,
         |      ROW_NUMBER() OVER (ORDER BY ff DESC, pr) AS rnk
         |    FROM p$n ORDER BY ff DESC, pr LIMIT $window),
         |  sel$n AS MATERIALIZED (SELECT a.pr, a.ff, a.rnk FROM top$n a
         |    WHERE NOT EXISTS (SELECT 1 FROM top$n b WHERE b.rnk < a.rnk
         |      AND len(list_intersect(${symsOf("a")},
         |        ${symsOf("b")})) > 0)),
         |  w${n + 1} AS MATERIALIZED (SELECT list_reduce(list_prepend(s,
         |      (SELECT COALESCE(list(pr ORDER BY rnk),
         |         CAST([] AS VARCHAR[])) FROM sel$n)),
         |      (acc, x) -> replace(replace(acc,
         |        ' ' || x || ' ', ' ' || replace(x, ' ', '') || ' '),
         |        ' ' || x || ' ', ' ' || replace(x, ' ', '') || ' '))
         |      AS s, f FROM w$n)""".stripMargin
    }
    val unions = (0 until rounds)
      .map(n => s"SELECT $n AS rnd, rnk, pr, ff FROM sel$n")
      .mkString("\n    UNION ALL ")
    s"""$w0,
       |  ${stages.mkString(",\n  ")},
       |  selall AS MATERIALIZED (SELECT rnd, rnk, pr, ff FROM (
       |    $unions))""".stripMargin
  }

  val xTextBpeSql: String =
    s"""WITH ${bpeStageCtes(bpeRounds, bpeWindow)}
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rnd, rnk) - 1 AS INTEGER)
       |    AS merge_rank, pr AS pair, ff AS freq
       |FROM selall ORDER BY merge_rank""".stripMargin

  // ---------------------------------------------------------------------
  // BPE ENCODING with the table the trainer just learned — the full
  // tokenizer chain (train -> encode) in one query: per-document word
  // and subword counts after applying the learned merges in rank order.
  // The DuckDB twin re-derives the same merge table (shared trainer
  // CTEs) and applies the identical padded two-pass replaces through
  // one list_reduce over the rank-ordered pair list.
  // ---------------------------------------------------------------------
  def xTextBpeEncode(s: SparkSession, dir: String): DataFrame =
    TextOps.bpeEncodeStats(t(s, dir, "documents"), "doc_id", "text",
        trainedMerges(s, dir))
      .orderBy(col("doc_id"))

  val xTextBpeEncodeSql: String = {
    val spaced = "' ' || array_to_string(list_transform(" +
      "range(1, len(w) + 1), i -> substr(w, CAST(i AS INTEGER), 1)), ' ')" +
      " || ' '"
    s"""WITH ${bpeStageCtes(bpeRounds, bpeWindow)},
       |  mseq AS MATERIALIZED (SELECT COALESCE(list(pr ORDER BY rnd, rnk),
       |      CAST([] AS VARCHAR[])) AS ms FROM selall),
       |  dw AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |  enc AS (SELECT doc_id,
       |      len(string_split(trim(list_reduce(list_prepend($spaced,
       |        (SELECT ms FROM mseq)),
       |        (acc, x) -> replace(replace(acc,
       |          ' ' || x || ' ', ' ' || replace(x, ' ', '') || ' '),
       |          ' ' || x || ' ', ' ' || replace(x, ' ', '') || ' '))),
       |        ' ')) AS n
       |    FROM dw)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n) AS BIGINT) AS n_subwords
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Tokenizer fertility report: per source, subwords-per-word and
  // chars-per-subword of the TRAINED tokenizer (the merge table is the
  // bpeCache one the encode query shares) — the metric that decides
  // whether a vocabulary is big enough for a corpus slice before a
  // training run prices it in. Integer-ppm ratios; docs that tokenize
  // to nothing count toward n_docs/n_chars but contribute no words.
  // ---------------------------------------------------------------------
  def xTextFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val enc = TextOps.bpeEncodeStats(docs, "doc_id", "text",
      trainedMerges(s, dir))
    docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("_chars"))
      .join(enc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_words", "n_subwords"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("_chars")).as("n_chars"))
      .withColumn("fertility_ppm",
        when(col("n_words") > 0,
          expr("n_subwords * 1000000 div n_words")).otherwise(lit(0L)))
      .withColumn("chars_per_subword_ppm",
        when(col("n_subwords") > 0,
          expr("n_chars * 1000000 div n_subwords")).otherwise(lit(0L)))
      .orderBy(col("source"))
  }

  val xTextFertilitySql: String = {
    val spaced = "' ' || array_to_string(list_transform(" +
      "range(1, len(w) + 1), i -> substr(w, CAST(i AS INTEGER), 1)), ' ')" +
      " || ' '"
    s"""WITH ${bpeStageCtes(bpeRounds, bpeWindow)},
       |  mseq AS MATERIALIZED (SELECT COALESCE(list(pr ORDER BY rnd, rnk),
       |      CAST([] AS VARCHAR[])) AS ms FROM selall),
       |  dw AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |  enc AS (SELECT doc_id,
       |      len(string_split(trim(list_reduce(list_prepend($spaced,
       |        (SELECT ms FROM mseq)),
       |        (acc, x) -> replace(replace(acc,
       |          ' ' || x || ' ', ' ' || replace(x, ' ', '') || ' '),
       |          ' ' || x || ' ', ' ' || replace(x, ' ', '') || ' '))),
       |        ' ')) AS n
       |    FROM dw),
       |  pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |      CAST(SUM(n) AS BIGINT) AS n_subwords
       |    FROM enc GROUP BY doc_id),
       |  j AS (SELECT d.source,
       |      CAST(length(d.text) AS BIGINT) AS chars,
       |      COALESCE(pd.n_words, 0) AS w, COALESCE(pd.n_subwords, 0) AS sw
       |    FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
       |  agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |      CAST(SUM(w) AS BIGINT) AS n_words,
       |      CAST(SUM(sw) AS BIGINT) AS n_subwords,
       |      CAST(SUM(chars) AS BIGINT) AS n_chars
       |    FROM j GROUP BY source)
       |SELECT source, n_docs, n_words, n_subwords, n_chars,
       |  CASE WHEN n_words > 0 THEN n_subwords * 1000000 // n_words
       |       ELSE 0 END AS fertility_ppm,
       |  CASE WHEN n_subwords > 0 THEN n_chars * 1000000 // n_subwords
       |       ELSE 0 END AS chars_per_subword_ppm
       |FROM agg ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Corpus vocabulary: top-50 tokens, deterministic ties — the tokenizer
  // vocab-construction step over the documents corpus.
  // ---------------------------------------------------------------------
  def xTextVocab(s: SparkSession, dir: String): DataFrame =
    TextOps.vocabulary(t(s, dir, "documents"), "text", 50)

  val xTextVocabSql: String =
    s"""SELECT tok, COUNT(*) AS n FROM (
       |  SELECT unnest($toksSql) AS tok FROM documents)
       |GROUP BY tok
       |ORDER BY n DESC, tok
       |LIMIT 50""".stripMargin

  def xSampleSplit(s: SparkSession, dir: String): DataFrame =
    graft.transform.Split
      .hashSplit(t(s, dir, "documents"), "doc_id",
        Seq("test" -> 0.05, "valid" -> 0.05))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  val xSampleSplitSql: String =
    """SELECT doc_id,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'valid'
      |       ELSE 'train' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Deterministic corpus shuffle + sharding (Split.shuffleShards): the
  // seeded pseudo-random training order, shard and within-shard key
  // both pure functions of (seed, id). The oracle recomputes the md5
  // keys and the hex-bucket shard assignment; hash compare certifies
  // the exact epoch order a trainer would consume.
  // ---------------------------------------------------------------------
  def xSampleShuffle(s: SparkSession, dir: String): DataFrame =
    graft.transform.Split
      .shuffleShards(t(s, dir, "documents").select(col("doc_id")),
        "doc_id", "ep0", nShards = 8)
      .orderBy(col("shard"), col("shuffle_key"))

  val xSampleShuffleSql: String =
    """SELECT doc_id,
      |  md5('ep0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
      |  CAST(('0x' || substr(md5('ep0:' || CAST(doc_id AS VARCHAR)),
      |    1, 4))::BIGINT % 8 AS INTEGER) AS shard
      |FROM documents
      |ORDER BY shard, shuffle_key""".stripMargin

  // ---------------------------------------------------------------------
  // Embedding covariance via the custom typed aggregate (graft_gram):
  // one corpus pass folds (n, Σx, Σxxᵀ) into a fixed-point buffer;
  // the DuckDB twin recomputes every floor(x_i·x_j·2³⁰) sum over the
  // exploded index cross product. 4096 rows, every value hash-exact.
  // ---------------------------------------------------------------------
  def xEmbedCov(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.embeddingCovariance(
        t(s, dir, "embeddings").select(col("embedding")), "embedding",
        dim = 64)
      .orderBy(col("i"), col("j"))

  val xEmbedCovSql: String =
    """WITH e AS (SELECT
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  idx AS (SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j
      |    FROM range(64) r1(i), range(64) r2(j)),
      |  g AS (SELECT i, j,
      |      CAST(SUM(CAST(FLOOR(v[i + 1] * v[j + 1] * 1073741824.0)
      |        AS BIGINT)) AS BIGINT) AS gram_fixed
      |    FROM e, idx GROUP BY i, j),
      |  sm AS (SELECT CAST(i AS INTEGER) AS i,
      |      CAST(SUM(CAST(FLOOR(v[i + 1] * 1073741824.0) AS BIGINT))
      |        AS BIGINT) AS sf
      |    FROM e, range(64) r1(i) GROUP BY i),
      |  ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
      |SELECT g.i, g.j, n, gram_fixed,
      |  ((CAST(gram_fixed AS DOUBLE) / 1073741824.0) / CAST(n AS DOUBLE))
      |    - ((CAST(si.sf AS DOUBLE) / 1073741824.0) / CAST(n AS DOUBLE))
      |      * ((CAST(sj.sf AS DOUBLE) / 1073741824.0) / CAST(n AS DOUBLE))
      |    AS cov
      |FROM g
      |JOIN sm si ON si.i = g.i
      |JOIN sm sj ON sj.i = g.j
      |CROSS JOIN ns
      |ORDER BY g.i, g.j""".stripMargin

  // ---------------------------------------------------------------------
  // Hourly error-rate anomalies (z > 2 against observed-hour moments):
  // exact integer sums → one fixed arithmetic chain → engine-exact
  // z-scores and flags.
  // ---------------------------------------------------------------------
  def xEventsAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.hourlyAnomalies(t(s, dir, "events"), "ts",
        "event_type", "error", zMax = 2.0)
      .orderBy(col("hour"))

  val xEventsAnomalySql: String =
    """WITH hourly AS (SELECT date_trunc('hour', ts) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events WHERE event_type = 'error' GROUP BY 1),
      |  st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(n_events) AS BIGINT) AS s,
      |    CAST(SUM(n_events * n_events) AS BIGINT) AS s2
      |  FROM hourly),
      |  z AS (SELECT hour, n_events,
      |    CASE WHEN sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) > 0.0
      |      THEN (CAST(n_events AS DOUBLE)
      |            - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |        / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |          - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
      |      ELSE 0.0 END AS z
      |  FROM hourly CROSS JOIN st)
      |SELECT hour, n_events, z, abs(z) > 2.0 AS is_anomaly
      |FROM z ORDER BY hour""".stripMargin

  // ---------------------------------------------------------------------
  // Corpus report: the per-source dashboard a data engineer pulls
  // before mixing — volume (docs/tokens), quality-gate pass counts,
  // exact-duplicate mass, and mean length, each an exact integer
  // aggregate (the one division is integer/integer → double, exact).
  // Composes qualityMetrics + fingerprint over one grouped pass.
  // ---------------------------------------------------------------------
  def xCorpusReport(s: SparkSession, dir: String): DataFrame = {
    val q = TextOps.qualityMetrics(t(s, dir, "documents"), "text")
      .withColumn("_fp", TextOps.fingerprint(col("text")))
    q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
        (count(lit(1)) - count_distinct(col("_fp"))).as("n_exact_dups"),
        (sum(col("n_tokens")).cast("double") /
          count(lit(1)).cast("double")).as("avg_tokens"))
      .orderBy(col("source"))
  }

  val xCorpusReportSql: String =
    s"""WITH q AS (SELECT source,
       |    len($toksSql) AS n_tokens,
       |    length(text) AS n_chars,
       |    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
       |      AS n_alnum,
       |    md5(lower(trim(text))) AS fp
       |  FROM documents),
       |  m AS (SELECT source, n_tokens, fp,
       |    (n_tokens >= 5
       |      AND (CASE WHEN n_chars > 0
       |            THEN CAST(n_alnum AS DOUBLE) / n_chars
       |            ELSE 0.0 END) >= 0.5
       |      AND (CASE WHEN n_tokens > 0
       |            THEN CAST(n_alnum AS DOUBLE) / n_tokens
       |            ELSE 0.0 END) BETWEEN 2 AND 12) AS ok
       |  FROM q)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_quality_ok,
       |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
       |  CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    AS avg_tokens
       |FROM m GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Token chunking with overlap (RAG prep): 40-token windows advancing
  // by 30 (10-token overlap). Chunk layout is exact integer
  // arithmetic; text reconstructs from the token slices identically in
  // both engines.
  // ---------------------------------------------------------------------
  def xTextChunks(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 40, overlapTokens = 10)
      .orderBy(col("doc_id"), col("chunk_id"))

  val xTextChunksSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  d AS (SELECT doc_id, toks, len(toks) AS n FROM tok
       |    WHERE len(toks) >= 1),
       |  c AS (SELECT doc_id, toks, n,
       |      unnest(range(CAST((greatest(n - 40, 0) + 29) // 30 AS INTEGER)
       |        + 1)) AS chunk_id
       |    FROM d),
       |  sl AS (SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       |      toks[chunk_id * 30 + 1 : chunk_id * 30 + 40] AS ct
       |    FROM c)
       |SELECT doc_id, chunk_id,
       |  CAST(len(ct) AS INTEGER) AS n_chunk_tokens,
       |  array_to_string(ct, ' ') AS chunk_text
       |FROM sl
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------------
  // PMI collocations: global top-20 bigram collocations with min count
  // 5 — each PMI is one graft_ln over exact divisions, no float sums.
  // ---------------------------------------------------------------------
  def xTextPmi(s: SparkSession, dir: String): DataFrame =
    TextOps.collocationsPmi(t(s, dir, "documents"), "text",
      k = 20, minCount = 5L)

  val xTextPmiSql: String =
    s"""WITH tok AS (SELECT $toksSql AS toks FROM documents),
       |  uni AS (SELECT w, COUNT(*) AS c FROM (
       |      SELECT unnest(toks) AS w FROM tok) GROUP BY w),
       |  bi AS (SELECT pair, COUNT(*) AS n_pair FROM (
       |      SELECT unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS pair
       |      FROM tok WHERE len(toks) >= 2)
       |    GROUP BY pair HAVING COUNT(*) >= 5),
       |  tots AS (SELECT (SELECT SUM(c) FROM uni) AS t,
       |    (SELECT COUNT(*) FROM (
       |      SELECT unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1]))
       |      FROM tok WHERE len(toks) >= 2)) AS b)
       |SELECT pair, n_pair,
       |  ln((CAST(n_pair AS DOUBLE) / CAST(b AS DOUBLE))
       |    / ((CAST(u1.c AS DOUBLE) / CAST(t AS DOUBLE))
       |       * (CAST(u2.c AS DOUBLE) / CAST(t AS DOUBLE)))) AS pmi
       |FROM bi
       |JOIN uni u1 ON string_split(pair, ' ')[1] = u1.w
       |JOIN uni u2 ON string_split(pair, ' ')[2] = u2.w
       |CROSS JOIN tots
       |ORDER BY pmi DESC, pair LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // Token-distribution drift src0 vs src1: symmetric add-one KL pair
  // over the union vocabulary; the fixed-point sums and graft_ln make
  // the nats values reproduce bit-for-bit.
  // ---------------------------------------------------------------------
  def xTextDrift(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TextOps.tokenDrift(d.filter(col("source") === "src0"),
      d.filter(col("source") === "src1"), "text")
  }

  val xTextDriftSql: String =
    s"""WITH ca AS (SELECT w, COUNT(*) AS c FROM (
       |    SELECT unnest($toksSql) AS w FROM documents
       |    WHERE source = 'src0') GROUP BY w),
       |  cb AS (SELECT w, COUNT(*) AS c FROM (
       |    SELECT unnest($toksSql) AS w FROM documents
       |    WHERE source = 'src1') GROUP BY w),
       |  j AS (SELECT COALESCE(ca.w, cb.w) AS w,
       |      COALESCE(ca.c, 0) AS cca, COALESCE(cb.c, 0) AS ccb
       |    FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
       |  tots AS (SELECT CAST(SUM(cca) AS BIGINT) AS ta,
       |    CAST(SUM(ccb) AS BIGINT) AS tb,
       |    CAST(COUNT(*) AS BIGINT) AS v FROM j),
       |  terms AS (SELECT ta, tb, v,
       |      (CAST(cca AS DOUBLE) + 1.0)
       |        / (CAST(ta AS DOUBLE) + CAST(v AS DOUBLE)) AS p,
       |      (CAST(ccb AS DOUBLE) + 1.0)
       |        / (CAST(tb AS DOUBLE) + CAST(v AS DOUBLE)) AS q
       |    FROM j CROSS JOIN tots),
       |  fx AS (SELECT ta, tb, v,
       |      CAST(FLOOR(p * ln(p / q) * 1099511627776.0) AS BIGINT)
       |        AS fab,
       |      CAST(FLOOR(q * ln(q / p) * 1099511627776.0) AS BIGINT)
       |        AS fba
       |    FROM terms)
       |SELECT v AS n_vocab, ta AS tokens_a, tb AS tokens_b,
       |  CAST(CAST(SUM(fab) AS BIGINT) AS DOUBLE)
       |    / 1099511627776.0 AS kl_ab,
       |  CAST(CAST(SUM(fba) AS BIGINT) AS DOUBLE)
       |    / 1099511627776.0 AS kl_ba
       |FROM fx GROUP BY ta, tb, v""".stripMargin

  // ---------------------------------------------------------------------
  // CCNet's head/middle/tail cut: NTILE(3)-exact tiling over the LM
  // fluency score (Wenzek et al. 2020 §4.3 bucket corpora by
  // reference-LM perplexity and mix by bucket). Order is
  // (mean_nll, doc_id) — total, so the tile assignment is deterministic
  // and the oracle reproduces it exactly on the bit-identical scores.
  // r10: the global-window NTILE (every row to ONE task) is replaced by
  // TextOps.scoreTiles — the two-pass contiguous-rank shape + integer
  // tile arithmetic, SAME semantics (the unchanged NTILE oracle proves
  // it), no partition-less window anywhere (PlanShapeSpec pins this).
  // The threshold form (x_text_ppl_thresh) is the other 100 TB cut.
  // ---------------------------------------------------------------------
  /** Materialized DOC-grain LM sums `(_id, _sfx, n_bigrams)` (train on
    * src0, score all — the x_text_lmscore framing), session-cached:
    * FOUR registered queries consume the identical train/join/score
    * chain (`x_text_lmscore`, `x_text_ppl_buckets`, `x_text_ppl_thresh`
    * at doc grain; `x_mix_weights`/`x_mix_allocate` regroup the exact
    * integer sums to source grain), and within a session the corpus is
    * immutable — the ccCache/bpeCache argument applied to the
    * third-most-expensive subtree (the r16 sf10 sweep priced the chain
    * at ~23 s per consumer). Checkpoint-backed, so reuse replays no
    * lineage. */
  private val lmSumsCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]())
  private def lmDocSums(s: SparkSession, dir: String): DataFrame =
    graft.engine.SessionCaches.memo(lmSumsCache, (s, dir))( {
      val d = t(s, dir, "documents")
      graft.engine.Engine.materialize(TextOps.lmKeySums(
        d, d.filter(col("source") === "src0"), "doc_id", "text"))
    })
  private def lmScoredDocs(s: SparkSession, dir: String): DataFrame =
    TextOps.lmScoreFromSums(lmDocSums(s, dir), "doc_id")

  def xTextPplBuckets(s: SparkSession, dir: String): DataFrame = {
    val scored = lmScoredDocs(s, dir)
    TextOps.scoreTiles(scored, "doc_id", "mean_nll", k = 3)
      .withColumn("bucket",
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("mean_nll")).as("min_nll"),
        max(col("mean_nll")).as("max_nll"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------------
  // The percentile-THRESHOLD form of the same cut — the plan that runs
  // at 100 TB: one exact-percentile aggregate (DuckDB quantile_cont
  // twins Spark's exact `percentile`, the q_percentiles-proven
  // pairing), 1-row broadcast bounds, narrow when-chain bucketing.
  // Boundary-tie semantics differ from NTILE by design (ties share a
  // bucket); the oracle certifies exactly this form.
  // ---------------------------------------------------------------------
  def xTextPplThresh(s: SparkSession, dir: String): DataFrame = {
    val scored = lmScoredDocs(s, dir)
    TextOps.nllBucketsByThreshold(scored, "mean_nll")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("mean_nll")).as("min_nll"),
        max(col("mean_nll")).as("max_nll"))
      .orderBy(col("bucket"))
  }

  // lazy: shares the scoring CTE chain with xTextLmscoreSql (declared
  // later in the file; object vals initialize in order).
  lazy val xTextPplThreshSql: String = {
    val scored = xTextLmscoreSql.replace("ORDER BY doc_id", "")
    s"""WITH scored AS ($scored),
       |  b AS (SELECT quantile_cont(mean_nll, 1.0/3) AS t1,
       |      quantile_cont(mean_nll, 2.0/3) AS t2 FROM scored)
       |SELECT CASE WHEN mean_nll <= t1 THEN 'head'
       |            WHEN mean_nll <= t2 THEN 'middle'
       |            ELSE 'tail' END AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(mean_nll) AS min_nll, MAX(mean_nll) AS max_nll
       |FROM scored CROSS JOIN b GROUP BY 1
       |ORDER BY bucket""".stripMargin
  }

  // lazy: shares the scoring CTE chain with xTextLmscoreSql, which is
  // declared later in the file (object vals initialize in order).
  lazy val xTextPplBucketsSql: String = {
    val scored = xTextLmscoreSql.replace("ORDER BY doc_id", "")
    s"""WITH scored AS ($scored),
       |  tiled AS (SELECT doc_id, mean_nll,
       |      NTILE(3) OVER (ORDER BY mean_nll, doc_id) AS t
       |    FROM scored)
       |SELECT CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
       |              ELSE 'tail' END AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(mean_nll) AS min_nll, MAX(mean_nll) AS max_nll
       |FROM tiled GROUP BY t
       |ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------------
  // TF-IDF keywords: top-3 terms per document, smoothed idf via
  // graft_ln — scores are single products (no float sums), so the
  // oracle reproduces them bit-for-bit with no fixed-point step.
  // ---------------------------------------------------------------------
  def xTextKeywords(s: SparkSession, dir: String): DataFrame =
    TextOps.keywordsTfidf(t(s, dir, "documents"), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rnk"))

  val xTextKeywordsSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (
       |      SELECT doc_id, unnest(toks) AS term FROM tok)
       |    GROUP BY doc_id, term),
       |  dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |  ns AS (SELECT COUNT(*) AS n FROM documents),
       |  sc AS (SELECT doc_id, term,
       |      CAST(tf AS DOUBLE) * ln((CAST(n AS DOUBLE) + 1.0)
       |        / (CAST(df AS DOUBLE) + 1.0)) AS score
       |    FROM tf JOIN dfs USING (term) CROSS JOIN ns),
       |  r AS (SELECT doc_id, term, score,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, term) AS rnk
       |    FROM sc)
       |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, score
       |FROM r WHERE rnk <= 3
       |ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // Ordered funnel over the events table: view → click → purchase with
  // first-touch / earliest-completion semantics. The oracle stages the
  // same min-after-previous aggregates through CTEs.
  // ---------------------------------------------------------------------
  def xEventsFunnel(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  val xEventsFunnelSql: String =
    """WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |    WHERE event_type = 'view' GROUP BY user_id),
      |  u2 AS (SELECT u1.user_id, u1.t1, MIN(e.ts) AS t2
      |    FROM u1 LEFT JOIN events e
      |      ON e.user_id = u1.user_id AND e.event_type = 'click'
      |        AND e.ts > u1.t1
      |    GROUP BY u1.user_id, u1.t1),
      |  u3 AS (SELECT u2.user_id, u2.t1, u2.t2, MIN(e.ts) AS t3
      |    FROM u2 LEFT JOIN events e
      |      ON e.user_id = u2.user_id AND e.event_type = 'purchase'
      |        AND e.ts > u2.t2
      |    GROUP BY u2.user_id, u2.t1, u2.t2)
      |SELECT user_id, t1, t2, t3,
      |  CAST((CASE WHEN t1 IS NULL THEN 0 ELSE 1 END)
      |     + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
      |     + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END)
      |    AS INTEGER) AS steps_completed
      |FROM u3 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // First/last-touch attribution: per purchase, the user's first and
  // last preceding click plus the touch count. One user-keyed range
  // join + one conversion-keyed min/max-struct aggregate; the oracle
  // replays the tie rule ((ts, id) order both ways) through windows.
  // ---------------------------------------------------------------------
  def xEventsAttribution(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.touchAttribution(t(s, dir, "events"), "user_id",
        "ts", "event_type", "event_id", "purchase", "click")
      .orderBy(col("event_id"))

  val xEventsAttributionSql: String =
    """WITH conv AS (SELECT event_id, user_id, ts AS conv_ts
      |    FROM events WHERE event_type = 'purchase'),
      |  tch AS (SELECT event_id AS tid, user_id, ts AS tts
      |    FROM events WHERE event_type = 'click'),
      |  j AS (SELECT c.event_id, c.user_id, c.conv_ts, t.tid, t.tts
      |    FROM conv c LEFT JOIN tch t
      |      ON t.user_id = c.user_id AND t.tts <= c.conv_ts),
      |  f AS (SELECT event_id, tid AS first_touch_id,
      |      tts AS first_touch_ts FROM (
      |    SELECT event_id, tid, tts, ROW_NUMBER() OVER (
      |        PARTITION BY event_id ORDER BY tts, tid) AS rn
      |    FROM j WHERE tid IS NOT NULL) WHERE rn = 1),
      |  l AS (SELECT event_id, tid AS last_touch_id,
      |      tts AS last_touch_ts FROM (
      |    SELECT event_id, tid, tts, ROW_NUMBER() OVER (
      |        PARTITION BY event_id ORDER BY tts DESC, tid DESC) AS rn
      |    FROM j WHERE tid IS NOT NULL) WHERE rn = 1),
      |  g AS (SELECT event_id, user_id, conv_ts,
      |      CAST(COUNT(tid) AS BIGINT) AS n_touches
      |    FROM j GROUP BY 1, 2, 3)
      |SELECT g.event_id, g.user_id, g.conv_ts, g.n_touches,
      |  f.first_touch_id, f.first_touch_ts,
      |  l.last_touch_id, l.last_touch_ts
      |FROM g LEFT JOIN f USING (event_id) LEFT JOIN l USING (event_id)
      |ORDER BY g.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // k-anonymity audit (Profile.kAnonymity): re-identification exposure
  // of two quasi-identifier sets — (event_type, hour) over events and
  // (source, lang) over documents — min equivalence class + exact-ppm
  // share of under-k rows. The pre-export privacy review beside PII
  // redaction (which fixes direct identifiers, not quasi-identifiers).
  // ---------------------------------------------------------------------
  def xPrivacyKanon(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("hour", hour(col("ts")))
    graft.transform.Profile.kAnonymity(ev,
        Seq("event_type", "hour"), k = 60L)
      .unionAll(graft.transform.Profile.kAnonymity(
        t(s, dir, "documents"), Seq("source", "lang"), k = 5L))
      .orderBy(col("qi"))
  }

  val xPrivacyKanonSql: String =
    """(WITH g AS (SELECT event_type, hour(ts) AS h,
      |      CAST(COUNT(*) AS BIGINT) AS n
      |    FROM events GROUP BY 1, 2)
      |  SELECT 'event_type,hour' AS qi, CAST(60 AS BIGINT) AS k,
      |    CAST(SUM(n) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_groups,
      |    CAST(MIN(n) AS BIGINT) AS min_k,
      |    CAST(SUM(CASE WHEN n < 60 THEN n ELSE 0 END) AS BIGINT)
      |      AS n_below_k,
      |    CAST(CAST(SUM(CASE WHEN n < 60 THEN n ELSE 0 END) AS HUGEINT)
      |      * 1000000 // SUM(n) AS BIGINT) AS below_ppm
      |  FROM g)
      |UNION ALL
      |(WITH g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      |    FROM documents GROUP BY 1, 2)
      |  SELECT 'source,lang' AS qi, CAST(5 AS BIGINT) AS k,
      |    CAST(SUM(n) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_groups,
      |    CAST(MIN(n) AS BIGINT) AS min_k,
      |    CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |      AS n_below_k,
      |    CAST(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS HUGEINT)
      |      * 1000000 // SUM(n) AS BIGINT) AS below_ppm
      |  FROM g)
      |ORDER BY qi""".stripMargin

  // ---------------------------------------------------------------------
  // l-diversity audit (Profile.lDiversity): the homogeneity-attack
  // companion to x_privacy_kanon — distinct-l and entropy-l in one
  // pass over the same two QI sets, sensitive = user_id / lang.
  // Entropy is the tokenEntropy fixed-point recipe, so the twin (plain
  // ln + floor in DuckDB) hashes exactly.
  // ---------------------------------------------------------------------
  def xPrivacyLdiv(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("hour", hour(col("ts")))
    graft.transform.Profile.lDiversity(ev,
        Seq("event_type", "hour"), "user_id", l = 3L)
      .unionAll(graft.transform.Profile.lDiversity(
        t(s, dir, "documents"), Seq("source"), "lang", l = 4L))
      .orderBy(col("qi"))
  }

  val xPrivacyLdivSql: String = {
    def block(qiLabel: String, qiSel: String, qiGrp: String,
              sens: String, sensLabel: String, from: String,
              l: Int): String =
      s"""(WITH cell AS (SELECT $qiSel, $sens AS s,
         |      CAST(COUNT(*) AS BIGINT) AS c
         |    FROM $from GROUP BY $qiGrp, s),
         |  cls AS (SELECT $qiGrp,
         |      CAST(SUM(c) AS BIGINT) AS n,
         |      CAST(COUNT(*) AS BIGINT) AS d,
         |      CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE)
         |        * ln(CAST(c AS DOUBLE)) * 1073741824.0) AS BIGINT))
         |        AS BIGINT) AS sfx
         |    FROM cell GROUP BY $qiGrp),
         |  hh AS (SELECT n, d,
         |      CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1073741824.0) AS BIGINT)
         |        - (sfx // n) AS hfx
         |    FROM cls)
         |  SELECT '$qiLabel' AS qi, '$sensLabel' AS sensitive,
         |    CAST($l AS BIGINT) AS l,
         |    CAST(SUM(n) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) AS BIGINT) AS n_groups,
         |    CAST(MIN(d) AS BIGINT) AS min_distinct,
         |    CAST(SUM(CASE WHEN d < $l THEN n ELSE 0 END) AS BIGINT)
         |      AS n_below_l,
         |    CAST(CAST(SUM(CASE WHEN d < $l THEN n ELSE 0 END) AS HUGEINT)
         |      * 1000000 // SUM(n) AS BIGINT) AS below_ppm,
         |    CAST(MIN(hfx) AS BIGINT) AS min_entropy_fx,
         |    CAST(SUM(CASE WHEN hfx <
         |        CAST(FLOOR(ln(CAST($l AS DOUBLE)) * 1073741824.0)
         |          AS BIGINT)
         |      THEN n ELSE 0 END) AS BIGINT) AS n_below_entropy,
         |    CAST(CAST(SUM(CASE WHEN hfx <
         |        CAST(FLOOR(ln(CAST($l AS DOUBLE)) * 1073741824.0)
         |          AS BIGINT)
         |      THEN n ELSE 0 END) AS HUGEINT)
         |      * 1000000 // SUM(n) AS BIGINT) AS below_entropy_ppm
         |  FROM hh)""".stripMargin
    block("event_type,hour", "event_type, hour(ts) AS h", "event_type, h",
      "user_id", "user_id", "events", 3) +
      "\nUNION ALL\n" +
      block("source", "source", "source", "lang", "lang",
        "documents", 4) +
      "\nORDER BY qi"
  }

  // ---------------------------------------------------------------------
  // Z-order layout audit (LayoutOps.zOrderAudit): Morton-interleave
  // l_partkey × l_suppkey onto a 256×256 grid, bucket by equal-width
  // curve ranges, and report per-bucket footer extents + exact-ppm
  // extent area vs the single-column-sort layout. The write-side data
  // skipping decision, audited in-engine. Twin: the same shift/mask
  // chain generated as DuckDB SQL.
  // ---------------------------------------------------------------------
  def xLayoutZorder(s: SparkSession, dir: String): DataFrame =
    graft.ext.LayoutOps.zOrderAudit(t(s, dir, "lineitem"),
        "l_partkey", "l_suppkey", bits = 8, nBuckets = 16)
      .orderBy(col("layout"), col("bucket"))

  /** Shared twin prefix for the two layout audits: min/max bounds +
    * 255-cell grid scaling of (l_partkey, l_suppkey) — ONE definition
    * so the scaling contract can't silently desynchronize between the
    * Morton and Hilbert oracles. */
  private val layoutScaledCte: String =
    """b AS (SELECT CAST(MIN(l_partkey) AS BIGINT) AS xlo,
      |    CAST(MAX(l_partkey) AS BIGINT) AS xhi,
      |    CAST(MIN(l_suppkey) AS BIGINT) AS ylo,
      |    CAST(MAX(l_suppkey) AS BIGINT) AS yhi
      |  FROM lineitem),
      |  s AS (SELECT
      |    CASE WHEN xhi > xlo THEN CAST(
      |      (CAST(CAST(l_partkey AS BIGINT) - xlo AS HUGEINT) * 255)
      |        // (xhi - xlo) AS BIGINT)
      |      ELSE 0 END AS sx,
      |    CASE WHEN yhi > ylo THEN CAST(
      |      (CAST(CAST(l_suppkey AS BIGINT) - ylo AS HUGEINT) * 255)
      |        // (yhi - ylo) AS BIGINT)
      |      ELSE 0 END AS sy
      |  FROM lineitem, b)""".stripMargin

  val xLayoutZorderSql: String = {
    val zv = graft.ext.LayoutOps.zValue2Sql("sx", "sy", 8)
    s"""WITH $layoutScaledCte,
       |  z AS (SELECT sx, sy, $zv AS zv FROM s),
       |  m AS (SELECT 'zorder' AS layout, zv // 4096 AS bucket, sx, sy
       |      FROM z
       |    UNION ALL
       |    SELECT 'linear' AS layout, sx // 16 AS bucket, sx, sy FROM z)
       |SELECT layout, CAST(bucket AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(MIN(sx) AS BIGINT) AS min_x, CAST(MAX(sx) AS BIGINT) AS max_x,
       |  CAST(MIN(sy) AS BIGINT) AS min_y, CAST(MAX(sy) AS BIGINT) AS max_y,
       |  CAST(CAST((MAX(sx) - MIN(sx) + 1) AS HUGEINT)
       |    * (MAX(sy) - MIN(sy) + 1) * 1000000 // 65536 AS BIGINT)
       |    AS area_ppm
       |FROM m GROUP BY layout, bucket
       |ORDER BY layout, bucket""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Three-key Morton audit: the practical ceiling of curve clustering
  // ("your two or three hottest filter keys") — extents on all three
  // of (l_partkey, l_suppkey, l_orderkey) per curve-range bucket vs
  // the single-column sort.
  // ---------------------------------------------------------------------
  def xLayoutZorder3(s: SparkSession, dir: String): DataFrame =
    graft.ext.LayoutOps.zOrderAudit3(t(s, dir, "lineitem"),
        "l_partkey", "l_suppkey", "l_orderkey", bits = 6, nBuckets = 16)
      .orderBy(col("layout"), col("bucket"))

  val xLayoutZorder3Sql: String = {
    val zv = graft.ext.LayoutOps.zValue3Sql("sx", "sy", "sz", 6)
    val zDiv = (1L << 18) / 16
    s"""WITH b AS (SELECT CAST(MIN(l_partkey) AS BIGINT) AS xlo,
       |    CAST(MAX(l_partkey) AS BIGINT) AS xhi,
       |    CAST(MIN(l_suppkey) AS BIGINT) AS ylo,
       |    CAST(MAX(l_suppkey) AS BIGINT) AS yhi,
       |    CAST(MIN(l_orderkey) AS BIGINT) AS zlo,
       |    CAST(MAX(l_orderkey) AS BIGINT) AS zhi
       |  FROM lineitem),
       |  s AS (SELECT
       |    CASE WHEN xhi > xlo THEN CAST(
       |      (CAST(CAST(l_partkey AS BIGINT) - xlo AS HUGEINT) * 63)
       |        // (xhi - xlo) AS BIGINT)
       |      ELSE 0 END AS sx,
       |    CASE WHEN yhi > ylo THEN CAST(
       |      (CAST(CAST(l_suppkey AS BIGINT) - ylo AS HUGEINT) * 63)
       |        // (yhi - ylo) AS BIGINT)
       |      ELSE 0 END AS sy,
       |    CASE WHEN zhi > zlo THEN CAST(
       |      (CAST(CAST(l_orderkey AS BIGINT) - zlo AS HUGEINT) * 63)
       |        // (zhi - zlo) AS BIGINT)
       |      ELSE 0 END AS sz
       |  FROM lineitem, b),
       |  z AS (SELECT sx, sy, sz, $zv AS zv FROM s),
       |  m AS (SELECT 'zorder3' AS layout, zv // $zDiv AS bucket,
       |      sx, sy, sz FROM z
       |    UNION ALL
       |    SELECT 'linear' AS layout, sx // 4 AS bucket, sx, sy, sz
       |      FROM z)
       |SELECT layout, CAST(bucket AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(MIN(sx) AS BIGINT) AS min_x, CAST(MAX(sx) AS BIGINT) AS max_x,
       |  CAST(MIN(sy) AS BIGINT) AS min_y, CAST(MAX(sy) AS BIGINT) AS max_y,
       |  CAST(MIN(sz) AS BIGINT) AS min_z, CAST(MAX(sz) AS BIGINT) AS max_z,
       |  CAST(CAST((MAX(sx) - MIN(sx) + 1) AS HUGEINT)
       |    * (MAX(sy) - MIN(sy) + 1) * (MAX(sz) - MIN(sz) + 1)
       |    * 1000000 // ${1L << 18} AS BIGINT) AS volume_ppm
       |FROM m GROUP BY layout, bucket
       |ORDER BY layout, bucket""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Hilbert layout audit: the same extents contract as x_layout_zorder
  // but with the xy2d curve (native graft_hilbert) as the multi-column
  // layout — contiguous curve ranges are CONNECTED regions, so bucket
  // extents tighten vs Morton's quadrant-seam jumps. The twin unrolls
  // the walk as chained subqueries with two's-complement `&`.
  // ---------------------------------------------------------------------
  def xLayoutHilbert(s: SparkSession, dir: String): DataFrame =
    graft.ext.LayoutOps.hilbertAudit(t(s, dir, "lineitem"),
        "l_partkey", "l_suppkey", bits = 8, nBuckets = 16)
      .orderBy(col("layout"), col("bucket"))

  val xLayoutHilbertSql: String = {
    val steps = graft.ext.LayoutOps.hilbertStepsSql("s", Seq.empty, 8)
    s"""WITH $layoutScaledCte,
       |  z AS (SELECT sx, sy, hd FROM $steps zz),
       |  m AS (SELECT 'hilbert' AS layout, hd // 4096 AS bucket, sx, sy
       |      FROM z
       |    UNION ALL
       |    SELECT 'linear' AS layout, sx // 16 AS bucket, sx, sy FROM z)
       |SELECT layout, CAST(bucket AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(MIN(sx) AS BIGINT) AS min_x, CAST(MAX(sx) AS BIGINT) AS max_x,
       |  CAST(MIN(sy) AS BIGINT) AS min_y, CAST(MAX(sy) AS BIGINT) AS max_y,
       |  CAST(CAST((MAX(sx) - MIN(sx) + 1) AS HUGEINT)
       |    * (MAX(sy) - MIN(sy) + 1) * 1000000 // 65536 AS BIGINT)
       |    AS area_ppm
       |FROM m GROUP BY layout, bucket
       |ORDER BY layout, bucket""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Weak-supervision label aggregation (LabelOps): three heuristic
  // labeling functions (language, length band w/ abstain, keyword)
  // melt out of ONE documents scan; majority init → smoothed
  // agreement-with-majority reliability → log-odds-weighted re-vote
  // (one Dawid–Skene EM half-step). Two grains registered: the
  // per-doc label table and the per-labeler reliability audit.
  // ---------------------------------------------------------------------
  private def lfVotes(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val vLang = when(col("lang") === "en", 1).otherwise(-1)
    val vLen = when(col("n_chars") >= 300, 1)
      .when(col("n_chars") < 150, -1).otherwise(0)
    val vThe = when(locate(" the ",
      concat(lit(" "), col("text"), lit(" "))) > 0, 1).otherwise(-1)
    d.select(col("doc_id"), explode(array(
        struct(lit("lf_lang").as("labeler"), vLang.as("vote")),
        struct(lit("lf_len").as("labeler"), vLen.as("vote")),
        struct(lit("lf_the").as("labeler"), vThe.as("vote")))).as("lv"))
      .select(col("doc_id"), col("lv.labeler").as("labeler"),
        col("lv.vote").as("vote"))
  }

  private val lfVotesSql: String =
    """SELECT doc_id, 'lf_lang' AS labeler,
      |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS vote
      |  FROM documents
      |UNION ALL
      |SELECT doc_id, 'lf_len',
      |    CASE WHEN n_chars >= 300 THEN 1
      |      WHEN n_chars < 150 THEN -1 ELSE 0 END
      |  FROM documents
      |UNION ALL
      |SELECT doc_id, 'lf_the',
      |    CASE WHEN position(' the ' IN ' ' || text || ' ') > 0
      |      THEN 1 ELSE -1 END
      |  FROM documents""".stripMargin

  private val lfAggSql: String =
    s"""v AS ($lfVotesSql),
       |  m AS (SELECT doc_id,
       |      CAST(SUM(CASE WHEN vote <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |        AS n_votes,
       |      CAST(SUM(vote) AS BIGINT) AS vote_sum
       |    FROM v GROUP BY doc_id),
       |  mm AS (SELECT doc_id, n_votes, vote_sum,
       |      CAST(CASE WHEN vote_sum > 0 THEN 1
       |        WHEN vote_sum < 0 THEN -1 ELSE 0 END AS INTEGER) AS maj
       |    FROM m),
       |  r AS (SELECT labeler,
       |      CAST(COUNT(*) AS BIGINT) AS n_scored,
       |      CAST(SUM(CASE WHEN vote = maj THEN 1 ELSE 0 END) AS BIGINT)
       |        AS n_agree
       |    FROM v JOIN mm USING (doc_id)
       |    WHERE vote <> 0 AND maj <> 0
       |    GROUP BY labeler),
       |  w AS (SELECT labeler, n_scored, n_agree,
       |      CAST(CAST(n_agree + 1 AS HUGEINT) * 1000000
       |        // (n_scored + 2) AS BIGINT) AS acc_ppm,
       |      CAST(FLOOR(ln(CAST(n_agree + 1 AS DOUBLE)
       |          / CAST(n_scored - n_agree + 1 AS DOUBLE))
       |        * 1073741824.0) AS BIGINT) AS weight_fx
       |    FROM r)""".stripMargin

  def xLabelVote(s: SparkSession, dir: String): DataFrame =
    graft.ext.LabelOps.aggregateLabels(lfVotes(s, dir), "doc_id",
        "labeler", "vote")
      .orderBy(col("doc_id"))

  val xLabelVoteSql: String =
    s"""WITH $lfAggSql,
       |  sc AS (SELECT doc_id,
       |      CAST(SUM(CAST(vote AS BIGINT) * weight_fx) AS BIGINT)
       |        AS score_fx
       |    FROM v JOIN w USING (labeler) GROUP BY doc_id)
       |SELECT mm.doc_id, mm.n_votes, mm.maj,
       |  COALESCE(sc.score_fx, 0) AS score_fx,
       |  CAST(CASE WHEN COALESCE(sc.score_fx, 0) > 0 THEN 1
       |    WHEN COALESCE(sc.score_fx, 0) < 0 THEN -1 ELSE 0 END
       |    AS INTEGER) AS label
       |FROM mm LEFT JOIN sc USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // All-but-the-top projection (SimilarityOps.abttProject): the
  // isotropy-restoring cleanup's per-vector signed projection onto the
  // FIXED-POINT dominant covariance component — the eigensolve itself
  // is oracle-checked here (pcaProject's float eigensolve has no SQL
  // analog; this one replays as 8 unrolled HUGEINT CTE steps).
  // ---------------------------------------------------------------------
  def xEmbedAbtt(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.abttProject(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, iters = 8)
      .orderBy(col("vec_id"))

  val xEmbedAbttSql: String = SimilarityOps.abttProjectSql(64, 8)

  // ---------------------------------------------------------------------
  // Systematic PPS sampling (Split.systematicPps): sample documents
  // proportional to token count at a fixed per-source budget — seeded
  // deterministic start, exact-integer mark counting, certainty items
  // reported at multiplicity > 1, zero-weight rows visible at 0.
  // ---------------------------------------------------------------------
  def xSamplePps(s: SparkSession, dir: String): DataFrame =
    graft.transform.Split.systematicPps(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", n = 20, seed = "pps0")
      .orderBy(col("doc_id"))

  val xSamplePpsSql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |  c AS (SELECT doc_id, source, n_tokens,
       |      GREATEST(n_tokens, 0) AS w,
       |      COALESCE(SUM(GREATEST(n_tokens, 0)) OVER (
       |        PARTITION BY source ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS cum_before,
       |      SUM(GREATEST(n_tokens, 0)) OVER (PARTITION BY source)
       |        AS group_total
       |    FROM t),
       |  st AS (SELECT *,
       |      CAST(('0x' || substr(md5('pps0:' || source), 1, 8))::BIGINT
       |        % GREATEST(group_total, 1) AS BIGINT) AS strt
       |    FROM c),
       |  m AS (SELECT doc_id, source, n_tokens,
       |      CAST(cum_before AS BIGINT) AS cum_before,
       |      CAST(group_total AS BIGINT) AS group_total,
       |      CAST(CASE WHEN group_total > 0 THEN
       |        ((cum_before * 20 + w * 20 - strt - 1 + group_total)
       |          // group_total)
       |        - ((cum_before * 20 - strt - 1 + group_total)
       |          // group_total)
       |      ELSE 0 END AS BIGINT) AS multiplicity
       |    FROM st)
       |SELECT doc_id, source, n_tokens, cum_before, group_total,
       |  multiplicity, multiplicity >= 1 AS selected
       |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Balanced truncation-free packing (Split.balancedPack): snake-draft
  // assignment on the (token-count desc, id) global rank — documents
  // stay whole (vs x_text_pack's concat-and-chunk) and bin loads
  // balance to within ~one document. Doc-grain output so the oracle
  // pins the rank AND the bin.
  // ---------------------------------------------------------------------
  def xPackBalanced(s: SparkSession, dir: String): DataFrame = {
    val withCounts = t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.transform.Split.balancedPack(withCounts, "doc_id", "n_tokens",
        nBins = 16)
      .select(col("doc_id"), col("n_tokens"), col("pack_rank"),
        col("pack_bin"))
      .orderBy(col("doc_id"))
  }

  val xPackBalancedSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |  r AS (SELECT doc_id, n_tokens,
       |      CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)
       |        - 1 AS BIGINT) AS pack_rank
       |    FROM t)
       |SELECT doc_id, n_tokens, pack_rank,
       |  CAST(CASE WHEN (pack_rank // 16) % 2 = 0 THEN pack_rank % 16
       |    ELSE 15 - (pack_rank % 16) END AS BIGINT) AS pack_bin
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Per-dimension embedding health audit (SimilarityOps
  // .embeddingMoments): exact fixed-point mean/var/sd + 3-sigma outlier
  // mass per dimension — dead, exploding, and mean-offset dimensions
  // read straight off the 64-row result.
  // ---------------------------------------------------------------------
  def xEmbedMoments(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.embeddingMoments(t(s, dir, "embeddings"), "embedding",
        dim = 64)
      .orderBy(col("i"))

  val xEmbedMomentsSql: String =
    """WITH e AS (SELECT
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  ex AS MATERIALIZED (SELECT idx.i,
      |      CAST(FLOOR(v[idx.i + 1] * 1073741824.0) AS BIGINT) AS xfx,
      |      CAST(FLOOR(v[idx.i + 1] * v[idx.i + 1] * 1073741824.0)
      |        AS BIGINT) AS gfx
      |    FROM e, (SELECT CAST(i AS INTEGER) AS i FROM range(64) r(i))
      |      idx),
      |  m AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n,
      |      CAST(SUM(xfx) AS BIGINT) AS sfx,
      |      CAST(SUM(gfx) AS BIGINT) AS g2
      |    FROM ex GROUP BY i),
      |  mm AS (SELECT i, n, sfx // n AS mean_fx,
      |      GREATEST((g2 // n) - CAST((CAST(sfx // n AS HUGEINT)
      |        * (sfx // n)) // 1073741824 AS BIGINT), 0) AS var_fx
      |    FROM m),
      |  sd AS (SELECT i, n, mean_fx, var_fx,
      |      CAST(FLOOR(SQRT(CAST(CAST(var_fx AS HUGEINT) * 1073741824
      |        AS DOUBLE))) AS BIGINT) AS sd_fx
      |    FROM mm),
      |  o AS (SELECT ex.i,
      |      CAST(SUM(CASE WHEN ABS(ex.xfx - sd.mean_fx) > 3 * sd.sd_fx
      |        THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier
      |    FROM ex JOIN sd ON sd.i = ex.i GROUP BY ex.i)
      |SELECT sd.i, sd.n, sd.mean_fx, sd.var_fx, sd.sd_fx, o.n_outlier,
      |  CAST(CAST(o.n_outlier AS HUGEINT) * 1000000 // sd.n AS BIGINT)
      |    AS outlier_ppm
      |FROM sd JOIN o ON o.i = sd.i ORDER BY sd.i""".stripMargin

  def xLabelReliability(s: SparkSession, dir: String): DataFrame =
    graft.ext.LabelOps.labelerReliability(lfVotes(s, dir), "doc_id",
        "labeler", "vote")
      .orderBy(col("labeler"))

  val xLabelReliabilitySql: String =
    s"""WITH $lfAggSql
       |SELECT labeler, n_scored, n_agree, acc_ppm, weight_fx
       |FROM w ORDER BY labeler""".stripMargin

  // ---------------------------------------------------------------------
  // Key-skew audit (Profile.keySkewAcross) over four candidate shuffle
  // keys: exact integer Gini / max-share / skew-ratio / p50/p99 group
  // sizes, window-free ranks. One melted corpus pass per TABLE (r11 was
  // one pass per KEY COLUMN) and one shared rank machinery for all four
  // columns. The oracle replays the rank + HUGEINT algebra.
  // ---------------------------------------------------------------------
  def xProfileSkew(s: SparkSession, dir: String): DataFrame =
    graft.transform.Profile.keySkewAcross(Seq(
        t(s, dir, "events") -> Seq("user_id", "event_type"),
        t(s, dir, "documents") -> Seq("source", "lang")))
      .orderBy(col("key_col"))

  private def skewCteSql(table: String, key: String): String =
    s"""(WITH c AS (SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS n
       |    FROM $table GROUP BY 1),
       |  r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n, k) AS rk FROM c),
       |  tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |      CAST(SUM(n) AS BIGINT) AS n_rows,
       |      CAST(MAX(n) AS BIGINT) AS max_n,
       |      SUM(CAST(rk AS HUGEINT) * n) AS six FROM r),
       |  q AS (SELECT
       |      MAX(CASE WHEN rk = (n_keys * 50 + 99) // 100 THEN n END)
       |        AS p50_n,
       |      MAX(CASE WHEN rk = (n_keys * 99 + 99) // 100 THEN n END)
       |        AS p99_n
       |    FROM r CROSS JOIN tt)
       |SELECT '$key' AS key_col, n_keys, n_rows, max_n,
       |  CAST(CAST(max_n AS HUGEINT) * 1000000 // n_rows AS BIGINT)
       |    AS max_share_ppm,
       |  CAST(CAST(max_n AS HUGEINT) * n_keys * 1000000 // n_rows
       |    AS BIGINT) AS skew_ratio_ppm,
       |  CAST((2 * six - CAST(n_keys + 1 AS HUGEINT) * n_rows) * 1000000
       |    // (CAST(n_keys AS HUGEINT) * n_rows) AS BIGINT) AS gini_ppm,
       |  p50_n, p99_n
       |FROM tt CROSS JOIN q)""".stripMargin

  val xProfileSkewSql: String =
    Seq(("events", "user_id"), ("events", "event_type"),
        ("documents", "source"), ("documents", "lang"))
      .map { case (tb, k) => skewCteSql(tb, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")

  // ---------------------------------------------------------------------
  // Per-user inter-arrival burstiness (EventOps.interArrivalStats):
  // exact microsecond gaps, DECIMAL(38,0) moments, one double sqrt on
  // the final scalars — the bot-vs-organic signal. Twin replays the
  // window lag + HUGEINT moment algebra + the identical double
  // formula.
  // ---------------------------------------------------------------------
  def xEventsBurstiness(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.interArrivalStats(t(s, dir, "events"),
        "user_id", "ts", "event_id")
      .orderBy(col("user_id"))

  val xEventsBurstinessSql: String =
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events),
      |  m AS (SELECT user_id,
      |      CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |      SUM(CAST(gap AS HUGEINT)) AS sg,
      |      SUM(CAST(gap AS HUGEINT) * gap) AS sgg,
      |      CAST(MIN(gap) AS BIGINT) AS min_gap_us,
      |      CAST(MAX(gap) AS BIGINT) AS max_gap_us
      |    FROM g WHERE gap IS NOT NULL GROUP BY user_id),
      |  d AS (SELECT *,
      |      CAST(sg // n_gaps AS BIGINT) AS mean_gap_us,
      |      CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mm,
      |      sqrt(CAST(CAST(n_gaps AS HUGEINT) * sgg - sg * sg
      |        AS DOUBLE)) / CAST(n_gaps AS DOUBLE) AS ss
      |    FROM m)
      |SELECT user_id, n_gaps, mean_gap_us, min_gap_us, max_gap_us,
      |  CASE WHEN ss + mm > 0.0
      |    THEN CAST(FLOOR((ss - mm) / (ss + mm) * 1000000.0) AS BIGINT)
      |    ELSE -1000000 END AS burst_ppm
      |FROM d ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // Weekly cohort retention over events: first-activity-week cohorts ×
  // week offsets, counted on the distinct (user, week) activity
  // relation. Pure calendar/integer arithmetic — hash-exact.
  // ---------------------------------------------------------------------
  def xEventsRetention(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.cohortRetention(t(s, dir, "events"),
        "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset"))

  val xEventsRetentionSql: String =
    """WITH act AS (SELECT DISTINCT user_id AS u,
      |    CAST(date_trunc('week', ts) AS DATE) AS p FROM events),
      |  coh AS (SELECT u, MIN(p) AS c FROM act GROUP BY u)
      |SELECT c AS cohort_week,
      |  CAST(datediff('day', c, p) // 7 AS INTEGER) AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM act JOIN coh USING (u)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // Bigram-LM fluency score: train the add-one LM on the src0 slice,
  // score every document. The oracle retrains the identical counts and
  // reproduces each mean-NLL bit-for-bit (graft_ln + fixed-point sums).
  // ---------------------------------------------------------------------
  def xTextLmscore(s: SparkSession, dir: String): DataFrame =
    lmScoredDocs(s, dir).orderBy(col("doc_id"))

  val xTextLmscoreSql: String =
    s"""WITH tok AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  grams AS (SELECT doc_id, source, unnest(
       |      list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g
       |    FROM tok WHERE len(toks) >= 2),
       |  uni AS (SELECT w1, COUNT(*) AS c1 FROM (
       |      SELECT unnest(toks) AS w1 FROM tok WHERE source = 'src0')
       |    GROUP BY w1),
       |  vs AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS v FROM uni),
       |  bi AS (SELECT g, COUNT(*) AS c12 FROM grams
       |    WHERE source = 'src0' GROUP BY g),
       |  sc AS (SELECT doc_id,
       |      CAST(FLOOR((0.0 - ln(
       |        (CAST(COALESCE(c12, 0) AS DOUBLE) + 1.0)
       |          / (CAST(COALESCE(c1, 0) AS DOUBLE) + v)))
       |        * 1073741824.0) AS BIGINT) AS fx
       |    FROM grams d
       |    LEFT JOIN uni ON string_split(d.g, ' ')[1] = uni.w1
       |    LEFT JOIN bi ON d.g = bi.g
       |    CROSS JOIN vs)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  (CAST(CAST(SUM(fx) AS BIGINT) AS DOUBLE)
       |     / CAST(COUNT(*) AS DOUBLE)) / 1073741824.0 AS mean_nll
       |FROM sc GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Interpolated Kneser-Ney bigram scoring (TextOps.knScore): train on
  // the src0 slice with D = 3/4 (exact rational — every term a ratio
  // of integers), score every document. The twin re-derives c1/c12/
  // continuation counts on token strings and replays the double
  // algebra in the identical order, so each mean NLL is bit-exact.
  // ---------------------------------------------------------------------
  def xTextKneser(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TextOps.knScore(d, d.filter(col("source") === "src0"),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val xTextKneserSql: String =
    s"""WITH tok AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  grams AS (SELECT doc_id, source, g.w1 AS w1, g.w2 AS w2 FROM (
       |    SELECT doc_id, source, unnest(list_transform(
       |        range(1, len(toks)),
       |        i -> {w1: toks[i], w2: toks[i+1]})) AS g
       |    FROM tok WHERE len(toks) >= 2)),
       |  uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
       |      SELECT unnest(toks) AS w1 FROM tok WHERE source = 'src0')
       |    GROUP BY w1),
       |  bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
       |    FROM grams WHERE source = 'src0' GROUP BY w1, w2),
       |  n1f AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1f
       |    FROM bi GROUP BY w1),
       |  n1b AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
       |    FROM bi GROUP BY w2),
       |  tv AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bi) AS t,
       |      (SELECT CAST(COUNT(*) + 1 AS BIGINT) FROM uni) AS v),
       |  sc AS (SELECT doc_id, CAST(FLOOR((0.0 - ln(
       |      CASE WHEN COALESCE(c1, 0) > 0 AND COALESCE(n1f, 0) > 0
       |      THEN CAST(GREATEST(COALESCE(c12, 0) * 4 - 3, 0) AS DOUBLE)
       |          / CAST(COALESCE(c1, 0) * 4 AS DOUBLE)
       |        + (CAST(COALESCE(n1f, 0) * 3 AS DOUBLE)
       |           / CAST(COALESCE(c1, 0) * 4 AS DOUBLE))
       |          * (CAST(COALESCE(n1b, 0) + 1 AS DOUBLE)
       |             / CAST(t + v AS DOUBLE))
       |      ELSE CAST(COALESCE(n1b, 0) + 1 AS DOUBLE)
       |           / CAST(t + v AS DOUBLE) END))
       |      * 1073741824.0) AS BIGINT) AS fx
       |    FROM grams d
       |    LEFT JOIN uni ON d.w1 = uni.w1
       |    LEFT JOIN bi ON d.w1 = bi.w1 AND d.w2 = bi.w2
       |    LEFT JOIN n1f ON d.w1 = n1f.w1
       |    LEFT JOIN n1b ON d.w2 = n1b.w2
       |    CROSS JOIN tv)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  (CAST(CAST(SUM(fx) AS BIGINT) AS DOUBLE)
       |     / CAST(COUNT(*) AS DOUBLE)) / 1073741824.0 AS kn_nll
       |FROM sc GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // DoReMi-style domain mixture weights (TextOps.mixtureWeights): train
  // the bigram LM on the trusted slice (src0, the x_text_lmscore
  // framing), aggregate fixed-point NLL at DOMAIN grain, upweight
  // domains with excess NLL over the corpus mean — exact integer
  // arithmetic end to end, so the twin reproduces every ppm. The sc CTE
  // is the x_text_lmscore scoring chain verbatim, carried at source
  // grain (contract: TextOps.lmFixedStream — the Spark side shares the
  // identical chain between the two queries by construction).
  // ---------------------------------------------------------------------
  def xMixWeights(s: SparkSession, dir: String): DataFrame = {
    // Regroup the cached DOC-grain sums to source grain: bigrams map
    // 1:1 to (doc → source), and the fixed-point sums are exact longs,
    // so Σ_docs-of-source equals the direct source-grain aggregation
    // bit-for-bit (the lmKeySums contract).
    val d = t(s, dir, "documents")
    val per = lmDocSums(s, dir)
      .join(d.select(col("doc_id").as("_id"),
        col("source").as("_src")), Seq("_id"))
      .groupBy(col("_src").as("_id"))
      .agg(sum(col("_sfx")).as("_sfx"),
        sum(col("n_bigrams")).as("n_bigrams"))
    val nd = d.groupBy(col("source").as("_id"))
      .agg(count(lit(1)).as("n_docs"))
    TextOps.mixtureWeightsFromSums(per, nd, "source")
      .orderBy(col("source"))
  }

  val xMixWeightsSql: String =
    s"""WITH tok AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  grams AS (SELECT doc_id, source, unnest(
       |      list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS g
       |    FROM tok WHERE len(toks) >= 2),
       |  uni AS (SELECT w1, COUNT(*) AS c1 FROM (
       |      SELECT unnest(toks) AS w1 FROM tok WHERE source = 'src0')
       |    GROUP BY w1),
       |  vs AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS v FROM uni),
       |  bi AS (SELECT g, COUNT(*) AS c12 FROM grams
       |    WHERE source = 'src0' GROUP BY g),
       |  sc AS (SELECT d.source,
       |      CAST(FLOOR((0.0 - ln(
       |        (CAST(COALESCE(c12, 0) AS DOUBLE) + 1.0)
       |          / (CAST(COALESCE(c1, 0) AS DOUBLE) + v)))
       |        * 1073741824.0) AS BIGINT) AS fx
       |    FROM grams d
       |    LEFT JOIN uni ON string_split(d.g, ' ')[1] = uni.w1
       |    LEFT JOIN bi ON d.g = bi.g
       |    CROSS JOIN vs),
       |  per AS (SELECT source, CAST(SUM(fx) AS BIGINT) AS sfx,
       |      CAST(COUNT(*) AS BIGINT) AS n_bigrams
       |    FROM sc GROUP BY source),
       |  nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |    FROM documents GROUP BY source),
       |  tot AS (SELECT CAST(SUM(sfx) AS BIGINT) AS tsfx,
       |      CAST(SUM(n_bigrams) AS BIGINT) AS tnb FROM per),
       |  td AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tdn FROM nd),
       |  base AS (SELECT per.source, n_docs, n_bigrams,
       |      sfx // n_bigrams AS nll_fx,
       |      GREATEST(CAST(0 AS BIGINT),
       |        sfx // n_bigrams - tsfx // tnb) AS excess_fx,
       |      n_docs * 1000000 // tdn AS share_ppm,
       |      (n_docs * 1000000 // tdn)
       |        * (1073741824 + GREATEST(CAST(0 AS BIGINT),
       |            sfx // n_bigrams - tsfx // tnb)) AS raw
       |    FROM per JOIN nd USING (source) CROSS JOIN tot CROSS JOIN td),
       |  sr AS (SELECT CAST(SUM(raw) AS BIGINT) AS sraw FROM base)
       |SELECT source, n_docs, n_bigrams, nll_fx, excess_fx, share_ppm,
       |  CAST(CAST(raw AS HUGEINT) * 1000000 // sraw AS BIGINT)
       |    AS weight_ppm
       |FROM base CROSS JOIN sr ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Exact token-budget apportionment (Split.allocateBudget over the
  // mixture weights): Hamilton largest-remainder split of a 10⁹-token
  // budget — sum(alloc) == budget EXACTLY, every unit accounted. The
  // twin re-derives the weights (the x_mix_weights chain verbatim as a
  // CTE) and replays the quota/remainder integer algebra in HUGEINT.
  // ---------------------------------------------------------------------
  private val mixCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Seq[(String, Long)]]())
  /** Collected (source, weight_ppm) rows of [[xMixWeights]], cached
    * per (session, dir) — the weight table is driver-scale by the
    * mixtureWeights contract, so the allocator rides one collection
    * instead of re-running the corpus LM chain (the bpeCache argument
    * applied to the chain's second consumer). */
  private def mixWeightRows(s: SparkSession,
                            dir: String): Seq[(String, Long)] =
    graft.engine.SessionCaches.memo(mixCache, (s, dir))(
      xMixWeights(s, dir).select(col("source"), col("weight_ppm"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq)

  def xMixAllocate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.transform.Split.allocateBudget(
        mixWeightRows(s, dir).toDF("source", "weight_ppm"),
        "source", "weight_ppm", 1000000000L)
      .orderBy(col("source"))
  }

  val xMixAllocateSql: String =
    s"""WITH mw AS ($xMixWeightsSql),
       |  tw AS (SELECT CAST(SUM(weight_ppm) AS BIGINT) AS tw FROM mw),
       |  b AS (SELECT source, weight_ppm,
       |      CAST(weight_ppm AS HUGEINT) * 1000000000 AS q FROM mw),
       |  f AS (SELECT source, weight_ppm, q % tw AS rem,
       |      CAST((q - q % tw) // tw AS BIGINT) AS fl
       |    FROM b CROSS JOIN tw),
       |  fs AS (SELECT CAST(SUM(fl) AS BIGINT) AS fsum FROM f),
       |  rk AS (SELECT *, ROW_NUMBER() OVER
       |      (ORDER BY rem DESC, source) AS rk FROM f)
       |SELECT source, weight_ppm,
       |  fl + CASE WHEN rk <= 1000000000 - fsum THEN 1 ELSE 0 END
       |    AS alloc
       |FROM rk CROSS JOIN fs ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Duplication report: the cluster-size histogram of the near-dup
  // graph — the first number a data engineer asks of a corpus ("how
  // much duplication, in what shape?"). Sizes come from the same
  // oracled component closure as x_dedup_cc; n_docs = size × count
  // cross-checks the histogram against the corpus mass.
  // ---------------------------------------------------------------------
  def xDedupClusterSizes(s: SparkSession, dir: String): DataFrame = {
    val comps = clonedDocsComponents(s, dir)
    comps.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("cluster_size")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  val xDedupClusterSizesSql: String =
    s"""WITH $ccCtesSql
       |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
       |FROM (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |      FROM comp GROUP BY component)
       |GROUP BY cluster_size
       |ORDER BY cluster_size""".stripMargin

  // ---------------------------------------------------------------------
  // Token-budget mixture: src0 to ~half its tokens (boundary doc
  // included), src1 to a small budget, src3's budget exceeds the
  // stratum (kept whole), every other source dropped. The oracle
  // recomputes the md5-rank order and integer cumsum exactly.
  // ---------------------------------------------------------------------
  def xSampleBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
    graft.transform.Split.tokenBudgetSample(d, "source", "doc_id",
        "n_tokens",
        Map("src0" -> 700L, "src1" -> 300L, "src3" -> 5000L))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val xSampleBudgetSql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents WHERE source IN ('src0', 'src1', 'src3')),
       |  c AS (SELECT doc_id, source, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS tok_before
       |  FROM d)
       |SELECT doc_id, source, n_tokens FROM c
       |WHERE tok_before < CASE source WHEN 'src0' THEN 700
       |                               WHEN 'src1' THEN 300
       |                               WHEN 'src3' THEN 5000 END
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Leakage-safe split over the cloned corpus: every near-dup component
  // (the same minhash-0.8 graph x_dedup_cc certifies) lands in ONE
  // split, so planted clones can never straddle train/test. The oracle
  // recomputes components via the recursive-CTE closure and applies the
  // identical md5-bucket assignment to the component label.
  // ---------------------------------------------------------------------
  def xSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val corpus = clonedDocs(s, dir)
    graft.transform.Split.componentSplit(corpus, "doc_id",
        clonedDocsComponents(s, dir), Seq("test" -> 0.1, "valid" -> 0.1))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  // Bounds mirror hashSplit: ceil(0.1*256) = 26 = 0x1a cumulative,
  // ceil(0.2*256) = 52 = 0x34.
  val xSplitLeakageSql: String =
    s"""WITH $ccCtesSql
       |SELECT c.doc_id,
       |  CASE WHEN substr(md5(CAST(coalesce(comp.component, c.doc_id)
       |              AS VARCHAR)), 1, 2) < '1a' THEN 'test'
       |       WHEN substr(md5(CAST(coalesce(comp.component, c.doc_id)
       |              AS VARCHAR)), 1, 2) < '34' THEN 'valid'
       |       ELSE 'train' END AS split
       |FROM corpus c LEFT JOIN comp ON c.doc_id = comp.doc_id
       |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // SemDeDup semantic dedup over embeddings ∪ perturbed clones of the
  // first 25 (ids +10000; first coordinate +0.25 → cosine ≈ 0.97 to the
  // original, while the highest NATURAL pairwise cosine in the fixture
  // is 0.513 — clean separation around tau = 0.95). 22 of the 25
  // planted pairs land in the same sampled-centroid cell and are
  // deduped; 3 straddle a cell boundary and survive — cluster
  // blocking's documented recall trade (Abbas et al. 2023), identical
  // in both engines, so the oracle certifies exactly that behavior.
  // ---------------------------------------------------------------------
  def xDedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val pert = e.filter(col("vec_id") < 25).select(
      (col("vec_id") + 10000).as("vec_id"),
      concat(array(element_at(col("v"), 1) + lit(0.25)),
        slice(col("v"), 2, 63)).as("v"))
    // r10: size-derived centroid count (constant ~128-vector cells).
    // At the sf0.01/sf0.1 gate scales this derives the SAME k=16 as the
    // old fixed count — identical output — while a 10x corpus gets 10x
    // the cells instead of 10x the density (the r9 sf1 9.3x ratio).
    SimilarityOps.semDedupScaled(e.unionAll(pert), "vec_id", "v",
        targetCellSize = 128, minCentroids = 16, tau = 0.95)
      .select(col("vec_id"), col("cell"), col("centroid_sim"))
      .orderBy(col("vec_id"))
  }

  val xDedupSemanticSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  corpus AS (SELECT vec_id, v FROM e
      |    UNION ALL
      |    SELECT vec_id + 10000, list_concat([v[1] + 0.25], v[2:])
      |    FROM e WHERE vec_id < 25),
      |  nk AS (SELECT GREATEST(16, CAST(CEIL(COUNT(*) / 128.0)
      |      AS BIGINT)) AS k FROM corpus),
      |  cent AS (SELECT CAST(rn - 1 AS INTEGER) AS cell, cv FROM (
      |    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
      |    FROM corpus) WHERE rn <= (SELECT k FROM nk)),
      |  ad AS (SELECT c0.vec_id, c0.v, c.cell,
      |      list_dot_product(c0.v, c0.v)
      |        - 2 * list_dot_product(c0.v, c.cv)
      |        + list_dot_product(c.cv, c.cv) AS d2
      |    FROM corpus c0, cent c),
      |  asgn AS (SELECT vec_id, v, cell FROM (
      |      SELECT vec_id, v, cell,
      |        ROW_NUMBER() OVER (PARTITION BY vec_id
      |                           ORDER BY d2, cell) AS rn
      |      FROM ad) WHERE rn = 1),
      |  wcs AS (SELECT a.vec_id, a.v, a.cell,
      |      round(list_dot_product(a.v, c.cv)
      |        / (sqrt(list_dot_product(a.v, a.v))
      |           * sqrt(list_dot_product(c.cv, c.cv))), 6) AS csim
      |    FROM asgn a JOIN cent c ON a.cell = c.cell)
      |SELECT w.vec_id, w.cell, w.csim AS centroid_sim FROM wcs w
      |WHERE NOT EXISTS (SELECT 1 FROM wcs b
      |  WHERE b.cell = w.cell AND b.vec_id <> w.vec_id
      |    AND round(list_dot_product(w.v, b.v)
      |      / (sqrt(list_dot_product(w.v, w.v))
      |         * sqrt(list_dot_product(b.v, b.v))), 6) > 0.95
      |    AND (b.csim < w.csim
      |         OR (b.csim = w.csim AND b.vec_id < w.vec_id)))
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // SemDeDup with the BUCKETED assignment tier forced — the
  // beyond-broadcast form (centroid counts too large to broadcast):
  // nearest-cell assignment over LSH-bucket CANDIDATE pairs only (an
  // id-only equi-join on (table, bucket)), bucket-orphan vectors
  // resolved exactly. Same corpus and pair stage as x_dedup_semantic;
  // the oracle reproduces the seeded hyperplane buckets bit-for-bit
  // (lshBucketsSql), so the approximate assignment is itself
  // hash-checked, not just the survivor count.
  // ---------------------------------------------------------------------
  def xDedupSemanticLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val pert = e.filter(col("vec_id") < 25).select(
      (col("vec_id") + 10000).as("vec_id"),
      concat(array(element_at(col("v"), 1) + lit(0.25)),
        slice(col("v"), 2, 63)).as("v"))
    SimilarityOps.semDedupScaled(e.unionAll(pert), "vec_id", "v",
        targetCellSize = 128, minCentroids = 16, tau = 0.95,
        assignMode = "bucketed", dim = 64, bits = 4, tables = 8,
        seed = 42L)
      .select(col("vec_id"), col("cell"), col("centroid_sim"))
      .orderBy(col("vec_id"))
  }

  val xDedupSemanticLshSql: String = {
    val perTable = lshBucketsSql(dim = 64, bits = 4, tables = 8,
      seed = 42L)
    s"""WITH raw AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  e AS (SELECT vec_id, v FROM raw
       |    UNION ALL
       |    SELECT vec_id + 10000, list_concat([v[1] + 0.25], v[2:])
       |    FROM raw WHERE vec_id < 25),
       |  nk AS (SELECT GREATEST(16, CAST(CEIL(COUNT(*) / 128.0)
       |      AS BIGINT)) AS k FROM e),
       |  cent AS (SELECT vec_id AS cid, CAST(rn - 1 AS INTEGER) AS cell,
       |      cv FROM (
       |    SELECT vec_id, v AS cv, ROW_NUMBER() OVER (ORDER BY vec_id)
       |        AS rn
       |    FROM e) WHERE rn <= (SELECT k FROM nk)),
       |  eb AS ($perTable),
       |  centb AS (SELECT c.cell, b.tbl, b.bkt
       |    FROM eb b JOIN cent c ON b.vec_id = c.cid),
       |  cand AS (SELECT DISTINCT b.vec_id, c.cell
       |    FROM eb b JOIN centb c ON b.tbl = c.tbl AND b.bkt = c.bkt),
       |  scored AS (SELECT cand.vec_id, cand.cell,
       |      list_dot_product(cv0.v, cv0.v)
       |        - 2 * list_dot_product(cv0.v, ct.cv)
       |        + list_dot_product(ct.cv, ct.cv) AS d2
       |    FROM cand JOIN e cv0 ON cv0.vec_id = cand.vec_id
       |    JOIN cent ct ON ct.cell = cand.cell),
       |  asgn_c AS (SELECT vec_id, cell FROM (
       |      SELECT vec_id, cell,
       |        ROW_NUMBER() OVER (PARTITION BY vec_id
       |                           ORDER BY d2, cell) AS rn
       |      FROM scored) WHERE rn = 1),
       |  orph AS (SELECT vec_id, v FROM e
       |    WHERE vec_id NOT IN (SELECT vec_id FROM asgn_c)),
       |  fb AS (SELECT vec_id, cell FROM (
       |      SELECT o.vec_id, c.cell,
       |        ROW_NUMBER() OVER (PARTITION BY o.vec_id ORDER BY
       |          list_dot_product(o.v, o.v)
       |            - 2 * list_dot_product(o.v, c.cv)
       |            + list_dot_product(c.cv, c.cv), c.cell) AS rn
       |      FROM orph o, cent c) WHERE rn = 1),
       |  asgn AS (SELECT vec_id, cell FROM asgn_c
       |    UNION ALL SELECT vec_id, cell FROM fb),
       |  wcs AS (SELECT a.vec_id, e.v, a.cell,
       |      round(list_dot_product(e.v, c.cv)
       |        / (sqrt(list_dot_product(e.v, e.v))
       |           * sqrt(list_dot_product(c.cv, c.cv))), 6) AS csim
       |    FROM asgn a JOIN e ON e.vec_id = a.vec_id
       |    JOIN cent c ON a.cell = c.cell)
       |SELECT w.vec_id, w.cell, w.csim AS centroid_sim FROM wcs w
       |WHERE NOT EXISTS (SELECT 1 FROM wcs b
       |  WHERE b.cell = w.cell AND b.vec_id <> w.vec_id
       |    AND round(list_dot_product(w.v, b.v)
       |      / (sqrt(list_dot_product(w.v, w.v))
       |         * sqrt(list_dot_product(b.v, b.v))), 6) > 0.95
       |    AND (b.csim < w.csim
       |         OR (b.csim = w.csim AND b.vec_id < w.vec_id)))
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // BM25 full-text retrieval: top-5 documents per query for a fixed
  // 4-query batch over the documents corpus. Hash-exact vs DuckDB by
  // construction — dyadic k1/b, graft_ln (platform-libm idf), and the
  // exact fixed-point (floor(score*2^30) BIGINT) cross-term sum; see
  // TextOps.bm25TopK's scaladoc for the full determinism argument.
  // ---------------------------------------------------------------------
  private val bm25Queries = Seq(
    ("q_hash_join", "hash join table"),
    ("q_window_sort", "window sort order stream"),
    ("q_vector_scan", "vector scan filter"),
    ("q_customer", "customer query group data"))

  def xTextBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = bm25Queries.toDF("qid", "qtext")
    TextOps.bm25TopK(t(s, dir, "documents"), qs,
        "doc_id", "text", "qid", "qtext", k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  val xTextBm25Sql: String = {
    val qvals = bm25Queries
      .map { case (q, txt) => s"('$q', '$txt')" }.mkString(", ")
    // Arithmetic (in the shared bm25ScoreCtesSql chain) mirrors the
    // Scala expression tree ASSOCIATION exactly (left-assoc products,
    // same cast points) — the doubles are then bit-identical and the
    // floored fixed-point sums hash-equal.
    s"""WITH q(qid, qtext) AS (VALUES $qvals),
       |  $bm25ScoreCtesSql,
       |  agg AS (SELECT qid, doc_id, CAST(SUM(fx) AS BIGINT) AS sfx,
       |      CAST(COUNT(*) AS BIGINT) AS n_terms
       |    FROM sc GROUP BY qid, doc_id),
       |  r AS (SELECT qid, doc_id, sfx, n_terms,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY sfx DESC, doc_id) AS rnk
       |    FROM agg)
       |SELECT qid, CAST(rnk AS INTEGER) AS rnk, doc_id,
       |  CAST(sfx AS DOUBLE) / 1073741824.0 AS score, n_terms
       |FROM r WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Lexical diversity per source: distinct-1 / distinct-2 ratios
  // (Li et al. 2016) — template spam scores near 0.
  // ---------------------------------------------------------------------
  def xTextDiversity(s: SparkSession, dir: String): DataFrame =
    TextOps.distinctNgramRatios(t(s, dir, "documents"), "source",
        "text")
      .orderBy(col("source"))

  val xTextDiversitySql: String =
    s"""WITH tok AS (SELECT source, $toksSql AS toks FROM documents),
       |  u AS (SELECT source, unnest(toks) AS gram FROM tok),
       |  b AS (SELECT source, unnest(list_transform(
       |      range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))
       |      AS gram FROM tok WHERE len(toks) >= 2),
       |  t1 AS (SELECT source, CAST(COUNT(*) AS BIGINT)
       |      AS total_1gram FROM u GROUP BY source),
       |  d1 AS (SELECT source, CAST(COUNT(*) AS BIGINT)
       |      AS distinct_1gram
       |    FROM (SELECT DISTINCT source, gram FROM u) GROUP BY source),
       |  t2 AS (SELECT source, CAST(COUNT(*) AS BIGINT)
       |      AS total_2gram FROM b GROUP BY source),
       |  d2 AS (SELECT source, CAST(COUNT(*) AS BIGINT)
       |      AS distinct_2gram
       |    FROM (SELECT DISTINCT source, gram FROM b) GROUP BY source)
       |SELECT source, total_1gram, distinct_1gram,
       |  CAST(distinct_1gram AS DOUBLE) / CAST(total_1gram AS DOUBLE)
       |    AS distinct_1,
       |  total_2gram, distinct_2gram,
       |  CAST(distinct_2gram AS DOUBLE) / CAST(total_2gram AS DOUBLE)
       |    AS distinct_2
       |FROM t1 JOIN d1 USING (source) LEFT JOIN t2 USING (source)
       |LEFT JOIN d2 USING (source)
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Markov transition statistics: consecutive event-type pairs per
  // user in (ts, event_id) order — the behavioral-model training
  // table; |types|² output rows.
  // ---------------------------------------------------------------------
  def xEventsMarkov(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.transitionCounts(t(s, dir, "events"), "user_id",
        "ts", "event_id", "event_type")
      .orderBy(col("prev_type"), col("next_type"))

  val xEventsMarkovSql: String =
    """WITH seq AS (SELECT user_id, event_type AS next_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      |FROM seq WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY prev_type, next_type""".stripMargin

  // ---------------------------------------------------------------------
  // PageRank over the transition graph (EventOps.stationaryRank): 8
  // power-iteration rounds at damping 0.85, exact ppm integer
  // arithmetic — the twin materializes every round as its own CTE pair
  // (contrib + dangling mass) and replays the identical floors, the
  // BPE-oracle discipline for driver-loop operators.
  // ---------------------------------------------------------------------
  def xEventsPagerank(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.stationaryRank(t(s, dir, "events"), "user_id",
        "ts", "event_id", "event_type", alphaPct = 85, rounds = 8)
      .orderBy(desc("rank_ppm"), col("event_type"))

  val xEventsPagerankSql: String = {
    val roundCtes = (1 to 8).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
         |      CAST(SUM((85 * rk * w) // 100000000) AS BIGINT) AS c
         |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |    GROUP BY 1),
         |  d$i AS (SELECT CAST(COALESCE(SUM(rk), 0) AS BIGINT) AS dm
         |    FROM r${i - 1} WHERE node NOT IN (SELECT src FROM e)),
         |  r$i AS (SELECT nodes.node,
         |      (15 * 1000000) // (100 * nn.n) + COALESCE(c, 0)
         |        + (85 * dm) // (100 * nn.n) AS rk
         |    FROM nodes CROSS JOIN nn CROSS JOIN d$i
         |    LEFT JOIN c$i ON c$i.node = nodes.node)""".stripMargin
    }.mkString(",\n  ")
    s"""WITH seq AS (SELECT user_id, event_type AS next_type,
       |    LAG(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |  tc AS (SELECT prev_type, next_type,
       |      CAST(COUNT(*) AS BIGINT) AS n
       |    FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |  nodes AS (SELECT prev_type AS node FROM tc
       |    UNION SELECT next_type FROM tc),
       |  nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |  ow AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS o
       |    FROM tc GROUP BY 1),
       |  e AS (SELECT prev_type AS src, next_type AS dst,
       |      n * 1000000 // o AS w FROM tc JOIN ow USING (prev_type)),
       |  r0 AS (SELECT node, 1000000 // nn.n AS rk
       |    FROM nodes CROSS JOIN nn),
       |  $roundCtes
       |SELECT node AS event_type, CAST(rk AS BIGINT) AS rank_ppm
       |FROM r8 ORDER BY rank_ppm DESC, event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Training-sequence assembly: per-(user, day) ordered event-type
  // chains — one shuffle on the grouping the trainer reads anyway;
  // ordering pinned by the unique (ts, event_id) prefix.
  // ---------------------------------------------------------------------
  def xEventsSequences(s: SparkSession, dir: String): DataFrame =
    graft.ext.EventOps.userSequences(t(s, dir, "events"), "user_id",
        "ts", "event_id", "event_type")
      .orderBy(col("user_id"), col("day"))

  val xEventsSequencesSql: String =
    """SELECT user_id, CAST(ts AS DATE) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
      |FROM events GROUP BY user_id, CAST(ts AS DATE)
      |ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------------
  // Mutual-kNN pair mining (both directions in each other's top-5):
  // the reciprocity join over the brute-force lists; each surviving
  // pair appears once (id_a < id_b) with both ranks.
  // ---------------------------------------------------------------------
  /** Bounded like the other brute-force baseline queries (x_sim_topk
    * contract): the exact all-pairs tier runs over vecs 0-999; the
    * production path is the same mutuality join over ANN lists. */
  def xEmbedMutual(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.mutualTopK(
        t(s, dir, "embeddings").filter(col("vec_id") < 1000), "vec_id",
        "embedding", k = 5)
      .orderBy(col("id_a"), col("id_b"))

  val xEmbedMutualSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id < 1000),
      |  sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      round(list_dot_product(q.v, c.v)
      |        / (sqrt(list_dot_product(q.v, q.v))
      |           * sqrt(list_dot_product(c.v, c.v))), 6) AS score
      |    FROM e q, e c WHERE q.vec_id <> c.vec_id),
      |  r AS (SELECT query_id, neighbor_id, score,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY score DESC, neighbor_id) AS rnk
      |    FROM sc QUALIFY rnk <= 5)
      |SELECT a.query_id AS id_a, a.neighbor_id AS id_b,
      |  CAST(a.rnk AS INTEGER) AS rnk_ab,
      |  CAST(b.rnk AS INTEGER) AS rnk_ba, a.score
      |FROM r a JOIN r b
      |  ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
      |WHERE a.query_id < a.neighbor_id
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // Mutual-kNN over ANN lists — THE production tier (no |C|² scan):
  // the identical reciprocity join, but over LSH-bucketed candidate
  // lists. Run on the same bounded slice as the exact tier so the two
  // CORRECTNESS rows grade the same pair-mining task at both tiers.
  // ---------------------------------------------------------------------
  def xEmbedMutualAnn(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.mutualTopKAnn(
        t(s, dir, "embeddings").filter(col("vec_id") < 1000), "vec_id",
        "embedding", k = 5, dim = 64, bits = 4, tables = 8)
      .orderBy(col("id_a"), col("id_b"))

  /** Full DuckDB twin of [[xEmbedMutualAnn]]: generated LSH buckets
    * ([[lshBucketsSql]] — plan-literal hyperplanes), candidate join,
    * exact-cosine rerank, then the reciprocity join — the 100 TB
    * mutual-mining path is hash-checkable end to end, not rows-only. */
  val xEmbedMutualAnnSql: String = {
    val perTable = lshBucketsSql(dim = 64, bits = 4, tables = 8,
      seed = 42L)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < 1000),
       |  eb AS ($perTable),
       |  cand AS (SELECT DISTINCT q.vec_id AS query_id,
       |      c.vec_id AS neighbor_id
       |    FROM eb q JOIN eb c ON q.tbl = c.tbl AND q.bkt = c.bkt
       |    WHERE c.vec_id <> q.vec_id),
       |  sc AS (SELECT query_id, neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM cand
       |    JOIN e qv ON qv.vec_id = cand.query_id
       |    JOIN e cv ON cv.vec_id = cand.neighbor_id),
       |  r AS (SELECT query_id, neighbor_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM sc QUALIFY rnk <= 5)
       |SELECT a.query_id AS id_a, a.neighbor_id AS id_b,
       |  CAST(a.rnk AS INTEGER) AS rnk_ab,
       |  CAST(b.rnk AS INTEGER) AS rnk_ba, a.score
       |FROM r a JOIN r b
       |  ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
       |WHERE a.query_id < a.neighbor_id
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Hard-negative mining over ANN candidates — the production tier:
  // LSH lists oversampled to k·4 per query, label-filtered, re-ranked
  // to k. Same query slice as the exact tier (vec_id < 20 vs the full
  // corpus), so recall loss vs x_embed_negatives is directly visible.
  // ---------------------------------------------------------------------
  def xEmbedNegativesAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.hardNegativesAnn(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", "label", k = 3, dim = 64, bits = 4,
        tables = 8, oversample = 4)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Full DuckDB twin of [[xEmbedNegativesAnn]]: generated buckets over
    * the whole corpus, query side restricted in the candidate join,
    * rank ≤ k·oversample BEFORE the label filter (the order matters —
    * a same-label hit occupies a candidate slot), then the final
    * re-rank to k. */
  val xEmbedNegativesAnnSql: String = {
    val perTable = lshBucketsSql(dim = 64, bits = 4, tables = 8,
      seed = 42L)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  eb AS ($perTable),
       |  cand AS (SELECT DISTINCT q.vec_id AS query_id,
       |      c.vec_id AS neighbor_id
       |    FROM eb q JOIN eb c ON q.tbl = c.tbl AND q.bkt = c.bkt
       |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |  sc AS (SELECT query_id, neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM cand
       |    JOIN e qv ON qv.vec_id = cand.query_id
       |    JOIN e cv ON cv.vec_id = cand.neighbor_id),
       |  r AS (SELECT query_id, neighbor_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM sc QUALIFY rnk <= 12),
       |  flt AS (SELECT r.query_id, r.neighbor_id, r.score
       |    FROM r JOIN embeddings ql ON ql.vec_id = r.query_id
       |    JOIN embeddings cl ON cl.vec_id = r.neighbor_id
       |    WHERE ql.label <> cl.label),
       |  r2 AS (SELECT query_id, neighbor_id, score,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, neighbor_id) AS rnk
       |    FROM flt QUALIFY rnk <= 3)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, score
       |FROM r2 ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // PSI feature drift (population stability index) between two corpus
  // slices on a numeric column, fixed bucket edges as plan literals;
  // add-one smoothing keeps empty buckets finite; fixed-point sum +
  // graft_ln make the index engine-exact.
  // ---------------------------------------------------------------------
  def xFeaturePsi(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextOps.featurePsi(
      docs.filter(col("source") === "src0"),
      docs.filter(col("source") === "src1"),
      "n_chars", edges = Seq(100.0, 200.0, 300.0, 500.0))
  }

  val xFeaturePsiSql: String =
    """WITH a AS (SELECT n_chars FROM documents
      |    WHERE source = 'src0' AND n_chars IS NOT NULL),
      |  b AS (SELECT n_chars FROM documents
      |    WHERE source = 'src1' AND n_chars IS NOT NULL),
      |  ba AS (SELECT CASE WHEN n_chars < 100 THEN 0
      |      WHEN n_chars < 200 THEN 1 WHEN n_chars < 300 THEN 2
      |      WHEN n_chars < 500 THEN 3 ELSE 4 END AS bkt FROM a),
      |  bb AS (SELECT CASE WHEN n_chars < 100 THEN 0
      |      WHEN n_chars < 200 THEN 1 WHEN n_chars < 300 THEN 2
      |      WHEN n_chars < 500 THEN 3 ELSE 4 END AS bkt FROM b),
      |  ca AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS na FROM ba
      |    GROUP BY bkt),
      |  cb AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS nb FROM bb
      |    GROUP BY bkt),
      |  tots AS (SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS ta,
      |      CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS tb),
      |  grid AS (SELECT CAST(i AS INTEGER) AS bkt FROM range(5) r(i)),
      |  j AS (SELECT grid.bkt, COALESCE(na, 0) + 1 AS na1,
      |      COALESCE(nb, 0) + 1 AS nb1, ta + 5 AS ta1, tb + 5 AS tb1
      |    FROM grid LEFT JOIN ca USING (bkt) LEFT JOIN cb USING (bkt)
      |    CROSS JOIN tots),
      |  terms AS (SELECT bkt,
      |      (CAST(na1 AS DOUBLE) / CAST(ta1 AS DOUBLE)
      |        - CAST(nb1 AS DOUBLE) / CAST(tb1 AS DOUBLE))
      |      * ln((CAST(na1 AS DOUBLE) / CAST(ta1 AS DOUBLE))
      |            / (CAST(nb1 AS DOUBLE) / CAST(tb1 AS DOUBLE)))
      |        AS term
      |    FROM j)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
      |  CAST(SUM(CAST(FLOOR(term * 1099511627776.0) AS BIGINT))
      |    AS BIGINT) AS psi_fx,
      |  CAST(SUM(CAST(FLOOR(term * 1099511627776.0) AS BIGINT))
      |    AS DOUBLE) / 1099511627776.0 AS psi
      |FROM terms""".stripMargin

  // ---------------------------------------------------------------------
  // Quality-classifier inference: fixed trained weights as plan
  // literals over exact-integer features; keep = sign of the linear
  // score (≡ sigmoid > 0.5). One narrow projection.
  // ---------------------------------------------------------------------
  def xQualityClassify(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityClassify(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_tokens"), col("stop_hits"),
        col("distinct_tokens"), col("digit_tokens"), col("clf_score"),
        col("keep"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------------
  // Cross-corpus bigram novelty: each non-src0 source scored by how
  // many of its distinct bigrams never occur in src0 — set-cardinality
  // identity (hash-invariant), integer-ppm ratio.
  // ---------------------------------------------------------------------
  def xNgramNovelty(s: SparkSession, dir: String): DataFrame =
    TextOps.ngramNovelty(t(s, dir, "documents"), "source", "text",
        refValue = "src0", n = 2)
      .orderBy(col("source"))

  val xNgramNoveltySql: String =
    s"""WITH tok AS (SELECT source, $toksSql AS toks FROM documents),
       |  big AS (SELECT source,
       |      unnest(list_transform(range(1, len(toks)),
       |        i -> toks[i] || ' ' || toks[i+1])) AS gm
       |    FROM tok WHERE len(toks) >= 2),
       |  refg AS (SELECT DISTINCT gm FROM big WHERE source = 'src0'),
       |  newg AS (SELECT DISTINCT source, gm FROM big
       |    WHERE source <> 'src0'),
       |  tot AS (SELECT source, CAST(COUNT(*) AS BIGINT)
       |      AS distinct_grams FROM newg GROUP BY source),
       |  nov AS (SELECT source, CAST(COUNT(*) AS BIGINT)
       |      AS novel_grams FROM newg
       |    WHERE gm NOT IN (SELECT gm FROM refg) GROUP BY source),
       |  srcs AS (SELECT DISTINCT source FROM documents
       |    WHERE source <> 'src0'),
       |  f AS (SELECT srcs.source, distinct_grams,
       |      CASE WHEN distinct_grams IS NOT NULL
       |        THEN COALESCE(novel_grams, 0) END AS novel_grams
       |    FROM srcs LEFT JOIN tot USING (source)
       |    LEFT JOIN nov USING (source))
       |SELECT source, distinct_grams, novel_grams,
       |  (novel_grams * 1000000) // distinct_grams AS novelty_ppm
       |FROM f ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Token-distribution entropy per document (fixed-point Shannon H) —
  // the continuous repetition signal; near-zero = template spam.
  // ---------------------------------------------------------------------
  def xTextEntropy(s: SparkSession, dir: String): DataFrame =
    TextOps.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  val xTextEntropySql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tk
       |    FROM documents),
       |  cnt AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c
       |    FROM tok GROUP BY doc_id, tk),
       |  per AS (SELECT doc_id,
       |      CAST(SUM(c) AS BIGINT) AS n,
       |      CAST(COUNT(*) AS BIGINT) AS d,
       |      CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE)
       |          * ln(CAST(c AS DOUBLE)) * 1073741824.0) AS BIGINT))
       |        AS BIGINT) AS sfx
       |    FROM cnt GROUP BY doc_id),
       |  f AS (SELECT docs.doc_id,
       |      COALESCE(n, 0) AS n_tokens,
       |      COALESCE(d, 0) AS distinct_tokens,
       |      COALESCE(CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1073741824.0)
       |          AS BIGINT) - sfx // n, 0) AS entropy_fx
       |    FROM documents docs LEFT JOIN per ON docs.doc_id = per.doc_id)
       |SELECT doc_id, n_tokens, distinct_tokens, entropy_fx,
       |  CAST(entropy_fx AS DOUBLE) / 1073741824.0 AS entropy
       |FROM f ORDER BY doc_id""".stripMargin

  /** The fixed-weight classifier score over a `toks` list column —
    * shared verbatim by the quality-classify and top-fraction oracles
    * so the two twins cannot drift. */
  private val clfScoreSql: String =
    """-40 + 3 * len(list_filter(toks, x -> list_contains(
      |      ['the','a','an','and','or','of','to','in','is','it'], x)))
      |    + 1 * len(list_distinct(toks))
      |    - 2 * len(list_filter(toks,
      |        x -> regexp_full_match(x, '[0-9]+')))
      |    - 1 * GREATEST(0, len(toks) - 150)""".stripMargin

  val xQualityClassifySql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(toks, x -> list_contains(
       |    ['the','a','an','and','or','of','to','in','is','it'], x)))
       |    AS BIGINT) AS stop_hits,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_tokens,
       |  CAST(len(list_filter(toks,
       |    x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT)
       |    AS digit_tokens,
       |  CAST($clfScoreSql AS BIGINT) AS clf_score,
       |  ($clfScoreSql) > 0 AS keep
       |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Quantile normalization of the classifier score per source
  // (Sanitize.quantileNormalize): each doc's score remaps to the
  // POOLED score at the same relative rank, so per-source
  // distributions become comparable before any global threshold.
  // Window-free two-pass ranks; the twin replays both rank passes +
  // the HUGEINT target-rank algebra.
  // ---------------------------------------------------------------------
  def xQualityQnorm(s: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.qualityClassify(t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("source"), col("clf_score"))
    graft.transform.Sanitize.quantileNormalize(scored, "source",
        "doc_id", "clf_score")
      .select(col("doc_id"), col("source"), col("clf_score"),
        col("grp_rank"), col("n_group"), col("norm_score"))
      .orderBy(col("doc_id"))
  }

  val xQualityQnormSql: String =
    s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  t AS (SELECT doc_id, source,
       |      CAST($clfScoreSql AS BIGINT) AS clf_score FROM tk),
       |  r AS (SELECT clf_score AS norm_score, ROW_NUMBER() OVER (
       |      ORDER BY clf_score, doc_id) AS prk FROM t),
       |  n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM t),
       |  g AS (SELECT *,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY clf_score, doc_id) AS BIGINT) AS grp_rank,
       |      CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
       |        AS n_group
       |    FROM t),
       |  m AS (SELECT g.*,
       |      CAST((CAST(grp_rank AS HUGEINT) * nn + n_group - 1)
       |        // n_group AS BIGINT) AS trk
       |    FROM g CROSS JOIN n)
       |SELECT doc_id, source, clf_score, grp_rank, n_group, norm_score
       |FROM m JOIN r ON r.prk = m.trk ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Naive Bayes quality classifier TRAINED in-engine: trusted slice
  // (lang = 'en') vs rest, per-token fixed-point log-odds, per-doc
  // score = prior + Σ occurrence weights, keep = score > 0. The twin
  // retrains the identical counts on token strings and replays the
  // ln/floor algebra bit-for-bit.
  // ---------------------------------------------------------------------
  /** NB-scored corpus, computed ONCE per (session, dir) and shared by
    * `x_quality_nb` and `x_quality_auc` (the ccCache/bpeCache
    * argument: the scoring chain is the expensive subtree and its
    * input is immutable within a session). Checkpoint-backed, so
    * reuse replays no lineage. */
  private val nbCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]())
  private def nbScored(s: SparkSession, dir: String): DataFrame =
    graft.engine.SessionCaches.memo(nbCache, (s, dir))(
      graft.engine.Engine.materialize(
        TextOps.nbQualityScore(t(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en")))

  def xQualityNb(s: SparkSession, dir: String): DataFrame =
    nbScored(s, dir).orderBy(col("doc_id"))

  /** Shared NB scoring chain (contract in [[TextOps.nbQualityScore]]):
    * yields `nbscored(doc_id, pos, n_tokens, score_fx)` — used
    * verbatim by BOTH the classifier oracle and the AUC oracle so the
    * twins cannot drift. */
  private val nbScoreCtesSql: String =
    s"""b AS (SELECT doc_id, (lang = 'en') AS pos, text
       |    FROM documents),
       |  tk AS (SELECT doc_id, pos, unnest($toksSql) AS tkn FROM b),
       |  cnt AS (SELECT tkn,
       |      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |      CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
       |    FROM tk GROUP BY tkn),
       |  tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
       |      CAST(SUM(cp) AS BIGINT) AS np,
       |      CAST(SUM(cn) AS BIGINT) AS nn FROM cnt),
       |  nd AS (SELECT
       |      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS dp,
       |      CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS dn
       |    FROM b),
       |  lam AS (SELECT tkn, CAST(FLOOR(
       |      (ln(CAST(cp + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))
       |       - ln(CAST(cn + 1 AS DOUBLE) / CAST(nn + v AS DOUBLE)))
       |      * 1073741824.0) AS BIGINT) AS lam
       |    FROM cnt CROSS JOIN tot),
       |  sc AS (SELECT doc_id, CAST(SUM(lam) AS BIGINT) AS sl,
       |      CAST(COUNT(*) AS BIGINT) AS n_tokens
       |    FROM tk JOIN lam USING (tkn) GROUP BY doc_id),
       |  pr AS (SELECT CAST(FLOOR(
       |      (ln(CAST(dp AS DOUBLE)) - ln(CAST(dn AS DOUBLE)))
       |      * 1073741824.0) AS BIGINT) AS prior FROM nd),
       |  nbscored AS (SELECT b.doc_id, b.pos,
       |      COALESCE(n_tokens, 0) AS n_tokens,
       |      prior + COALESCE(sl, 0) AS score_fx
       |    FROM b LEFT JOIN sc USING (doc_id) CROSS JOIN pr)""".stripMargin

  val xQualityNbSql: String =
    s"""WITH $nbScoreCtesSql
       |SELECT doc_id, n_tokens, score_fx, score_fx > 0 AS keep
       |FROM nbscored ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Exact ROC AUC of the NB quality score against the trusted labels
  // (Profile.aucExact): the Mann-Whitney rank identity with exact
  // integer midranks — no curve discretization, no score collection,
  // no window. The twin re-derives the scores (shared nbscored CTE)
  // and replays the rank/midrank/HUGEINT algebra.
  // ---------------------------------------------------------------------
  def xQualityAuc(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scored = nbScored(s, dir)
      .join(d.select(col("doc_id"), (col("lang") === "en").as("label")),
        Seq("doc_id"))
    graft.transform.Profile.aucExact(scored, "score_fx", "doc_id",
      "label")
  }

  val xQualityAucSql: String =
    s"""WITH $nbScoreCtesSql,
       |  r AS (SELECT pos, score_fx, ROW_NUMBER() OVER (
       |      ORDER BY score_fx, doc_id) AS rk FROM nbscored),
       |  runs AS (SELECT score_fx, MIN(rk) AS f, MAX(rk) AS l
       |    FROM r GROUP BY score_fx),
       |  agg AS (SELECT
       |      CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
       |        AS n_pos,
       |      CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
       |        AS n_neg,
       |      SUM(CASE WHEN pos THEN CAST(f + l AS HUGEINT)
       |          ELSE 0 END) AS r2
       |    FROM r JOIN runs USING (score_fx))
       |SELECT n_pos, n_neg,
       |  CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
       |    AS u2,
       |  CAST((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
       |    // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
       |    AS auc_ppm
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------------
  // Label-noise candidates (confident-disagreement screen, the
  // first-order form of Northcutt's confident learning): docs whose
  // trusted label the classifier CONFIDENTLY contradicts — positives
  // in the BOTTOM score decile, negatives in the TOP. Deciles come
  // from the NTILE-exact integer tile machinery, NOT an interpolated
  // percentile threshold: a float bound used for set membership can
  // flip tied rows across engines by one ulp (review catch), whereas
  // the (score, id)-ranked tile is a pure integer and bit-stable.
  // These are the rows a curation pass re-audits first.
  // ---------------------------------------------------------------------
  def xQualityLabelNoise(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scored = nbScored(s, dir)
      .join(d.select(col("doc_id"), (col("lang") === "en").as("label")),
        Seq("doc_id"))
    TextOps.scoreTiles(scored, "doc_id", "score_fx", k = 10)
      .withColumn("noise_side",
        when(col("label") && col("tile") === 1,
          lit("labeled_pos_scored_neg"))
          .when(!col("label") && col("tile") === 10,
            lit("labeled_neg_scored_pos")))
      .filter(col("noise_side").isNotNull)
      .select(col("doc_id"), col("label"), col("score_fx"),
        col("tile"), col("noise_side"))
      .orderBy(col("doc_id"))
  }

  val xQualityLabelNoiseSql: String =
    s"""WITH $nbScoreCtesSql,
       |  lt AS (SELECT doc_id, pos, score_fx,
       |      NTILE(10) OVER (ORDER BY score_fx, doc_id) AS tile
       |    FROM nbscored)
       |SELECT doc_id, pos AS label, score_fx,
       |  CAST(tile AS INTEGER) AS tile,
       |  CASE WHEN pos AND tile = 1 THEN 'labeled_pos_scored_neg'
       |    ELSE 'labeled_neg_scored_pos' END AS noise_side
       |FROM lt
       |WHERE (pos AND tile = 1) OR (NOT pos AND tile = 10)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Confusion matrix + precision/recall/F1 of the NB gate at its
  // natural threshold (score > 0), in exact ppm — ONE aggregate over
  // the cached scored frame. F1 = 2TP*1e6 div (2TP+FP+FN) exactly.
  // ---------------------------------------------------------------------
  def xQualityConfusion(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    nbScored(s, dir)
      .join(d.select(col("doc_id"), (col("lang") === "en").as("label")),
        Seq("doc_id"))
      .agg(
        sum(when(col("keep") && col("label"), 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("keep") && !col("label"), 1L).otherwise(0L))
          .as("fp"),
        sum(when(!col("keep") && col("label"), 1L).otherwise(0L))
          .as("fn"),
        sum(when(!col("keep") && !col("label"), 1L).otherwise(0L))
          .as("tn"))
      // Denominator guards (r11 advice): a gate that keeps nothing
      // (tp+fp=0) or a corpus with no positives (tp+fn=0) must yield
      // NULL ratios, not an ANSI divide-by-zero. Twin mirrors the CASE.
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("case when tp + fp > 0 then tp * 1000000 div (tp + fp) end")
          .as("precision_ppm"),
        expr("case when tp + fn > 0 then tp * 1000000 div (tp + fn) end")
          .as("recall_ppm"),
        expr("case when 2 * tp + fp + fn > 0 then" +
          " 2 * tp * 1000000 div (2 * tp + fp + fn) end").as("f1_ppm"))
  }

  val xQualityConfusionSql: String =
    s"""WITH $nbScoreCtesSql,
       |  cm AS (SELECT
       |      CAST(SUM(CASE WHEN score_fx > 0 AND pos
       |        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |      CAST(SUM(CASE WHEN score_fx > 0 AND NOT pos
       |        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |      CAST(SUM(CASE WHEN score_fx <= 0 AND pos
       |        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |      CAST(SUM(CASE WHEN score_fx <= 0 AND NOT pos
       |        THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |    FROM nbscored)
       |SELECT tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0
       |    THEN tp * 1000000 // (tp + fp) END AS precision_ppm,
       |  CASE WHEN tp + fn > 0
       |    THEN tp * 1000000 // (tp + fn) END AS recall_ppm,
       |  CASE WHEN 2 * tp + fp + fn > 0
       |    THEN 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_ppm
       |FROM cm""".stripMargin

  // ---------------------------------------------------------------------
  // Calibration table (reliability diagram) of the NB score: score
  // deciles via the NTILE-exact window-free tile machinery, per-tile
  // positive rate in exact ppm — monotone pos_ppm across tiles is the
  // "ranking is informative" read, pos_ppm vs score the calibration
  // read. Shares the cached scored frame with x_quality_nb/_auc.
  // ---------------------------------------------------------------------
  def xQualityCalibration(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scored = nbScored(s, dir)
      .join(d.select(col("doc_id"), (col("lang") === "en").as("label")),
        Seq("doc_id"))
    TextOps.scoreTiles(scored, "doc_id", "score_fx", k = 10)
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        min(col("score_fx")).as("min_score_fx"),
        max(col("score_fx")).as("max_score_fx"))
      .withColumn("pos_ppm", expr("n_pos * 1000000 div n"))
      .orderBy(col("tile"))
  }

  val xQualityCalibrationSql: String =
    s"""WITH $nbScoreCtesSql,
       |  lt AS (SELECT doc_id, pos, score_fx,
       |      NTILE(10) OVER (ORDER BY score_fx, doc_id) AS tile
       |    FROM nbscored)
       |SELECT CAST(tile AS INTEGER) AS tile,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(MIN(score_fx) AS BIGINT) AS min_score_fx,
       |  CAST(MAX(score_fx) AS BIGINT) AS max_score_fx,
       |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000
       |    // COUNT(*) AS BIGINT) AS pos_ppm
       |FROM lt GROUP BY tile ORDER BY tile""".stripMargin

  // ---------------------------------------------------------------------
  // Per-source quality gate: keep the top 30% of each source by
  // classifier score (exact integer ceil cut, rank ties by doc_id) —
  // the per-domain curation step a global threshold gets wrong.
  // ---------------------------------------------------------------------
  def xQualityTopfrac(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityTopFraction(t(s, dir, "documents"), "doc_id", "text",
        "source", keepPpm = 300000L)
      .orderBy(col("source"), col("src_rank"))

  val xQualityTopfracSql: String =
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks
       |    FROM documents),
       |  sc AS (SELECT doc_id, source,
       |      CAST($clfScoreSql AS BIGINT) AS clf_score FROM t),
       |  r AS (SELECT doc_id, source, clf_score,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY source
       |          ORDER BY clf_score DESC, doc_id) AS BIGINT)
       |        AS src_rank,
       |      CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
       |        AS n_group
       |    FROM sc)
       |SELECT doc_id, source, clf_score, src_rank, n_group,
       |  src_rank <= (n_group * 300000 + 999999) // 1000000 AS kept
       |FROM r ORDER BY source, src_rank""".stripMargin

  // ---------------------------------------------------------------------
  // Triangle census of the cosine similarity graph
  // (GraphOps.triangleStats): edges = round-6 cosine >= 0.2 pairs over
  // the bounded vec_id < 200 slice (the exact-tier posture — the
  // operator itself takes ANY edge table); per-node triangle counts +
  // exact integer clustering coefficient. The twin enumerates each
  // id-ordered triangle once and replays the ppm algebra in HUGEINT.
  // ---------------------------------------------------------------------
  /** Cosine ≥ 0.2 similarity edges over the bounded vec_id < 200
    * slice — the shared fixture graph of the graph-ops queries. */
  private def cosineEdges(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").filter(col("vec_id") < 200)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("_va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("_vb"))
    a.join(b, col("ia") < col("ib"))
      .filter(round(SimilarityOps.cosine(col("_va"), col("_vb")), 6)
        >= 0.2)
      .select(col("ia"), col("ib"))
  }

  /** DuckDB form of [[cosineEdges]] — yields `p(ia, ib)`. */
  private val cosineEdgesCteSql: String =
    """e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id < 200),
      |  p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
      |    FROM e a JOIN e b ON a.vec_id < b.vec_id
      |    WHERE round(list_dot_product(a.v, b.v)
      |      / (sqrt(list_dot_product(a.v, a.v))
      |         * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.2)""".stripMargin

  def xGraphTriangles(s: SparkSession, dir: String): DataFrame =
    graft.ext.GraphOps.triangleStats(cosineEdges(s, dir), "ia", "ib")
      .orderBy(col("node"))

  val xGraphTrianglesSql: String =
    s"""WITH $cosineEdgesCteSql,
      |  deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      |      SELECT ia AS node FROM p UNION ALL SELECT ib FROM p)
      |    GROUP BY node),
      |  tr AS (SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c
      |    FROM p e1
      |    JOIN p e2 ON e1.ia = e2.ia AND e1.ib < e2.ib
      |    JOIN p e3 ON e3.ia = e1.ib AND e3.ib = e2.ib),
      |  pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      |    FROM (SELECT a AS node FROM tr UNION ALL SELECT b FROM tr
      |          UNION ALL SELECT c FROM tr) GROUP BY node)
      |SELECT deg.node, degree,
      |  COALESCE(n_triangles, 0) AS n_triangles,
      |  CASE WHEN degree >= 2 THEN CAST(
      |      2 * CAST(COALESCE(n_triangles, 0) AS HUGEINT) * 1000000
      |      // (CAST(degree AS HUGEINT) * (degree - 1)) AS BIGINT)
      |    ELSE 0 END AS clustering_ppm
      |FROM deg LEFT JOIN pn USING (node) ORDER BY deg.node""".stripMargin

  // ---------------------------------------------------------------------
  // 7-core of the same similarity graph (GraphOps.kCore): iterative
  // peeling to the maximal subgraph of min-degree >= 7 — the density
  // screen over a similarity cluster. The engine peels to FIXPOINT
  // (edge-count convergence probe); the twin unrolls 8 peel rounds
  // (the fixture converges in <= 4 at every shipped sf — margin 2x;
  // an unconverged unroll would differ from the engine and FAIL the
  // hash, so the margin is self-auditing).
  // ---------------------------------------------------------------------
  def xGraphKcore(s: SparkSession, dir: String): DataFrame =
    graft.ext.GraphOps.kCore(cosineEdges(s, dir), "ia", "ib", k = 7)
      .orderBy(col("node"))

  val xGraphKcoreSql: String = {
    // MATERIALIZED per round (the x_events_pagerank twin discipline):
    // an inlined 8-round unroll re-evaluates the whole edge pipeline
    // per reference and exhausts file handles on the parquet scan.
    val rounds = (0 until 8).map { r =>
      s"""d$r AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM (
         |      SELECT ia AS node FROM p$r UNION ALL SELECT ib FROM p$r)
         |    GROUP BY node),
         |  p${r + 1} AS MATERIALIZED (SELECT ia, ib FROM p$r
         |    WHERE ia IN (SELECT node FROM d$r WHERE d >= 7)
         |      AND ib IN (SELECT node FROM d$r WHERE d >= 7))"""
        .stripMargin
    }.mkString(",\n  ")
    s"""WITH $cosineEdgesCteSql,
       |  p0 AS MATERIALIZED (SELECT ia, ib FROM p),
       |  $rounds
       |SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
       |  SELECT ia AS node FROM p8 UNION ALL SELECT ib FROM p8)
       |GROUP BY node ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Sign random projection 64 → 16 dims (SimilarityOps.signProject):
  // deterministic ±1 JL matrix from the portable md5 convention, all
  // arithmetic fixed-point BIGINT. The twin re-derives every sign and
  // component exactly.
  // ---------------------------------------------------------------------
  def xEmbedProject(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.signProject(t(s, dir, "embeddings"), "vec_id",
        "embedding", dOut = 16)
      .orderBy(col("vec_id"), col("dim"))

  /** Shared sign-projection CTE (contract in
    * [[SimilarityOps.signProject]], dOut = 16): yields
    * `proj(vec_id, dim, comp)`. */
  private val signProjCteSql: String =
    """pc AS (SELECT vec_id, s.i AS i,
      |    CAST(FLOOR(CAST(s.x AS DOUBLE) * 16777216.0) AS BIGINT) AS xq
      |  FROM (SELECT vec_id, unnest(list_transform(
      |      range(1, len(embedding) + 1),
      |      k -> {i: k - 1, x: embedding[k]})) AS s FROM embeddings)),
      |  pdm AS (SELECT unnest(range(0, 16)) AS j),
      |  proj AS (SELECT vec_id, CAST(j AS INTEGER) AS dim,
      |      CAST(SUM((1 - 2 * (('0x' || substr(
      |        md5('sp:' || j || ':' || i), 1, 15))::BIGINT % 2)) * xq)
      |        AS BIGINT) AS comp
      |    FROM pc CROSS JOIN pdm
      |    GROUP BY vec_id, j)""".stripMargin

  val xEmbedProjectSql: String =
    s"""WITH $signProjCteSql
       |SELECT vec_id, dim, comp FROM proj
       |ORDER BY vec_id, dim""".stripMargin

  // ---------------------------------------------------------------------
  // Project -> shortlist -> exact rerank (SimilarityOps.signProjectTopK):
  // the JL projection as an ANN accelerator — coarse integer dot in
  // 16 dims shortlists 20 per query, the exact round-6 cosine reranks
  // to top-5. Twin replays the projection, the HUGEINT dot, and both
  // windows.
  // ---------------------------------------------------------------------
  def xSimProjectAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.signProjectTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, dOut = 16, shortlist = 20)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xSimProjectAnnSql: String =
    s"""WITH $signProjCteSql,
       |  qp AS (SELECT vec_id AS query_id, dim, comp AS qc FROM proj
       |    WHERE vec_id < 10),
       |  pd AS (SELECT query_id, p.vec_id AS neighbor_id,
       |      SUM(CAST(qc AS HUGEINT) * comp) AS pdot
       |    FROM qp JOIN proj p USING (dim)
       |    WHERE p.vec_id <> query_id
       |    GROUP BY query_id, p.vec_id),
       |  cand AS (SELECT query_id, neighbor_id FROM pd
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY pdot DESC, neighbor_id) <= 20),
       |  e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  sc AS (SELECT query_id, neighbor_id,
       |      round(list_dot_product(q.v, c.v)
       |        / (sqrt(list_dot_product(q.v, q.v))
       |           * sqrt(list_dot_product(c.v, c.v))), 6) AS score
       |    FROM cand
       |    JOIN e q ON q.vec_id = cand.query_id
       |    JOIN e c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS INTEGER) AS rnk,
       |  neighbor_id, score
       |FROM sc
       |QUALIFY rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // Int8 scalar quantization of the embedding table: corpus-wide
  // per-dim (min, max) → plan-literal quantizer → shuffle-free coding
  // projection; per-vector code checksum/extremes + fixed-point
  // reconstruction error.
  // ---------------------------------------------------------------------
  def xEmbedQuantize(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.quantizeInt8(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64)
      .orderBy(col("vec_id"))

  val xEmbedQuantizeSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  st AS (SELECT CAST(i AS INTEGER) AS i,
      |      MIN(v[CAST(i + 1 AS INTEGER)]) AS mn,
      |      MAX(v[CAST(i + 1 AS INTEGER)]) AS mx
      |    FROM e, range(64) r(i) GROUP BY i),
      |  q AS (SELECT CAST(list(mn ORDER BY i) AS DOUBLE[]) AS mns,
      |      CAST(list(mx ORDER BY i) AS DOUBLE[]) AS mxs FROM st),
      |  c AS (SELECT vec_id,
      |      list_transform(range(64), i -> CASE
      |        WHEN mxs[CAST(i + 1 AS INTEGER)]
      |             > mns[CAST(i + 1 AS INTEGER)]
      |        THEN LEAST(255, GREATEST(0, CAST(FLOOR(
      |          (v[CAST(i + 1 AS INTEGER)]
      |             - mns[CAST(i + 1 AS INTEGER)]) * 255.0
      |            / (mxs[CAST(i + 1 AS INTEGER)]
      |               - mns[CAST(i + 1 AS INTEGER)]) + 0.5)
      |          AS BIGINT)))
      |        ELSE 0 END) AS codes,
      |      v, mns, mxs
      |    FROM e CROSS JOIN q)
      |SELECT vec_id,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |  CAST(list_min(codes) AS INTEGER) AS code_min,
      |  CAST(list_max(codes) AS INTEGER) AS code_max,
      |  CAST(list_sum(list_transform(range(64), i ->
      |    CAST(FLOOR(
      |      ((CASE WHEN mxs[CAST(i + 1 AS INTEGER)]
      |                  > mns[CAST(i + 1 AS INTEGER)]
      |         THEN mns[CAST(i + 1 AS INTEGER)]
      |           + CAST(codes[CAST(i + 1 AS INTEGER)] AS DOUBLE)
      |             * (mxs[CAST(i + 1 AS INTEGER)]
      |                - mns[CAST(i + 1 AS INTEGER)]) / 255.0
      |         ELSE mns[CAST(i + 1 AS INTEGER)] END)
      |       - v[CAST(i + 1 AS INTEGER)])
      |      * ((CASE WHEN mxs[CAST(i + 1 AS INTEGER)]
      |                    > mns[CAST(i + 1 AS INTEGER)]
      |           THEN mns[CAST(i + 1 AS INTEGER)]
      |             + CAST(codes[CAST(i + 1 AS INTEGER)] AS DOUBLE)
      |               * (mxs[CAST(i + 1 AS INTEGER)]
      |                  - mns[CAST(i + 1 AS INTEGER)]) / 255.0
      |           ELSE mns[CAST(i + 1 AS INTEGER)] END)
      |         - v[CAST(i + 1 AS INTEGER)])
      |      * 1073741824.0) AS BIGINT))) AS BIGINT) AS err_fx
      |FROM c ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Corpus-law report: Zipf slope/intercept over the top-1000 vocab +
  // Heaps-style token/vocab totals, all fixed-point engine-exact.
  // ---------------------------------------------------------------------
  def xCorpusZipf(s: SparkSession, dir: String): DataFrame =
    TextOps.corpusZipf(t(s, dir, "documents"), "text", topN = 1000)

  val xCorpusZipfSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tk AS (SELECT unnest(toks) AS term FROM tok),
       |  tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_tokens,
       |      CAST(COUNT(DISTINCT term) AS BIGINT) AS distinct_tokens
       |    FROM tk),
       |  cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tk
       |    GROUP BY term),
       |  top AS (SELECT term, c FROM cnt ORDER BY c DESC, term
       |    LIMIT 1000),
       |  rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term)
       |      AS r FROM top),
       |  pts AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
       |      ln(CAST(c AS DOUBLE)) AS y FROM rk),
       |  sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_fit,
       |      CAST(SUM(CAST(FLOOR(x * 1073741824.0) AS BIGINT))
       |        AS BIGINT) AS sx,
       |      CAST(SUM(CAST(FLOOR(y * 1073741824.0) AS BIGINT))
       |        AS BIGINT) AS sy,
       |      CAST(SUM(CAST(FLOOR(x * y * 1073741824.0) AS BIGINT))
       |        AS BIGINT) AS sxy,
       |      CAST(SUM(CAST(FLOOR(x * x * 1073741824.0) AS BIGINT))
       |        AS BIGINT) AS sxx
       |    FROM pts),
       |  sl AS (SELECT total_tokens, distinct_tokens, n_fit, sx, sy,
       |      (CAST(n_fit AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1073741824.0)
       |         - (CAST(sx AS DOUBLE) / 1073741824.0)
       |           * (CAST(sy AS DOUBLE) / 1073741824.0))
       |      / (CAST(n_fit AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1073741824.0)
       |         - (CAST(sx AS DOUBLE) / 1073741824.0)
       |           * (CAST(sx AS DOUBLE) / 1073741824.0)) AS zipf_slope
       |    FROM sums CROSS JOIN tot)
       |SELECT total_tokens, distinct_tokens, n_fit, zipf_slope,
       |  (CAST(sy AS DOUBLE) / 1073741824.0) / CAST(n_fit AS DOUBLE)
       |    - zipf_slope * ((CAST(sx AS DOUBLE) / 1073741824.0)
       |                    / CAST(n_fit AS DOUBLE)) AS zipf_intercept
       |FROM sl""".stripMargin

  // ---------------------------------------------------------------------
  // MMR diversified re-ranking (λ=0.5, top-8 candidates → 3 picks per
  // query): every cosine is pre-rounded by the shared round-6 Column
  // contract, so the DuckDB twin replays the greedy EXACTLY, step by
  // step (s1 → m2/s2 → m3/s3 CTEs).
  // ---------------------------------------------------------------------
  def xMmrRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    SimilarityOps.mmrRerank(emb.filter(col("vec_id") < 6), emb,
        "vec_id", "embedding", k = 3, lambda = 0.5, nCand = 8)
      .orderBy(col("query_id"), col("rnk"))
  }

  val xMmrRerankSql: String = {
    val cos = (a: String, b: String) =>
      s"""round(list_dot_product($a, $b)
         |        / (sqrt(list_dot_product($a, $a))
         |           * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |    WHERE vec_id < 6),
       |  sc AS (SELECT query_id, vec_id AS neighbor_id,
       |      ${cos("qv", "v")} AS score, v
       |    FROM q, e WHERE vec_id <> query_id),
       |  cand AS (SELECT query_id, neighbor_id, score, v FROM sc
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) <= 8),
       |  ps AS (SELECT a.query_id, a.neighbor_id AS ida,
       |      b.neighbor_id AS idb, ${cos("a.v", "b.v")} AS sim
       |    FROM cand a JOIN cand b
       |      ON a.query_id = b.query_id
       |        AND a.neighbor_id < b.neighbor_id),
       |  s1 AS (SELECT query_id, neighbor_id AS id1, score AS rel1
       |    FROM cand
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) = 1),
       |  m2 AS (SELECT c.query_id, c.neighbor_id, c.score,
       |      0.5 * c.score - 0.5 * p1.sim AS mmr
       |    FROM cand c
       |    JOIN s1 ON c.query_id = s1.query_id
       |      AND c.neighbor_id <> s1.id1
       |    JOIN ps p1 ON p1.query_id = c.query_id
       |      AND p1.ida = LEAST(c.neighbor_id, s1.id1)
       |      AND p1.idb = GREATEST(c.neighbor_id, s1.id1)),
       |  s2 AS (SELECT query_id, neighbor_id AS id2, score AS rel2,
       |      mmr AS mmr2 FROM m2
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY mmr DESC, neighbor_id) = 1),
       |  m3 AS (SELECT c.query_id, c.neighbor_id, c.score,
       |      0.5 * c.score - 0.5 * GREATEST(p1.sim, p2.sim) AS mmr
       |    FROM cand c
       |    JOIN s1 ON c.query_id = s1.query_id
       |    JOIN s2 ON c.query_id = s2.query_id
       |    JOIN ps p1 ON p1.query_id = c.query_id
       |      AND p1.ida = LEAST(c.neighbor_id, s1.id1)
       |      AND p1.idb = GREATEST(c.neighbor_id, s1.id1)
       |    JOIN ps p2 ON p2.query_id = c.query_id
       |      AND p2.ida = LEAST(c.neighbor_id, s2.id2)
       |      AND p2.idb = GREATEST(c.neighbor_id, s2.id2)
       |    WHERE c.neighbor_id <> s1.id1
       |      AND c.neighbor_id <> s2.id2),
       |  s3 AS (SELECT query_id, neighbor_id AS id3, score AS rel3,
       |      mmr AS mmr3 FROM m3
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY mmr DESC, neighbor_id) = 1)
       |SELECT query_id, 1 AS rnk, id1 AS neighbor_id,
       |  rel1 AS relevance, 0.5 * rel1 AS mmr FROM s1
       |UNION ALL
       |SELECT query_id, 2 AS rnk, id2, rel2, mmr2 FROM s2
       |UNION ALL
       |SELECT query_id, 3 AS rnk, id3, rel3, mmr3 FROM s3
       |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Unicode NFC normalization (graft_nfc native expression vs DuckDB's
  // utf8proc nfc_normalize — two independent implementations of UAX
  // #15): each doc gets a decomposed-accent suffix planted (combining
  // U+0301/U+0308), normalization must merge the combining marks
  // (length drops by exactly 2) and the normalized bytes must md5-agree
  // across engines.
  // ---------------------------------------------------------------------
  def xTextNfc(s: SparkSession, dir: String): DataFrame = {
    val marked = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        concat(col("text"), lit(" cafe\u0301 u\u0308ber")).as("_raw"))
    val norm = call_function("graft_nfc", col("_raw"))
    marked.select(col("doc_id"),
        length(col("_raw")).as("len_raw"),
        length(norm).as("len_nfc"),
        md5(norm.cast("binary")).as("h_nfc"))
      .orderBy(col("doc_id"))
  }

  val xTextNfcSql: String =
    """WITH m AS (SELECT doc_id,
      |    text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber'
      |      AS raw
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id, CAST(length(raw) AS INTEGER) AS len_raw,
      |  CAST(length(nfc_normalize(raw)) AS INTEGER) AS len_nfc,
      |  md5(nfc_normalize(raw)) AS h_nfc
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Engine-exact Lloyd's k-means (k=4, 2 rounds, init = first 4 vecs):
  // fixed-point distances and integer-division centroid updates make
  // the full iterative clustering — not just one assignment pass —
  // hash-identical to the DuckDB twin, which replays both rounds as
  // CTEs. Complements x_sim_ivf, whose ML-trained centroids are only
  // rows-checkable.
  // ---------------------------------------------------------------------
  def xEmbedKmeans(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.kmeansLloydFx(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 4, dim = 64, iters = 2)
      .orderBy(col("vec_id"))

  /** Shared kmeans-round CTE chain (contract in
    * [[SimilarityOps.kmeansLloydFx]], k = 4, dim = 64, iters = 2):
    * yields `d2(vec_id, c, dfx)` — every vector's fixed-point distance
    * to every FINAL centroid. Used by both the clustering oracle and
    * the silhouette oracle so the two twins score the same model. */
  private val kmeansCtesSql: String = {
    // per-dim fixed-point squared-distance term vs a centroid list `cv`
    val dTerm =
      """CAST(list_sum(list_transform(range(64), i ->
        |        CAST(FLOOR((v[CAST(i+1 AS INTEGER)]
        |            - cv[CAST(i+1 AS INTEGER)])
        |          * (v[CAST(i+1 AS INTEGER)]
        |            - cv[CAST(i+1 AS INTEGER)])
        |          * 1073741824.0) AS BIGINT))) AS BIGINT)""".stripMargin
    s"""e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  c0 AS (SELECT CAST(vec_id AS INTEGER) AS c, v AS cv FROM e
       |    WHERE vec_id < 4),
       |  d1 AS (SELECT e.vec_id, c0.c, $dTerm AS dfx FROM e, c0),
       |  a1 AS (SELECT vec_id, c AS cl FROM d1
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dfx, c) = 1),
       |  s1 AS (SELECT cl, CAST(i AS INTEGER) AS i,
       |      CAST(SUM(CAST(FLOOR(v[CAST(i+1 AS INTEGER)]
       |        * 1073741824.0) AS BIGINT)) AS BIGINT) AS sfx,
       |      CAST(COUNT(*) AS BIGINT) AS n
       |    FROM a1 JOIN e USING (vec_id), range(64) r(i)
       |    GROUP BY cl, i),
       |  c1 AS (SELECT cl AS c,
       |      list(CAST(sfx // n AS DOUBLE) / 1073741824.0 ORDER BY i)
       |        AS cv
       |    FROM s1 GROUP BY cl),
       |  d2 AS (SELECT e.vec_id, c1.c, $dTerm AS dfx FROM e, c1)"""
      .stripMargin
  }

  val xEmbedKmeansSql: String =
    s"""WITH $kmeansCtesSql,
       |  a2 AS (SELECT vec_id, c AS cluster, dfx AS dist_fx FROM d2
       |    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dfx, c) = 1)
       |SELECT vec_id, cluster, dist_fx FROM a2
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Simplified silhouette of the kmeans clustering
  // (SimilarityOps.silhouetteFx): a = distance to own centroid, b =
  // nearest other centroid, s = (b-a)/max(a,b) in exact ppm — the
  // "did k make sense" audit over the same centroid table as
  // x_embed_kmeans. Twin = shared kmeans CTEs + a two-row-per-vec
  // rank pivot.
  // ---------------------------------------------------------------------
  def xEmbedSilhouette(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.silhouetteFx(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 4, dim = 64, iters = 2)
      .orderBy(col("vec_id"))

  val xEmbedSilhouetteSql: String =
    s"""WITH $kmeansCtesSql,
       |  rr AS (SELECT vec_id, c, dfx, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id ORDER BY dfx, c) AS rn FROM d2),
       |  f AS (SELECT vec_id,
       |      MAX(CASE WHEN rn = 1 THEN c END) AS cluster,
       |      MAX(CASE WHEN rn = 1 THEN dfx END) AS a_fx,
       |      MAX(CASE WHEN rn = 2 THEN dfx END) AS b_fx
       |    FROM rr WHERE rn <= 2 GROUP BY vec_id)
       |SELECT vec_id, cluster, a_fx, b_fx,
       |  CASE WHEN greatest(a_fx, b_fx) > 0
       |    THEN CAST(CAST(b_fx - a_fx AS HUGEINT) * 1000000
       |      // greatest(a_fx, b_fx) AS BIGINT)
       |    ELSE 0 END AS silhouette_ppm
       |FROM f ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Curriculum staging: rarity-weighted integer difficulty, global
  // easy→hard rank via the two-pass contiguous-id machinery (no
  // single-partition window), 5 stages; output is the per-stage
  // profile a training scheduler consumes.
  // ---------------------------------------------------------------------
  def xCurriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextOps.curriculumStages(docs, "doc_id", "text", stages = 5)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("difficulty_fx")).as("min_fx"),
        max(col("difficulty_fx")).as("max_fx"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("stage"))
  }

  val xCurriculumSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  tk AS (SELECT doc_id, unnest(toks) AS term FROM tok),
       |  cnt AS (SELECT term, COUNT(*) AS c FROM tk GROUP BY term),
       |  dfx AS (SELECT doc_id,
       |      CAST(SUM(CAST(FLOOR(1073741824.0 / CAST(c AS DOUBLE))
       |        AS BIGINT)) AS BIGINT) AS fx
       |    FROM tk JOIN cnt USING (term) GROUP BY doc_id),
       |  alld AS (SELECT d.doc_id, COALESCE(fx, 0) AS fx, d.n_chars
       |    FROM documents d LEFT JOIN dfx USING (doc_id)),
       |  rk AS (SELECT doc_id, fx, n_chars,
       |      ROW_NUMBER() OVER (ORDER BY fx, doc_id) - 1 AS rnk
       |    FROM alld),
       |  nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM alld),
       |  st AS (SELECT fx, n_chars,
       |      CAST(FLOOR(CAST(rnk * 5 AS DOUBLE) / CAST(n AS DOUBLE))
       |        AS INTEGER) AS stage
       |    FROM rk CROSS JOIN nn)
       |SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(fx) AS min_fx, MAX(fx) AS max_fx,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM st GROUP BY stage ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------------
  // Snapshot diff: documents vs a deterministically-derived "next crawl"
  // (every 17th doc dropped, every 13th re-cased, 20 new docs landed
  // under a new source) — per-row added/removed/changed/unchanged status
  // plus exactly which columns changed. One full-outer join on the key.
  // ---------------------------------------------------------------------
  def xSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "documents")
    val next = a.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 5, upper(col("text")))
          .otherwise(col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .unionAll(a.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), lit("newcrawl").as("source"), col("n_chars")))
    graft.transform.Diff.snapshotDiff(a, next, "doc_id",
        Seq("text", "lang", "source", "n_chars"), carry = Seq("source"))
      .orderBy(col("doc_id"))
  }

  val xSnapshotDiffSql: String =
    """WITH b AS (SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 5 THEN upper(text) ELSE text END AS text,
      |    lang, source, n_chars
      |  FROM documents WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, lang,
      |    'newcrawl' AS source, n_chars
      |  FROM documents WHERE doc_id < 20),
      |  f AS (SELECT a.doc_id AS ak, b.doc_id AS bk,
      |    COALESCE(b.source, a.source) AS source,
      |    CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN
      |      concat_ws(',',
      |        CASE WHEN a.text IS DISTINCT FROM b.text
      |          THEN 'text' END,
      |        CASE WHEN a.lang IS DISTINCT FROM b.lang
      |          THEN 'lang' END,
      |        CASE WHEN a.source IS DISTINCT FROM b.source
      |          THEN 'source' END,
      |        CASE WHEN a.n_chars IS DISTINCT FROM b.n_chars
      |          THEN 'n_chars' END)
      |    ELSE '' END AS changed_cols
      |  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT COALESCE(ak, bk) AS doc_id,
      |  CASE WHEN ak IS NULL THEN 'added'
      |       WHEN bk IS NULL THEN 'removed'
      |       WHEN changed_cols <> '' THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  changed_cols, source
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // DSIR data selection (Xie et al. 2023): hashed bag-of-unigrams
  // importance weights of corpus docs vs the src0 target slice, top-500
  // kept. Portable md5 buckets + fixed-point log-ratios make the whole
  // score engine-exact.
  // ---------------------------------------------------------------------
  def xSelectDsir(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextOps.dsirSelect(docs, docs.filter(col("source") === "src0"),
        "doc_id", "text", "text", numBuckets = 64, budget = 500)
      .orderBy(col("rnk"))
  }

  val xSelectDsirSql: String =
    s"""WITH tgt AS (SELECT unnest($toksSql) AS t FROM documents
       |    WHERE source = 'src0'),
       |  tb AS (SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 64
       |      AS bkt FROM tgt),
       |  tc AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS ct FROM tb
       |    GROUP BY bkt),
       |  tt AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS tt
       |    FROM tc),
       |  ctk AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |  db AS (SELECT doc_id,
       |      ('0x' || substr(md5(t), 1, 15))::BIGINT % 64 AS bkt,
       |      CAST(COUNT(*) AS BIGINT) AS cnt
       |    FROM ctk GROUP BY doc_id, bkt),
       |  rc AS (SELECT bkt, CAST(SUM(cnt) AS BIGINT) AS cr FROM db
       |    GROUP BY bkt),
       |  rt AS (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS tr
       |    FROM rc),
       |  grid AS (SELECT CAST(i AS BIGINT) AS bkt FROM range(64) r(i)),
       |  lr AS (SELECT grid.bkt,
       |      CAST(FLOOR(ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
       |          / CAST(tt + 64 AS DOUBLE)) * 1073741824.0) AS BIGINT)
       |      - CAST(FLOOR(ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE)
       |          / CAST(tr + 64 AS DOUBLE)) * 1073741824.0) AS BIGINT)
       |        AS lrfx
       |    FROM grid LEFT JOIN tc USING (bkt) LEFT JOIN rc USING (bkt)
       |    CROSS JOIN tt CROSS JOIN rt),
       |  sc AS (SELECT doc_id, CAST(SUM(cnt * lrfx) AS BIGINT) AS lwfx,
       |      CAST(SUM(cnt) AS BIGINT) AS nt
       |    FROM db JOIN lr USING (bkt) GROUP BY doc_id),
       |  f AS (SELECT d.doc_id, COALESCE(nt, 0) AS n_tokens,
       |      COALESCE(lwfx, 0) AS logw_fx
       |    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
       |  rk AS (SELECT doc_id, n_tokens, logw_fx,
       |      CAST(ROW_NUMBER() OVER (ORDER BY logw_fx DESC, doc_id)
       |        AS INTEGER) AS rnk
       |    FROM f)
       |SELECT doc_id, n_tokens, logw_fx,
       |  CAST(logw_fx AS DOUBLE) / 1073741824.0 AS logw, rnk
       |FROM rk WHERE rnk <= 500 ORDER BY rnk""".stripMargin

  // ---------------------------------------------------------------------
  // Semantic decontamination: every corpus embedding screened against
  // the benchmark slice (vec_id % 29 = 0 plays the leaked eval set — it
  // remains IN the corpus, so those rows flag at sim 1.0); round-6
  // cosine contract, closest-benchmark tie → smallest id. The benchmark
  // side is additionally bounded to vec_id < 2000 (a no-op at
  // sf ≤ 0.1, where all ids are < 2000): eval benchmarks are
  // FIXED-SIZE in practice — a 10× corpus does not grow a 10× eval
  // set — so the registered query keeps the screen linear in the
  // corpus, the shape the operator has at any scale (the bounded-tier
  // convention of x_embed_mutual).
  // ---------------------------------------------------------------------
  /** Collected benchmark vectors, cached per (session, dir) — the
    * lmSumsCache discipline applied to xDecontamSemantic's driver
    * collect (r17 advice: the collect was eager and uncached, so every
    * invocation re-ran the benchmark scan). */
  private val decontamBenchCache = graft.engine.SessionCaches.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Seq[(Long, Seq[Double])]]())

  def xDecontamSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // The benchmark is fixed-size by contract (~69 vectors) — collect
    // it and fold it into the plan as literals: the corpus then streams
    // through ONE compiled max-cos projection (graft_maxcos) instead of
    // a BroadcastNestedLoopJoin materializing a corpus×B pair row per
    // candidate (r17: 20 s → ~2 s at sf10, bit-identical output; the
    // kernel == join-form equivalence is pinned in NativeExprsSpec).
    val benchSel = emb
      .filter(col("vec_id") % 29 === 0 && col("vec_id") < 2000)
    val bench = graft.engine.SessionCaches.memo(
      decontamBenchCache, (s, dir))(
      benchSel.select(col("vec_id"),
          col("embedding").cast("array<double>").as("_v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq)
    // An empty benchmark selection (possible on an exotic fixture
    // scale) takes the general join form, which returns the empty
    // screen instead of the literal form's loud refusal (r17 advice).
    val screened =
      if (bench.isEmpty)
        SimilarityOps.semanticDecontaminate(
          emb.select(col("vec_id"),
            col("embedding").cast("array<double>").as("_cv2")),
          benchSel.select(col("vec_id").as("_bid2"),
            col("embedding").cast("array<double>").as("_bv2")),
          "vec_id", "_cv2", "_bid2", "_bv2", tau = 0.95)
      else
        SimilarityOps.semanticDecontaminateLit(emb, "vec_id", "embedding",
          bench, tau = 0.95)
    screened.orderBy(col("vec_id"))
  }

  val xDecontamSemanticSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |  bench AS (SELECT vec_id AS bid, v AS bv FROM e
      |    WHERE vec_id % 29 = 0 AND vec_id < 2000),
      |  sims AS (SELECT c.vec_id, b.bid,
      |      round(list_dot_product(c.v, b.bv)
      |        / (sqrt(list_dot_product(c.v, c.v))
      |           * sqrt(list_dot_product(b.bv, b.bv))), 6) AS sim
      |    FROM e c CROSS JOIN bench b),
      |  m AS (SELECT vec_id,
      |      MAX(struct_pack(s := sim, nb := -bid)) AS mm
      |    FROM sims GROUP BY vec_id)
      |SELECT vec_id, mm.s AS max_sim, -mm.nb AS bench_id,
      |  mm.s > 0.95 AS contaminated
      |FROM m ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Embedding-coverage audit: per-source doc counts vs embedding rows
  // (vec_id keys the embedded doc), integer ppm coverage, global orphan
  // count on every row. NOT to be confused with x_embed_cov, the
  // covariance-matrix query — "cov" there abbreviates covariance.
  // ---------------------------------------------------------------------
  def xEmbedCoverage(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.embeddingCoverage(t(s, dir, "documents"),
        t(s, dir, "embeddings"), "doc_id", "source", "vec_id")
      .orderBy(col("source"))

  val xEmbedCoverageSql: String =
    """WITH em AS (SELECT DISTINCT vec_id FROM embeddings),
      |  j AS (SELECT d.source, d.doc_id, em.vec_id AS has
      |    FROM documents d LEFT JOIN em ON d.doc_id = em.vec_id),
      |  per AS (SELECT source,
      |      CAST(COUNT(*) AS BIGINT) AS n_docs,
      |      CAST(COUNT(has) AS BIGINT) AS n_embedded
      |    FROM j GROUP BY source),
      |  orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_vecs
      |    FROM em LEFT JOIN documents d ON em.vec_id = d.doc_id
      |    WHERE d.doc_id IS NULL)
      |SELECT source, n_docs, n_embedded,
      |  n_docs - n_embedded AS n_missing,
      |  (n_embedded * 1000000) // n_docs AS cov_ppm,
      |  n_orphan_vecs
      |FROM per CROSS JOIN orph ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // KMV distinct-count sketch vs the exact answer (SketchOps.kmvSketch):
  // per-source distinct-token estimates from k-long state. The exact
  // side here exists only to verify the estimator — production runs the
  // sketch alone. The DuckDB twin reproduces the sketch itself (distinct
  // portable hashes, ROW_NUMBER ascending, k-th value), so the hash
  // compare covers the estimator arithmetic end to end.
  // ---------------------------------------------------------------------
  def xSketchDistinct(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // 3-gram units: the fixture's token vocabulary (31 types) never
    // fills a k=256 sketch, so the token variant would only ever take
    // the under-full exact path; the ~1.1-1.4k distinct 3-grams per
    // source keep the k-th-minimum ESTIMATOR on the oracle's hook
    val sk = graft.ext.SketchOps.kmvSketch(docs, "source", "text",
      k = 256, gramN = 3)
    // the exact side is a distinct-count — duplicate-blind, so the
    // gram explode also runs over DISTINCT (source, text) pairs
    val exact = graft.ext.SketchOps
      .distinctGroupTexts(docs, "source", "text")
      .select(col("source"),
        explode(coalesce(TextOps.shingles(TextOps.tokens(col("text")), 3),
          array().cast("array<string>"))).as("_t"))
      .select(col("source"), graft.ext.SketchOps.h60(col("_t")).as("_h"))
      .distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    sk.join(exact, Seq("source"))
      .withColumn("err_ppm",
        expr("abs(est_distinct - n_exact) * 1000000 div n_exact"))
      .select(col("source"), col("n_exact"), col("n_seen"),
        col("est_distinct"), col("err_ppm"))
      .orderBy(col("source"))
  }

  /** 3-gram unit in DuckDB form (contract: [[TextOps.shingles]] with
    * n = 3 — space-joined token triples). */
  private val grams3Sql: String =
    s"""(SELECT doc_id, source, unnest(list_transform(
       |    range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS t
       |  FROM (SELECT doc_id, source, $toksSql AS toks FROM documents) z
       |  WHERE len(toks) >= 3)""".stripMargin

  val xSketchDistinctSql: String =
    s"""WITH tok AS (SELECT source, t FROM $grams3Sql g3),
       |  h AS (SELECT DISTINCT source,
       |      ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |  r AS (SELECT source, h,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM h),
       |  ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
       |    FROM h GROUP BY source),
       |  km AS (SELECT source,
       |      CAST(COUNT(CASE WHEN rn <= 256 THEN 1 END) AS INTEGER)
       |        AS n_seen,
       |      MAX(CASE WHEN rn <= 256 THEN h END) AS kth
       |    FROM r GROUP BY source),
       |  est AS (SELECT km.source, n_exact, n_seen,
       |      CASE WHEN n_seen < 256 THEN CAST(n_seen AS BIGINT)
       |           ELSE CAST(FLOOR(255.0 * 1152921504606846976.0
       |             / CAST(kth AS DOUBLE)) AS BIGINT) END AS est_distinct
       |    FROM km JOIN ex USING (source))
       |SELECT source, n_exact, n_seen, est_distinct,
       |  abs(est_distinct - n_exact) * 1000000 // n_exact AS err_ppm
       |FROM est ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Count-min sketch point queries vs exact counts (SketchOps.cmsSketch):
  // the 4x64 counter grid estimates each probe token's frequency as the
  // min over its depth cells — never an undercount. Probes are the
  // top-20 tokens by exact count (ties -> token asc, deterministic);
  // the twin rebuilds the identical grid from the portable hash.
  // ---------------------------------------------------------------------
  def xSketchCms(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sketch = graft.ext.SketchOps.cmsSketch(docs, "text",
      depth = 4, width = 64)
    val exact = docs
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
    val probes = exact.orderBy(col("n_exact").desc, col("token")).limit(20)
    graft.ext.SketchOps.cmsEstimate(sketch, probes, "token",
        depth = 4, width = 64)
      .withColumn("overcount", col("cms_est") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  val xSketchCmsSql: String =
    s"""WITH tok AS (SELECT unnest($toksSql) AS t FROM documents),
       |  fan AS (SELECT t, unnest(range(4)) AS j FROM tok),
       |  g AS (SELECT j,
       |      ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || t), 1, 15))
       |        ::BIGINT % 64 AS cell,
       |      CAST(COUNT(*) AS BIGINT) AS cnt
       |    FROM fan GROUP BY 1, 2),
       |  ex AS (SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n_exact
       |    FROM tok GROUP BY t),
       |  pr AS (SELECT token, n_exact FROM ex
       |    ORDER BY n_exact DESC, token LIMIT 20),
       |  pf AS (SELECT token, n_exact, unnest(range(4)) AS j FROM pr),
       |  pe AS (SELECT token, n_exact, j,
       |      ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || token),
       |        1, 15))::BIGINT % 64 AS cell
       |    FROM pf),
       |  est AS (SELECT token, n_exact,
       |      MIN(COALESCE(cnt, 0)) AS cms_est
       |    FROM pe LEFT JOIN g USING (j, cell) GROUP BY token, n_exact)
       |SELECT token, n_exact, cms_est, cms_est - n_exact AS overcount
       |FROM est ORDER BY n_exact DESC, token""".stripMargin

  // ---------------------------------------------------------------------
  // Exact heavy hitters at sketch cost (SketchOps.heavyHitters): the
  // CMS grid (a driver-bounded plan literal) pre-filters the 3-gram
  // stream — no false negatives since CMS never undercounts — and the
  // exact count removes collision false positives. Result is PROVABLY
  // the exact HAVING >= 6 answer, so the twin just runs that. Width
  // 8192 (the grid is still only 256 KB of plan literal): pruning
  // power needs width ≳ distinct-units / heavy-ratio, and the 64-wide
  // monitoring grid saturates above the threshold on every cell.
  // ---------------------------------------------------------------------
  def xSketchHeavy(s: SparkSession, dir: String): DataFrame =
    graft.ext.SketchOps.heavyHitters(t(s, dir, "documents"), "text",
        minCount = 6L, width = 8192, gramN = 3)
      .orderBy(desc("n_exact"), asc("gram"))

  val xSketchHeavySql: String =
    s"""WITH tok AS (SELECT t FROM $grams3Sql g3)
       |SELECT t AS gram, CAST(COUNT(*) AS BIGINT) AS n_exact
       |FROM tok GROUP BY t HAVING COUNT(*) >= 6
       |ORDER BY n_exact DESC, gram""".stripMargin

  // ---------------------------------------------------------------------
  // Corpus-overlap matrix from KMV sketches (SketchOps.kmvOverlapMatrix):
  // every source pair's Jaccard and union-cardinality estimates derived
  // from the per-source k-min arrays alone — the corpus is read once,
  // the pair stage touches only k-long arrays. The twin rebuilds the
  // same sketches and replays the same set algebra cell by cell.
  // ---------------------------------------------------------------------
  def xSketchOverlap(s: SparkSession, dir: String): DataFrame =
    graft.ext.SketchOps.kmvOverlapMatrix(t(s, dir, "documents"),
        "source", "text", k = 256, gramN = 3)
      .orderBy(col("src_a"), col("src_b"))

  val xSketchOverlapSql: String =
    s"""WITH tok AS (SELECT source, t FROM $grams3Sql g3),
       |  h AS (SELECT DISTINCT source,
       |      ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |  r AS (SELECT source, h,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM h),
       |  sk AS (SELECT source, list(h ORDER BY h) AS mins
       |    FROM r WHERE rn <= 256 GROUP BY source),
       |  p AS (SELECT a.source AS src_a, b.source AS src_b,
       |      a.mins AS ma, b.mins AS mb
       |    FROM sk a JOIN sk b ON a.source < b.source),
       |  c AS (SELECT src_a, src_b, ma, mb,
       |      list_sort(list_distinct(list_concat(ma, mb)))[1:256] AS u
       |    FROM p),
       |  m AS (SELECT src_a, src_b,
       |      CAST(len(u) AS INTEGER) AS k_union,
       |      CAST(len(list_intersect(list_intersect(u, ma), mb))
       |        AS INTEGER) AS n_shared,
       |      CASE WHEN len(u) < 256 THEN CAST(len(u) AS BIGINT)
       |           ELSE CAST(FLOOR(255.0 * 1152921504606846976.0
       |             / CAST(u[256] AS DOUBLE)) AS BIGINT) END
       |        AS union_est_distinct
       |    FROM c)
       |SELECT src_a, src_b, k_union, n_shared, union_est_distinct,
       |  CAST(n_shared AS BIGINT) * 1000000 // k_union AS jaccard_ppm
       |FROM m ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------------
  // All-pairs tf-idf cosine with L2 prefix filtering (Bayardo 2007,
  // DedupOps.allPairsCosine): the twin computes the DEFINITION — the
  // full posting self-join with no pruning — so this row PROVES the
  // prefix filter drops no qualifying pair. Threshold 3/5, 3-gram
  // terms, fixed-point idf (floor(ln(N/df)·1000)).
  // ---------------------------------------------------------------------
  def xDedupApss(s: SparkSession, dir: String): DataFrame =
    graft.ext.DedupOps.allPairsCosine(t(s, dir, "documents"),
        "doc_id", "text", tNum = 3, tDen = 5, gramN = 3)
      .orderBy(col("id_a"), col("id_b"))

  val xDedupApssSql: String =
    s"""WITH g3 AS (SELECT doc_id, source, t FROM $grams3Sql z),
       |  tf AS (SELECT doc_id AS id, t, COUNT(*) AS tf
       |    FROM g3 GROUP BY doc_id, t),
       |  dfr AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
       |  w AS (SELECT id, tf.t, tf.tf * CAST(FLOOR(ln(
       |        (SELECT COUNT(*) FROM documents)::DOUBLE / df) * 1000)
       |        AS BIGINT) AS w
       |    FROM tf JOIN dfr ON tf.t = dfr.t),
       |  wp AS (SELECT id, t, w FROM w WHERE w > 0),
       |  n AS (SELECT id, SUM(w * w) AS nsq FROM wp GROUP BY id),
       |  d AS (SELECT a.id AS ia, b.id AS ib,
       |      CAST(SUM(a.w * b.w) AS BIGINT) AS dot
       |    FROM wp a JOIN wp b ON a.t = b.t AND a.id < b.id
       |    GROUP BY a.id, b.id),
       |  sc AS (SELECT ia, ib, dot,
       |      ROUND(dot / (SQRT(na.nsq::DOUBLE) * SQRT(nb.nsq::DOUBLE)), 6)
       |        AS score
       |    FROM d JOIN n na ON na.id = ia JOIN n nb ON nb.id = ib)
       |SELECT ia AS id_a, ib AS id_b, dot, score FROM sc
       |WHERE score >= 0.6 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // HyperLogLog distinct estimates (SketchOps.hllSketch): registers,
  // harmonic denominator, and estimate reproduced bit-for-bit by the
  // twin — integer register algebra end to end, one shared double
  // literal for the estimator numerator. Two slices so BOTH estimator
  // branches are on the oracle's hook: the full corpus lands in the
  // normal harmonic regime, the doc_id%50 slice leaves most registers
  // empty and takes the linear-counting branch.
  // ---------------------------------------------------------------------
  private val HllP = 8
  def xSketchHll(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val full = graft.ext.SketchOps
      .hllSketch(docs, "source", "text", p = HllP, gramN = 3)
      .withColumn("slice", lit("all"))
    val sparse = graft.ext.SketchOps
      .hllSketch(docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        "source", "text", p = HllP, gramN = 3)
      .withColumn("slice", lit("sparse"))
    full.unionByName(sparse)
      .select(col("slice"), col("source"), col("n_zero_registers"),
        col("t_harmonic"), col("est_distinct"))
      .orderBy(col("slice"), col("source"))
  }

  val xSketchHllSql: String = {
    val m = 1 << HllP
    val w = 60 - HllP
    val pow2w = 1L << w
    val perEmpty = 1L << (w + 1)
    val num = graft.ext.SketchOps.hllNumerator(HllP)
    s"""WITH g3 AS (SELECT doc_id, source, t FROM $grams3Sql z),
       |  sel AS (SELECT 'all' AS slice, source, t FROM g3
       |    UNION ALL
       |    SELECT 'sparse', source, t FROM g3 WHERE doc_id % 50 = 0),
       |  h AS (SELECT slice, source,
       |      ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM sel),
       |  r AS (SELECT slice, source,
       |      CAST(h // $pow2w AS INTEGER) AS j, h % $pow2w AS y FROM h),
       |  rh AS (SELECT slice, source, j,
       |      CASE WHEN y = 0 THEN ${w + 1}
       |           ELSE ${w + 1} - length(bin(y)) END AS rho FROM r),
       |  mx AS (SELECT slice, source, j, MAX(rho) AS mj FROM rh
       |    GROUP BY slice, source, j),
       |  ag AS (SELECT slice, source, COUNT(*) AS np,
       |      CAST(SUM(1::BIGINT << (${w + 1} - mj)) AS BIGINT) AS tp
       |    FROM mx GROUP BY slice, source),
       |  e AS (SELECT slice, source, ($m - np) AS v,
       |      tp + ($m - np) * $perEmpty AS t_harmonic FROM ag),
       |  f AS (SELECT slice, source, v, t_harmonic,
       |      $num / CAST(t_harmonic AS DOUBLE) AS eraw FROM e)
       |SELECT slice, source, CAST(v AS INTEGER) AS n_zero_registers,
       |  t_harmonic,
       |  CASE WHEN v > 0 AND eraw <= ${2.5 * m}
       |       THEN CAST(FLOOR($m.0 * ln($m.0 / v)) AS BIGINT)
       |       ELSE CAST(FLOOR(eraw) AS BIGINT) END AS est_distinct
       |FROM f ORDER BY slice, source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Weighted sampling without replacement (Split.weightedSample): 200
  // docs drawn with probability proportional to token count — the
  // "uniform over tokens" sample LM evals want. The md5-derived uniform
  // and the fixed-point ln-key make the drawn SET engine-exact; the
  // twin replays the same keys and the same (key desc, id) cut.
  // ---------------------------------------------------------------------
  def xSampleWeighted(s: SparkSession, dir: String): DataFrame = {
    // spread: the tokenize-for-weight projection must not inherit a
    // 1-split scan (weightedSample itself is projection + TakeOrdered)
    val d = graft.engine.Engine.spread(t(s, dir, "documents"))
      .withColumn("weight",
        TextOps.tokenCount(col("text")).cast("long") + lit(1L))
    graft.transform.Split.weightedSample(d, "doc_id", "weight", 200)
      .select(col("doc_id"), col("source"), col("weight"),
        col("sample_score_fx"))
      .orderBy(col("doc_id"))
  }

  val xSampleWeightedSql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    CAST(len($toksSql) AS BIGINT) + 1 AS weight FROM documents),
       |  k AS (SELECT doc_id, source, weight,
       |      CAST(FLOOR(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
       |          1, 15))::BIGINT + 1) / 1152921504606846976.0)
       |        * 1073741824.0 / weight) AS BIGINT) AS sample_score_fx
       |    FROM d WHERE weight > 0),
       |  top AS (SELECT * FROM k
       |    ORDER BY sample_score_fx DESC, doc_id LIMIT 200)
       |SELECT doc_id, source, weight, sample_score_fx FROM top
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Containment near-dup pairs (DedupOps.containmentPairs): the
  // asymmetric |A∩B|/|A| screen over a corpus with planted TRUNCATED
  // twins (first half of each of the first 30 docs) — the case Jaccard
  // structurally misses (J ~ 0.5, containment ~ 1). Exact tier, both
  // directions, integer ppm; the twin replays string-shingle set
  // algebra.
  // ---------------------------------------------------------------------
  /** docs < 100 ∪ half-length truncations of docs < 30 (ids +20000):
    * the planted-containment fixture shared by `x_dedup_containment`
    * and `x_media_dedup` — one recipe, one SQL twin, no drift. */
  private def truncatedTwinDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 20000).as("doc_id"),
          expr("substring(text, 1, cast(length(text) div 2 as int))")
            .as("text")))
  }

  /** DuckDB form of [[truncatedTwinDocs]]. LAZY: xMediaDedupSql is
    * declared earlier in the object and initializes first — a plain
    * val here would interpolate as null there (Scala val order). */
  private lazy val truncatedTwinSql: String =
    """SELECT doc_id, text FROM documents WHERE doc_id < 100
      |    UNION ALL
      |    SELECT doc_id + 20000 AS doc_id,
      |      substr(text, 1, CAST(length(text) // 2 AS INTEGER)) AS text
      |    FROM documents WHERE doc_id < 30""".stripMargin

  def xDedupContainment(s: SparkSession, dir: String): DataFrame =
    DedupOps.containmentPairs(truncatedTwinDocs(s, dir), "doc_id",
        "text", n = 2, tauPpm = 600000L)
      .orderBy(col("id_a"), col("id_b"))

  val xDedupContainmentSql: String =
    s"""WITH corpus AS (
       |    $truncatedTwinSql),
       |  tok AS (SELECT doc_id, $toksSql AS toks FROM corpus),
       |  $shingleCteSql,
       |  pj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      CAST(len(a.sh) AS BIGINT) AS n_a,
       |      CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter
       |    FROM t a JOIN t b ON a.doc_id <> b.doc_id)
       |SELECT id_a, id_b, n_a, n_inter,
       |  n_inter * 1000000 // n_a AS containment_ppm
       |FROM pj WHERE n_inter * 1000000 // n_a >= 600000
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // Per-group weighted sampling without replacement
  // (Split.weightedSamplePerGroup): 5 docs per source chosen ∝ token
  // count via per-group Efraimidis-Spirakis keys, ranked by the
  // window-free two-pass grouped rank. The twin replays the score and
  // a per-group window.
  // ---------------------------------------------------------------------
  def xSampleGroupWeighted(s: SparkSession, dir: String): DataFrame = {
    // weight = tokenCount(text) is a pure text function — ride the
    // fanOutPerText class tier so the tokenizer runs once per distinct
    // text on clone-heavy corpora (values identical either way).
    val d = TextOps.fanOutPerText(t(s, dir, "documents"), "text")(tc =>
        Seq("weight" -> (TextOps.tokenCount(tc).cast("long") + 1)))
      .select(col("doc_id"), col("source"), col("weight"))
    graft.transform.Split.weightedSamplePerGroup(d, "source", "doc_id",
        "weight", 5)
      .select(col("doc_id"), col("source"), col("weight"),
        col("sample_score_fx"), col("sample_rank"), col("n_group"))
      .orderBy(col("doc_id"))
  }

  val xSampleGroupWeightedSql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    CAST(len($toksSql) AS BIGINT) + 1 AS weight FROM documents),
       |  k AS (SELECT doc_id, source, weight,
       |      CAST(FLOOR(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
       |          1, 15))::BIGINT + 1) / 1152921504606846976.0)
       |        * 1073741824.0 / weight) AS BIGINT) AS sample_score_fx
       |    FROM d WHERE weight > 0),
       |  r AS (SELECT *,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY sample_score_fx DESC, doc_id) AS BIGINT)
       |        AS sample_rank,
       |      CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
       |        AS n_group
       |    FROM k)
       |SELECT doc_id, source, weight, sample_score_fx, sample_rank,
       |  n_group
       |FROM r WHERE sample_rank <= 5 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Winnowing fingerprints (TextOps.winnowFingerprints): min-hash of
  // each 4-window over 4-token shingle hashes — any shared 7-token run
  // between documents lands one identical fingerprint in both. The
  // selection depends on hash VALUES, so the twin recomputes the same
  // portable md5 hashes and takes the same minima.
  // ---------------------------------------------------------------------
  def xTextWinnow(s: SparkSession, dir: String): DataFrame =
    TextOps.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text",
        k = 4, w = 4)
      .orderBy(col("doc_id"), col("fp"))

  val xTextWinnowSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |  g AS (SELECT doc_id, list_transform(range(1, len(toks) - 2),
       |      i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
       |        || toks[i+2] || ' ' || toks[i+3]), 1, 15))::BIGINT) AS hs
       |    FROM tok WHERE len(toks) >= 4),
       |  wmin AS (SELECT doc_id,
       |      unnest(list_transform(
       |        range(1, greatest(len(hs) - 4, 0) + 2),
       |        i -> list_min(hs[i : i + least(4, len(hs)) - 1]))) AS fp
       |    FROM g)
       |SELECT DISTINCT doc_id, fp FROM wmin
       |ORDER BY doc_id, fp""".stripMargin

  // ---------------------------------------------------------------------
  // Vocabulary coverage curve (SketchOps.vocabCoverage): token mass
  // captured by a frequency-ranked top-k vocabulary at each cut — the
  // "how big a tokenizer vocab do we need" question. The Spark side
  // ranks via the two-pass contiguous-id machinery (no vocab-wide
  // window); the twin's ROW_NUMBER order (count desc, token asc) is the
  // same deterministic total order.
  // ---------------------------------------------------------------------
  def xVocabCoverage(s: SparkSession, dir: String): DataFrame =
    graft.ext.SketchOps.vocabCoverage(t(s, dir, "documents"), "text",
        Seq(100, 300, 1000, 3000, 10000))
      .orderBy(col("top_k"))

  val xVocabCoverageSql: String =
    s"""WITH tok AS (SELECT unnest($toksSql) AS t FROM documents),
       |  v AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
       |    FROM tok GROUP BY t),
       |  r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rk
       |    FROM v),
       |  ks(top_k) AS (VALUES (100), (300), (1000), (3000), (10000)),
       |  cov AS (SELECT top_k,
       |      CAST(SUM(CASE WHEN rk <= top_k THEN c ELSE 0 END) AS BIGINT)
       |        AS covered_tokens,
       |      CAST(SUM(c) AS BIGINT) AS total_tokens
       |    FROM r CROSS JOIN ks GROUP BY top_k)
       |SELECT top_k, covered_tokens, total_tokens,
       |  covered_tokens * 1000000 // total_tokens AS coverage_ppm
       |FROM cov ORDER BY top_k""".stripMargin

  // ---------------------------------------------------------------------
  // Bloom membership sketch + cross-source FPR audit (SketchOps
  // .bloomWords/bloomProbe): each source's 3-gram set folds into a
  // 16384-bit filter (261 words of 63 bits — DuckDB's checked `<<`
  // rules out sign-bit slabs); every OTHER source's distinct grams
  // probe it, the cross-source membership screen of the decontamination
  // family. n_false_neg is PROVABLY 0 (Bloom never forgets) and stays
  // in the output so the oracle hash pins the proof; the build uses all
  // gram occurrences while the twin builds from the DISTINCT gram set —
  // identical filters, since bit-OR is idempotent.
  // ---------------------------------------------------------------------
  private val BloomM = 16384
  private val BloomD = 3
  def xSketchBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sketch = graft.ext.SketchOps.bloomWords(docs, "source", "text",
        mBits = BloomM, depth = BloomD, gramN = 3)
      .withColumnRenamed("source", "bloom_src")
    // ONE (gram → containing-source-set) relation replaces three
    // gram-string shuffles of the naive shape (distinct for the probe
    // side, distinct for the truth side, and the truth equi-join):
    // positions hash once per gram, the ×(G−1) fan-out replicates
    // them, and truth is an array_contains against the collected set —
    // after the single groupBy, gram strings never shuffle again
    // (measured 9.2 → 3.4 s at sf0.1, with the probe restructure).
    // collect_set is duplicate-blind → the gram explode runs over
    // DISTINCT (source, text) pairs on clone-heavy corpora (same tier
    // rule as the sketch builds themselves).
    val gsrc = graft.ext.SketchOps
      .distinctGroupTexts(docs, "source", "text")
      .select(col("source"),
        explode(coalesce(TextOps.shingles(TextOps.tokens(col("text")), 3),
          array().cast("array<string>"))).as("gram"))
      .groupBy(col("gram"))
      .agg(collect_set(col("source")).as("_srcs"))
    val srcs = docs.select(col("source").as("bloom_src")).distinct()
    val probes = graft.ext.SketchOps.bloomPositionsFor(gsrc, "gram",
        BloomM, BloomD)
      .select(col("*"), explode(col("_srcs")).as("probe_src"))
      .join(broadcast(srcs), col("probe_src") =!= col("bloom_src"))
      .withColumn("_present",
        array_contains(col("_srcs"), col("bloom_src")).cast("int"))
      .drop("_srcs")
    graft.ext.SketchOps.bloomProbe(sketch, probes,
        "bloom_src", "gram", mBits = BloomM, depth = BloomD)
      .groupBy(col("probe_src"), col("bloom_src"))
      .agg(count(lit(1)).as("n_probes"),
        sum(col("_present")).cast("long").as("n_present"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("bloom_hit") && col("_present") === 0, 1L)
          .otherwise(0L)).as("n_false_pos"),
        sum(when(!col("bloom_hit") && col("_present") === 1, 1L)
          .otherwise(0L)).as("n_false_neg"))
      .withColumn("fpr_ppm",
        when(col("n_probes") > col("n_present"),
          expr("n_false_pos * 1000000 div (n_probes - n_present)"))
          .otherwise(lit(0L)))
      .orderBy(col("probe_src"), col("bloom_src"))
  }

  val xSketchBloomSql: String =
    s"""WITH g3 AS (SELECT doc_id, source, t FROM $grams3Sql z),
       |  gr AS (SELECT DISTINCT source, t AS gram FROM g3),
       |  fan AS (SELECT source, gram, unnest(range($BloomD)) AS j
       |    FROM gr),
       |  pos AS (SELECT source,
       |      ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram),
       |        1, 15))::BIGINT % $BloomM AS p FROM fan),
       |  words AS (SELECT source AS bloom_src, p // 63 AS word,
       |      bit_or(1::BIGINT << CAST(p % 63 AS INTEGER)) AS bits
       |    FROM pos GROUP BY 1, 2),
       |  pr AS (SELECT a.source AS probe_src, b.bloom_src, a.gram
       |    FROM gr a
       |    JOIN (SELECT DISTINCT source AS bloom_src FROM documents) b
       |      ON a.source <> b.bloom_src),
       |  pf AS (SELECT probe_src, bloom_src, gram,
       |      unnest(range($BloomD)) AS j FROM pr),
       |  pp AS (SELECT probe_src, bloom_src, gram,
       |      ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram),
       |        1, 15))::BIGINT % $BloomM AS p FROM pf),
       |  pb AS (SELECT pp.probe_src, pp.bloom_src, pp.gram,
       |      CASE WHEN (COALESCE(w.bits, 0) &
       |          (1::BIGINT << CAST(pp.p % 63 AS INTEGER))) <> 0
       |        THEN 1 ELSE 0 END AS bitset
       |    FROM pp LEFT JOIN words w
       |      ON w.bloom_src = pp.bloom_src AND w.word = pp.p // 63),
       |  hit AS (SELECT probe_src, bloom_src, gram,
       |      MIN(bitset) = 1 AS bloom_hit FROM pb GROUP BY 1, 2, 3),
       |  wt AS (SELECT h.probe_src, h.bloom_src, h.bloom_hit,
       |      CASE WHEN g.gram IS NOT NULL THEN 1 ELSE 0 END AS present
       |    FROM hit h LEFT JOIN gr g
       |      ON g.source = h.bloom_src AND g.gram = h.gram)
       |SELECT probe_src, bloom_src,
       |  CAST(COUNT(*) AS BIGINT) AS n_probes,
       |  CAST(SUM(present) AS BIGINT) AS n_present,
       |  CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  CAST(SUM(CASE WHEN bloom_hit AND present = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_false_pos,
       |  CAST(SUM(CASE WHEN present = 1 AND NOT bloom_hit
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
       |  CAST(CASE WHEN COUNT(*) > SUM(present)
       |    THEN SUM(CASE WHEN bloom_hit AND present = 0 THEN 1 ELSE 0 END)
       |      * 1000000 // (COUNT(*) - SUM(present))
       |    ELSE 0 END AS BIGINT) AS fpr_ppm
       |FROM wt GROUP BY probe_src, bloom_src
       |ORDER BY probe_src, bloom_src""".stripMargin

  // ---------------------------------------------------------------------
  // Log₂-histogram quantile sketch (SketchOps.logHistSketch +
  // histQuantiles): p50/p90/p99 of event value per event type from a
  // mergeable relative-error-bucket histogram — HDR-histogram buckets
  // in exact integer arithmetic (fixed-point ×100, bit-length via
  // bin(), no transcendental), so the twin replays the sketch bucket
  // for bucket and the decode rank for rank. True quantile is within
  // a 2^-6 relative factor of est by the bucket-width guarantee.
  // ---------------------------------------------------------------------
  def xSketchQuantiles(s: SparkSession, dir: String): DataFrame = {
    val sk = graft.ext.SketchOps.logHistSketch(t(s, dir, "events"),
      "event_type", "value", mBits = 6, scale = 100.0)
    graft.ext.SketchOps.histQuantiles(sk, "event_type",
        Seq(50, 90, 99), scale = 100.0)
      .orderBy(col("event_type"), col("p"))
  }

  val xSketchQuantilesSql: String =
    s"""WITH v AS (SELECT event_type,
       |      CAST(FLOOR(value * 100.0) AS BIGINT) AS i
       |    FROM events WHERE FLOOR(value * 100.0) >= 1),
       |  b AS (SELECT event_type,
       |      i - i % (1::BIGINT << GREATEST(0, LENGTH(bin(i)) - 7))
       |        AS bucket FROM v),
       |  s AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT)
       |      AS cnt FROM b GROUP BY 1, 2),
       |  c AS (SELECT event_type, bucket, cnt,
       |      SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
       |        AS cum,
       |      SUM(cnt) OVER (PARTITION BY event_type) AS n FROM s),
       |  f AS (SELECT event_type, p, CAST(n AS BIGINT) AS n,
       |      MIN(bucket) AS bucket_lo
       |    FROM c CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) ps
       |    WHERE cum >= (n * p + 99) // 100 GROUP BY 1, 2, 3)
       |SELECT event_type, CAST(p AS BIGINT) AS p, n, bucket_lo,
       |  CAST(bucket_lo AS DOUBLE) / 100.0 AS est
       |FROM f ORDER BY event_type, p""".stripMargin

  // ---------------------------------------------------------------------
  // ANN recall audit (recall@5 of the LSH tier vs the brute-force
  // truth): the production "is my index good enough to ship" metric —
  // measured IN the engine, per query, before anyone swaps the exact
  // scan for the bucketed one. Both sides are top-k lists (queries × k
  // rows); the audit itself is list-sized joins and never re-touches
  // the corpus. Both tiers are already bit-exact against DuckDB
  // (x_sim_topk / x_sim_ann), so the recall numbers are too.
  // ---------------------------------------------------------------------
  def xSimRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth = SimilarityOps.bruteForceTopK(q, emb,
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val ann = SimilarityOps.annTopK(q, emb,
        "vec_id", "embedding", k = 5, dim = 64, bits = 4, tables = 8)
      .select(col("query_id"), col("neighbor_id"))
    SimilarityOps.topKRecall(truth, ann).orderBy(col("query_id"))
  }

  val xSimRecallSql: String = {
    val perTable = lshBucketsSql(dim = 64, bits = 4, tables = 8,
      seed = 42L)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |    WHERE vec_id < 10),
       |  bsc AS (SELECT query_id, vec_id AS neighbor_id,
       |      round(list_dot_product(qv, v)
       |        / (sqrt(list_dot_product(qv, qv))
       |           * sqrt(list_dot_product(v, v))), 6) AS score
       |    FROM q, e WHERE vec_id <> query_id),
       |  tr AS (SELECT query_id, neighbor_id FROM (
       |      SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, neighbor_id) AS rnk FROM bsc)
       |    WHERE rnk <= 5),
       |  eb AS ($perTable),
       |  cand AS (SELECT DISTINCT b.vec_id AS query_id,
       |      c.vec_id AS neighbor_id
       |    FROM eb b JOIN eb c ON b.tbl = c.tbl AND b.bkt = c.bkt
       |    WHERE b.vec_id < 10 AND c.vec_id <> b.vec_id),
       |  asc2 AS (SELECT cand.query_id, cand.neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM cand
       |    JOIN e qv ON qv.vec_id = cand.query_id
       |    JOIN e cv ON cv.vec_id = cand.neighbor_id),
       |  ar AS (SELECT query_id, neighbor_id FROM (
       |      SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, neighbor_id) AS rnk FROM asc2)
       |    WHERE rnk <= 5),
       |  t AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
       |    FROM tr GROUP BY query_id),
       |  a AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ann
       |    FROM ar GROUP BY query_id),
       |  h AS (SELECT tr.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |    FROM tr JOIN ar USING (query_id, neighbor_id)
       |    GROUP BY tr.query_id)
       |SELECT t.query_id, n_truth,
       |  COALESCE(n_ann, 0) AS n_ann, COALESCE(n_hit, 0) AS n_hit,
       |  COALESCE(n_hit, 0) * 1000000 // n_truth AS recall_ppm
       |FROM t LEFT JOIN a ON t.query_id = a.query_id
       |LEFT JOIN h ON t.query_id = h.query_id
       |ORDER BY t.query_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // ANN MRR audit (reciprocal rank of the TRUE nearest neighbor inside
  // the ANN top-5, per query): recall@k says whether the index finds
  // the neighborhood; MRR says whether it puts the right answer FIRST
  // — the ranking-quality half of the ship/no-ship gate. Exact
  // integers (mrr_ppm = 10⁶ div rank, 0 on a miss); both tiers already
  // bit-exact vs DuckDB, so the audit is too.
  // ---------------------------------------------------------------------
  def xSimMrr(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth1 = SimilarityOps.bruteForceTopK(q, emb,
        "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id").as("truth_id"))
    val ann = SimilarityOps.annTopK(q, emb,
        "vec_id", "embedding", k = 5, dim = 64, bits = 4, tables = 8)
    SimilarityOps.topKMrr(truth1, ann).orderBy(col("query_id"))
  }

  val xSimMrrSql: String = {
    val perTable = lshBucketsSql(dim = 64, bits = 4, tables = 8,
      seed = 42L)
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |    WHERE vec_id < 10),
       |  bsc AS (SELECT query_id, vec_id AS neighbor_id,
       |      round(list_dot_product(qv, v)
       |        / (sqrt(list_dot_product(qv, qv))
       |           * sqrt(list_dot_product(v, v))), 6) AS score
       |    FROM q, e WHERE vec_id <> query_id),
       |  tr AS (SELECT query_id, neighbor_id AS truth_id FROM (
       |      SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, neighbor_id) AS rnk FROM bsc)
       |    WHERE rnk = 1),
       |  eb AS ($perTable),
       |  cand AS (SELECT DISTINCT b.vec_id AS query_id,
       |      c.vec_id AS neighbor_id
       |    FROM eb b JOIN eb c ON b.tbl = c.tbl AND b.bkt = c.bkt
       |    WHERE b.vec_id < 10 AND c.vec_id <> b.vec_id),
       |  asc2 AS (SELECT cand.query_id, cand.neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM cand
       |    JOIN e qv ON qv.vec_id = cand.query_id
       |    JOIN e cv ON cv.vec_id = cand.neighbor_id),
       |  ar AS (SELECT query_id, neighbor_id, rnk FROM (
       |      SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, neighbor_id) AS rnk FROM asc2)
       |    WHERE rnk <= 5)
       |SELECT tr.query_id, truth_id,
       |  CAST(COALESCE(ar.rnk, 0) AS BIGINT) AS ann_rank,
       |  CASE WHEN ar.rnk IS NOT NULL THEN 1000000 // ar.rnk
       |    ELSE 0 END AS mrr_ppm
       |FROM tr LEFT JOIN ar ON ar.query_id = tr.query_id
       |  AND ar.neighbor_id = tr.truth_id
       |ORDER BY tr.query_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // ANN ship gates over the PERSISTED index (r14 verdict ask #5): the
  // recall@5 / MRR audits above measure the LSH tier, but the index a
  // deployment actually serves is the persisted IVF state
  // (AnnIndexJob) — loaded from parquet, append-grown daily against a
  // frozen quantizer. These rows run the SAME audits against the
  // loaded state's IVF search (annState: trained once per session,
  // then every search replays the load path), so the green row
  // certifies "the index we ship clears the gate", not "an index like
  // it would". Appends can only degrade recall (the quantizer never
  // re-fits); JobsSpec pins day-2-append recall == union-retrain
  // recall on the frozen sample.
  // ---------------------------------------------------------------------
  def xSimRecallIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth = SimilarityOps.bruteForceTopK(q, emb,
      "vec_id", "embedding", k = 5)
    val ann = SimilarityOps.ivfTopKSampledWithIndex(q, emb,
      annState(s, dir), "vec_id", "embedding", k = 5, nProbe = 4)
    SimilarityOps.topKRecall(truth, ann).orderBy(col("query_id"))
  }

  /** Shared DuckDB chain: brute-force truth (tr) + the deterministic
    * sampled-quantizer IVF top-5 (ar) — the xSimIvfSql pipeline with
    * the truth CTEs of xSimRecallSql, composed once for both gates. */
  private def ivfGateCtes(k: Int): String = {
    val (nCent, nProbe) = (16, 4)
    s"""e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |  q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |    WHERE vec_id < 10),
       |  bsc AS (SELECT query_id, vec_id AS neighbor_id,
       |      round(list_dot_product(qv, v)
       |        / (sqrt(list_dot_product(qv, qv))
       |           * sqrt(list_dot_product(v, v))), 6) AS score
       |    FROM q, e WHERE vec_id <> query_id),
       |  trr AS (SELECT query_id, neighbor_id, rnk FROM (
       |      SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, neighbor_id) AS rnk FROM bsc)
       |    WHERE rnk <= $k),
       |  cent AS (SELECT CAST(rn - 1 AS INTEGER) AS cell, cv FROM (
       |    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
       |    FROM e ORDER BY vec_id LIMIT $nCent)),
       |  ad AS (SELECT e.vec_id, c.cell,
       |      list_dot_product(e.v, e.v)
       |        - 2 * list_dot_product(e.v, c.cv)
       |        + list_dot_product(c.cv, c.cv) AS d2
       |    FROM e, cent c),
       |  rk AS MATERIALIZED (SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |                         ORDER BY d2, cell) AS rn FROM ad),
       |  asgn AS (SELECT vec_id AS neighbor_id, cell FROM rk
       |    WHERE rn = 1),
       |  pr AS (SELECT vec_id AS query_id, cell FROM rk
       |    WHERE vec_id < 10 AND rn <= $nProbe),
       |  sc AS (SELECT p.query_id, a.neighbor_id,
       |      round(list_dot_product(qv.v, cv.v)
       |        / (sqrt(list_dot_product(qv.v, qv.v))
       |           * sqrt(list_dot_product(cv.v, cv.v))), 6) AS score
       |    FROM pr p JOIN asgn a ON p.cell = a.cell
       |    JOIN e qv ON qv.vec_id = p.query_id
       |    JOIN e cv ON cv.vec_id = a.neighbor_id
       |    WHERE a.neighbor_id <> p.query_id),
       |  ar AS (SELECT query_id, neighbor_id, rnk FROM (
       |      SELECT query_id, neighbor_id,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY score DESC, neighbor_id) AS rnk FROM sc)
       |    WHERE rnk <= $k)""".stripMargin
  }

  val xSimRecallIvfSql: String =
    s"""WITH ${ivfGateCtes(5)},
       |  t AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
       |    FROM trr GROUP BY query_id),
       |  a AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ann
       |    FROM ar GROUP BY query_id),
       |  h AS (SELECT trr.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |    FROM trr JOIN ar USING (query_id, neighbor_id)
       |    GROUP BY trr.query_id)
       |SELECT t.query_id, n_truth,
       |  COALESCE(n_ann, 0) AS n_ann, COALESCE(n_hit, 0) AS n_hit,
       |  COALESCE(n_hit, 0) * 1000000 // n_truth AS recall_ppm
       |FROM t LEFT JOIN a ON t.query_id = a.query_id
       |LEFT JOIN h ON t.query_id = h.query_id
       |ORDER BY t.query_id""".stripMargin

  def xSimMrrIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val truth1 = SimilarityOps.bruteForceTopK(q, emb,
        "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id").as("truth_id"))
    val ann = SimilarityOps.ivfTopKSampledWithIndex(q, emb,
      annState(s, dir), "vec_id", "embedding", k = 5, nProbe = 4)
    SimilarityOps.topKMrr(truth1, ann).orderBy(col("query_id"))
  }

  val xSimMrrIvfSql: String =
    s"""WITH ${ivfGateCtes(5)},
       |  tr1 AS (SELECT query_id, neighbor_id AS truth_id FROM trr
       |    WHERE rnk = 1)
       |SELECT tr1.query_id, truth_id,
       |  CAST(COALESCE(ar.rnk, 0) AS BIGINT) AS ann_rank,
       |  CASE WHEN ar.rnk IS NOT NULL THEN 1000000 // ar.rnk
       |    ELSE 0 END AS mrr_ppm
       |FROM tr1 LEFT JOIN ar ON ar.query_id = tr1.query_id
       |  AND ar.neighbor_id = tr1.truth_id
       |ORDER BY tr1.query_id""".stripMargin

  // ---------------------------------------------------------------------
  // MinHash-estimator accuracy audit (DedupOps.minhashEstimateAudit):
  // per pair on the bounded doc_id < 60 slice, the 16-permutation
  // portable-md5 signature agreement (the quantity LSH thresholds on)
  // vs the exact shingle Jaccard, with |error| in ppm. The portable
  // permutation family h60("p:" + shingle) lets the twin reproduce
  // every signature component, so the estimator itself — not just its
  // candidates — is on the oracle's hook.
  // ---------------------------------------------------------------------
  def xDedupMinhashEst(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(col("doc_id") < 60 && TextOps.tokenCount(col("text")) >= 2)
    DedupOps.minhashEstimateAudit(docs, "doc_id", "text",
        n = 2, numPerm = 16)
      .orderBy(col("id_a"), col("id_b"))
  }

  val xDedupMinhashEstSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS toks
       |             FROM documents WHERE doc_id < 60),
       |  $shingleCteSql,
       |  pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      $jaccardSql AS jaccard
       |    FROM t a JOIN t b ON a.doc_id < b.doc_id),
       |  g AS (SELECT doc_id, unnest(sh) AS g FROM t),
       |  fan AS (SELECT doc_id, g, unnest(range(16)) AS p FROM g),
       |  h AS (SELECT doc_id, p,
       |      MIN(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || g),
       |        1, 15))::BIGINT) AS mh
       |    FROM fan GROUP BY doc_id, p),
       |  agree AS (SELECT pr.id_a, pr.id_b, pr.jaccard,
       |      CAST(SUM(CASE WHEN ha.mh = hb.mh THEN 1 ELSE 0 END)
       |        AS BIGINT) AS n_agree
       |    FROM pr JOIN h ha ON ha.doc_id = pr.id_a
       |    JOIN h hb ON hb.doc_id = pr.id_b AND hb.p = ha.p
       |    GROUP BY pr.id_a, pr.id_b, pr.jaccard)
       |SELECT id_a, id_b, jaccard, n_agree,
       |  n_agree * 1000000 // 16 AS est_ppm,
       |  abs(n_agree * 1000000 // 16
       |    - CAST(FLOOR(jaccard * 1000000.0) AS BIGINT)) AS err_ppm
       |FROM agree ORDER BY id_a, id_b""".stripMargin
}
