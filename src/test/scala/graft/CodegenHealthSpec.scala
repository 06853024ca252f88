package graft

import org.apache.spark.sql.functions._

/** Regression guard for the round-2 driver-bench outage: native
  * expressions with fixed local names in generated Java compiled fine
  * alone, but two instances fused into ONE generated method (one nested
  * in the other's block — e.g. both operands of an AND predicate) hit
  * Java's no-shadowing rule, janino rejected the class, and the query
  * silently ran interpreted (26× slower in the driver env). These tests
  * stack every native expression against itself in the shapes that fuse
  * (AND predicate, multi-column projection) and assert via
  * [[graft.tools.CodegenWatch]] that zero codegen compile errors fired. */
class CodegenHealthSpec extends SparkSpec {

  private def assertNoCodegenErrors(body: => Unit): Unit = {
    graft.tools.CodegenWatch.install()
    val before = graft.tools.CodegenWatch.count.get()
    body
    val after = graft.tools.CodegenWatch.count.get()
    assert(after == before,
      s"codegen compile failures fired (${after - before}) — generated " +
        "Java was rejected and Spark fell back to interpreted eval")
  }

  test("stacked native exprs in one AND predicate compile cleanly") {
    import spark.implicits._
    // Token sets chosen so simhash has bit majorities (nonzero result).
    val df = Seq(
      (Array(1L, 3L, 7L, 15L), Array(0.5f, 0.5f), Array(1.0f, 2.0f)),
      (Array(7L, 7L, 7L, 9L), Array(0.1f, 0.9f), Array(3.0f, 4.0f))
    ).toDF("toks", "va", "vb")
    df.createOrReplaceTempView("cg_probe")
    assertNoCodegenErrors {
      // Both operands of each AND nest one expression's generated code
      // inside the other's block — the exact round-2 failure shape.
      val filtered = spark.sql(
        """SELECT * FROM cg_probe
          |WHERE graft_dot(va, vb) > 0.0 AND graft_dot(vb, va) > 0.0
          |  AND graft_simhash(toks) != 0 AND graft_simhash(toks) IS NOT NULL
          |""".stripMargin)
      assert(filtered.count() == 2)
      val projected = spark.sql(
        """SELECT graft_shingle_hashes(toks, 2) AS s1,
          |       graft_shingle_hashes(toks, 3) AS s2,
          |       graft_minhash_sig(toks, 8) AS m1,
          |       graft_minhash_sig(toks, 16) AS m2,
          |       graft_simhash(toks) AS sh,
          |       graft_dot(va, vb) AS d
          |FROM cg_probe
          |WHERE size(graft_minhash_sig(toks, 8)) = 8
          |   AND size(graft_shingle_hashes(toks, 2)) > 0
          |""".stripMargin).collect()
      assert(projected.length == 2)
    }
  }

  test("graft_hash_tokens is bit-identical to per-element xxhash64") {
    import spark.implicits._
    val df = Seq(
      Seq("hello", "wörld", "", "日本語", "a" * 500),
      Seq("x")
    ).toDF("toks")
    df.createOrReplaceTempView("cg_toks")
    // Stacked in an AND predicate under the no-codegen-error guard: the
    // fused nested-block shape must compile for this expression too.
    assertNoCodegenErrors {
      val stacked = spark.sql(
        """SELECT * FROM cg_toks
          |WHERE size(graft_hash_tokens(toks)) > 0
          |  AND element_at(graft_hash_tokens(toks), 1) IS NOT NULL
          |""".stripMargin)
      assert(stacked.count() == 2)
    }
    val rows = spark.sql(
      """SELECT graft_hash_tokens(toks) AS fast,
        |       transform(toks, t -> xxhash64(t)) AS slow
        |FROM cg_toks""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // null element hashes to the seed, matching xxhash64(NULL)
    val withNull = spark.sql(
      "SELECT graft_hash_tokens(array('a', NULL)) AS h").collect()(0)
      .getSeq[Long](0)
    val seedOnly = spark.sql(
      "SELECT xxhash64(CAST(NULL AS STRING)) AS h").collect()(0).getLong(0)
    assert(withNull(1) == seedOnly)
  }

  test("graft_nfc normalizes decomposed text, idempotent, compiles stacked") {
    import spark.implicits._
    // raw = DECOMPOSED (base char + combining mark), pre = PRECOMPOSED
    val df = Seq(
      ("café", "café"),
      ("über ok", "über ok"),
      ("plain ascii", "plain ascii")
    ).toDF("raw", "pre")
    df.createOrReplaceTempView("nfc_probe")
    assertNoCodegenErrors {
      val out = spark.sql(
        """SELECT graft_nfc(raw) AS n, pre,
          |       length(raw) AS lr, length(graft_nfc(raw)) AS ln
          |FROM nfc_probe
          |WHERE graft_nfc(raw) = graft_nfc(graft_nfc(raw))
          |  AND graft_nfc(raw) IS NOT NULL""".stripMargin).collect()
      assert(out.length == 3)
      out.foreach(r => assert(r.getString(0) == r.getString(1),
        s"NFC mismatch: ${r.getString(0)} != ${r.getString(1)}"))
      // combining marks merged: decomposed inputs lose one codepoint
      assert(out.count(r => r.getInt(3) == r.getInt(2) - 1) == 2)
    }
    val n = spark.sql("SELECT graft_nfc(CAST(NULL AS STRING))").collect()
    assert(n(0).isNullAt(0))
  }

  test("graft_del_variants matches the HOF formulation and compiles stacked") {
    import spark.implicits._
    val df = Seq("abc", "aab", "x", "日本語", "").toDF("s")
    df.createOrReplaceTempView("cg_del")
    assertNoCodegenErrors {
      val stacked = spark.sql(
        """SELECT * FROM cg_del
          |WHERE size(graft_del_variants(s)) > 0
          |  AND element_at(graft_del_variants(s), 1) = s
          |""".stripMargin)
      assert(stacked.count() == 5) // first variant is always s itself
    }
    // Same SET of variants as the declarative HOF form (order differs:
    // native is [s, deletions...] deduped; HOF sorts for the compare).
    val rows = spark.sql(
      """SELECT array_sort(graft_del_variants(s)) AS fast,
        |  array_sort(array_distinct(concat(array(s),
        |    transform(sequence(1, length(s)),
        |      i -> concat(substr(s, 1, i - 1),
        |                  substr(s, i + 1, length(s))))))) AS slow
        |FROM cg_del WHERE length(s) >= 1""".stripMargin).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // Empty string: just itself (no deletions).
    val empty = spark.sql("SELECT graft_del_variants('') AS v")
      .collect()(0).getSeq[String](0)
    assert(empty == Seq(""))
  }

  test("graft_ln is bit-identical to glibc/DuckDB ln (the oracle contract)") {
    import spark.implicits._
    // Expected bits are glibc's correctly-observed `log` outputs, probed
    // against DuckDB `ln` (bit-equal there). Spark's builtin `ln` uses
    // StrictMath/fdlibm, which is 1 ulp off on ln(3.0) — the exact reason
    // GraftLn exists. If a JVM ever changes the Math.log intrinsic away
    // from the platform libm, this test is the tripwire.
    val expect = Map(
      2.0 -> 0x3fe62e42fefa39efL,
      3.0 -> 0x3ff193ea7aad030bL, // fdlibm gives ...030a here
      10.0 -> 0x40026bb1bbb55516L,
      1234.5678 -> 0x401c7951d51791d7L,
      0.1 -> 0xc0026bb1bbb55515L,
      7.0 / 3.0 -> 0x3feb1d10670aae9aL,
      1e-9 -> 0xc034b927f32bffb8L,
      601.0 / 37.0 -> 0x40064d299c46a8dbL)
    val df = expect.keys.toSeq.toDF("x")
    df.createOrReplaceTempView("cg_ln")
    assertNoCodegenErrors {
      val rows = spark.sql(
        "SELECT x, graft_ln(x) AS l FROM cg_ln WHERE graft_ln(x) IS NOT NULL")
        .collect()
      assert(rows.length == expect.size)
      rows.foreach { r =>
        val bits = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        assert(bits == expect(r.getDouble(0)),
          s"graft_ln(${r.getDouble(0)}) bits ${bits.toHexString} != " +
            s"expected ${expect(r.getDouble(0)).toHexString}")
      }
    }
    // NULL propagates; domain edges follow Math.log.
    val edge = spark.sql(
      "SELECT graft_ln(CAST(NULL AS DOUBLE)), graft_ln(0.0d), graft_ln(-1.0d)")
      .collect()(0)
    assert(edge.isNullAt(0))
    assert(edge.getDouble(1).isNegInfinity)
    assert(edge.getDouble(2).isNaN)
  }

  test("graft_lm_nll compiles stacked and matches interpreted eval") {
    import spark.implicits._
    val model = graft.ext.TextOps.lmTrainHashed(
      Seq("a b a b", "a c").toDF("text"), "text")
    val df = Seq("a b c", "z z z", "a", "").toDF("text")
    df.createOrReplaceTempView("cg_lm")
    def nll = graft.ext.TextOps.lmNllStruct(col("text"), model)
    assertNoCodegenErrors {
      val stacked = df.filter(nll.isNotNull && nll.getField("sfx") >= 0L)
      assert(stacked.count() == 2) // "a" and "" have no bigrams → null
    }
    val sql = df.select(nll.as("s"))
    val generated = sql.collect()
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = sql.collect()
      assert(generated.toSeq == interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("graft_dict_sum compiles stacked and matches interpreted eval") {
    import spark.implicits._
    val model = graft.ext.TextOps.nbTrainHashed(
      Seq(("good text", true), ("bad junk", false)).toDF("text", "pos"),
      "text", col("pos"))
    val df = Seq("good text", "bad junk", "novel words", "")
      .toDF("text")
    def ds = call_function("graft_dict_sum",
      call_function("graft_hash_tokens",
        graft.ext.TextOps.tokens(col("text"))),
      lit(model.keys), lit(model.vals), lit(model.defaultFx))
    assertNoCodegenErrors {
      // fused nested shape: both operands of one AND predicate
      val stacked = df.filter(ds.getField("n") >= 0 &&
        ds.getField("sum") + lit(model.priorFx) > Long.MinValue)
      assert(stacked.count() == 4)
    }
    val sql = df.select(ds.as("s"))
    val generated = sql.collect()
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = sql.collect()
      assert(generated.toSeq == interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("graft_bloom_contains compiles stacked; no false negatives") {
    import spark.implicits._
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq("alpha", "beta", "gamma").foreach(bloom.putString)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val df = Seq("alpha", "beta", "gamma", "delta", "epsilon").toDF("s")
    df.createOrReplaceTempView("cg_bloom")
    def contains = call_function("graft_bloom_contains", col("s"), lit(bytes))
    assertNoCodegenErrors {
      val stacked = df.filter(contains && contains) // fused nested shape
      // members MUST pass (no false negatives); non-members usually don't
      val hits = stacked.collect().map(_.getString(0)).toSet
      assert(Set("alpha", "beta", "gamma").subsetOf(hits))
    }
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val gen = df.select(contains).collect().map(_.getBoolean(0)).toSeq
      spark.conf.set("spark.sql.codegen.factoryMode", prev)
      val gen2 = df.select(contains).collect().map(_.getBoolean(0)).toSeq
      assert(gen == gen2, "interpreted and codegen probes must agree")
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("graft_window_hashes: positional, agrees with shingle identity") {
    import spark.implicits._
    val df = Seq((Array("a", "b", "c", "a", "b"), 0)).toDF("toks", "pad")
    df.createOrReplaceTempView("cg_win")
    assertNoCodegenErrors {
      val row = spark.sql(
        """SELECT graft_window_hashes(graft_hash_tokens(toks), 2) AS w,
          |       graft_shingle_hashes(graft_hash_tokens(toks), 2) AS s,
          |       graft_window_hashes(graft_hash_tokens(toks), 9) AS e
          |FROM cg_win""".stripMargin).collect()(0)
      val w = row.getSeq[Long](0)
      val s = row.getSeq[Long](1)
      // positional: one hash per start; windows "ab","bc","ca","ab"
      assert(w.length == 4)
      assert(w(0) == w(3) && w(0) != w(1), "identical windows must collide")
      // identity agrees with the sorted-distinct shingle family
      assert(w.toSet == s.toSet)
      assert(row.getSeq[Long](2).isEmpty, "docs shorter than n → empty")
    }
  }

  test("graft_strip_covered: two-pointer sweep matches set semantics") {
    import spark.implicits._
    val df = Seq(
      // starts {0, 3} with n=3 cover positions 0-2 and 3-5 → keep 6
      (Array("t0", "t1", "t2", "t3", "t4", "t5", "t6"), Array(0, 3)),
      // overlapping starts {1, 2}, n=3 → cover 1-4, keep 0,5,6
      (Array("t0", "t1", "t2", "t3", "t4", "t5", "t6"), Array(1, 2)),
      // no coverage
      (Array("t0", "t1"), Array.empty[Int]),
      // full coverage
      (Array("t0", "t1", "t2"), Array(0))
    ).toDF("toks", "starts")
    df.createOrReplaceTempView("cg_strip")
    assertNoCodegenErrors {
      val rows = spark.sql(
        """SELECT graft_strip_covered(toks, starts, 3) AS kept
          |FROM cg_strip""".stripMargin)
        .collect().map(_.getSeq[String](0))
      assert(rows(0) == Seq("t6"))
      assert(rows(1) == Seq("t0", "t5", "t6"))
      assert(rows(2) == Seq("t0", "t1"))
      assert(rows(3) == Seq.empty)
    }
    // brute-force cross-check on random inputs: kept == positions not in
    // any [st, st+n-1]
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val len = 1 + rnd.nextInt(30)
      val toks = Array.tabulate(len)(i => s"w$i")
      val n = 1 + rnd.nextInt(5)
      val starts = (0 until len).filter(_ => rnd.nextBoolean()).toArray
      val expect = (0 until len).filterNot(p =>
        starts.exists(st => st <= p && p <= st + n - 1)).map(toks)
      val got = Seq((toks, starts)).toDF("toks", "starts")
        .selectExpr(s"graft_strip_covered(toks, starts, $n) AS kept")
        .collect()(0).getSeq[String](0)
      assert(got == expect, s"n=$n starts=${starts.mkString(",")}")
    }
  }

  test("graft_shingle_h60 is bit-identical to the transform+h60 " +
      "lambda form it replaces") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "one", "", "wörld café 日本語 mixed unicode tokens here")
      .toDF("text")
    df.createOrReplaceTempView("cg_sh60")
    for (k <- Seq(2, 3, 4)) {
      val rows = spark.sql(
        s"""SELECT graft_shingle_h60(toks, $k) AS fast,
           |  transform(
           |    CASE WHEN size(toks) >= $k THEN
           |      transform(sequence(0, size(toks) - $k),
           |        i -> array_join(slice(toks, i + 1, $k), ' '))
           |    ELSE array() END,
           |    g -> CAST(conv(substring(md5(g), 1, 15), 16, 10)
           |      AS BIGINT)) AS slow
           |FROM (SELECT array_remove(split(lower(text),
           |  '[^a-z0-9]+'), '') AS toks FROM cg_sh60)""".stripMargin)
        .collect()
      rows.foreach(r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k"))
    }
  }

  test("graft_min_windows matches the array_min(slice) lambda form, " +
      "full and ragged windows") {
    import spark.implicits._
    val df = Seq(
      Array(5L, 3L, 8L, 1L, 9L, 2L, 7L),
      Array(4L, 4L, 4L),
      Array(9L),
      Array(1L, 2L)).toDF("hs")
    df.createOrReplaceTempView("cg_minw")
    for (w <- Seq(1, 2, 4, 10)) {
      val rows = spark.sql(
        s"""SELECT graft_min_windows(hs, $w) AS fast,
           |  transform(sequence(0, greatest(size(hs) - $w, 0)),
           |    i -> array_min(slice(hs, i + 1,
           |      least($w, size(hs))))) AS slow
           |FROM cg_minw""".stripMargin).collect()
      rows.foreach(r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"w=$w"))
    }
  }

  test("graft_gram_stats: [n, distinct, max-multiplicity] on hand " +
      "cases; matches the groupBy twin; null/empty conventions") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(7L, 7L, 7L, 3L, 3L, 9L)), // n=6 d=3 mx=3
      (2L, Array(5L)),                     // n=1 d=1 mx=1
      (3L, Array.empty[Long]),             // empty -> [0,0,0]
      (4L, Array(1L, 2L, 3L, 4L))          // all distinct
    ).toDF("id", "hs")
    df.createOrReplaceTempView("cg_gs")
    val got = spark.sql(
        "SELECT id, graft_gram_stats(hs) AS s FROM cg_gs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(6L, 3L, 3L))
    assert(got(2L) == Seq(1L, 1L, 1L))
    assert(got(3L) == Seq(0L, 0L, 0L))
    assert(got(4L) == Seq(4L, 4L, 1L))
    // null input -> null (UnaryExpression null propagation)
    assert(spark.sql("SELECT graft_gram_stats(CAST(NULL AS ARRAY<BIGINT>))")
      .collect()(0).isNullAt(0))
    // fixture-scale agreement with the explode+groupBy definition
    val docs = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .limit(150)
      .select(col("doc_id"), expr("graft_hash_tokens(" +
        "array_remove(split(lower(text), '[^a-z0-9]+'), ''))").as("hs"))
    docs.createOrReplaceTempView("cg_gs2")
    val rows = spark.sql(
      """SELECT f.doc_id FROM
        |  (SELECT doc_id, graft_gram_stats(hs) AS s FROM cg_gs2
        |   WHERE size(hs) > 0) f
        |JOIN
        |  (SELECT doc_id, array(CAST(SUM(c) AS BIGINT),
        |       CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT)) AS s
        |   FROM (SELECT doc_id, g, COUNT(*) AS c
        |         FROM (SELECT doc_id, explode(hs) AS g FROM cg_gs2)
        |         GROUP BY doc_id, g)
        |   GROUP BY doc_id) slow
        |ON f.doc_id = slow.doc_id AND f.s = slow.s""".stripMargin)
      .count()
    val n = spark.sql(
      "SELECT COUNT(*) FROM cg_gs2 WHERE size(hs) > 0").collect()(0)
      .getLong(0)
    assert(rows == n, s"gram stats must match the groupBy twin ($rows/$n)")
  }

  test("graft_span_corrupt equals the aggregate-fold lambda twin on " +
      "the fixture corpus, multiple rates") {
    val docs = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .limit(120)
    for (rate <- Seq(1, 150, 500, 999)) {
      val fast = graft.ext.TextOps.spanCorrupt(
          docs, "doc_id", "text", rate)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toMap
      val slow = graft.ext.TextOps.spanCorruptFold(
          docs, "doc_id", "text", rate)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(fast == slow, s"rate=$rate")
    }
  }

  test("graft_hilbert compiles stacked (two walks in one projection + " +
    "an AND predicate) and matches interpreted eval") {
    import spark.implicits._
    val df = (for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y))
      .toDF("hx", "hy")
    df.createOrReplaceTempView("cg_hilbert")
    assertNoCodegenErrors {
      // two instances fuse into one generated method — the freshName
      // shadowing shape the suite exists to guard
      val out = spark.sql(
        """SELECT graft_hilbert(hx, hy, 4) AS d1,
          |       graft_hilbert(hy, hx, 4) AS d2
          |FROM cg_hilbert
          |WHERE graft_hilbert(hx, hy, 4) >= 0
          |  AND graft_hilbert(hy, hx, 4) >= 0
          |""".stripMargin).collect()
      assert(out.length == 256)
      // codegen output == interpreted eval (nullSafeEval) on every cell
      val viaExpr = out.map(_.getLong(0)).toSeq
      val interpreted = (for (x <- 0L to 15L; y <- 0L to 15L) yield {
        graft.expressions.HilbertIndex(
          org.apache.spark.sql.catalyst.expressions.Literal(x),
          org.apache.spark.sql.catalyst.expressions.Literal(y), 4)
          .eval(null).asInstanceOf[Long]
      }).toSeq
      assert(viaExpr == interpreted)
      // a bits=4 walk visits every cell exactly once
      assert(viaExpr.sorted == (0L until 256L))
    }
  }

  test("codegen results match interpreted eval on the stacked shapes") {
    import spark.implicits._
    val df = Seq((Array(11L, 22L, 33L, 44L, 55L), Array("a", "bb")))
      .toDF("toks", "strs")
    df.createOrReplaceTempView("cg_probe2")
    val sql =
      """SELECT graft_simhash(toks) AS sh,
        |       graft_minhash_sig(toks, 4) AS mh,
        |       graft_shingle_hashes(toks, 2) AS sg,
        |       graft_hash_tokens(strs) AS th,
        |       graft_shingle_h60(strs, 2) AS s60,
        |       graft_min_windows(toks, 2) AS mw,
        |       graft_ln(CAST(element_at(toks, 1) AS DOUBLE)) AS ln
        |FROM cg_probe2""".stripMargin
    val generated = spark.sql(sql).collect()
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = spark.sql(sql).collect()
      assert(generated.toSeq == interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
