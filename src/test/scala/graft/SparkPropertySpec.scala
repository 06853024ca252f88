package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ext.TextOps
import graft.functions.Functions

/** Spark-evaluated properties: generated inputs are batched into ONE
  * DataFrame pass per law (per-sample Spark jobs would be minutes). */
class SparkPropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int = 300): Seq[A] =
    Iterator.from(0)
      .map(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .collect { case Some(v) => v }.take(n).toSeq

  test("parseFlag is total: any string maps to a non-null boolean") {
    import spark.implicits._
    val weird = Gen.oneOf(
      Gen.asciiPrintableStr, Gen.numStr,
      Gen.oneOf("1", "sim", " T ", "1,0", "0,99", "2,0", "nan", "inf",
        "-1", "1.0e0", "", " ", ",", "true true"))
    val df = (samples(weird, 500) :+ null).toDF("v")
    val out = df.select(Functions.parseFlag(col("v")).as("f"))
    assert(out.filter(col("f").isNull).count() == 0)
    assert(out.count() == 501)
  }

  test("shingle count law: max(tokens - n + 1, 0) distinct-capped") {
    import spark.implicits._
    val words = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
      .map(_.mkString(" "))
    val df = samples(words, 300).toDF("text")
    val rows = df.select(
        size(TextOps.tokens(col("text"))).as("nt"),
        size(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("ns"))
      .collect()
    rows.foreach { r =>
      val (nt, ns) = (r.getInt(0), r.getInt(1))
      assert(ns == math.max(nt - 3 + 1, 0), s"nt=$nt ns=$ns")
    }
  }

  test("jaccard is symmetric, bounded, and 1 on self") {
    import spark.implicits._
    val texts = samples(
      Gen.listOfN(12, Gen.oneOf("spark", "rows", "scan", "agg", "join",
        "key", "hash", "sort")).map(_.mkString(" ")), 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val pairs = graft.ext.DedupOps.jaccardPairs(df, "id", "text", n = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    pairs.foreach { case ((a, b), j) =>
      assert(j >= 0.0 && j <= 1.0, s"($a,$b) j=$j")
    }
    // self-jaccard via a cloned corpus
    val cloned = df.unionAll(df.select((col("id") + 1000).as("id"),
      col("text")))
    val selfPairs = graft.ext.DedupOps
      .jaccardPairs(cloned, "id", "text", n = 2)
      .filter(col("id_b") === col("id_a") + 1000)
      .collect().map(_.getDouble(2))
    assert(selfPairs.nonEmpty && selfPairs.forall(_ == 1.0))
  }

  test("profile invariants: null accounting, unique bounds, top-k mass") {
    import spark.implicits._
    // Random (string|null, long, double|null) rows — one generated frame,
    // one profile pass.
    val gen = Gen.zip(
      Gen.option(Gen.alphaStr.map(_.take(4))),
      Gen.chooseNum(-50L, 50L),
      Gen.option(Gen.chooseNum(-5.0, 5.0)))
    val rows = samples(gen, 400)
    val df = rows.map { case (s, l, d) =>
      (s.orNull, l, d.map(java.lang.Double.valueOf).orNull)
    }.toDF("s", "l", "d")
    val n = rows.length.toLong
    val prof = graft.transform.Profile.profile(df).collect()
    assert(prof.length == 3)
    prof.foreach { r =>
      val colName = r.getAs[String]("column")
      val nulls = r.getAs[Long]("null_count")
      val uniques = r.getAs[Long]("unique_count")
      val nonNull = n - nulls
      assert(nulls >= 0 && nulls <= n, s"$colName nulls=$nulls")
      assert(uniques <= nonNull, s"$colName uniques=$uniques > $nonNull")
      val top =
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top_10")
      assert(top.length <= 10)
      val counts = top.map(_.getAs[Long]("count"))
      // top-k is sorted by count desc and its mass can't exceed non-nulls
      // (null sentinel values count toward rows, not non-null — allow n)
      assert(counts.sorted.reverse == counts, s"$colName top10 unsorted")
      assert(counts.sum <= n, s"$colName top10 mass ${counts.sum} > $n")
      val sample = r.getAs[scala.collection.Seq[String]]("sample_values")
      assert(sample.length <= math.min(5, nonNull), s"$colName samples")
    }
  }

  test("as-of join law: equals per-row argmax for random (key, time) data") {
    import spark.implicits._
    // Small keyspace + coarse times force collisions: equal timestamps,
    // multiple rights per left, keys with rights only / lefts only.
    val rowGen = for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 20L)
    } yield (k, t)
    val lefts = samples(rowGen, 120).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "lid")
    // Unique (k, t) on the right — the operator's contract.
    val rights = samples(rowGen, 120).distinct.zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong * 10) }
      .toDF("k", "t", "rv")

    val fast = graft.transform.Temporal
      .asofJoinBackward(lefts, rights, "k", "t", "t")
      .select(col("lid"), col("asof_t"), col("asof_rv"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lid").orderBy(col("rt").desc)
    val naive = lefts
      .join(rights.select(col("k").as("rk"), col("t").as("rt"), col("rv")),
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("lid"), col("rt").as("asof_t"), col("rv").as("asof_rv"))

    assert(fast.count() == 120)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("hash split/sample laws: exhaustive id range, deterministic, disjoint, monotone") {
    import spark.implicits._
    val ids = spark.range(2000).toDF("id")
    val split = graft.transform.Split
      .hashSplit(ids, "id", Seq("a" -> 0.2, "b" -> 0.3), rest = "c")
    // Total function: every row gets exactly one of the declared names.
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("a", "b", "c")))
    assert(counts.values.sum == 2000L)
    // Fractions within bucket-granularity + hash noise of the ask.
    assert(math.abs(counts("a") / 2000.0 - 0.2) < 0.05, counts)
    assert(math.abs(counts("b") / 2000.0 - 0.3) < 0.05, counts)
    // Sampling is monotone in the fraction across many cut points.
    val fracs = Seq(0.05, 0.2, 0.5, 0.8, 0.95)
    val sets = fracs.map(f => graft.transform.Split.hashSample(ids, "id", f)
      .collect().map(_.getLong(0)).toSet)
    sets.sliding(2).foreach { case Seq(small, big) =>
      assert(small.subsetOf(big), "larger fraction must be a superset")
    }
  }

  test("contiguous ids: dense from start for random sizes and starts") {
    import spark.implicits._
    val cases = Seq((1, 0L), (97, 1000L), (1024, -7L))
    cases.foreach { case (size, start) =>
      val df = spark.range(size).select(
        (col("id") * 37 % 101).as("k"), col("id").as("payload"))
        .repartition(5)
      val ids = graft.transform.Ids
        .assignContiguousIds(df, col("k"), "nid", start)
        .select("nid").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (start until start + size).toSeq,
        s"size=$size start=$start not dense")
    }
  }

  test("tokenBudgetSample law: monotone in budget (prefix of the md5 order)") {
    import spark.implicits._
    val rows = samples(Gen.zip(Gen.chooseNum(1L, 500L),
        Gen.oneOf("a", "b"), Gen.chooseNum(1L, 40L)), 120)
      .distinctBy(_._1).toDF("id", "stratum", "n_tok")
    val budgets = Seq(50L, 150L, 400L, 1200L)
    val kept = budgets.map { b =>
      b -> graft.transform.Split.tokenBudgetSample(rows, "stratum", "id",
        "n_tok", Map("a" -> b, "b" -> b))
        .select("id").collect().map(_.getLong(0)).toSet
    }
    kept.sliding(2).foreach { case Seq((b1, s1), (b2, s2)) =>
      assert(s1.subsetOf(s2),
        s"budget $b1 selection must be a prefix of budget $b2's")
    }
    // budget ≥ total tokens keeps everything
    assert(kept.last._2 == rows.select("id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("winsorize law: outputs inside the band, order statistics preserved") {
    import spark.implicits._
    val vals = samples(Gen.chooseNum(-1000.0, 1000.0), 200)
    val df = vals.toDF("v")
    val out = graft.transform.Sanitize.winsorize(df, "v", 0.1, 0.9)
      .select("v", "v_wins", "v_lo", "v_hi").collect()
    val (lo, hi) = (out.head.getDouble(2), out.head.getDouble(3))
    assert(lo <= hi)
    out.foreach { r =>
      val (v, w) = (r.getDouble(0), r.getDouble(1))
      assert(w >= lo && w <= hi, s"clipped $w outside [$lo, $hi]")
      assert(w == math.min(math.max(v, lo), hi))
    }
    // clipping preserves weak order: v1 <= v2 → w1 <= w2
    val sorted = out.sortBy(_.getDouble(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(1) <= b.getDouble(1))
    }
  }

  test("componentSplit law: total assignment, component-constant splits") {
    import spark.implicits._
    val n = 80L
    val rows = (1L to n).map(i => (i, s"r$i")).toDF("id", "text")
    // random component labeling over a subset of ids (label = min id)
    val pairs = samples(Gen.zip(Gen.chooseNum(1L, n), Gen.chooseNum(1L, n)),
        40).filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    val comps = graft.ext.DedupOps.connectedComponents(
      pairs.toDF("id_a", "id_b"))
    val out = graft.transform.Split.componentSplit(rows, "id", comps,
        Seq("test" -> 0.25, "valid" -> 0.25))
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == n, "every row gets exactly one split")
    assert(out.values.forall(Set("test", "valid", "train")))
    val labels = comps.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all members of one component share the split
    labels.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(out).toSet.size == 1,
        s"component ${members.values.head} split apart")
    }
  }

  test("dsirSelect law: equals a naive reimplementation on random corpora") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val docGen = Gen.listOf(Gen.oneOf(vocab)).map(_.mkString(" "))
    val docs = samples(docGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val target = samples(docGen, 8).filter(_.nonEmpty)
    val m = 8
    val out = TextOps.dsirSelect(docs.toDF("id", "txt"),
        target.toDF("t"), "id", "txt", "t",
        numBuckets = m, budget = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    // naive mirror: same md5 bucket, same Math.log (graft_ln IS
    // Math.log), same floor(x*2^30) fixed point, same tie order
    def bkt(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % m
    }
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def fx(x: Double): Long = math.floor(x * 1073741824.0).toLong
    val tCnt = target.flatMap(toks).groupBy(bkt).map { case (b, g) =>
      b -> g.size.toLong }
    val tt = tCnt.values.sum
    val dCnt = docs.map { case (id, t) =>
      id -> toks(t).groupBy(bkt).map { case (b, g) => b -> g.size.toLong }
    }.toMap
    val rCnt = dCnt.values.flatten
      .groupBy(_._1).map { case (b, g) => b -> g.map(_._2).sum }
    val tr = rCnt.values.sum
    val lr = (0L until m.toLong).map { b =>
      b -> (fx(Math.log((tCnt.getOrElse(b, 0L) + 1).toDouble /
              (tt + m).toDouble)) -
            fx(Math.log((rCnt.getOrElse(b, 0L) + 1).toDouble /
              (tr + m).toDouble)))
    }.toMap
    val naive = docs.map { case (id, _) =>
      val cm = dCnt(id)
      (id, cm.values.sum, cm.map { case (b, c) => c * lr(b) }.sum)
    }.sortBy { case (id, _, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, nt, s), i) => (id, nt, s, i + 1) }
    assert(out.sortBy(_._4).toSeq == naive,
      "dsirSelect diverged from the naive mirror")
  }

  test("tokenEntropy law: equals the naive fixed-point H on random docs") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docGen = Gen.listOf(Gen.oneOf(vocab)).map(_.mkString(" "))
    val docs = samples(docGen, 250).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = TextOps.tokenEntropy(docs.toDF("id", "txt"), "id", "txt")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def fx(x: Double): Long = math.floor(x * 1073741824.0).toLong
    docs.foreach { case (id, t) =>
      val cs = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      val n = cs.sum
      val expected =
        if (n == 0) (0L, 0L, 0L)
        else {
          val sfx = cs.map(c => fx(c.toDouble * Math.log(c.toDouble))).sum
          (n, cs.size.toLong, fx(Math.log(n.toDouble)) - sfx / n)
        }
      assert(out(id) == expected, s"id=$id got=${out(id)} want=$expected")
    }
  }

  test("ngramNovelty law: equals naive bigram set arithmetic") {
    import spark.implicits._
    val vocab = Vector("x1", "x2", "x3", "y1", "y2")
    val docGen = Gen.listOf(Gen.oneOf(vocab)).map(_.mkString(" "))
    val rows = samples(Gen.zip(Gen.oneOf("ref", "s1", "s2", "s3"),
      docGen), 200)
    val out = TextOps.ngramNovelty(rows.toDF("src", "txt"),
        "src", "txt", refValue = "ref")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    def bigrams(t: String): Set[(String, String)] = {
      val tk = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      tk.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSet
    }
    val bySrc = rows.groupBy(_._1).view
      .mapValues(_.flatMap(r => bigrams(r._2)).toSet).toMap
    val ref = bySrc.getOrElse("ref", Set.empty)
    bySrc.keys.filter(_ != "ref").foreach { s =>
      val g = bySrc(s)
      val expected =
        if (g.isEmpty) ((None, None, None))
        else {
          val novel = (g -- ref).size.toLong
          ((Some(g.size.toLong), Some(novel),
            Some(novel * 1000000L / g.size)))
        }
      assert(out(s) == expected, s"src=$s got=${out(s)} want=$expected")
    }
  }

  test("qualityTopFraction law: equals naive scoring + per-group ceil cut") {
    import spark.implicits._
    val vocab = Vector("the", "cat", "runs", "42", "007", "of", "data")
    val docGen = Gen.listOf(Gen.oneOf(vocab)).map(_.mkString(" "))
    val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"), docGen), 150)
      .zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
    val ppm = 300000L
    val out = TextOps.qualityTopFraction(rows.toDF("id", "grp", "txt"),
        "id", "txt", "grp", keepPpm = ppm)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it")
    def score(t: String): Long = {
      val tk = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      -40L + 3L * tk.count(stop) + tk.distinct.length.toLong -
        2L * tk.count(_.matches("[0-9]+")) -
        math.max(0L, tk.length.toLong - 150L)
    }
    rows.groupBy(_._2).values.foreach { grp =>
      val ranked = grp.map(r => (r._1, score(r._3)))
        .sortBy { case (id, s) => (-s, id) }
      val n = ranked.size.toLong
      val cut = (n * ppm + 999999L) / 1000000L
      ranked.zipWithIndex.foreach { case ((id, _), i) =>
        val expected = ((i + 1L, n, (i + 1) <= cut))
        assert(out(id) == expected,
          s"id=$id got=${out(id)} want=$expected")
      }
    }
  }

  test("scoreTiles law: equals SQL NTILE(k) for random sizes, ties, k") {
    import spark.implicits._
    // heavy ties + random sizes: the ragged-edge rule (first n mod k
    // tiles get one extra row) must match NTILE exactly, rank ties
    // broken by id — the two-pass rank is semantics-for-semantics the
    // window form, minus the single-task window
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 5, 97); k <- Seq(1, 3, 4)) {
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(5).toDouble))
      val df = rows.toDF("id", "score")
      val got = TextOps.scoreTiles(df, "id", "score", k)
        .select("id", "tile").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"), col("id"))
      val want = df.withColumn("t", ntile(k).over(w))
        .select("id", "t").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=$n k=$k: $got vs $want")
    }
  }

  test("semanticDecontaminate law: equals the naive max-cosine screen") {
    import spark.implicits._
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-5.0f, 5.0f))
      .map(_.toArray).suchThat(v => v.exists(_ != 0f))
    val corpus = samples(vecGen, 60).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
    val bench = samples(vecGen, 7).zipWithIndex
      .map { case (v, i) => (100L + i, v.toSeq) }
    val tau = 0.6
    val out = graft.ext.SimilarityOps.semanticDecontaminate(
        corpus.toDF("id", "v"), bench.toDF("bid", "bv"),
        "id", "v", "bid", "bv", tau)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getBoolean(3)))).toMap
    // naive mirror: graft_dot accumulates left-to-right in doubles;
    // Spark round(_, 6) is BigDecimal HALF_UP
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      java.math.BigDecimal.valueOf(c)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    corpus.foreach { case (id, v) =>
      val best = bench.map { case (bid, bv) => (cos(v, bv), bid) }
        .maxBy { case (s, bid) => (s, -bid) }
      assert(out(id) == ((best._1, best._2, best._1 > tau)),
        s"id=$id spark=${out(id)} naive=$best")
    }
  }
}
