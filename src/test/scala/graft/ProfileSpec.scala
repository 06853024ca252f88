package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.transform.Profile

/** W2 profile invariants + values vs `core/utils/data_core.py:178-299`. */
class ProfileSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq[(Option[String], Option[Int])](
      (Some("a"), Some(1)), (Some("a"), Some(2)), (Some("b"), None),
      (None, Some(2)), (Some("a"), Some(3))).toDF("s", "n")
  }

  test("profile invariants: null_count + non_null == rows; unique <= rows") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("s", "n"))
    assert(p("s").getAs[Long]("null_count") == 1L)
    assert(p("n").getAs[Long]("null_count") == 1L)
    // unique_count counts non-null distinct values (pandas nunique dropna).
    assert(p("s").getAs[Long]("unique_count") == 2L)
    assert(p("n").getAs[Long]("unique_count") == 3L)
    assert(p("s").getAs[Double]("null_pct") == 0.2)
  }

  test("profile top_10 ranks by count desc with __NULL__ sentinel") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val sTop = p("s").getAs[scala.collection.Seq[Row]]("top_10")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sTop.head == ("a", 3L))
    assert(sTop.toSet == Set(("a", 3L), ("b", 1L), ("__NULL__", 1L)))
    // total counted occurrences == rows
    assert(sTop.map(_._2).sum == 5L)
  }

  test("profile sample_values holds up to N non-null values") {
    val p = Profile.profile(df, sampleN = 3).collect()
      .map(r => r.getString(0) -> r).toMap
    val samples = p("s").getAs[scala.collection.Seq[String]]("sample_values")
    assert(samples.size == 3)
    assert(samples.forall(Set("a", "b").contains))
  }

  test("profile on a fixture table: dtypes and row-math hold") {
    val cust = graft.engine.Engine.table(spark, fixtureDir, "customer")
    val rows = cust.count()
    val p = Profile.profile(cust, exact = true).collect()
    assert(p.length == cust.columns.length)
    p.foreach { r =>
      assert(r.getAs[Long]("null_count") >= 0L)
      assert(r.getAs[Long]("unique_count") <= rows)
      val pct = r.getAs[Double]("null_pct")
      assert(pct >= 0.0 && pct <= 1.0)
    }
  }

  test("top_10 exact on a near-unique column (bounded per-partition prune)") {
    val wide = spark.range(1000).toDF("id")
      .select(col("id").cast("string").as("u"),
        (col("id") % 3).cast("string").as("m"))
      .repartition(8)
    val p = Profile.profile(wide).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("u").getAs[Long]("unique_count") == 1000L)
    val uTop = p("u").getAs[scala.collection.Seq[Row]]("top_10")
      .map(_.getString(0)).toSeq
    // all counts are 1 → ranked by value asc (deterministic tie-break)
    assert(uTop == (0 until 1000).map(_.toString).sorted.take(10))
    val mTop = p("m").getAs[scala.collection.Seq[Row]]("top_10")
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mTop == Set(("0", 334L), ("1", 333L), ("2", 333L)))
  }

  test("exact=false swaps HLL approx distincts (within tolerance, no melt dependency)") {
    val cust = graft.engine.Engine.table(spark, fixtureDir, "customer")
    val exact = Profile.profile(cust, exact = true).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("unique_count")).toMap
    val approx = Profile.profile(cust, exact = false).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("unique_count")).toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(math.abs(a - e).toDouble <= math.max(2.0, e * 0.1),
        s"$c approx=$a exact=$e")
    }
  }

  test("topKValues is deterministic under ties (count desc, value asc)") {
    import spark.implicits._
    val t = Seq("x", "y", "x", "y", "z").toDF("c")
    val top = Profile.topKValues(t, "c", 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("x", 2L), ("y", 2L)))
  }

  test("pearson: exact ±1 on linear data, 0 on orthogonal, layout-independent") {
    import spark.implicits._
    val lin = Seq((1.0, 2.0, "g"), (2.0, 4.0, "g"), (3.0, 6.0, "g"),
      (1.0, 9.0, "h"), (2.0, 6.0, "h"), (3.0, 3.0, "h")).toDF("x", "y", "g")
    val r = Profile.pearson(lin, "x", "y", Seq("g")).collect()
      .map(row => row.getString(0) -> row.getDouble(2)).toMap
    assert(r("g") == 1.0 && r("h") == -1.0) // exact: moments are decimal
    // x = [-1,0,1], y = [1,0,1]: covariance exactly 0.
    val orth = Seq((-1.0, 1.0), (0.0, 0.0), (1.0, 1.0)).toDF("x", "y")
    assert(Profile.pearson(orth, "x", "y", Nil).collect()(0).getDouble(1) == 0.0)
    // Partition-layout independence (the property built-in corr lacks).
    val a = Profile.pearson(lin.repartition(7, col("y")), "x", "y", Seq("g"))
    assert(a.collect().map(row => row.getString(0) -> row.getDouble(2)).toMap
      == r)
  }

  test("histogram: fixed buckets, overflow clamped to maxBucket, nulls dropped") {
    import spark.implicits._
    val v = Seq[java.lang.Double](0.0, 9.9, 10.0, 25.0, 99.0, 1e6, null)
      .toDF("v")
    val got = Profile.histogram(v, "v", 10.0, 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq.sorted
    assert(got == Seq((0L, 0.0, 2L), (1L, 10.0, 1L), (2L, 20.0, 1L),
      (4L, 40.0, 2L))) // 99.0 and 1e6 clamp into the top bucket
  }

  test("kAnonymity: min class, under-k mass, fully-anonymous and " +
    "fully-unique extremes") {
    import spark.implicits._
    // classes: (a,x)=4 rows, (a,y)=2, (b,x)=1
    val df = (Seq.fill(4)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq(("b", "x"))).toDF("q1", "q2")
    val r = Profile.kAnonymity(df, Seq("q1", "q2"), k = 3L).collect()(0)
    assert(r.getString(0) == "q1,q2" && r.getLong(1) == 3L)
    assert(r.getLong(2) == 7L && r.getLong(3) == 3L) // rows, groups
    assert(r.getLong(4) == 1L)                        // min_k
    assert(r.getLong(5) == 3L)                        // 2 + 1 below k=3
    assert(r.getLong(6) == 3000000L / 7L)             // exact floor ppm
    // k = 1: nothing can be below → exposure 0
    val ok = Profile.kAnonymity(df, Seq("q1", "q2"), k = 1L).collect()(0)
    assert(ok.getLong(5) == 0L && ok.getLong(6) == 0L)
    // fully-unique QI: everything below any k >= 2
    val uniq = (1 to 5).map(i => (s"u$i", i)).toDF("q1", "q2")
    val ur = Profile.kAnonymity(uniq, Seq("q1"), k = 2L).collect()(0)
    assert(ur.getLong(4) == 1L && ur.getLong(5) == 5L &&
      ur.getLong(6) == 1000000L)
  }

  test("lDiversity: homogeneous class caught despite k-anonymity, " +
    "entropy variant, hand-computed fixed points") {
    import spark.implicits._
    // classes by q: a = {s1 x3, s2 x1} (d=2), b = {s1 x4} (d=1, the
    // homogeneity attack: 4-anonymous but zero diversity), c = {s1,s2,s3}
    val df = (Seq.fill(3)(("a", "s1")) ++ Seq(("a", "s2")) ++
      Seq.fill(4)(("b", "s1")) ++
      Seq(("c", "s1"), ("c", "s2"), ("c", "s3"))).toDF("q", "s")
    val r = Profile.lDiversity(df, Seq("q"), "s", l = 2L).collect()(0)
    assert(r.getString(0) == "q" && r.getString(1) == "s" &&
      r.getLong(2) == 2L)
    assert(r.getLong(3) == 11L && r.getLong(4) == 3L) // n_rows, n_groups
    assert(r.getLong(5) == 1L)                        // min_distinct (b)
    assert(r.getLong(6) == 4L)                        // b's 4 rows below l=2
    assert(r.getLong(7) == 4000000L / 11L)
    // entropy fixed points: b is 0; a = floor(ln4*2^30) - floor(3ln3*2^30)div4
    val fx = 1073741824.0
    val hA = math.floor(math.log(4.0) * fx).toLong -
      math.floor(3.0 * math.log(3.0) * fx).toLong / 4L
    assert(r.getLong(8) == 0L) // min_entropy_fx = class b
    // classes below ln(2): b (H=0) and a (H≈0.562 < ln2≈0.693) → 8 rows
    val lnl = math.floor(math.log(2.0) * fx).toLong
    assert(hA < lnl)
    assert(r.getLong(9) == 8L && r.getLong(10) == 8000000L / 11L)
    // l = 1: nothing is ever below (every class has ≥1 value, H ≥ 0 = ln 1)
    val ok = Profile.lDiversity(df, Seq("q"), "s", l = 1L).collect()(0)
    assert(ok.getLong(6) == 0L && ok.getLong(9) == 0L)
    // sensitive column in the QI set must be rejected
    intercept[IllegalArgumentException] {
      Profile.lDiversity(df, Seq("q", "s"), "s", l = 2L)
    }
  }

  test("aucExact: perfect separation 1e6, all-tied 5e5, hand-computed " +
    "tie case, layout-independent") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long, Boolean)]): (Long, Long, Long) = {
      val r = Profile.aucExact(rows.toDF("id", "s", "y").repartition(5),
        "s", "id", "y").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(3))
    }
    // perfect: every positive above every negative
    val perfect = (1L to 4L).map(i => (i, 100L + i, true)) ++
      (5L to 10L).map(i => (i, i, false))
    assert(auc(perfect.toSeq) == ((4L, 6L, 1000000L)))
    // anti-perfect
    val anti = perfect.map { case (i, s, y) => (i, -s, y) }
    assert(auc(anti.toSeq)._3 == 0L)
    // all scores tied: midrank gives exactly 1/2
    val tied = (1L to 10L).map(i => (i, 7L, i % 2 == 0))
    assert(auc(tied.toSeq) == ((5L, 5L, 500000L)))
    // hand case: pos scores {3, 1}, neg {2, 1}.
    // pairs: (3>2)=1, (3>1)=1, (1<2)=0, (1==1)=0.5 → AUC = 2.5/4
    val hand = Seq((1L, 3L, true), (2L, 1L, true),
      (3L, 2L, false), (4L, 1L, false))
    assert(auc(hand)._3 == 625000L)
  }

  test("keySkew: hand-computed gini/share/quantiles on known group sizes") {
    import spark.implicits._
    // sizes per key: a=1, b=1, c=2, d=4 → ascending ranks 1..4
    val df = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val r = Profile.keySkew(df, Seq("k")).collect()(0)
    assert(r.getAs[String]("key_col") == "k")
    assert(r.getAs[Long]("n_keys") == 4L && r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("max_n") == 4L)
    assert(r.getAs[Long]("max_share_ppm") == 500000L)   // 4/8
    assert(r.getAs[Long]("skew_ratio_ppm") == 2000000L) // max 4 vs mean 2
    // Σ rank·n = 1+2+6+16 = 25; gini = (50 − 5·8)/(4·8) = 10/32
    assert(r.getAs[Long]("gini_ppm") == 312500L)
    // rank conventions: p50 → rank (4·50+99)//100 = 2 → size 1;
    // p99 → rank (4·99+99)//100 = 4 → size 4
    assert(r.getAs[Long]("p50_n") == 1L && r.getAs[Long]("p99_n") == 4L)
  }

  test("keySkew: uniform keys give gini 0 and skew ratio 10^6") {
    import spark.implicits._
    val df = (1 to 12).map(i => s"k${i % 4}").toDF("k")
    val r = Profile.keySkew(df, Seq("k")).collect()(0)
    assert(r.getAs[Long]("gini_ppm") == 0L)
    assert(r.getAs[Long]("skew_ratio_ppm") == 1000000L)
    assert(r.getAs[Long]("max_share_ppm") == 250000L)
    assert(r.getAs[Long]("p50_n") == 3L && r.getAs[Long]("p99_n") == 3L)
  }

  test("keySkew: float keys group -0.0 with 0.0 and all NaNs together " +
      "(typed-grouping parity); exotic key types are rejected loudly") {
    import spark.implicits._
    // typed grouping would see TWO keys here: {0.0 (×3), 1.0 (×1)} —
    // the melt must not split -0.0 from 0.0 nor NaN payloads from
    // each other.
    val df = Seq(0.0, -0.0, 0.0, 1.0).toDF("k")
    val r = Profile.keySkew(df, Seq("k")).collect()(0)
    assert(r.getAs[Long]("n_keys") == 2L, "-0.0 must melt into 0.0")
    assert(r.getAs[Long]("max_n") == 3L)
    val nan1 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val dfn = Seq(Double.NaN, nan1, 2.0).toDF("k")
    val rn = Profile.keySkew(dfn, Seq("k")).collect()(0)
    assert(rn.getAs[Long]("n_keys") == 2L, "NaN payloads must merge")
    // float column goes through the same normalization
    val dff = Seq(0.0f, -0.0f).toDF("k")
    assert(Profile.keySkew(dff, Seq("k")).collect()(0)
      .getAs[Long]("n_keys") == 1L)
    // non-injective string renders (array/binary) are rejected
    val bad = Seq(Array(1L, 2L)).toDF("k")
    val ex = intercept[IllegalArgumentException] {
      Profile.keySkew(bad, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("unsupported key column type"))
  }

  test("keySkew: multiple key columns, one row each, layout-independent") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("b", 2), ("c", 2), ("c", 3))
      .toDF("s", "n")
    val rows = Profile.keySkew(df.repartition(7), Seq("s", "n")).collect()
      .map(r => r.getAs[String]("key_col") -> r).toMap
    assert(rows.keySet == Set("s", "n"))
    assert(rows("s").getAs[Long]("n_keys") == 3L)
    assert(rows("n").getAs[Long]("n_keys") == 3L)
    assert(rows("s").getAs[Long]("max_n") == 2L)
    // single-partition input gives identical numbers
    val one = Profile.keySkew(df.coalesce(1), Seq("s")).collect()(0)
    assert(one.getAs[Long]("gini_ppm")
      == rows("s").getAs[Long]("gini_ppm"))
  }

  test("keySkewAcross: several frames share one rank machinery, " +
      "numbers equal the per-frame calls") {
    import spark.implicits._
    val d1 = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("s", "uid")
    val d2 = (1 to 9).map(i => s"src${i % 3}").toDF("source")
    val got = Profile.keySkewAcross(Seq(
        d1 -> Seq("s", "uid"), d2 -> Seq("source")))
      .orderBy("key_col").collect().toSeq
    val want = (Seq("s", "uid").map(k => Profile.keySkew(d1, Seq(k))) :+
        Profile.keySkew(d2, Seq("source")))
      .reduce(_ unionAll _).orderBy("key_col").collect().toSeq
    assert(got == want)
    // key-column names must be distinct across inputs
    intercept[IllegalArgumentException] {
      Profile.keySkewAcross(Seq(d1 -> Seq("s"), d2.withColumnRenamed(
        "source", "s") -> Seq("s")))
    }
  }
}
