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
}
