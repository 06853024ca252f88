package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** W7 — synthetic tabular data, the working replacement for the
  * reference's dead CTGAN path (`core/utils/data_core.py:110-176`,
  * imports commented out). Honestly labeled: this is an EMPIRICAL
  * per-column sampler, not a GAN — numeric columns draw from a
  * piecewise-linear inverse CDF over approximate deciles, categorical
  * columns draw from the observed top-K frequency distribution. Column
  * marginals match the source; cross-column joint structure is NOT
  * preserved (that is the part CTGAN would add).
  *
  * Scale shape: fitting is one pass of sketches (approxQuantile /
  * top-K counts — both driver-tiny summaries); generation is
  * `spark.range(n)` plus a seeded-rand projection — embarrassingly
  * parallel, no shuffle, fully deterministic for a fixed seed and row
  * count.
  */
object Synth {

  private val Deciles = (0 to 10).map(_ / 10.0).toArray

  /** Sample `n` synthetic rows whose per-column marginals approximate
    * `df`'s. Deterministic in (df contents, n, seed).
    *
    * The uniform draws are MATERIALIZED as columns before the generator
    * projection references them: `rand()` is non-deterministic, so every
    * textual copy of it inside a when-chain would re-evaluate
    * independently (and CollapseProject refuses to inline
    * non-deterministic columns — exactly the guarantee needed here). */
  def sample(df: DataFrame, n: Long, seed: Long = 42L,
             topK: Int = 20): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.zipWithIndex
    val withU = spark.range(n).select(
      fields.map { case (_, i) => rand(seed + i).as(s"_u$i") }.toSeq: _*)
    val gens: Seq[Column] = fields.map {
      case (f, i) =>
        val u = col(s"_u$i")
        val g = f.dataType match {
          case _: NumericType =>
            numericGen(df, f, u).cast(f.dataType)
          case TimestampType | TimestampNTZType =>
            timestamp_micros(
              numericGen(df, f.copy(name = f.name), u,
                pre = c => unix_micros(c.cast(TimestampType)))
                .cast(LongType)).cast(f.dataType)
          case BooleanType =>
            val pTrue = df.filter(col(f.name) === true).count().toDouble /
              math.max(df.count(), 1L)
            u < pTrue
          case _ => categoricalGen(df, f.name, u, topK)
        }
        g.as(f.name)
    }.toSeq
    withU.select(gens: _*)
  }

  /** Piecewise-linear inverse CDF over approximate deciles. */
  private def numericGen(df: DataFrame, f: StructField, u: Column,
                         pre: Column => Column = identity): Column = {
    val q = df.select(pre(col(f.name)).cast("double").as("_v"))
      .na.drop().stat.approxQuantile("_v", Deciles, 0.001)
    if (q.isEmpty) return lit(null).cast("double")
    val idx = least(floor(u * 10).cast("int"), lit(9))
    val frac = u * 10 - idx.cast("double")
    // select decile bounds with when-chains (driver-side constants)
    def at(base: Int): Column = (0 to 9).map { k =>
      (k, q(math.min(base + k, 10)))
    }.foldRight(lit(q.last)) { case ((k, v), elseC) =>
      when(idx === k, lit(v)).otherwise(elseC)
    }
    at(0) + frac * (at(1) - at(0))
  }

  /** Frequency-weighted draw from the observed top-K values (cumulative
    * probability when-chain; ties and the tail collapse into the most
    * frequent value). */
  private def categoricalGen(df: DataFrame, name: String, u: Column,
                             topK: Int): Column = {
    val counts = df.groupBy(col(name)).count()
      .orderBy(desc("count"), col(name).cast("string"))
      .limit(topK).collect()
      .map(r => (r.get(0), r.getLong(1)))
    if (counts.isEmpty) return lit(null)
    val total = counts.map(_._2).sum.toDouble
    val cum = counts.scanLeft(("" : Any, 0.0)) {
      case ((_, acc), (v, c)) => (v, acc + c / total)
    }.drop(1)
    cum.init.foldRight(lit(cum.last._1.toString)) {
      case ((v, cumP), elseC) =>
        when(u < cumP, lit(if (v == null) null else v.toString))
          .otherwise(elseC)
    }
  }
}
