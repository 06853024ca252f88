package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-mitigation helpers (SURVEY §4.2 / the 100 TB brief: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join splitting handles JOIN skew automatically (enabled in
  * [[graft.engine.Engine.session]]); aggregation skew it does not touch:
  * a groupBy on a key where one value holds 30% of 100 TB funnels that
  * value's rows into one reducer. Salting splits each hot key across
  * `salts` reducers with a synthetic sub-key, aggregates partially, then
  * merges the partials — two small shuffles instead of one skewed one.
  */
object Skew {

  /** Two-phase salted sum/count per key. Decimal-exact accumulation, so
    * the result is bit-identical to the unsalted aggregation (addition of
    * exact decimals is associative — the whole point of not summing raw
    * doubles twice). Salt derivation is value-independent (row position),
    * which spreads rows regardless of key distribution. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol).cast(DecimalType(30, 6))).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).cast(DoubleType).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n_rows"))

  /** Salted equi-join for the case AQE can't fix: BOTH sides too large to
    * broadcast and one join key pathologically hot (AQE's skew splitting
    * works per sort-merge partition, but a single key's rows still land
    * in one partition — it cannot split WITHIN a key; salting can).
    *
    * Left rows get a random salt in [0, salts); every right row is
    * replicated `salts` times (one per salt value) so each (key, salt)
    * reducer holds the full right side for its key. Cost: right side
    * shuffled `salts`× — use a `salts` just big enough to break the hot
    * key (8-32), and only when metrics show a single-key hot spot.
    * Inner-join semantics; result equals the unsalted join exactly. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
