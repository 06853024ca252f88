package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import graft.transform.Profile

/** W2 golden-file parity (FIXTURES.md "Profiling golden fixture"): the
  * profile of `customer` and `events` at sf0.001 must match expectations
  * computed independently with pandas against the same parquet.
  *
  * Double-typed values are compared after parsing (Java and Python render
  * shortest-round-trip decimals slightly differently); everything else is
  * compared as exact strings.
  */
class ProfileGoldenSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def golden(table: String) = {
    val in = getClass.getResourceAsStream(s"/golden_profile_$table.json")
    assert(in != null, s"golden file for $table missing")
    val root = mapper.readTree(in)
    root.elements().asScala.map { n =>
      (n.get("column").asText(),
        (n.get("null_count").asLong(), n.get("null_pct").asDouble(),
          n.get("unique_count").asLong(),
          n.get("sample_values").elements().asScala.map(_.asText()).toSeq,
          n.get("top_10").elements().asScala
            .map(t => (t.get("value").asText(), t.get("count").asLong()))
            .toSeq))
    }.toMap
  }

  private def normalize(v: String, doubleTyped: Boolean): Any =
    if (doubleTyped && v != "__NULL__") v.toDouble else v

  private def check(table: String): Unit = {
    val df = graft.engine.Engine.table(spark, fixtureDir, table)
    val doubleCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.DoubleType)
      .map(_.name).toSet
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val expect = golden(table)
    assert(got.keySet == expect.keySet)
    expect.foreach { case (c, (nulls, pct, uniq, samples, top)) =>
      val r = got(c)
      val isD = doubleCols.contains(c)
      assert(r.getAs[Long]("null_count") == nulls, s"$table.$c null_count")
      assert(r.getAs[Double]("null_pct") == pct, s"$table.$c null_pct")
      assert(r.getAs[Long]("unique_count") == uniq, s"$table.$c unique")
      val gotSamples = r.getAs[scala.collection.Seq[String]]("sample_values")
        .map(normalize(_, isD)).toSeq
      assert(gotSamples == samples.map(normalize(_, isD)),
        s"$table.$c samples: $gotSamples vs $samples")
      val gotTop = r.getAs[scala.collection.Seq[Row]]("top_10")
        .map(t => (normalize(t.getString(0), isD), t.getLong(1))).toSeq
      assert(gotTop == top.map { case (v, n) => (normalize(v, isD), n) },
        s"$table.$c top_10: $gotTop vs $top")
    }
  }

  test("profile(customer) matches the pandas golden")(check("customer"))
  test("profile(events) matches the pandas golden")(check("events"))
}
