package graft

import org.apache.spark.sql.functions._
import graft.transform.Dedupe

/** J1 + exact-dedup semantics vs `core/utils/sheets_core.py:163-177`. */
class DedupeSpec extends SparkSpec {

  test("dedupeAppend drops rows whose trimmed id exists; trim-only, no lowercasing") {
    import spark.implicits._
    val existing = Seq("  A1 ", "b2", "", "  ").toDF("id")
    val incoming = Seq("A1", "a1", "B2", "b2 ", "c3", "").toDF("id")
    val kept = Dedupe.dedupeAppend(incoming, existing, "id")
      .collect().map(_.getString(0)).toSet
    // "A1" matches trimmed "A1"; "a1" does NOT (reference does str.strip()
    // with no lower: sheets_core.py:176); "b2 " trims to existing "b2";
    // empty ids never match (excluded from the existing set).
    assert(kept == Set("a1", "B2", "c3", ""))
  }

  test("dedupeAppend with numeric id columns compares stringified values") {
    import spark.implicits._
    val existing = Seq(1L, 2L).toDF("id")
    val incoming = Seq(2L, 3L).toDF("id")
    val kept = Dedupe.dedupeAppend(incoming, existing, "id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("dedupeAppend broadcast hint is size-gated: big existing side plans a non-broadcast anti join") {
    import spark.implicits._
    // spark.range carries exact size stats: 20M rows × 8B ≈ 160 MB — far
    // above the 64 MB broadcast ceiling, so the hint must be dropped and
    // the initial plan must not contain a broadcast exchange.
    val big = spark.range(20L * 1000 * 1000).select(col("id"))
    val incoming = Seq(1L, 2L, 3L).toDF("id")
    val planBig = Dedupe.dedupeAppend(incoming, big, "id")
      .queryExecution.sparkPlan.toString
    assert(!planBig.contains("BroadcastHashJoin"),
      s"large existing side must not be broadcast:\n$planBig")
    // Small side keeps the broadcast (no shuffle of incoming data).
    val small = Seq(1L, 2L).toDF("id")
    val planSmall = Dedupe.dedupeAppend(incoming, small, "id")
      .queryExecution.sparkPlan.toString
    assert(planSmall.contains("BroadcastHashJoin"),
      s"small existing side should broadcast:\n$planSmall")
  }

  test("exact dedup keeps one row per key") {
    import spark.implicits._
    val df = Seq(("k1", 1), ("k1", 2), ("k2", 3)).toDF("k", "v")
    val out = Dedupe.exact(df, Seq("k"))
    assert(out.count() == 2)
    assert(out.select("k").distinct().count() == 2)
  }

  test("exactKeepMin keeps the deterministic winner per key") {
    import spark.implicits._
    val df = Seq(("k1", 5), ("k1", 2), ("k1", 9), ("k2", 3)).toDF("k", "v")
    val out = Dedupe.exactKeepMin(df, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out == Map("k1" -> 2, "k2" -> 3))
  }
}
