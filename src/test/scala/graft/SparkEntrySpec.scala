package graft

/** Driver-contract guards: entry() smoke, and oracleSql ⊆ queries with
  * consistent naming (a dangling oracle key would silently skip a check). */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the sf0.001 fixture (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without queries: $dangling")
  }

  test("every registered query carries an oracle (no rows-only checks left)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only queries: $rowsOnly")
  }

  test("query names are unique and stable in count") {
    // r13 second wave: +x_privacy_ldiv, x_layout_zorder,
    // x_layout_hilbert, x_layout_zorder3, x_label_vote,
    // x_label_reliability, x_embed_abtt, x_graph_lpa, x_pack_balanced,
    // x_embed_moments, x_sample_pps
    assert(SparkEntry.queries.size == 194)
    assert(SparkEntry.oracleSql.size == 194)
  }
}
