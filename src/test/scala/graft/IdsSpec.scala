package graft

import org.apache.spark.sql.functions._
import graft.transform.Ids

/** W1 contiguous-id semantics vs `core/utils/data_core.py:169-171`. */
class IdsSpec extends SparkSpec {

  test("assignContiguousIds is dense, starts at start, follows the order") {
    import spark.implicits._
    val n = 10007 // prime → uneven partition boundaries
    val df = spark.range(n).select(
        (col("id") * 2654435761L % 1000003L).as("key"),
        col("id").as("payload"))
      .repartition(8) // ≥8 partitions, arbitrary placement before the op
    val out = Ids.assignContiguousIds(df, col("key"), "new_id", start = 100L)
    val rows = out.select("key", "new_id").collect()
    assert(rows.length == n)
    val ids = rows.map(_.getLong(1)).sorted
    assert(ids.head == 100L && ids.last == 100L + n - 1)
    assert(ids.toSet.size == n) // dense + unique
    // ids ordered by the ordering key
    val byId = rows.sortBy(_.getLong(1)).map(_.getLong(0))
    assert(byId.zip(byId.tail).forall { case (a, b) => a <= b })
  }

  test("no cached RDDs linger once results are unreachable (no cache pin)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // Two calls — the old `.cache().count()` materialization pinned one
    // full table copy in the block store PER CALL for the session's
    // lifetime; localCheckpoint blocks must drain once unreachable.
    var out = Ids.assignContiguousIds(
      spark.range(5000).select(col("id").as("k")), col("k"))
    assert(out.count() == 5000)
    out = Ids.assignContiguousIds(
      spark.range(3000).select(col("id").as("k")), col("k"))
    assert(out.count() == 3000)
    out = null // drop the only reference → ContextCleaner may reclaim
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var extra = Set.empty[Int]
    while ({
      System.gc()
      extra = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
      extra.nonEmpty && System.nanoTime() < deadline
    }) Thread.sleep(200)
    assert(extra.isEmpty,
      s"persistent RDDs leaked after results became unreachable: $extra")
  }

  test("appendIdsAfterMax continues after the existing max") {
    import spark.implicits._
    val existing = Seq(3L, 9L, 7L).toDF("id")
    val incoming = spark.range(5).select(col("id").as("k"))
    val out = Ids.appendIdsAfterMax(existing, incoming, "id", col("k"))
    val ids = out.select("id_new").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(10L, 11L, 12L, 13L, 14L))
  }
}
