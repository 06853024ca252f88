package graft.transform

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** W1 — contiguous sequential id assignment
  * (`core/utils/data_core.py:169-171`): new ids must be dense
  * `start, start+1, …, start+n-1` in a caller-specified order.
  *
  * Scale design: a global `row_number()` window collapses to ONE partition
  * — a non-starter at 100 TB. Instead: range-partition by the ordering key
  * (so partitions are globally ordered), count rows per partition (cheap
  * first pass), prefix-sum the counts on the driver (#partitions longs),
  * then attach `offset(p) + local_index` per partition. Two passes over the
  * data, zero skew, no single-partition stage.
  *
  * The sorted RDD is persisted (MEMORY_AND_DISK_SER) across the two passes
  * and unpersisted in a finally: range-partitioner boundaries come from a
  * runtime sample, so recomputing the lineage between passes could shift
  * rows across partitions and break contiguity — the persist is a
  * correctness anchor, not a cache nicety. At extreme scale, swap for a
  * checkpoint to cheap storage; the pass structure is unchanged.
  * `monotonically_increasing_id` is NOT used — it is non-contiguous by
  * design and would break reference parity.
  */
object Ids {

  def assignContiguousIds(df: DataFrame, orderCol: Column,
                          idName: String = "new_id",
                          start: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val n = df.rdd.getNumPartitions.max(1)
    val sorted = df.repartitionByRange(n, orderCol)
      .sortWithinPartitions(orderCol)
    val rdd = sorted.rdd
    rdd.persist(StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // Pass 1: per-partition counts → driver-side prefix sums (tiny:
      // #partitions longs; rows are only counted, never collected).
      val counts = rdd
        .mapPartitionsWithIndex { (i, it) =>
          var c = 0L; while (it.hasNext) { it.next(); c += 1 }
          Iterator((i, c))
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(start)(_ + _)
      // Pass 2: attach offset + local index.
      val withId = rdd.mapPartitionsWithIndex { (i, it) =>
        var j = 0L
        it.map { r =>
          val id = offsets(i) + j; j += 1
          Row.fromSeq(r.toSeq :+ id)
        }
      }
      val schema = StructType(sorted.schema.fields :+
        StructField(idName, LongType, nullable = false))
      // localCheckpoint (eager): materializes the ids while the persisted
      // parent is alive AND truncates lineage, so a later action can never
      // re-sample the range partitioner and shift ids. Unlike `.cache()`
      // (which pins a full table copy in the CacheManager until explicitly
      // unpersisted — a session-lifetime leak at 100 TB), checkpoint blocks
      // are released by the ContextCleaner as soon as the returned frame is
      // garbage-collected. At extreme scale swap for checkpoint-to-storage;
      // the pass structure is unchanged.
      spark.createDataFrame(withId, schema).localCheckpoint(eager = true)
    } finally rdd.unpersist(blocking = false)
  }

  /** Reference composition (`data_core.py:169`): continue ids after the
    * current max of an existing id column. */
  def appendIdsAfterMax(existing: DataFrame, newRows: DataFrame,
                        idCol: String, orderCol: Column): DataFrame = {
    val maxId = existing.agg(org.apache.spark.sql.functions.max(col(idCol)))
      .collect()(0) match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
    assignContiguousIds(newRows, orderCol, idCol + "_new", maxId + 1)
  }
}
