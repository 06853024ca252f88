package graft.transform

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    rdd.cache()
    // Pass 1: per-partition counts → driver-side prefix sums (tiny).
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2.toLong)
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
    val out = spark.createDataFrame(withId, schema)
    out
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
