package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K10 — native UPDATE/DELETE surface over parquet table paths, replacing
  * the reference's DML passthrough (`core/utils/db_core.py:187-200`, which
  * shipped UPDATE/DELETE strings to BigQuery).
  *
  * Vanilla parquet has no ACID DML, so this implements copy-on-write at
  * table-path granularity: plan the mutated frame, write it to a temp
  * sibling, then atomically swap directories. Same shape a lakehouse
  * format (Delta/Iceberg) uses, minus per-file-group granularity — at
  * 100 TB you would adopt one of those formats; the API surface here stays
  * identical, so callers don't change.
  *
  * Each op costs one counting scan (affected rows, computed before the
  * swap) plus one rewrite pass (scan → project/filter → write).
  */
object Dml {

  /** UPDATE t SET assignments WHERE cond. Returns affected-row count. */
  def update(spark: SparkSession, tablePath: String,
             assignments: Map[String, Column], cond: Column): Long = {
    val df = spark.read.parquet(tablePath)
    val updated = assignments.foldLeft(df) { case (acc, (name, value)) =>
      acc.withColumn(name, when(cond, value).otherwise(col(name)))
    }
    rewrite(spark, tablePath, updated,
      affected = df.filter(cond).count())
  }

  /** DELETE FROM t WHERE cond. Returns deleted-row count. */
  def delete(spark: SparkSession, tablePath: String, cond: Column): Long = {
    val df = spark.read.parquet(tablePath)
    rewrite(spark, tablePath, df.filter(!coalesce(cond, lit(false))),
      affected = df.filter(cond).count())
  }

  /** Partition-bounded UPDATE over a Hive-partitioned table: one scan
    * finds the touched partition values, then ONLY those partition
    * directories are rewritten and swapped — untouched partitions are
    * never read again nor written (at 100 TB rewriting the whole table
    * for a one-day fix is the difference between minutes and a day).
    * Returns affected-row count. */
  def updatePartitioned(spark: SparkSession, tablePath: String,
                        partitionCol: String,
                        assignments: Map[String, Column],
                        cond: Column): Long = {
    // Assigning the partition column would MOVE rows between directories
    // — out of partition-bounded scope (the row would be dropped with the
    // partition column on rewrite and silently stay put). Refuse loudly;
    // use the whole-table update for repartitioning mutations.
    require(!assignments.contains(partitionCol),
      s"updatePartitioned cannot reassign partition column " +
        s"'$partitionCol' (rows would change directory); use Dml.update")
    mutatePartitions(spark, tablePath, cond,
      assignedCols = assignments.keySet) { part =>
      assignments.foldLeft(part) { case (acc, (name, value)) =>
        acc.withColumn(name, when(cond, value).otherwise(col(name)))
      }
    }
  }

  /** Partition-bounded DELETE (see [[updatePartitioned]]). */
  def deletePartitioned(spark: SparkSession, tablePath: String,
                        partitionCol: String, cond: Column): Long =
    mutatePartitions(spark, tablePath, cond, assignedCols = Set.empty) {
      part => part.filter(!coalesce(cond, lit(false)))
    }

  private def mutatePartitions(spark: SparkSession, tablePath: String,
                               cond: Column, assignedCols: Set[String])
                              (mutate: DataFrame => DataFrame): Long = {
    val df = spark.read.parquet(tablePath)
    // Qualified table root: input_file_name() yields fully-qualified URIs
    // (file:/...), and partition columns must be parsed from the path
    // RELATIVE to the root — an ancestor directory that happens to
    // contain '=' (e.g. /data/exp=baseline/t) is NOT a partition level
    // and must never reach the drop list.
    val rootPath = new Path(tablePath)
    val qualifiedRoot = rootPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(rootPath).toString
    // One scan bounds the blast radius: touched partition DIRECTORIES are
    // derived from the actual file paths of affected rows
    // (input_file_name), never reconstructed from values — so Hive path
    // escaping (':' '%' '=') and null partitions (__HIVE_DEFAULT_
    // PARTITION__) are handled by construction. The planner prunes this
    // scan too when cond constrains a partition column.
    val touchedFiles = df.filter(cond)
      .groupBy(input_file_name().as("_file"))
      .agg(count(lit(1)).as("_n")).collect()
    val byDir = touchedFiles
      .groupBy { r =>
        val f = r.getString(0); f.substring(0, f.lastIndexOf('/'))
      }
      .view.mapValues(_.map(_.getLong(1)).sum).toMap
    var affected = 0L
    byDir.foreach { case (partDir, n) =>
      affected += n
      // basePath keeps partition columns visible to `cond`; the rewritten
      // files drop them again (they live in the directory names). All
      // name=value segments BELOW the table root are dropped, so
      // multi-level partitioning (a=1/b=2/...) round-trips correctly.
      val relative =
        if (partDir.startsWith(qualifiedRoot)) {
          partDir.drop(qualifiedRoot.length)
        } else partDir.drop(partDir.lastIndexOf('/')) // defensive fallback
      val dirCols = relative.split('/')
        .filter(_.contains('=')).map(_.takeWhile(_ != '=')).toSeq
      // An assignment targeting ANY partition level of this directory
      // would be silently erased by the drop below — refuse loudly (rows
      // cannot change directory under partition-bounded DML).
      val clash = assignedCols.intersect(dirCols.toSet)
      require(clash.isEmpty,
        s"updatePartitioned cannot reassign partition column(s) " +
          s"${clash.mkString(", ")} (rows would change directory); " +
          "use Dml.update")
      val part = spark.read.option("basePath", tablePath).parquet(partDir)
      rewrite(spark, partDir, mutate(part).drop(dirCols: _*), 0L)
    }
    affected
  }

  /** Write `out` to a temp sibling of `tablePath`, then swap. The rename
    * pair is the narrow non-atomic window — acceptable for a single-writer
    * batch engine (the reference's Airflow jobs are single-writer too). */
  private def rewrite(spark: SparkSession, tablePath: String,
                      out: DataFrame, affected: Long): Long = {
    val table = new Path(tablePath)
    val tmp = new Path(tablePath + "._dml_tmp")
    val old = new Path(tablePath + "._dml_old")
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true); fs.delete(old, true)
    out.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(table, old))
      throw new java.io.IOException(s"DML swap failed: cannot move $table")
    if (!fs.rename(tmp, table)) {
      fs.rename(old, table) // roll back
      throw new java.io.IOException(s"DML swap failed: cannot move $tmp")
    }
    fs.delete(old, true)
    affected
  }
}
