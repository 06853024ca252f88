package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._
import graft.transform.Sanitize

/** S8 + K11 — the sheet-like grid source/sink: a local CSV file standing in
  * for a spreadsheet (zero-egress twin of `core/utils/sheets_core.py`).
  * A grid is header row + all-string data rows, capped at 100,000 rows on
  * read (the reference's `A1:Z100000` range, `sheets_core.py:155`).
  *
  * This is deliberately a DRIVER-SIDE sink: the reference's sheet surface
  * tops out at 100k rows, so the correct Spark shape is "collect the small
  * final frame and talk to the API from the driver" — using executors for
  * a 100k-row append would be pure overhead. Large appends belong in
  * [[Sinks]]/[[Upsert]].
  */
object GridSink {

  /** Read cap (`sheets_core.py:155`). */
  val MaxRows = 100000

  /** Raised when the id column is absent from the grid header — the
    * reference raises `ValueError('ID_COLUMN_NOT_IN_SHEET')`
    * (`sheets_core.py:174-175`). */
  final class IdColumnNotInSheet(col: String)
    extends IllegalArgumentException(s"ID_COLUMN_NOT_IN_SHEET: $col")

  /** S8 — grid → all-string DataFrame with header promotion
    * (`sheets_core.py:153-177`); missing file → empty grid. */
  def readGrid(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = readLines(path)
    if (lines.isEmpty) return spark.emptyDataFrame
    val header = parseCsvLine(lines.head)
    val rows = lines.tail.take(MaxRows).map { l =>
      val cells = parseCsvLine(l)
      // ragged rows: pad/truncate to header width (sheets are ragged too)
      org.apache.spark.sql.Row.fromSeq(
        header.indices.map(i => if (i < cells.length) cells(i) else ""))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(header.map(h =>
        org.apache.spark.sql.types.StructField(h,
          org.apache.spark.sql.types.StringType))))
  }

  /** K11 — append with header-if-missing + dedupe-by-id:
    *  1. stringify rows (W6: datetime→ISO, null→"", `sheets_core.py:194-209`),
    *  2. write the header when the grid doesn't exist yet
    *     (`sheets_core.py:179-192`),
    *  3. drop rows whose trimmed id already exists (`sheets_core.py:163-177`),
    *  4. align to the grid's header order — unknown header columns get ""
    *     (`row.get(col, "")`, `sheets_core.py:198-207`),
    *  5. append and return the appended count (`sheets_core.py:211-228`).
    */
  def appendDedupe(df: DataFrame, path: String, idColumn: String): Int = {
    val stringified = Sanitize.stringifyForExport(df)
    val existing = readLines(path)
    val header: Seq[String] =
      if (existing.isEmpty) {
        val h = stringified.columns.toSeq
        writeLine(path, toCsvLine(h), append = false)
        h
      } else parseCsvLine(existing.head)

    // resolve the id column in the grid header, case-insensitive trim match
    // (sheets_core.py:169-172); absent → raise.
    val idIdx = header.indexWhere(_.trim.toLowerCase == idColumn.trim.toLowerCase)
    if (idIdx < 0) throw new IdColumnNotInSheet(idColumn)
    val existingIds: Set[String] = existing.drop(1).iterator.map { l =>
      val cells = parseCsvLine(l)
      if (idIdx < cells.length) cells(idIdx).trim else ""
    }.filter(_.nonEmpty).toSet

    // incoming id column resolved on the frame side the same way; a frame
    // without the id column appends everything (row.get semantics).
    val dfIdCol = stringified.columns
      .find(_.trim.toLowerCase == idColumn.trim.toLowerCase)

    val rows = stringified.collect() // ≤100k by contract; driver-side sink
    val toAppend = rows.filter { r =>
      dfIdCol match {
        case Some(c) =>
          val id = r.getAs[String](c).trim
          id.isEmpty || !existingIds.contains(id)
        case None => true
      }
    }
    val colIdx = header.map(h => stringified.columns.indexOf(h))
    toAppend.foreach { r =>
      val line = colIdx.map(i => if (i >= 0) r.getString(i) else "")
      writeLine(path, toCsvLine(line), append = true)
    }
    toAppend.length
  }

  // ---------------- post-write validation + sharing ----------------
  // The reference follows every sheet append with (a) a ONE_OF_LIST data-
  // validation rule on the 'homologado' column spanning the appended rows
  // (`sheets_core.py:230-275`) and (b) writer-role shares to a list of
  // emails with per-email error collection (`sheets_core.py:276-292`).
  // The zero-egress twin records both in a sidecar `<grid>.meta.json`
  // (the grid's "spreadsheet properties") — and, because a rule you can't
  // enforce is just decoration, `validateGrid` checks the grid's cells
  // against every recorded rule, so the sheet contract is testable.

  /** One recorded ONE_OF_LIST rule: `column` restricted to `allowed` over
    * data rows [startRow, endRow) (0 = header, per the reference's
    * startRowIndex=1 → our data row 0). */
  final case class GridRule(column: String, allowed: Seq[String],
                            startRow: Int, endRow: Int)

  /** Apply a ONE_OF_LIST validation covering the `appendedCount` freshly
    * appended rows. No-op (returns false) when the column is absent from
    * the header — reference behavior for sheets without 'homologado'.
    * Default allowed values mirror the reference's SIM/NAO. */
  def applyValidation(path: String, column: String,
                      allowed: Seq[String] = Seq("SIM", "NAO"),
                      appendedCount: Int = 0): Boolean = {
    val lines = readLines(path)
    if (lines.isEmpty) return false
    val header = parseCsvLine(lines.head)
    if (!header.exists(_.trim.toLowerCase == column.trim.toLowerCase))
      return false
    val nData = lines.length - 1
    // reference range: rows 1 .. max(1, appended+2) in sheet coords →
    // the appended tail of the data rows (clamped to what exists)
    val start = math.max(0, nData - math.max(appendedCount, 1))
    val meta = readMeta(path)
    val rule = GridRule(column, allowed, start, nData)
    writeMeta(path, meta.copy(rules = meta.rules :+ rule))
    true
  }

  /** Share the grid with writer role; errors are COLLECTED per email,
    * not thrown (`sheets_core.py:283-291` returns (email, status, msg)
    * tuples). Invalid addresses get status 400; duplicates are
    * idempotent. */
  def share(path: String,
            emails: Seq[String]): Seq[(String, Int, String)] = {
    val meta = readMeta(path)
    val (bad, good) = emails.partition(e => !e.matches("[^@\\s]+@[^@\\s]+"))
    writeMeta(path, meta.copy(
      writers = (meta.writers ++ good).distinct))
    bad.map(e => (e, 400, s"invalid email address: $e"))
  }

  /** `get_spreadsheet_url` twin: the grid's stable URI. */
  def gridUrl(path: String): String =
    Paths.get(path).toAbsolutePath.toUri.toString

  /** Enforce every recorded rule against the grid's current cells:
    * returns (column, row, value) violations — empty means the sheet
    * honors its validations. Blank cells pass (the sheet UI leaves new
    * rows blank until a user picks a value). */
  def validateGrid(path: String): Seq[(String, Int, String)] = {
    val lines = readLines(path)
    if (lines.isEmpty) return Seq.empty
    val header = parseCsvLine(lines.head).map(_.trim.toLowerCase)
    val data = lines.tail.map(parseCsvLine)
    readMeta(path).rules.flatMap { r =>
      val idx = header.indexOf(r.column.trim.toLowerCase)
      if (idx < 0) Seq.empty
      else data.zipWithIndex
        .filter { case (_, i) => i >= r.startRow && i < r.endRow }
        .flatMap { case (cells, i) =>
          val v = if (idx < cells.length) cells(idx).trim else ""
          if (v.isEmpty || r.allowed.contains(v)) None
          else Some((r.column, i, v))
        }
    }
  }

  /** Recorded grid metadata (sidecar file next to the CSV). Stored as
    * one record per line with URL-encoded fields — lossless for ANY
    * column name / value / email (quotes, brackets, tabs, newlines)
    * without a JSON dependency or a hand-rolled parser to get wrong:
    *   rule <col> <allowed,csv> <startRow> <endRow>
    *   writer <email>
    * (tab-separated; fields percent-encoded). */
  final case class GridMeta(rules: Seq[GridRule], writers: Seq[String])

  private def metaPath(path: String) = Paths.get(path + ".meta")

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private[graft] def readMeta(path: String): GridMeta = {
    val p = metaPath(path)
    if (!Files.exists(p)) return GridMeta(Nil, Nil)
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
    val rules = lines.collect {
      case l if l.startsWith("rule\t") =>
        l.split("\t", -1) match {
          case Array(_, c, allowed, s, e) =>
            GridRule(dec(c),
              if (allowed.isEmpty) Nil
              else allowed.split(",", -1).toSeq.map(dec),
              s.toInt, e.toInt)
          case other => throw new IllegalStateException(
            s"corrupt grid meta line: ${other.mkString("\t")}")
        }
    }.toSeq
    val writers = lines.collect {
      case l if l.startsWith("writer\t") => dec(l.split("\t", -1)(1))
    }.toSeq
    GridMeta(rules, writers)
  }

  private def writeMeta(path: String, meta: GridMeta): Unit = {
    val lines =
      meta.rules.map(r => s"rule\t${enc(r.column)}\t" +
        s"${r.allowed.map(enc).mkString(",")}\t${r.startRow}\t${r.endRow}") ++
      meta.writers.map(w => s"writer\t${enc(w)}")
    Files.write(metaPath(path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
  }

  // ------------------------- tiny CSV codec -------------------------
  // RFC-4180-ish: quote cells containing delimiter/quote/newline; double
  // embedded quotes. Enough for the grid stand-in; real sheets use the API.

  private def readLines(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
  }

  private def writeLine(path: String, line: String, append: Boolean): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val opts =
      if (append) Seq(StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      else Seq(StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.write(p, (line + "\n").getBytes(StandardCharsets.UTF_8), opts: _*)
  }

  private[graft] def toCsvLine(cells: Seq[String]): String =
    cells.map { c =>
      if (c.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
        "\"" + c.replace("\"", "\"\"") + "\""
      else c
    }.mkString(",")

  private[graft] def parseCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val ch = line(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < line.length && line(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += ch
      } else ch match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case c => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }
}
