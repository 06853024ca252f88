package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: row-level comparison of two versions of a keyed table.
  *
  * The data-versioning audit a training-data pipeline runs between crawl
  * snapshots (what Delta's change-data-feed answers for table formats,
  * computed here directly over two parquet snapshots): which rows were
  * added, removed, or changed — and for changed rows, WHICH columns.
  * The reference has no equivalent (its loads are replace/append only,
  * `core/utils/db_core.py:330-369`); this closes the "what did the new
  * crawl actually change" gap those modes leave open.
  *
  * Scale shape: ONE full-outer shuffle join on the key — both snapshots
  * shuffle once, compare is a narrow projection, and the output carries
  * no payload columns (key, status, changed-column names, carried dims
  * only). At 100 TB, bucket both snapshots by the key at write time
  * ([[graft.sources.Bucketing]]) and the join co-locates with no
  * shuffle at all; the compare never widens beyond the compared row.
  */
object Diff {

  /** Diff `a` (old) vs `b` (new) on `key`, comparing `cols` null-safely.
    *
    * Output: one row per key present in either side —
    * `(key, status ∈ added|removed|changed|unchanged, changed_cols,
    * carried…)` where `changed_cols` is the comma-joined (stable,
    * caller-given order) list of differing columns, empty for
    * non-`changed` rows, and each `carry` column surfaces the new
    * side's value, falling back to the old side for removed rows.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   cols: Seq[String],
                   carry: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "cols must list at least one compare column")
    // presence flags, NOT key nullability, drive the status: a
    // null-key row never matches the equi-join, and deriving
    // added/removed from `key IS NULL` would misread the row's OWN
    // null key as "absent from this side" (an old null-key row would
    // report 'added'). With flags it reports removed/added correctly.
    val aSide = a.select((lit(true).as("_a_present") +:
      (key +: (cols ++ carry).distinct)
        .map(c => col(c).as(s"_a_$c"))): _*)
    val bSide = b.select((lit(true).as("_b_present") +:
      (key +: (cols ++ carry).distinct)
        .map(c => col(c).as(s"_b_$c"))): _*)
    val aKey = col(s"_a_$key")
    val bKey = col(s"_b_$key")
    val inA = col("_a_present").isNotNull
    val inB = col("_b_present").isNotNull
    val changed: Column = concat_ws(",",
      cols.map(c => when(!(col(s"_a_$c") <=> col(s"_b_$c")), lit(c))): _*)
    val outCols =
      coalesce(aKey, bKey).as(key) ::
        when(!inA, lit("added"))
          .when(!inB, lit("removed"))
          .when(changed =!= "", lit("changed"))
          .otherwise(lit("unchanged")).as("status") ::
        when(inA && inB, changed)
          .otherwise(lit("")).as("changed_cols") ::
        carry.map(c => coalesce(col(s"_b_$c"), col(s"_a_$c")).as(c)).toList
    aSide.join(bSide, aKey === bKey, "full_outer").select(outCols: _*)
  }

  /** Per-(status, dim) counts over a [[snapshotDiff]] result — the
    * one-screen drift report (e.g. "newcrawl added 2k docs, source X
    * churned 40%"). One grouped aggregate with map-side partials. */
  def diffSummary(diff: DataFrame, dim: String): DataFrame =
    diff.groupBy(col("status"), col(dim))
      .agg(count(lit(1)).as("n"))
}
