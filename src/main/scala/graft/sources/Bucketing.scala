package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) tables — the shuffle-avoidance tool for repeated
  * large-×-large joins (SURVEY §4.2; the 100 TB brief: "bucketing for
  * co-located joins").
  *
  * Writing both sides bucketed (and sorted) by the join key into the same
  * bucket count lets Spark plan a sort-merge join with NO Exchange on
  * either side: every task reads matching bucket files directly. At
  * 100 TB, pre-bucketing fact/dimension tables that join daily converts
  * the dominant shuffle into pure map-side work — paid once at write time,
  * amortized over every subsequent join ([[BucketingSpec]] asserts the
  * exchange-free plan).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (catalog-registered —
    * bucketing metadata lives in the catalog, not the files). Idempotent:
    * drops any previous table AND its orphaned location first (a crashed
    * writer can leave the directory without the catalog entry, which
    * otherwise fails LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans without a
    * shuffle when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
