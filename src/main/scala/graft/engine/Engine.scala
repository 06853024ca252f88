package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap + table registry + SQL facade.
  *
  * The reference outsources all query processing to BigQuery
  * (`core/utils/db_core.py:119-135`); here Spark itself is the engine:
  * tables register as temp views and `Engine.sql` runs Catalyst end-to-end.
  *
  * Scale posture (100 TB): AQE on (runtime partition coalescing + skew-join
  * splitting), shuffle partitions sized for the local harness via config,
  * UTC session timezone pinned for oracle parity.
  */
object Engine {

  /** Build a session configured for this engine. In local mode `cores`
    * controls both parallelism and shuffle partitions; on a real cluster
    * leave master/shuffle-partitions to spark-submit + AQE.
    */
  def session(appName: String = "graft", master: Option[String] = None,
              shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no type
      // for; read as long and convert in `table` (values are µs-resolution,
      // so the conversion is lossless — see FIXTURES.md).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Fixture generations vary between TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS, isAdjustedToUTC=false); the latter would infer
      // as TIMESTAMP_NTZ and split the engine into two timestamp
      // families (Row.getTimestamp, unix_micros, window ranges all
      // differ). Pin inference off: naive micros read as session-TZ
      // TIMESTAMP, and the session TZ is pinned UTC above, so values
      // are identical to the oracle's naive reading either way.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // managed-table warehouse (bucketed tables) under tmp, not the cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // Reclaim RELIABLE checkpoint files when their RDD is GC'd:
      // daily-cadence jobs under the spark.graft.checkpointDir posture
      // materialize per-run relations (sketch grids, pair stages,
      // closure labels) whose checkpoint files otherwise accumulate
      // unboundedly — Engine.release covers blocks, but files need the
      // ContextCleaner. Safe by construction: the cleaner only deletes
      // a checkpoint once nothing can reference its RDD.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
    // Shuffle-partition count is set ONLY when this code also picks the
    // master (the local harness): a spark-submit deployment must keep its
    // own --conf spark.sql.shuffle.partitions (sized for the cluster),
    // which a builder.config here would silently override and cap every
    // shuffle at the harness value.
    master.foreach { m =>
      b.master(m)
      b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Local-harness scan parallelism: the default 128 MB split size
      // leaves every small-SF parquet table a SINGLE input partition, so
      // scan-stage work (tokenize, explode, partial aggs) runs on one of
      // the 32 cores. 4 MB splits spread test-scale tables across the
      // box; AQE re-coalesces downstream. Cluster deployments keep
      // Spark's default (128 MB is right when files are block-sized).
      b.config("spark.sql.files.maxPartitionBytes", "4m")
      b.config("spark.sql.files.openCostInBytes", "1m")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Lineage cut for iterative/materialize-and-freeze ops (connected
    * components, contiguous ids): reliable `checkpoint` when the session
    * sets `spark.graft.checkpointDir` (cluster posture — the checkpoint
    * survives executor loss and truncates lineage durably), eager
    * `localCheckpoint` otherwise (local posture — no distributed-FS round
    * trip, blocks released by the ContextCleaner). The swap is a config
    * flip, not a code edit: `spark.conf.set("spark.graft.checkpointDir",
    * "hdfs://…")` before calling any iterative op.
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) if dir.nonEmpty =>
        // Re-point the context when the CONFIGURED dir changed, not just
        // when unset: setCheckpointDir appends a UUID subdir, so compare
        // against the current value's parent (fully qualified).
        val sc = spark.sparkContext
        val want = new org.apache.hadoop.fs.Path(dir)
        val wantQ = want.getFileSystem(sc.hadoopConfiguration)
          .makeQualified(want)
        val currentParent = sc.getCheckpointDir
          .map(c => new org.apache.hadoop.fs.Path(c).getParent)
        if (!currentParent.contains(wantQ)) sc.setCheckpointDir(dir)
        // Persist first: Dataset.checkpoint re-runs the plan for the
        // checkpoint-write job when the data isn't cached (~2× compute
        // per iterative round). Cache → eager checkpoint → unpersist.
        // Checkpoint files themselves are reclaimed only via
        // spark.cleaner.referenceTracking.cleanCheckpoints=true (set it
        // in cluster posture) or by deleting the directory post-job.
        val cached = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try reset(cached.checkpoint(eager = true))
        finally cached.unpersist(blocking = false)
      case _ => reset(df.localCheckpoint(eager = true))
    }
  }

  /** Checkpoint carries the ORIGIN plan's size estimate through the cut
    * (`LogicalRDD.originStats`); in iterative loops that estimate is
    * squared by every round's join and eventually overflows BigInteger
    * (see CheckpointStats). Strip it — AQE re-plans from true runtime
    * sizes, so the carried estimate only ever hurt. */
  private def reset(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.CheckpointStats.dropOriginStats(df)

  /** Free the storage behind a frame returned by [[materialize]] — the
    * local-checkpoint blocks, or the reliable-checkpoint files when
    * `spark.graft.checkpointDir` was in force. For iterative ops (BPE,
    * connected components) each round's materialize supersedes the
    * previous one; without an explicit release the old iterate's blocks
    * stay pinned until the ContextCleaner happens to collect the
    * reference — unbounded at large iteration counts, and reliable
    * checkpoint FILES are never collected at all without
    * `spark.cleaner.referenceTracking.cleanCheckpoints`.
    *
    * DESTRUCTIVE: a checkpointed frame has no lineage to recompute from,
    * so only release a frame nothing will read again. No-op on frames
    * that did not come from [[materialize]]. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val rdd = lr.rdd
        rdd.getCheckpointFile.foreach { path =>
          val p = new org.apache.hadoop.fs.Path(path)
          try p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
          catch { case _: java.io.IOException => () } // best-effort
        }
        rdd.unpersist(blocking = false)
        ()
      case _ => ()
    }

  /** Spread a small input across the session's cores before heavy
    * per-row compute (tokenize → shingle → hash chains): repartition
    * ONLY when the planned scan has fewer than min(parallelism, 8)
    * partitions — the small-file case, where one 1.5 MB parquet file is
    * one partition and the whole scan stage runs on one core. The
    * absolute floor of 8 keeps this a NO-OP on any real corpus (hundreds
    * of splits on a cluster with more cores than splits would otherwise
    * re-shuffle full text — exactly what these operators promise not to
    * do); when it does fire, the input is by construction a handful of
    * row groups, so what shuffles is small.
    *
    * The width probe is PLAN-SIDE ([[planWidth]]), never `df.rdd`: under
    * AQE, `.rdd` on a plan containing exchanges eagerly executes those
    * shuffle stages at plan-construction time (a side-effect job whose
    * work the returned frame then redoes), and it throws on streaming
    * frames. Unknown-width plans (DSv2 relations, exotic nodes) no-op —
    * the safe default, since spreading only ever helps tiny inputs. */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val sc = df.sparkSession.sparkContext
      val target = sc.defaultParallelism
      planWidth(df.queryExecution.optimizedPlan, df.sparkSession) match {
        case Some(n) if n < math.min(target, 8) => df.repartition(target)
        case _ => df
      }
    }
  }

  /** Static partition-count estimate for a logical plan, top-down:
    * explicit repartitions pin the width; shuffle-inducing operators
    * produce `spark.sql.shuffle.partitions`; file scans reproduce
    * Spark's own split formula (`FilePartition.maxSplitBytes`: bin-pack
    * `size + openCost` into `min(maxPartitionBytes, max(openCost,
    * bytesPerCore))` bins); `None` = can't tell (caller must not assume
    * small). Estimation only — fine for a fire/no-fire threshold, not
    * an exact split count. */
  private def planWidth(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      spark: SparkSession): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val conf = spark.sessionState.conf
    plan match {
      case r: Repartition => Some(r.numPartitions.toLong)
      case r: RepartitionByExpression =>
        Some(r.optNumPartitions.getOrElse(conf.numShufflePartitions).toLong)
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Deduplicate =>
        Some(conf.numShufflePartitions.toLong)
      case _: GlobalLimit => Some(1L) // single-partition collect shape
      case r: Range =>
        Some(r.numSlices.getOrElse(spark.sparkContext.defaultParallelism)
          .toLong)
      case _: LocalRelation | _: OneRowRelation => Some(1L)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val bytes = math.max(0L, fs.location.sizeInBytes)
          val nFiles = math.max(1L, fs.location.inputFiles.length.toLong)
          val open = math.max(0L, conf.filesOpenCostInBytes)
          val bytesPerCore =
            (bytes + nFiles * open) / math.max(1,
              spark.sparkContext.defaultParallelism)
          val split = math.max(1L, math.min(conf.filesMaxPartitionBytes,
            math.max(open, bytesPerCore)))
          Some((bytes + nFiles * open + split - 1) / split)
        case _ => None
      }
      case u: Union =>
        val widths = u.children.map(planWidth(_, spark))
        if (widths.forall(_.isDefined)) Some(widths.flatten.sum) else None
      case p if p.children.size == 1 => planWidth(p.children.head, spark)
      case _ => None
    }
  }

  /** The fixture tables (TESTDATA.md). */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table from a scale-factor directory. Nanosecond
    * parquet timestamps (read as long via `nanosAsLong`) are normalized to
    * Spark microsecond timestamps with integer division — no double
    * round-trip, matching DuckDB's `CAST(ts AS TIMESTAMP)` truncation.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else if (name == "events" &&
        df.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampNTZType &&
        spark.conf.get("spark.sql.session.timeZone") == "UTC")
      // Session created outside Engine.session (NTZ inference on):
      // normalize to the engine-wide TIMESTAMP family. The cast
      // interprets naive values in the SESSION time zone, so it is
      // value-preserving vs the naive oracle only under UTC — which
      // the guard requires. A non-UTC session keeps the NTZ column
      // untouched (loud NTZ type errors downstream beat silently
      // offset instants).
      df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    else df
  }

  /** Register every fixture table under `dir` as a temp view so that
    * arbitrary SQL (the reference's S6 passthrough surface) runs natively.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** S6 replacement: arbitrary SQL over the registered views. Mirrors the
    * reference's query-path error contract (log + None) vs the load path
    * which throws — SURVEY §7.4.7.
    */
  def sql(spark: SparkSession, query: String): Option[DataFrame] =
    try Some(spark.sql(query))
    catch {
      case e: Exception =>
        System.err.println(s"[engine.sql] query failed: ${e.getMessage}")
        None
    }
}
