package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** §2.9 Structured Streaming: windowed aggs vs their batch twins, bounded
  * stateful dedupe, foreachBatch into the sink layer. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtureEvents(): Seq[Ev] = {
    // sf0.001 events (1k rows) pulled through the SAME reader the batch
    // twin uses, so both sides see identical microsecond timestamps.
    graft.engine.Engine.table(spark, fixtureDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect().toIndexedSeq
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
  }

  private def runComplete(stream: MemoryStream[Ev],
                          transform: org.apache.spark.sql.DataFrame =>
                            org.apache.spark.sql.DataFrame,
                          name: String) = {
    val q = transform(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("streaming hourly agg matches the batch twin on fixture events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(fixtureEvents())
    val streamed = runComplete(stream, Streaming.eventsHourly(_), "s_hourly")
      .orderBy("hour", "event_type").collect().map(_.toSeq)
    val batch = Queries.qEventsHourly(spark, fixtureDir)
      .collect().map(_.toSeq)
    assert(streamed.length == batch.length)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("session windows close after the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(Seq(
      Ev(1, ts("2026-01-01 10:00:00"), 7, "click", 1.0),
      Ev(2, ts("2026-01-01 10:10:00"), 7, "click", 2.0),
      // 40-minute gap > 30-minute session gap → new session
      Ev(3, ts("2026-01-01 10:50:00"), 7, "click", 3.0),
      Ev(4, ts("2026-01-01 10:05:00"), 8, "view", 4.0)))
    val out = runComplete(stream,
      Streaming.eventsSessions(_, gap = "30 minutes"), "s_sessions")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3) // user 7 → two sessions, user 8 → one
    val u7 = out.filter(_.getAs[Long]("user_id") == 7L)
    assert(u7.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
  }

  test("dropDuplicatesWithinWatermark dedupes repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(Seq(
      Ev(1, ts("2026-01-01 10:00:00"), 1, "a", 1.0),
      Ev(1, ts("2026-01-01 10:00:05"), 1, "a", 1.0), // dup id
      Ev(2, ts("2026-01-01 10:01:00"), 1, "b", 2.0)))
    val q = Streaming.dedupeEvents(stream.toDF())
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("s_dedup").count() == 2)
  }

  test("foreachBatch appends micro-batches through the batch sink layer") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream_sink").toString
    val stream = MemoryStream[Ev]
    val q = Streaming.startParquetSink(stream.toDF(),
      s"$dir/out", s"$dir/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    stream.addData(Seq(Ev(1, ts("2026-01-01 10:00:00"), 1, "a", 1.0)))
    q.processAllAvailable()
    stream.addData(Seq(Ev(2, ts("2026-01-01 10:01:00"), 2, "b", 2.0)))
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$dir/out")
    assert(written.count() == 2)
    assert(written.columns.contains("event_id"))
  }

  test("stateless decontamination filters a stream identically to the batch op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val bench = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .filter($"doc_id" < 20)
    val grams = graft.ext.DedupOps.benchmarkGramHashes(bench, "text")
    // batch reference: the join-based op on the same corpus
    val expected = graft.ext.DedupOps.decontaminate(
        graft.engine.Engine.table(spark, fixtureDir, "documents"),
        bench, "doc_id", "text")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val stream = MemoryStream[(Long, String)]
    val clean = stream.toDF().toDF("doc_id", "text")
      .filter(!graft.ext.DedupOps.isContaminated(col("text"), grams))
    val q = clean.writeStream.format("memory")
      .queryName("decontam").outputMode("append").start()
    stream.addData(docs.take(100))
    q.processAllAvailable()
    stream.addData(docs.drop(100))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id FROM decontam")
      .collect().map(_.getLong(0)).toSet
    assert(got == expected) // stateless literal-set filter == join twin
  }

  test("stream LM fluency score equals the batch join twin on the fixture") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val documents = graft.engine.Engine.table(spark, fixtureDir, "documents")
    val ref = documents.filter(col("source") === "src0")
    val model = graft.ext.TextOps.lmTrainHashed(ref, "text")
    val expected = graft.ext.TextOps
      .lmScore(documents, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val docs = documents.select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val stream = MemoryStream[(Long, String)]
    val scored = graft.ext.TextOps.streamLmScore(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
    val q = scored.writeStream.format("memory")
      .queryName("lm_stream").outputMode("append").start()
    stream.addData(docs.take(250)); q.processAllAvailable()
    stream.addData(docs.drop(250)); q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id, n_bigrams, mean_nll FROM lm_stream")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // bit-exact equality: hash probes + literal model reproduce the
    // string-keyed join arithmetic (no collisions at fixture vocab)
    assert(got == expected)
  }

  test("incrementalDedup runs unchanged on a stream (stream-static anti-join)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val history = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .select($"doc_id", $"text")
    val fresh = (1L to 20L)
      .map(i => (300000L + i, s"novel streaming crawl doc $i"))
    val recrawled = history.filter($"doc_id" < 8)
      .collect().map(r => (400000L + r.getLong(0), r.getString(1))).toSeq
    val batchExpected = graft.ext.DedupOps.incrementalDedup(
        (fresh ++ recrawled).toDF("doc_id", "text"), history,
        "doc_id", "text", expectedHistoryRows = 1000L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val stream = MemoryStream[(Long, String)]
    // the SAME op over an unbounded frame: tier 1 is a projection,
    // tier 2 a stream-static left-anti join — both stream-legal
    val deduped = graft.ext.DedupOps.incrementalDedup(
      stream.toDF().toDF("doc_id", "text"), history,
      "doc_id", "text", expectedHistoryRows = 1000L)
    val q = deduped.writeStream.format("memory")
      .queryName("inc_dedup").outputMode("append").start()
    stream.addData(fresh.take(10) ++ recrawled.take(4))
    q.processAllAvailable()
    stream.addData(fresh.drop(10) ++ recrawled.drop(4))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id FROM inc_dedup")
      .collect().map(_.getLong(0)).toSet
    assert(got == batchExpected && got == fresh.map(_._1).toSet)
  }

  test("deterministic hash split/sample are stateless and stream-safe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = (0L until 500L).map(i => (i, s"doc$i"))
    val batchDf = ids.toDF("doc_id", "text")
    val expectSplit = graft.transform.Split
      .hashSplit(batchDf, "doc_id", Seq("test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val stream = MemoryStream[(Long, String)]
    val streamed = graft.transform.Split.hashSplit(
      stream.toDF().toDF("doc_id", "text"), "doc_id", Seq("test" -> 0.1))
    val q = streamed.writeStream.format("memory")
      .queryName("splits").outputMode("append").start()
    stream.addData(ids.take(250)); q.processAllAvailable()
    stream.addData(ids.drop(250)); q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id, split FROM splits")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expectSplit) // membership is a pure function of the id
  }

  test("stream-stream interval join pairs events within the window only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = Streaming.correlatedEvents(clicks.toDF(), buys.toDF(),
        within = "10 minutes")
      .writeStream.format("memory").queryName("s_join")
      .outputMode("append").start()
    clicks.addData(Seq(Ev(1, ts("2026-01-01 10:00:00"), 7, "click", 1.0)))
    buys.addData(Seq(
      Ev(2, ts("2026-01-01 10:05:00"), 7, "buy", 9.0),   // within 10 min ✓
      Ev(3, ts("2026-01-01 10:30:00"), 7, "buy", 5.0),   // too late ✗
      Ev(4, ts("2026-01-01 10:04:00"), 8, "buy", 3.0)))  // other user ✗
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("s_join").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("r_value") == 9.0)
  }

  test("watermark drops late data in append mode (bounded state contract)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = Streaming.eventsHourly(stream.toDF(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("s_late")
      .outputMode("append").start()
    // batch 1: events up to 12:05 → watermark advances to 11:55
    stream.addData(Seq(
      Ev(1, ts("2026-01-01 10:30:00"), 1, "a", 1.0),
      Ev(2, ts("2026-01-01 12:05:00"), 1, "a", 2.0)))
    q.processAllAvailable()
    // batch 2: an event at 10:45 is behind the watermark → dropped; the
    // 10:00 window was already finalized and emitted without it
    stream.addData(Seq(Ev(3, ts("2026-01-01 10:45:00"), 1, "a", 8.0)))
    q.processAllAvailable()
    // advance watermark far enough to flush every window
    stream.addData(Seq(Ev(4, ts("2026-01-01 15:00:00"), 1, "a", 4.0)))
    q.processAllAvailable()
    q.stop()
    val tenAm = spark.table("s_late")
      .filter(col("hour") === "2026-01-01 10:00:00").collect()
    assert(tenAm.length == 1)
    assert(tenAm(0).getAs[Long]("n_events") == 1L) // late event NOT counted
    assert(tenAm(0).getAs[Double]("sum_value") == 1.0)
  }

  test("mapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = Streaming.runningUserTotals(stream.toDF())
      .writeStream.format("memory").queryName("s_state")
      .outputMode("update").start()
    stream.addData(Seq(
      Ev(1, ts("2026-01-01 10:00:00"), 7, "a", 1.0),
      Ev(2, ts("2026-01-01 10:01:00"), 7, "a", 2.0)))
    q.processAllAvailable()
    stream.addData(Seq(Ev(3, ts("2026-01-01 10:02:00"), 7, "a", 4.0)))
    q.processAllAvailable()
    q.stop()
    // update mode appends one row per user per touched batch; the LAST row
    // for user 7 must carry state accumulated across BOTH batches
    val rows = spark.table("s_state").filter(col("user_id") === 7L)
      .collect()
    val last = rows.maxBy(_.getAs[Long]("n_events"))
    assert(last.getAs[Long]("n_events") == 3L)
    assert(last.getAs[Double]("sum_value") == 7.0)
  }

  test("outer interval join emits unmatched rows after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = Streaming.correlatedEventsOuter(clicks.toDF(), buys.toDF(),
        within = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("s_outer")
      .outputMode("append").start()
    // user 1 converts within the window; user 2 never does.
    clicks.addData(Seq(
      Ev(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2026-01-01 10:00:00"), 2, "click", 1.0)))
    buys.addData(Seq(Ev(3, ts("2026-01-01 10:05:00"), 1, "buy", 9.0)))
    q.processAllAvailable()
    // Push both watermarks well past every join window so the unmatched
    // click can be finalized as a null-extended row.
    clicks.addData(Seq(Ev(8, ts("2026-01-01 12:00:00"), 9, "click", 0.0)))
    buys.addData(Seq(Ev(9, ts("2026-01-01 12:00:00"), 9, "buy", 0.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("s_outer")
      .filter(col("l_user").isin(1L, 2L)).collect()
      .map(r => (r.getAs[Long]("l_user"),
        Option(r.getAs[java.lang.Double]("r_value")))).toSet
    assert(rows == Set((1L, Some(java.lang.Double.valueOf(9.0))),
      (2L, None)), rows)
  }

  test("foreachBatch upsert sink merges micro-batches by key (K9 bridge)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert_stream")
    val storeDir = s"$base/store"
    val store = new graft.sinks.Upsert.FileStore(storeDir)
    val stream = MemoryStream[Ev]
    val q = Streaming.startUpsertSink(
      Streaming.runningUserTotals(stream.toDF()), "user_id", store,
      s"$base/cp", trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    // Two micro-batches touching the same user: the second must
    // OVERWRITE user 1's document, not append a second one.
    stream.addData(Seq(Ev(1, ts("2026-01-01 10:00:00"), 1, "a", 2.0)))
    q.processAllAvailable()
    stream.addData(Seq(Ev(2, ts("2026-01-01 10:00:01"), 1, "a", 3.0)))
    q.processAllAvailable()
    q.stop()
    val files = new java.io.File(storeDir).listFiles()
    assert(files.length == 1, files.mkString(","))
    val doc = new String(java.nio.file.Files.readAllBytes(
      files.head.toPath))
    assert(doc.contains("\"n_events\":2") && doc.contains("\"sum_value\":5.0"),
      doc)
  }

  test("incremental top-k per key: bounded state, refreshed ranks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = Streaming.topKPerKey(stream.toDF(), k = 2)
      .writeStream.format("memory").queryName("s_topk")
      .outputMode("update").start()
    // Batch 1: top-2 of {5.0, 3.0, 1.0} → (id 1, 5.0), (id 2, 3.0)
    stream.addData(Seq(
      Ev(1, ts("2026-01-01 10:00:00"), 1, "click", 5.0),
      Ev(2, ts("2026-01-01 10:00:01"), 1, "click", 3.0),
      Ev(3, ts("2026-01-01 10:00:02"), 1, "click", 1.0)))
    q.processAllAvailable()
    val b1 = spark.table("s_topk").orderBy("rnk").collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("event_id")))
    assert(b1.toSeq == Seq((1, 1L), (2, 2L)))
    // Batch 2: 4.0 displaces 3.0 from rank 2; update emits the refreshed
    // top-k (memory sink in update mode appends the new rows).
    stream.addData(Seq(Ev(4, ts("2026-01-01 10:00:03"), 1, "click", 4.0)))
    q.processAllAvailable()
    q.stop()
    // After both batches the state-of-the-world is (5.0, id1), (4.0, id4).
    val all = spark.table("s_topk").collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value")))
    assert(all.contains((1, 1L, 5.0)) && all.contains((2, 4L, 4.0)))
    assert(!all.exists { case (_, id, _) => id == 3L }) // never in top-2
  }

  test("session neighbor top-k equals the batch rank-over-max twin across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.engine.Engine.table(spark, fixtureDir, "embeddings")
    val corpus = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    val all = emb.filter(col("vec_id") >= 20 && col("vec_id") < 70)
      .select(pmod(col("vec_id"), lit(3)).as("session_id"),
        col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    val (a, b) = all.partition(_._2 < 50) // both halves hit all sessions

    // Batch twin: same scoring expressions, per-(session, neighbor) max,
    // rank, top-k.
    def twin(rows: Seq[(Long, Long, Array[Float])], k: Int) = {
      val ev = rows.toSeq.toDF("session_id", "vec_id", "vec")
      val c = corpus.select(col("vec_id").as("_nid"),
        col("embedding").as("_cv"),
        graft.ext.SimilarityOps.norm(col("embedding")).as("_cn"))
      val scored = ev.select(col("session_id"), col("vec").as("_qv"),
          graft.ext.SimilarityOps.norm(col("vec")).as("_qn"))
        .join(c)
        .groupBy(col("session_id"), col("_nid"))
        .agg(max(round(graft.ext.SimilarityOps.dot(col("_qv"), col("_cv")) /
          (col("_qn") * col("_cn")), 6)).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("session_id").orderBy(desc("score"), asc("_nid"))
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
        .select(col("session_id"), col("rnk"), col("_nid").as("neighbor_id"),
          col("score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq.sorted
    }

    val stream = MemoryStream[(Long, Long, Array[Float])]
    val q = Streaming.sessionNeighborTopK(
        stream.toDF().toDF("session_id", "vec_id", "vec")
          .select(col("session_id"), col("vec")),
        corpus, "vec_id", "embedding", k = 3)
      .writeStream.format("memory").queryName("s_nn_topk")
      .outputMode("update").start()
    stream.addData(a.toSeq)
    q.processAllAvailable()
    val afterA = spark.table("s_nn_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(afterA == twin(a.toSeq, 3), "first emission != twin(A)")
    stream.addData(b.toSeq)
    q.processAllAvailable(); q.stop()
    // Update mode appends batch 2's refreshed top-k after batch 1's rows:
    // the tail must equal the twin over ALL data.
    val everything = spark.table("s_nn_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val afterB = everything.drop(afterA.length).toSeq.sorted
    assert(afterB == twin((a ++ b).toSeq, 3),
      "refreshed emission != twin(A∪B)")
  }

  test("restart from checkpoint: state and source offsets survive") {
    import spark.implicits._
    // File source (fully replayable, unlike MemoryStream) + checkpointed
    // mapGroupsWithState: run 1 processes file1 and stops; run 2 starts a
    // FRESH query on the same checkpoint after file2 lands. Recovery must
    // (a) resume per-user running totals (state store), and (b) not
    // reprocess file1 (offset log).
    val base = Files.createTempDirectory("graft_restart").toString
    val (src, cp, out) = (s"$base/src", s"$base/cp", s"$base/out")
    new java.io.File(src).mkdirs()
    val schema = "user_id LONG, value DOUBLE"

    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema).json(src)
      val q = Streaming.runningUserTotals(in)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty)
            b.write.mode("append").parquet(out)
          ()
        }
        .start()
      q.awaitTermination()
    }

    Files.writeString(java.nio.file.Paths.get(s"$src/f1.json"),
      """{"user_id":1,"value":1.0}
        |{"user_id":1,"value":2.0}
        |""".stripMargin)
    runOnce()
    val after1 = spark.read.parquet(out)
      .filter(col("user_id") === 1).orderBy(desc("n_events")).collect()
    assert(after1.head.getAs[Long]("n_events") == 2L)
    assert(after1.head.getAs[Double]("sum_value") == 3.0)

    Files.writeString(java.nio.file.Paths.get(s"$src/f2.json"),
      """{"user_id":1,"value":5.0}
        |""".stripMargin)
    runOnce()
    val after2 = spark.read.parquet(out)
      .filter(col("user_id") === 1).orderBy(desc("n_events")).collect()
    // State survived: the new total CONTINUES from (2, 3.0) → (3, 8.0).
    assert(after2.head.getAs[Long]("n_events") == 3L)
    assert(after2.head.getAs[Double]("sum_value") == 8.0)
    // Offsets survived: file1 was not reprocessed — exactly one new
    // output row from run 2 (total 2 rows for user 1 across both runs).
    assert(after2.length == 2, after2.mkString(";"))
  }

  test("sliding windows overlap: each event appears in window/slide windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(Seq(Ev(1, ts("2026-01-01 10:07:00"), 1, "a", 1.0)))
    val out = runComplete(stream,
      Streaming.eventsSliding(_, "1 hour", "15 minutes"), "s_sliding")
      .collect()
    assert(out.length == 4) // 60/15 overlapping windows contain the event
    assert(out.map(_.getAs[Long]("n_events")).forall(_ == 1L))
  }

  test("streaming as-of enrichment matches the batch as-of join on one batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = fixtureEvents()
    val lStream = MemoryStream[Ev]
    val rStream = MemoryStream[Ev]
    lStream.addData(evs.filter(_.event_type == "purchase"))
    rStream.addData(evs.filter(_.event_type == "click"))
    val q = Streaming.asofEnriched(lStream.toDF(), rStream.toDF())
      .writeStream.format("memory").queryName("s_asof")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_asof")

    val ev = graft.engine.Engine.table(spark, fixtureDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val batch = graft.transform.Temporal
      .asofJoinBackward(purchases, clicks, "user_id", "ts", "ts",
        prefix = "click_")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("purchase_value"),
        unix_micros(col("click_ts")).as("click_ts_us"), col("click_value"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "one in-order batch must reproduce the batch as-of join exactly")
  }

  test("as-of enrichment state carries the latest right value across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lStream = MemoryStream[Ev]
    val rStream = MemoryStream[Ev]
    val q = Streaming.asofEnriched(lStream.toDF(), rStream.toDF())
      .writeStream.format("memory").queryName("s_asof_state")
      .outputMode("append").start()

    // batch 1: a purchase BEFORE any click → null match; then a click.
    lStream.addData(Seq(Ev(10, ts("2026-01-01 09:00:00"), 1, "purchase", 5.0)))
    rStream.addData(Seq(Ev(11, ts("2026-01-01 10:00:00"), 1, "click", 1.5)))
    q.processAllAvailable()
    // batch 2: a later purchase must match batch 1's click from STATE.
    lStream.addData(Seq(Ev(12, ts("2026-01-01 11:00:00"), 1, "purchase", 7.0)))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("s_asof_state").orderBy("event_id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(4) && rows(0).isNullAt(5)) // pre-click purchase
    assert(rows(1).getLong(4) == ts("2026-01-01 10:00:00").getTime * 1000L)
    assert(rows(1).getDouble(5) == 1.5)
  }

  test("cmsSketch is stream-legal: incremental grid equals the batch " +
      "twin across micro-batches") {
    // counts are associative, so the CMS grid maintains itself in a
    // streaming aggregation — the live token-frequency monitor of the
    // ingest DAG. Two micro-batches, then grid == batch run on the union.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val q = graft.ext.SketchOps.cmsSketch(
        stream.toDF().withColumnRenamed("value", "text"), "text")
      .writeStream.format("memory").queryName("s_cms")
      .outputMode("complete").start()
    stream.addData("the cat sat", "on the mat")
    q.processAllAvailable()
    stream.addData("the end of the tale", "cat cat cat")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.ext.SketchOps.cmsSketch(
        Seq("the cat sat", "on the mat", "the end of the tale",
          "cat cat cat").toDF("text"), "text").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("hllRegisters is stream-legal: max-merged registers ride the " +
      "state store; decoded estimate equals the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val toDocs = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumnRenamed("_1", "g").withColumnRenamed("_2", "text")
    val q = graft.ext.SketchOps.hllRegisters(
        toDocs(stream.toDF()), "g", "text", p = 4, gramN = 1)
      .writeStream.format("memory").queryName("s_hll")
      .outputMode("complete").start()
    stream.addData(("a", "x y z"), ("b", "p q"))
    q.processAllAvailable()
    stream.addData(("a", "z w v u t"), ("b", "p q"))
    q.processAllAvailable(); q.stop()
    val streamed = graft.ext.SketchOps.hllEstimate(
        spark.table("s_hll"), "g", 4).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2),
        r.getLong(3))).toMap
    val batch = graft.ext.SketchOps.hllSketch(
        toDocs(Seq(("a", "x y z"), ("b", "p q"), ("a", "z w v u t"),
          ("b", "p q")).toDF()), "g", "text", p = 4).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(streamed == batch)
  }

  test("kmvSketch is stream-legal: the bounded KMinDistinct buffer " +
      "rides the state store; estimate equals the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val toDocs = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumnRenamed("_1", "g").withColumnRenamed("_2", "text")
    val q = graft.ext.SketchOps.kmvSketch(
        toDocs(stream.toDF()), "g", "text", k = 4)
      .writeStream.format("memory").queryName("s_kmv")
      .outputMode("complete").start()
    stream.addData(("a", "x y z"), ("b", "p q"))
    q.processAllAvailable()
    stream.addData(("a", "z w v u t"), ("b", "p q"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_kmv").collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2))).toMap
    val batch = graft.ext.SketchOps.kmvSketch(
        toDocs(Seq(("a", "x y z"), ("b", "p q"), ("a", "z w v u t"),
          ("b", "p q")).toDF()), "g", "text", k = 4).collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2))).toMap
    assert(streamed == batch)
    // group a saw 7 distinct tokens through a k=4 sketch: estimating,
    // not counting; group b's 2 distinct report exactly
    assert(streamed("a")._1 == 4)
    assert(streamed("b") == ((2, 2L)))
  }

  test("bloomWords is stream-legal: bit_or slabs ride the state store; " +
      "incremental filter equals the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val toDocs = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumnRenamed("_1", "g").withColumnRenamed("_2", "text")
    val q = graft.ext.SketchOps.bloomWords(
        toDocs(stream.toDF()), "g", "text",
        mBits = 630, depth = 3, gramN = 1)
      .writeStream.format("memory").queryName("s_bloom")
      .outputMode("complete").start()
    stream.addData(("a", "x y z"), ("b", "p q"))
    q.processAllAvailable()
    stream.addData(("a", "z w v"), ("b", "p q"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_bloom").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.ext.SketchOps.bloomWords(
        toDocs(Seq(("a", "x y z"), ("b", "p q"), ("a", "z w v"),
          ("b", "p q")).toDF()), "g", "text",
        mBits = 630, depth = 3, gramN = 1).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("spanCorrupt runs unchanged on a stream (pure projection) " +
      "and equals the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .limit(60).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = graft.ext.TextOps.spanCorrupt(
        docs.toDF("doc_id", "text"), "doc_id", "text", 150)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    val stream = MemoryStream[(Long, String)]
    val q = graft.ext.TextOps.spanCorrupt(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 150)
      .writeStream.format("memory").queryName("s_corrupt")
      .outputMode("append").start()
    stream.addData(docs.take(30)); q.processAllAvailable()
    stream.addData(docs.drop(30)); q.processAllAvailable(); q.stop()
    val got = spark.table("s_corrupt").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected) // mask is a pure function of (id, text)
  }

  test("logHistSketch is stream-legal: incremental bucket counts " +
      "equal the batch twin; decode reads the live sketch") {
    // the quantile-monitor face: counts are associative, so the log2
    // histogram maintains itself in a streaming aggregation and
    // histQuantiles decodes the complete-mode sink at any time.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, Double)]
    val toDocs = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumnRenamed("_1", "g").withColumnRenamed("_2", "v")
    val q = graft.ext.SketchOps.logHistSketch(
        toDocs(stream.toDF()), "g", "v", mBits = 3, scale = 10.0)
      .writeStream.format("memory").queryName("s_lh")
      .outputMode("complete").start()
    val batch1 = (1 to 40).map(i => ("a", i * 3.7 % 50 + 1))
    val batch2 = (1 to 30).map(i => ("a", i * 7.3 % 50 + 1)) ++
      Seq(("b", 2.0), ("b", 900.0))
    stream.addData(batch1); q.processAllAvailable()
    stream.addData(batch2); q.processAllAvailable(); q.stop()
    val streamed = spark.table("s_lh").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.ext.SketchOps.logHistSketch(
        toDocs((batch1 ++ batch2).toDF()), "g", "v",
        mBits = 3, scale = 10.0).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    // decode over the live sink equals decode over the batch sketch
    val dq = graft.ext.SketchOps.histQuantiles(
        spark.table("s_lh"), "g", Seq(50, 99), scale = 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getLong(3)).toMap
    val db = graft.ext.SketchOps.histQuantiles(
        graft.ext.SketchOps.logHistSketch(
          toDocs((batch1 ++ batch2).toDF()), "g", "v",
          mBits = 3, scale = 10.0), "g", Seq(50, 99), scale = 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getLong(3)).toMap
    assert(dq == db)
  }

  test("ANN encodeWithState runs unchanged on a stream (frozen " +
      "quantizer = literal-folded pure projection) and equals batch") {
    // the streaming face of AnnIndexJob's daily append: new embeddings
    // can encode in the ingest DAG itself — cells and codes are pure
    // functions of (vector, frozen quantizer), no state, no shuffle.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val vecs = (0 until 30).map { i =>
      (i.toLong,
        (0 until 8).map(d => ((i * 7 + d * 3) % 13 - 6).toDouble).toArray)
    }
    val st = graft.ext.SimilarityOps.buildAnnIndexState(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 8, nCentroids = 4, m = 4, nCodewords = 8)
    val expected = st.codes.collect().map(_.toString).sorted.toSeq
    val stream = MemoryStream[(Long, Array[Double])]
    val q = graft.ext.SimilarityOps.encodeWithState(
        stream.toDF().toDF("vec_id", "embedding"), "vec_id",
        "embedding", st)
      .writeStream.format("memory").queryName("s_ann_encode")
      .outputMode("append").start()
    stream.addData(vecs.take(15)); q.processAllAvailable()
    stream.addData(vecs.drop(15)); q.processAllAvailable(); q.stop()
    val got = spark.table("s_ann_encode").collect()
      .map(_.toString).sorted.toSeq
    assert(got == expected)
  }
}
