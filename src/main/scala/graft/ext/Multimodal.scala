package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY §2.10): image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with batched per-partition
  * feature extraction.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is real
  * and tested. The actual media decode is STUBBED (this container has no
  * image/audio codecs): [[decodeStub]] derives deterministic fake features
  * from the raw bytes. Swapping in a real decoder (JavaCV, TwelveMonkeys,
  * ffmpeg-cli) changes ONLY that function; the distributed shape —
  * `mapPartitions` with `grouped(batchSize)` batches, mirroring the
  * Arrow-batch shape a `mapInPandas` pipeline would use — stays identical.
  *
  * Scale notes: payloads stay columnar in parquet (binary column, never
  * driver-collected); feature extraction is a narrow per-partition map (no
  * shuffle); batching amortizes per-call decoder setup exactly like Arrow
  * record batches do in Python pipelines.
  */
object Multimodal {

  /** Metadata struct carried alongside every media payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  val FeatureDim = 16

  /** Synthesize a deterministic media payload per row (UTF-8 bytes of the
    * text stand in for an encoded image) + metadata struct. This is the
    * fixture-side of the stub: real pipelines read (path, bytes) via
    * `spark.read.format("binaryFile")` and carry the same shape. */
  def withSyntheticMedia(df: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("image/fake").as("mime"),
        (pmod(col(idCol), lit(64)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 1).cast("int").as("height"),
        length(col("media")).cast("long").as("n_bytes")))

  /** Real media ingestion path: a directory of encoded files → (path,
    * modificationTime, length, content) via Spark's binaryFile source —
    * the production twin of [[withSyntheticMedia]]. Payloads stream
    * straight from the object store into executor memory per partition
    * (use `pathGlobFilter` to pick formats; `maxBytesPerPartition` style
    * limits come from `spark.sql.files.maxPartitionBytes`). */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession,
                      path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("length").as("n_bytes"),
        col("content").as("media"))

  /** STUB decoder — deterministic fake features from raw bytes: a
    * 16-bucket byte-value histogram, L1-normalized. A real implementation
    * would decode pixels/samples here; the signature (bytes in, fixed-dim
    * float vector out) is the real contract. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes == null || bytes.isEmpty) return hist
    bytes.foreach { b => hist((b & 0xFF) / FeatureDim) += 1f }
    val total = bytes.length.toFloat
    hist.map(_ / total)
  }

  /** Batched per-partition feature extraction: groups each partition's
    * rows into `batchSize` batches (the decoder-amortization unit — same
    * role as an Arrow batch in `mapInPandas`), decodes each payload, and
    * appends a `features: array<float>` column. mapPartitions is justified
    * here (SURVEY §7.3): a decode is genuine per-row imperative logic no
    * builtin expresses. */
  def extractFeatures(df: DataFrame, mediaCol: String,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = decoder-session scope (open once per batch)
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          Row.fromSeq(r.toSeq :+ decodeStub(bytes).toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th fixed-size
    * chunk of the payload becomes one "frame" row (id, frame_no, frame).
    * Pure `functions` — posexplode over a sliced binary — so it stays in
    * codegen; a real video pipeline swaps chunking for keyframe offsets. */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
                   frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col(mediaCol)).cast("double") / frameBytes)
      .cast("int")
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
          i => substring(col(mediaCol), i * frameBytes + 1, lit(frameBytes)))))
      .withColumnsRenamed(Map("pos" -> "frame_no", "col" -> "frame"))
  }

  /** Media near-dup pairs by SHARED FRAME FINGERPRINTS — the video/
    * audio dedup move (same payload re-encoded, clipped, or trimmed
    * still shares sampled frames; byte-level hashes of the container
    * do not): pairs whose overlap coefficient
    * `|fp(A) ∩ fp(B)| / min(|fp(A)|, |fp(B)|)` reaches `tauPpm` —
    * min-normalized so a CLIP of a longer video still scores ~10⁶
    * (the containment argument at media grain). Emits each unordered
    * pair once (`id_a < id_b`) with both frame counts, the shared
    * count, and exact-ppm overlap.
    *
    * Scale shape: payloads reduce to DISTINCT (id, frame-md5) rows —
    * the fingerprint, not the frame bytes, is what shuffles — then ONE
    * fingerprint-keyed equi-join + one pair-keyed count, ids-and-
    * hashes-only exchanges (the [[graft.ext.DedupOps.containmentPairs]]
    * shape). A real pipeline swaps [[sampleFrames]]' chunking for
    * keyframe offsets and drops ubiquitous fingerprints (black frames)
    * above a df cap before the join; the pair algebra is unchanged. */
  def frameDedupPairs(df: DataFrame, idCol: String, mediaCol: String,
                      frameBytes: Int = 32, stride: Int = 4,
                      tauPpm: Long = 500000L): DataFrame = {
    // Fingerprint ONCE: sizes + both join sides read this frame — the
    // materialize keeps the chunk/md5 pass from running three times
    // over the payload bytes (review catch, the rank-op lesson).
    val fps = graft.engine.Engine.materialize(
      sampleFrames(df, idCol, mediaCol, frameBytes, stride)
        .select(col(idCol).as("_id"), md5(col("frame")).as("_fp"))
        .distinct())
    val sizes = fps.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val pairs = fps.select(col("_id").as("id_a"), col("_fp"))
      .join(fps.select(col("_id").as("id_b"), col("_fp")), Seq("_fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("_id").as("id_a"), col("_n").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("_id").as("id_b"), col("_n").as("n_b")),
        Seq("id_b"))
      .withColumn("overlap_ppm",
        expr("n_shared * 1000000 div least(n_a, n_b)"))
      .filter(col("overlap_ppm") >= tauPpm)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("n_shared"), col("overlap_ppm"))
  }
}
