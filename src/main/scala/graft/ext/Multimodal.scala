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

  /** Deterministic ±1 projection weights for the PERCEPTUAL signature
    * ([[perceptualDedupPairs]]): `w(t)(i)` from the parity of
    * `XXH64("p:t:i", seed)`. Exposed so the oracle-SQL generator embeds
    * the SAME literals the engine plans with. */
  def perceptualWeights(dim: Int, bits: Int,
                        seed: Long): Array[Array[Int]] =
    Array.tabulate(bits, dim) { (t, i) =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(org.apache.spark.unsafe.types.UTF8String
          .fromString(s"p:$t:$i"), seed)
      if ((h & 1L) == 0L) 1 else -1
    }

  /** PERCEPTUAL media near-dup pairs over the FEATURE vectors — the
    * tier [[frameDedupPairs]] cannot serve: exact frame fingerprints
    * miss a re-encoded / resized / transcoded copy entirely (every
    * byte changes), but its decoded FEATURES barely move. The standard
    * crawled-media case is exactly that copy, so the perceptual tier
    * is the one that matters at corpus scale.
    *
    * Pipeline (every step deterministic, so a DuckDB twin reproduces
    * it bit-for-bit — the SimHash/band machinery re-used at media
    * grain): sign-quantized projection of the (float32→double-widened)
    * feature vector under [[perceptualWeights]] (fixed-order
    * left-associated double sums — reproducible IEEE arithmetic) →
    * `bits`-bit signature split into `bands` Hamming blocks → block
    * equi-join candidates → exact L1 verification,
    * `l1_ppm = floor(10⁶·Σ|fa_i−fb_i|) ≤ tauL1Ppm`.
    *
    * Scale shape: signatures and band values are a scan-bound
    * projection; band rows carry ONLY (band, value, id) — the
    * [[graft.ext.SimilarityOps.annTopK]] discipline — and feature
    * vectors re-attach AFTER the pair dedup by two id joins, so the
    * candidate join shuffles three small columns and the verify cost
    * is output-bound. */
  def perceptualDedupPairs(df: DataFrame, idCol: String,
                           featuresCol: String, bits: Int = 16,
                           bands: Int = 4, seed: Long = 42L,
                           tauL1Ppm: Long = 100L): DataFrame = {
    require(bits % bands == 0, "bits must be divisible by bands")
    require(bits <= 62, s"bits out of range: $bits")
    val r = bits / bands
    val dim = FeatureDim
    val w = perceptualWeights(dim, bits, seed)
    def f64(c: org.apache.spark.sql.Column, i: Int) =
      element_at(c, i + 1).cast("double")
    val bitCols = (0 until bits).map { t =>
      (0 until dim).map(i => f64(col("_f"), i) * lit(w(t)(i).toDouble))
        .reduceLeft(_ + _) >= lit(0.0)
    }
    val bandCols = (0 until bands).map { b =>
      (0 until r).map { j =>
        when(bitCols(b * r + j), lit(1L << j)).otherwise(lit(0L))
      }.reduceLeft(_ + _)
    }
    // One narrow materialized pass: (id, features, band values) —
    // consumed by the band explode AND the feature re-attach.
    val sigs = graft.engine.Engine.materialize(
      df.select(col(idCol).as("_id"), col(featuresCol).as("_f"))
        .select(col("_id") +: col("_f") +:
          bandCols.zipWithIndex.map { case (c, b) => c.as(s"_b$b") }: _*))
    val banded = sigs.select(col("_id"),
        posexplode(array((0 until bands).map(b => col(s"_b$b")): _*)))
      .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bv"))
    val cand = banded.select(col("_band"), col("_bv"),
        col("_id").as("id_a"))
      .join(banded.select(col("_band"), col("_bv"),
        col("_id").as("id_b")), Seq("_band", "_bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val feats = sigs.select(col("_id"), col("_f"))
    val l1 = (0 until dim).map(i =>
        abs(f64(col("_fa"), i) - f64(col("_fb"), i)))
      .reduceLeft(_ + _)
    cand
      .join(feats.select(col("_id").as("id_a"), col("_f").as("_fa")),
        Seq("id_a"))
      .join(feats.select(col("_id").as("id_b"), col("_f").as("_fb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(l1 * lit(1000000.0)).as("l1_ppm"))
      .filter(col("l1_ppm") <= tauL1Ppm)
  }

  /** Media near-dup pairs by SHARED FRAME FINGERPRINTS — the video/
    * audio dedup move for clips and trims (byte-level hashes of the
    * container miss them; shared sampled frames don't). A RE-ENCODED
    * or resized copy shares no exact frame bytes and evades this tier
    * entirely — that's [[perceptualDedupPairs]]' job. Pairs whose
    * overlap coefficient
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
