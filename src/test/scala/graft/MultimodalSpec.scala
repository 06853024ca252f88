package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** §2.10 multimodal plumbing: binary payload + meta schema, batched
  * feature extraction, frame sampling. The decode itself is a stub; what
  * these tests pin is the distributed shape and determinism. */
class MultimodalSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq((0L, "aaaa bbbb"), (1L, "zzzz"), (2L, ""))
      .toDF("doc_id", "text")
  }

  test("withSyntheticMedia: binary payload + typed meta struct") {
    val df = Multimodal.withSyntheticMedia(docs(), "doc_id", "text")
    val mediaField = df.schema("media")
    assert(mediaField.dataType ==
      org.apache.spark.sql.types.BinaryType)
    val metaType = df.schema("media_meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaType.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = df.filter(col("doc_id") === 0).select("media_meta.n_bytes")
      .collect()(0).getLong(0)
    assert(r == 9L) // "aaaa bbbb".getBytes.length
  }

  test("decodeStub: deterministic L1-normalized histogram") {
    val f1 = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0f))
  }

  test("extractFeatures: appends array<float> features, row count preserved") {
    val df = Multimodal.withSyntheticMedia(docs(), "doc_id", "text")
    val out = Multimodal.extractFeatures(df, "media", batchSize = 2)
    assert(out.count() == 3)
    assert(out.schema("features").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val feats = out.filter(col("doc_id") === 0)
      .select("features").collect()(0).getSeq[Float](0)
    assert(feats.length == Multimodal.FeatureDim)
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
  }

  test("extractFeatures matches decodeStub row-for-row") {
    val df = Multimodal.withSyntheticMedia(docs(), "doc_id", "text")
    val out = Multimodal.extractFeatures(df, "media").collect()
    out.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("media")
      val expect = Multimodal.decodeStub(bytes).toSeq
      assert(r.getSeq[Float](r.fieldIndex("features")).toSeq == expect)
    }
  }

  test("readBinaryFiles ingests a media directory with real payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.img"),
      Array.tabulate[Byte](100)(_.toByte))
    java.nio.file.Files.write(dir.resolve("b.img"),
      Array.tabulate[Byte](40)((i: Int) => (i * 3).toByte))
    java.nio.file.Files.write(dir.resolve("skip.txt"),
      "not media".getBytes("UTF-8"))
    val df = Multimodal.readBinaryFiles(spark, dir.toString, "*.img")
    assert(df.count() == 2)
    val out = Multimodal.extractFeatures(df, "media")
      .select("n_bytes", "features").collect()
    assert(out.map(_.getAs[Long]("n_bytes")).toSet == Set(100L, 40L))
    out.foreach(r =>
      assert(r.getSeq[Float](1).length == Multimodal.FeatureDim))
  }

  test("sampleFrames: strided fixed-size chunks with sequential frame_no") {
    import spark.implicits._
    val one = Seq((7L, "abcdefgh" * 20)).toDF("doc_id", "text") // 160 chars
    val df = Multimodal.withSyntheticMedia(one, "doc_id", "text")
    val frames = Multimodal.sampleFrames(df, "doc_id", "media",
        frameBytes = 32, stride = 4)
      .orderBy("frame_no").collect()
    // 160 bytes → 5 chunks of 32 → strided by 4 → chunks 0 and 4 → 2 frames
    assert(frames.length == 2)
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1))
    val f0 = new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8")
    assert(f0 == ("abcdefgh" * 20).substring(0, 32))
  }

  test("frameDedupPairs: identical payloads and clips pair at 1e6, " +
    "diverging tails fall below threshold, disjoint ones never pair") {
    import spark.implicits._
    // frameBytes=32, stride=4 → one sampled frame per 128 bytes. Every
    // 32-byte block carries an explicit (tag, block) label so frames
    // are globally unique unless bytes genuinely coincide.
    def body(tag: String, blocks: Int): String =
      (0 until blocks).map(b => s"$tag-b$b".padTo(32, '.')).mkString
    val long = body("d1", 32)           // 1024 bytes, 8 sampled frames
    val clip = long.substring(0, 512)   // 4 frames, all shared with long
    val other = body("d4", 32)          // same shape, no shared frame
    val near = long.substring(0, 128) + body("d5", 28) // shares frame 0
    val df = Seq((1L, long), (2L, long), (3L, clip), (4L, other),
      (5L, near)).toDF("id", "t")
      .withColumn("media", encode(col("t"), "UTF-8"))
    val got = Multimodal.frameDedupPairs(df, "id", "media",
        frameBytes = 32, stride = 4, tauPpm = 500000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // exact duplicate: all 8 frames shared
    assert(got((1L, 2L)) == ((8L, 8L, 8L, 1000000L)))
    // the clip: 4/4 of ITS frames shared → min-normalized 10^6
    assert(got((1L, 3L)) == ((8L, 4L, 4L, 1000000L)))
    assert(got((2L, 3L)) == ((8L, 4L, 4L, 1000000L)))
    // diverging tail: 1/8 shared with long, 1/4 with the clip — both
    // below the 0.5 threshold; disjoint payload never pairs
    assert(!got.contains((1L, 5L)) && !got.contains((3L, 5L)))
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
    assert(got.size == 3)
    // below-threshold evidence is real: rerun at tau 0
    val all = Multimodal.frameDedupPairs(df, "id", "media",
        frameBytes = 32, stride = 4, tauPpm = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    assert(all((1L, 5L)) == 1L && all((3L, 5L)) == 1L)
  }

  test("perceptual tier catches re-encoded twins the exact frame tier " +
    "misses; unrelated payloads stay apart") {
    import spark.implicits._
    def body(seed: String, n: Int): String =
      (0 until n).map(i => s"$seed token$i word$i ").mkString
    val orig = body("alpha", 64)
    // re-encode stand-ins: byte permutation (reverse) and a resample
    // (every byte doubled) — identical byte HISTOGRAMS, zero shared
    // 32-byte frames with the original
    val reenc = orig.reverse
    val resized = orig.flatMap(c => s"$c$c")
    val other = body("zqxj", 64) // different letter mass
    val df = Seq((1L, orig), (2L, reenc), (3L, resized), (4L, other))
      .toDF("id", "t")
      .withColumn("media", encode(col("t"), "UTF-8"))
    // exact tier: the re-encodes share NO frame with the original
    val exact = Multimodal.frameDedupPairs(df, "id", "media",
        frameBytes = 32, stride = 4, tauPpm = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!exact.contains((1L, 2L)),
      "reversed payload must evade the exact tier")
    // perceptual tier over the features: both re-encodes pair with
    // the original at L1 = 0 (histograms identical up to rounding)
    val feats = Multimodal.extractFeatures(df, "media")
    val got = Multimodal.perceptualDedupPairs(feats, "id", "features",
        bits = 16, bands = 4, seed = 42L, tauL1Ppm = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got.contains((1L, 2L)), s"reversed twin must pair: $got")
    assert(got((1L, 2L)) == 0L)
    assert(got.contains((1L, 3L)),
      "byte-doubled (resampled) twin must pair")
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated payload must stay apart: $got")
  }
}
