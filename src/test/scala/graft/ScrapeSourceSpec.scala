package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.scrape.ScrapeManifest

/** S9 scrape-manifest source (`base_spider.py:5-16` lands pages; the
  * engine reads them back distributed): manifest parse, content
  * roundtrip, column-pruned file IO, and the swallow-and-log posture
  * for missing landed files. */
class ScrapeSourceSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_scrape").toString

  private def land(dir: String, name: String, text: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, text.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("manifest roundtrip: content, url, fetched_at survive the scan") {
    val dir = tmp()
    val f1 = land(dir, "a.html", "<html>alpha page</html>")
    val f2 = land(dir, "b.html", "beta with\nnewlines and é accents")
    ScrapeManifest.write(Seq(
      ("https://x.test/a", f1, java.time.Instant.parse("2024-03-01T10:00:00Z")),
      ("https://x.test/b", f2, java.time.Instant.parse("2024-03-01T11:30:00Z"))),
      s"$dir/manifest.jsonl")
    val got = spark.read.format("graft-scrape")
      .option("path", s"$dir/manifest.jsonl").load()
      .orderBy("url").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("url") == "https://x.test/a")
    assert(got(0).getAs[String]("content") == "<html>alpha page</html>")
    assert(got(1).getAs[String]("content")
      == "beta with\nnewlines and é accents")
    assert(got(0).getAs[java.sql.Timestamp]("fetched_at").toInstant
      == java.time.Instant.parse("2024-03-01T10:00:00Z"))
  }

  test("epoch-millis fetched_at parses like ISO (the two crawler shapes)") {
    val dir = tmp()
    val f = land(dir, "c.txt", "x")
    val iso = java.time.Instant.parse("2024-05-05T00:00:01Z")
    // hand-write one line with a NUMBER where write() emits ISO
    Files.write(Paths.get(dir, "m.jsonl"),
      (s"""{"url":"u1","path":"$f","fetched_at":${iso.toEpochMilli}}""" +
        "\n").getBytes(StandardCharsets.UTF_8))
    val e = ScrapeManifest.read(s"$dir/m.jsonl")
    assert(e.head.fetchedAtMicros == iso.toEpochMilli * 1000L)
  }

  test("column pruning reaches file IO: metadata query never opens pages") {
    val dir = tmp()
    // Manifest points at files that DO NOT exist: a metadata-only query
    // must still answer (pruned readers never open the files), proving
    // the pruning is real IO avoidance, not a projection after the read.
    ScrapeManifest.write(Seq(
      ("https://x.test/gone", s"$dir/never_landed.html",
        java.time.Instant.parse("2024-03-02T00:00:00Z"))),
      s"$dir/manifest.jsonl")
    val df = spark.read.format("graft-scrape")
      .option("path", s"$dir/manifest.jsonl").load()
    val meta = df.select("url", "fetched_at").collect()
    assert(meta.length == 1 && meta(0).getString(0) == "https://x.test/gone")
    // the scan's description must show the pruned column set
    val plan = df.select("url").queryExecution.executedPlan.toString
    assert(plan.contains("required=[url]"), plan)
    // asking for content on the missing file: null, not an exception
    // (db_core.py:116-117 ingest posture)
    val full = df.collect()
    assert(full.length == 1 && full(0).getAs[String]("content") == null)
  }

  test("a crawl batch fans out: one partition per 32 manifest entries") {
    val dir = tmp()
    val f = land(dir, "p.txt", "shared")
    ScrapeManifest.write(
      (0 until 70).map(i => (s"u$i", f,
        java.time.Instant.parse("2024-01-01T00:00:00Z"))),
      s"$dir/manifest.jsonl")
    val df = spark.read.format("graft-scrape")
      .option("path", s"$dir/manifest.jsonl").load()
    assert(df.rdd.getNumPartitions == 3) // ceil(70/32)
    assert(df.count() == 70)
  }
}
