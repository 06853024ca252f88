package graft

import java.nio.file.Files

import graft.sources.ObjectStore

/** K14 object ops (storage.py:34-150 twin) over the Hadoop FS API,
  * exercised against file:// — the same code path a gs://-rooted store
  * takes through its connector. */
class ObjectStoreSpec extends SparkSpec {

  private def tmpRoot(): String =
    Files.createTempDirectory("objstore").toString

  test("upload/list/download/delete round-trip; names are relative+sorted") {
    val root = tmpRoot()
    val store = new ObjectStore(root)
    val local = Files.createTempFile("up", ".txt")
    Files.writeString(local, "payload-1")
    store.uploadFile(local.toString, "data/b.txt")
    store.uploadFile(local.toString, "data/a.txt")
    store.uploadFile(local.toString, "top.txt")
    assert(store.listFiles() == Seq("data/a.txt", "data/b.txt", "top.txt"))
    val dest = Files.createTempDirectory("down").resolve("got.txt")
    store.downloadFile("data/b.txt", dest.toString)
    assert(Files.readString(dest) == "payload-1")
    store.deleteFile("data/b.txt")
    assert(store.listFiles() == Seq("data/a.txt", "top.txt"))
  }

  test("delete of a missing object raises (GCS NotFound posture)") {
    val store = new ObjectStore(tmpRoot())
    intercept[java.io.FileNotFoundException] {
      store.deleteFile("never/was.txt")
    }
  }

  test("listFiles on a missing root is empty, not an error") {
    val store = new ObjectStore(tmpRoot() + "/nonexistent")
    assert(store.listFiles() == Seq.empty)
  }

  test("saveDataFrameParquet: empty frame → false and nothing written; " +
      "round-trips through readParquet otherwise") {
    import spark.implicits._
    val store = new ObjectStore(tmpRoot())
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    assert(!store.saveDataFrameParquet(empty, "out/empty.parquet"))
    assert(store.listFiles() == Seq.empty)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(store.saveDataFrameParquet(df, "out/data.parquet"))
    val back = store.readParquet(spark, "out/data.parquet")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("object names are opaque keys: absolute and ..-escapes rejected") {
    val store = new ObjectStore(tmpRoot())
    intercept[IllegalArgumentException] {
      store.deleteFile("/etc/hosts")
    }
    intercept[IllegalArgumentException] {
      store.listFiles() // ok
      store.deleteFile("a/../../outside.txt")
    }
    intercept[IllegalArgumentException] {
      store.deleteFile("")
    }
  }

  test("scheme-qualified names cannot replace the root (r9-review fix)") {
    val root = tmpRoot()
    val store = new ObjectStore(root)
    // Path(parent, child) swaps in an absolute child URI wholesale —
    // without the scheme guard these would operate OUTSIDE the root
    val victim = Files.createTempFile("victim", ".txt")
    Files.writeString(victim, "do-not-delete")
    Seq(s"file:$victim", s"file://$victim", "gs://bucket/other/x",
        "hdfs://nn:8020/x", "file:relative-but-schemed").foreach { n =>
      val e = intercept[IllegalArgumentException](store.deleteFile(n))
      assert(e.getMessage.contains("scheme-less") ||
        e.getMessage.contains("outside the store root"), s"$n: $e")
    }
    assert(Files.readString(victim) == "do-not-delete")
    // a colon AFTER the first slash is not a scheme — still a valid key
    val local = Files.createTempFile("up", ".txt")
    Files.writeString(local, "x")
    store.uploadFile(local.toString, "data/ts=12:30:00.txt")
    assert(store.listFiles() == Seq("data/ts=12:30:00.txt"))
  }

  test("save failure returns false rather than throwing (storage.py:143)") {
    import spark.implicits._
    // a root under a plain FILE cannot be created -> write fails
    val f = Files.createTempFile("blocker", ".bin")
    val store = new ObjectStore(f.toString + "/sub")
    val df = Seq((1L, "a")).toDF("id", "v")
    assert(!store.saveDataFrameParquet(df, "x.parquet"))
  }
}
