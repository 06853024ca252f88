package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Storage

/** Signed-URL surface (storage.py:85-97 twin): HMAC signing, expiry,
  * tamper detection. Pure compute — no Spark session needed. */
class StorageSpec extends AnyFunSuite {

  private val key = "test-signing-key"

  test("signed URL verifies under the same key before expiry") {
    val url = Storage.signedUrl("bucket/data/part-0.parquet", key,
      expirationSec = 3600, nowSec = 1000000)
    assert(url.startsWith("bucket/data/part-0.parquet?expires=1003600&"))
    assert(Storage.verifySignedUrl(url, key, nowSec = 1000001))
  }

  test("expired URL and wrong key are rejected") {
    val url = Storage.signedUrl("p/x.bin", key, 60, nowSec = 5000)
    assert(Storage.verifySignedUrl(url, key, nowSec = 5059))
    assert(!Storage.verifySignedUrl(url, key, nowSec = 5060)) // expired
    assert(!Storage.verifySignedUrl(url, "other-key", nowSec = 5059))
  }

  test("tampered path, expiry, or signature are rejected") {
    val url = Storage.signedUrl("a/b.parquet", key, 3600, nowSec = 100)
    assert(!Storage.verifySignedUrl(
      url.replace("a/b.parquet", "a/c.parquet"), key, nowSec = 101))
    assert(!Storage.verifySignedUrl(
      url.replace("expires=3700", "expires=99999"), key, nowSec = 101))
    val flipped =
      if (url.endsWith("0")) url.dropRight(1) + "1"
      else url.dropRight(1) + "0"
    assert(!Storage.verifySignedUrl(flipped, key, nowSec = 101))
    assert(!Storage.verifySignedUrl("no/query/params", key, nowSec = 101))
  }

  test("deterministic given (path, key, now)") {
    val a = Storage.signedUrl("p", key, 10, nowSec = 42)
    val b = Storage.signedUrl("p", key, 10, nowSec = 42)
    assert(a == b)
  }
}
