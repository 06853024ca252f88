package graft.sources

import java.nio.charset.StandardCharsets
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Object-store convenience surface: time-limited signed URLs
  * (`/root/reference/core/utils/storage.py:85-97` —
  * `generate_signed_url(blob, expiration)`), re-expressed as the
  * publicly documented HMAC scheme every object store implements
  * (GCS V4 / S3 presigned: canonical string of resource + expiry,
  * keyed MAC, signature carried as query parameters). The signing key
  * comes from a [[graft.engine.Credentials.CredentialProvider]], so the
  * same code signs with an env var locally and a mounted service secret
  * on a cluster. Bucket/transport I/O itself stays on the Hadoop FS
  * layer (SURVEY §2: out-of-engine); signing and verification are pure
  * compute and belong here — a sink can mint links for alert emails
  * without any cloud SDK.
  */
object Storage {

  val DefaultExpirationSec: Long = 3600L // reference default, storage.py:85

  private def hmacHex(key: String, payload: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(StandardCharsets.UTF_8),
      "HmacSHA256"))
    mac.doFinal(payload.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Canonical string: METHOD, resource path, expiry epoch-seconds —
    * newline-joined, the minimal V4-style canonical request. */
  private def canonical(path: String, expiresAtSec: Long): String =
    s"GET\n$path\n$expiresAtSec"

  /** Mint a signed URL for `path` valid until `nowSec + expirationSec`:
    * `<path>?expires=<epoch>&signature=<hex hmac>`. Deterministic given
    * (path, key, now) — no randomness, so URLs are reproducible and
    * testable. */
  def signedUrl(path: String, key: String,
                expirationSec: Long = DefaultExpirationSec,
                nowSec: Long = System.currentTimeMillis() / 1000): String = {
    val expiresAt = nowSec + expirationSec
    val sig = hmacHex(key, canonical(path, expiresAt))
    s"$path?expires=$expiresAt&signature=$sig"
  }

  /** Verify a signed URL: true iff the signature matches the path+expiry
    * under `key` AND the expiry is in the future. Constant-time
    * signature compare (MessageDigest.isEqual) — string == would leak a
    * timing oracle on the MAC. */
  def verifySignedUrl(url: String, key: String,
                      nowSec: Long =
                        System.currentTimeMillis() / 1000): Boolean = {
    val q = url.lastIndexOf('?')
    if (q < 0) return false
    val path = url.substring(0, q)
    val params = url.substring(q + 1).split('&').flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
    (params.get("expires"), params.get("signature")) match {
      case (Some(exp), Some(sig)) =>
        exp.toLongOption.exists { e =>
          e > nowSec && java.security.MessageDigest.isEqual(
            hmacHex(key, canonical(path, e))
              .getBytes(StandardCharsets.UTF_8),
            sig.getBytes(StandardCharsets.UTF_8))
        }
      case _ => false
    }
  }
}
