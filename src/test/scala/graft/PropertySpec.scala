package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.transform.Sanitize

/** Property-based tier (SURVEY §5.2.3) — raw ScalaCheck driven from
  * ScalaTest (no scalatestplus bridge in the offline cache). Driver-side
  * pure functions only; Spark-evaluated properties live in the dedicated
  * suites where a session exists. */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("sanitizeName is idempotent") {
    check("idempotence", Prop.forAll { (s: String) =>
      val once = Sanitize.sanitizeName(s)
      Sanitize.sanitizeName(once) == once
    })
  }

  test("sanitizeName always yields a warehouse-safe identifier") {
    check("valid", Prop.forAll { (s: String) =>
      val out = Sanitize.sanitizeName(s)
      out.nonEmpty &&
        out.matches("[A-Za-z_][A-Za-z0-9_]*") &&
        !out.startsWith("_") && !out.endsWith("_")
    })
  }

  test("sanitizeName preserves already-clean names") {
    val clean = for {
      head <- Gen.alphaChar
      tail <- Gen.listOf(Gen.frequency(
        9 -> Gen.alphaNumChar, 1 -> Gen.const('x')))
    } yield (head :: tail).mkString
    check("preserves", Prop.forAll(clean) { s =>
      Sanitize.sanitizeName(s) == s
    })
  }

  test("mix is a bijection-grade mixer: no collisions on distinct inputs (sampled)") {
    check("mix-distinct", Prop.forAll { (a: Long, b: Long) =>
      (a == b) == (graft.expressions.NativeExprs.mix(a) ==
        graft.expressions.NativeExprs.mix(b))
    })
  }

  test("decodeStub is an L1-normalized histogram for any payload") {
    check("histogram", Prop.forAll(Gen.listOf(Gen.choose(
        Byte.MinValue, Byte.MaxValue))) { bytes =>
      val f = graft.ext.Multimodal.decodeStub(bytes.toArray)
      f.length == graft.ext.Multimodal.FeatureDim &&
        f.forall(_ >= 0f) &&
        (bytes.isEmpty || math.abs(f.sum - 1f) < 1e-3)
    })
  }

  test("signed URLs round-trip for any path/key; never verify early-expired or cross-key") {
    import graft.sources.Storage
    val path = Gen.asciiPrintableStr.map(_.filter(c => c != '?' && c != '&'))
    check("roundtrip", Prop.forAll(path, Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.choose(1L, 100000L), Gen.choose(0L, 1000000L)) {
      (p, key, ttl, now) =>
        val url = Storage.signedUrl(p, key, ttl, now)
        Storage.verifySignedUrl(url, key, now + ttl - 1) &&
          !Storage.verifySignedUrl(url, key, now + ttl) &&
          !Storage.verifySignedUrl(url, key + "x", now)
    })
  }

  test("RRF fixed-point contribution: floor(double) ≡ integer division, strictly rank-monotone") {
    // the scaladoc claim behind rrfFuse: the floored double divide
    // equals true integer division for every realistic rank, and
    // better ranks always contribute strictly more (so fused order
    // respects rank improvements)
    def f(r: Long): Long = math.floor(1073741824.0 / (60.0 + r)).toLong
    check("floor≡intdiv", Prop.forAll(Gen.choose(1L, 1000000L)) { r =>
      f(r) == 1073741824L / (60L + r)
    })
    check("strict-monotone", Prop.forAll(
        Gen.choose(1L, 30000L), Gen.choose(1L, 30000L)) { (a, b) =>
      a == b || (a < b) == (f(a) > f(b))
    })
  }

  test("int8 quantize roundtrip error is bounded by half a step") {
    // driver-side replica of quantizeInt8's per-dim chain
    val gen = for {
      mn <- Gen.choose(-100.0, 100.0)
      w <- Gen.choose(1e-6, 200.0)
      t <- Gen.choose(0.0, 1.0)
    } yield (mn, mn + w, mn + t * w)
    check("halfstep", Prop.forAll(gen) { case (mn, mx, x0) =>
      val x = math.min(mx, math.max(mn, x0))
      val code = math.max(0L, math.min(255L,
        math.floor((x - mn) * 255.0 / (mx - mn) + 0.5).toLong))
      val deq = mn + code.toDouble * (mx - mn) / 255.0
      math.abs(deq - x) <= (mx - mn) / 255.0 * 0.5000001
    })
  }

  test("PSI bucket terms are never negative (psi_fx >= 0 by construction)") {
    // (pa − pb)·ln(pa/pb) ≥ 0 whenever both probabilities are
    // positive — add-one smoothing guarantees that, so the fixed-point
    // floor sum can never go below zero
    val gen = for {
      na <- Gen.choose(0L, 100000L); ta <- Gen.choose(1L, 1000000L)
      nb <- Gen.choose(0L, 100000L); tb <- Gen.choose(1L, 1000000L)
    } yield (na, ta + na, nb, tb + nb)
    check("nonneg", Prop.forAll(gen) { case (na, ta, nb, tb) =>
      val pa = (na + 1).toDouble / (ta + 5).toDouble
      val pb = (nb + 1).toDouble / (tb + 5).toDouble
      val term = (pa - pb) * math.log(pa / pb)
      term >= 0.0 && math.floor(term * 1099511627776.0).toLong >= 0L
    })
  }

  test("portable token hash stays in [0, 2^60) and is injective on distinct md5 prefixes (sampled)") {
    // driver-side twin of the conv(substring(md5)) pipeline used by
    // simhashPortable — the value contract the DuckDB oracle relies on
    def prefix(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    def h(s: String): Long = java.lang.Long.parseLong(prefix(s), 16)
    check("range", Prop.forAll { (s: String) =>
      h(s) >= 0L && h(s) < (1L << 60)
    })
    check("injective-on-distinct-prefixes", Prop.forAll { (a: String, b: String) =>
      (prefix(a) == prefix(b)) == (h(a) == h(b))
    })
  }
}
