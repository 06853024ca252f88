package graft.expressions

import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions (with `doGenCode`) for the §2.10 hot loops.
  *
  * Why: Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * are evaluated INTERPRETED, one boxed lambda call per element — a 64-perm
  * MinHash over ~50-shingle docs costs ~17M lambda invocations per 5k
  * documents (measured ~12 s at sf0.1). These expressions compile the same
  * arithmetic into whole-stage-codegen'd Java loops: fixed-width long ops,
  * zero allocation per element. Preference order per SURVEY §7.3 — (b)
  * custom `Expression` before (d) `mapPartitions` — because an Expression
  * keeps the op inside Catalyst: usable in any projection, prunable,
  * NULL-aware, and visible to the optimizer.
  *
  * Registered through [[GraftExtensions]] (SparkSessionExtensions →
  * injectFunction), the blessed extension seam; [[graft.engine.Engine]]
  * installs it on every session.
  */
object NativeExprs {

  /** splitmix64/murmur3 avalanche finalizer — the permutation family's
    * mixing function (public-domain constants). */
  @inline final def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33; z
  }

  def seeds(numPerm: Int): Array[Long] =
    Array.tabulate(numPerm)(p => mix(0x9E3779B97F4A7C15L * (p + 1)))

  /** Install all graft native functions on a session-extensions hook. */
  def inject(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, builder: FunctionBuilder): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    reg("graft_minhash_sig", {
      case Seq(c, Literal(k: Int, IntegerType)) => MinHashSig(c, k)
      case other => throw new IllegalArgumentException(
        s"graft_minhash_sig(arr, intLiteral), got $other")
    })
    reg("graft_simhash", { case Seq(c) => SimHashBits(c) })
    reg("graft_dot", { case Seq(a, b) => DotProduct(a, b) })
    reg("graft_shingle_hashes", {
      case Seq(c, Literal(n: Int, IntegerType)) => ShingleHashes(c, n)
      case other => throw new IllegalArgumentException(
        s"graft_shingle_hashes(arr, intLiteral), got $other")
    })
    reg("graft_hash_tokens", { case Seq(c) => TokenHashes(c) })
    reg("graft_shingle_h60", {
      case Seq(c, Literal(n: Int, IntegerType)) => ShingleH60(c, n)
      case other => throw new IllegalArgumentException(
        s"graft_shingle_h60(arr, intLiteral), got $other")
    })
    reg("graft_min_windows", {
      case Seq(c, Literal(w: Int, IntegerType)) => MinWindows(c, w)
      case other => throw new IllegalArgumentException(
        s"graft_min_windows(arr, intLiteral), got $other")
    })
    reg("graft_window_hashes", {
      case Seq(c, Literal(n: Int, IntegerType)) => WindowHashes(c, n)
      case other => throw new IllegalArgumentException(
        s"graft_window_hashes(arr, intLiteral), got $other")
    })
    reg("graft_strip_covered", {
      case Seq(t, s, Literal(n: Int, IntegerType)) => StripCovered(t, s, n)
      case other => throw new IllegalArgumentException(
        s"graft_strip_covered(toks, starts, intLiteral), got $other")
    })
    reg("graft_del_variants", { case Seq(c) => DeletionVariants(c) })
    reg("graft_span_corrupt", {
      case Seq(t, id, Literal(r: Int, IntegerType)) =>
        SpanCorruptExpr(t, id, r)
      case other => throw new IllegalArgumentException(
        s"graft_span_corrupt(toks, idStr, intLiteral), got $other")
    })
    reg("graft_ln", { case Seq(c) => GraftLn(c) })
    reg("graft_hilbert", {
      case Seq(x, y, Literal(b: Int, IntegerType)) => HilbertIndex(x, y, b)
      case other => throw new IllegalArgumentException(
        s"graft_hilbert(bigint, bigint, bitsLiteral), got $other")
    })
    reg("graft_dbits", { case Seq(c) => DoubleOrderBits(c) })
    reg("graft_nfc", { case Seq(c) => NfcNormalize(c) })
    reg("graft_bloom_contains", {
      case Seq(c, Literal(bytes: Array[Byte], BinaryType)) =>
        BloomMightContain(c, bytes)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_contains(str, binaryLiteral), got $other")
    })
    reg("graft_gram", {
      case Seq(c, Literal(d: Int, IntegerType)) => GramMatrixFixed(c, d)
      case other => throw new IllegalArgumentException(
        s"graft_gram(arr, dimLiteral), got $other")
    })
    reg("graft_kmin", {
      case Seq(c, Literal(k: Int, IntegerType)) => KMinDistinct(c, k)
      case other => throw new IllegalArgumentException(
        s"graft_kmin(bigint, kLiteral), got $other")
    })
    reg("graft_lm_nll", {
      case Seq(c, Literal(uk: ArrayData, ArrayType(LongType, _)),
               Literal(uv: ArrayData, ArrayType(LongType, _)),
               Literal(bk: ArrayData, ArrayType(LongType, _)),
               Literal(bv: ArrayData, ArrayType(LongType, _)),
               Literal(v: Double, DoubleType)) =>
        LmNllFixed(c, uk.toLongArray(), uv.toLongArray(),
          bk.toLongArray(), bv.toLongArray(), v)
      case other => throw new IllegalArgumentException(
        "graft_lm_nll(arr, ukLit, uvLit, bkLit, bvLit, vLit), got " + other)
    })
    reg("graft_any_in_set", {
      case Seq(c, Literal(arr: ArrayData, ArrayType(LongType, _))) =>
        AnyInSortedSet(c, arr.toLongArray())
      case other => throw new IllegalArgumentException(
        s"graft_any_in_set(arr, bigintArrayLiteral), got $other")
    })
    reg("graft_sign_project", {
      case Seq(c, Literal(dOut: Int, IntegerType),
               Literal(dIn: Int, IntegerType)) =>
        SignProjectFx(c, dOut, dIn)
      case other => throw new IllegalArgumentException(
        s"graft_sign_project(arr, dOutLit, dInLit), got $other")
    })
    reg("graft_dict_sum", {
      case Seq(c, Literal(ks: ArrayData, ArrayType(LongType, _)),
               Literal(vs: ArrayData, ArrayType(LongType, _)),
               Literal(d: Long, LongType)) =>
        DictSumFixed(c, ks.toLongArray(), vs.toLongArray(), d)
      case other => throw new IllegalArgumentException(
        "graft_dict_sum(arr, keysLit, valsLit, defaultLit), got " + other)
    })
    reg("graft_gram_stats", {
      case Seq(c) => GramStats(c)
      case other => throw new IllegalArgumentException(
        s"graft_gram_stats(arr), got $other")
    })
    reg("graft_nearest", {
      case Seq(c, Literal(m: ArrayData, ArrayType(ArrayType(DoubleType, _), _)),
               Literal(off: Int, IntegerType)) =>
        NearestIndexLit(c, NativeExprs.litMatrix(m), off)
      case other => throw new IllegalArgumentException(
        s"graft_nearest(arr, matrixLit, offsetLit), got $other")
    })
    reg("graft_kmeans_top2", {
      case Seq(c, Literal(ids: ArrayData, ArrayType(IntegerType, _)),
               Literal(m: ArrayData, ArrayType(ArrayType(DoubleType, _), _))) =>
        KmeansTop2Fx(c, ids.toIntArray(), NativeExprs.litMatrix(m))
      case other => throw new IllegalArgumentException(
        s"graft_kmeans_top2(arr, idsLit, matrixLit), got $other")
    })
    reg("graft_bloom_positions", {
      case Seq(c, Literal(m: Long, LongType), Literal(d: Int, IntegerType)) =>
        BloomPositionsExpr(c, m, d)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_positions(arr, mLongLit, depthIntLit), got $other")
    })
    reg("graft_h60", { case Seq(c) => GraftH60(c) })
    reg("graft_merge_dot", { case Seq(a, b) => MergeDotFixed(a, b) })
    reg("graft_bloom_pos", {
      case Seq(c, Literal(m: Long, LongType), Literal(j: Int, IntegerType)) =>
        BloomPosExpr(c, m, j)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_pos(str, mLongLit, saltIntLit), got $other")
    })
    reg("graft_maxcos", {
      case Seq(c, Literal(ids: ArrayData, ArrayType(LongType, _)),
               Literal(m: ArrayData, ArrayType(ArrayType(DoubleType, _), _))) =>
        MaxCosLit(c, ids.toLongArray(), NativeExprs.litMatrix(m))
      case other => throw new IllegalArgumentException(
        s"graft_maxcos(arr, idsLit, matrixLit), got $other")
    })
  }

  /** Spark `round(_, 6)` on a double, replicated exactly (RoundBase's
    * DoubleType branch): NaN/Infinity pass through, everything else via
    * the shortest-decimal BigDecimal at HALF_UP. */
  @inline final def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** [[MaxCosLit]]'s compiled kernel: per candidate j (ids ascending),
    * `s_j = round6(dot(v, cand_j) / (norm(v) * norm(cand_j)))` with the
    * identical sequential double accumulation as `graft_dot`/`sqrt`,
    * ranked by `(s, -id)` under SQLOrderingUtil double ordering (NaN
    * greatest, ties keep the smallest id — the strict `>` against
    * ascending ids). Returns `(s, id)` of the max, or null on a null
    * element or a vector whose length differs from the candidate dim. */
  def maxCos(a: ArrayData, isFloat: Boolean, ids: Array[Long],
             cands: Array[Array[Double]],
             cnorms: Array[Double]): InternalRow = {
    val dim = cands(0).length
    if (a.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var vv = 0.0
    i = 0
    while (i < dim) { vv += v(i) * v(i); i += 1 }
    val na = Math.sqrt(vv)
    var bestS = 0.0
    var bestId = 0L
    var first = true
    var j = 0
    while (j < cands.length) {
      val c = cands(j)
      var vc = 0.0
      i = 0
      while (i < dim) { vc += v(i) * c(i); i += 1 }
      val sj = round6(vc / (na * cnorms(j)))
      if (first || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(sj, bestS) > 0) {
        bestS = sj; bestId = ids(j); first = false
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestS, bestId))
  }

  /** Materialize a literal `array<array<double>>` into a JVM matrix
    * (registration-time only — never per row). */
  def litMatrix(m: ArrayData): Array[Array[Double]] =
    Array.tabulate(m.numElements())(i => m.getArray(i).toDoubleArray())

  /** dot(c, c) per candidate row, sequential accumulation — matches the
    * compositional `dot(cl, cl)` on a literal array bit-for-bit. */
  def selfDots(cands: Array[Array[Double]]): Array[Double] =
    cands.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  /** [[NearestIndexLit]]'s compiled kernel (shared by both eval paths):
    * argmin over candidates of `(vv − 2·vc) + cc(j)` on the window
    * `[offset, offset + len)`, ties to the lowest index via
    * `SQLOrderingUtil.compareDoubles` (array_sort's double ordering).
    * Returns −1 for null (null element / window past array end). */
  def nearestIdx(a: ArrayData, isFloat: Boolean, offset: Int,
                 cands: Array[Array[Double]], cc: Array[Double]): Int = {
    val len = cands(0).length
    if (offset + len > a.numElements()) return -1
    val v = new Array[Double](len)
    var i = 0
    while (i < len) {
      if (a.isNullAt(offset + i)) return -1
      v(i) = if (isFloat) a.getFloat(offset + i).toDouble
             else a.getDouble(offset + i)
      i += 1
    }
    var vv = 0.0
    i = 0
    while (i < len) { vv += v(i) * v(i); i += 1 }
    var best = 0.0
    var bi = -1
    var j = 0
    while (j < cands.length) {
      val c = cands(j)
      var vc = 0.0
      i = 0
      while (i < len) { vc += v(i) * c(i); i += 1 }
      val d = vv - 2.0 * vc + cc(j)
      if (bi < 0 || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(d, best) < 0) { best = d; bi = j }
      j += 1
    }
    bi
  }

  /** [[KmeansTop2Fx]]'s compiled kernel: exact fixed-point distance
    * `Σ_i ⌊(v_i − c_i)²·2³⁰⌋` per centroid, top-2 by `(d, id)`.
    * Returns null on a null element or a short vector. */
  def kmeansTop2(a: ArrayData, isFloat: Boolean, ids: Array[Int],
                 cents: Array[Array[Double]]): InternalRow = {
    val dim = cents(0).length
    if (dim > a.numElements()) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var d1 = Long.MaxValue; var c1 = -1
    var d2 = Long.MaxValue; var c2 = -1
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var s = 0L
      i = 0
      while (i < dim) {
        val df = v(i) - c(i)
        s += Math.floor(df * df * 1073741824.0).toLong
        i += 1
      }
      val id = ids(j)
      // ids are strictly increasing (kmeansCentroidsFx sorts), so a tie
      // on d never displaces an earlier id — plain < matches (d, id).
      if (c1 < 0 || s < d1) {
        d2 = d1; c2 = c1; d1 = s; c1 = id
      } else if (c2 < 0 || s < d2) {
        d2 = s; c2 = id
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](c1, d1, c2, d2))
  }

  /** Multiplicity stats of a hashed-gram MULTISET in one compiled pass:
    * `[n, d, mx]` = total grams, distinct grams, max multiplicity — the
    * inputs of the Gopher repetition fractions
    * ([[graft.ext.TextOps.repetitionStats]]), computed per ROW so the
    * repetition gate is a scan-bound projection instead of a corpus-wide
    * explode + two grouped aggregations. Sort-and-scan (no per-row hash
    * map): O(n log n) on primitive longs, zero boxing, zero allocation
    * beyond the working copy. Null elements count as hash 0L (the
    * [[ShingleHashes]] convention). Empty input → `[0, 0, 0]`. */
  def gramStats(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val hs = new Array[Long](len)
    var i = 0
    while (i < len) {
      hs(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i); i += 1
    }
    java.util.Arrays.sort(hs)
    var d = 1L; var mx = 1L; var run = 1L
    i = 1
    while (i < len) {
      if (hs(i) == hs(i - 1)) { run += 1; if (run > mx) mx = run }
      else { d += 1; run = 1 }
      i += 1
    }
    new GenericArrayData(Array(len.toLong, d, mx))
  }

  /** NFC-normalize a UTF8String, returning the INPUT object untouched
    * when it is already normalized — the dominant case for web text
    * (ASCII and precomposed Latin-1 both pass `isNormalized` without
    * allocating), so the scan-wide cost is one table lookup per char
    * and zero garbage on the hot path. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Order-sensitive combine of one n-token window (Horner-style mixing —
    * "ab c" and "a bc" collide only if the token hashes do). */
  @inline final def combineWindow(hs: Array[Long], start: Int,
                                  n: Int): Long = {
    var acc = 0x2545F4914F6CDD1DL
    var j = 0
    while (j < n) { acc = mix(acc ^ (hs(start + j) * 0x9E3779B97F4A7C15L)); j += 1 }
    acc
  }

  /** [[combineWindow]] over Catalyst ArrayData (no copy). */
  @inline final def combineWindowAD(
      hs: org.apache.spark.sql.catalyst.util.ArrayData, start: Int,
      n: Int): Long = {
    var acc = 0x2545F4914F6CDD1DL
    var j = 0
    while (j < n) { acc = mix(acc ^ (hs.getLong(start + j) * 0x9E3779B97F4A7C15L)); j += 1 }
    acc
  }

  /** Shared eval core for [[LmNllFixed]] — called from BOTH the
    * interpreted path and generated code (the DeletionVariants static-
    * call pattern). Returns null for docs with fewer than two tokens
    * (no bigrams — mirroring the batch op's absence semantics). The
    * arithmetic per bigram is EXACTLY `TextOps.lmScore`'s:
    * p = (c12 + 1.0) / (c1 + V), fixed = floor(−ln(p)·2³⁰), with
    * `Math.log` (the platform-libm intrinsic GraftLn standardizes on). */
  def lmNllFixed(hs: org.apache.spark.sql.catalyst.util.ArrayData,
                 uniKeys: Array[Long], uniVals: Array[Long],
                 biKeys: Array[Long], biVals: Array[Long],
                 v: Double): InternalRow = {
    val n = hs.numElements()
    if (n < 2) return null
    var sfx = 0L
    var i = 0
    while (i < n - 1) {
      val iu = java.util.Arrays.binarySearch(uniKeys, hs.getLong(i))
      val c1 = if (iu >= 0) uniVals(iu) else 0L
      val ib = java.util.Arrays.binarySearch(biKeys, combineWindowAD(hs, i, 2))
      val c12 = if (ib >= 0) biVals(ib) else 0L
      val p = (c12.toDouble + 1.0) / (c1.toDouble + v)
      sfx += java.lang.Math.floor(-java.lang.Math.log(p) *
        1073741824.0).toLong
      i += 1
    }
    InternalRow(sfx, n - 1)
  }

  /** Shared eval core for [[SignProjectFx]]: quantize the dIn vector
    * components to fixed point ONCE (`floor(x·2²⁴)`), then every
    * out-dim is a compiled ±1-weighted long sum — dIn·dOut MACs per
    * row with zero allocation beyond the output array. `signs` is the
    * flattened (j·dIn + i) sign matrix. */
  def signProjectFx(v: org.apache.spark.sql.catalyst.util.ArrayData,
                    signs: Array[Long], dOut: Int,
                    dIn: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // loud, not an ArrayIndexOutOfBounds deep in generated code — and
    // EXACT, not >=: a longer vector would silently project only its
    // prefix here while the string-twin projects every component
    // (review catch), so a ragged corpus must fail with the contract
    if (v.numElements() != dIn)
      throw new IllegalArgumentException(
        s"graft_sign_project: vector has ${v.numElements()} components," +
          s" expected exactly $dIn")
    val q = new Array[Long](dIn)
    var i = 0
    while (i < dIn) {
      q(i) = java.lang.Math.floor(v.getDouble(i) * 16777216.0).toLong
      i += 1
    }
    val out = new Array[Long](dOut)
    var j = 0
    while (j < dOut) {
      var acc = 0L
      val base = j * dIn
      var t = 0
      while (t < dIn) { acc += signs(base + t) * q(t); t += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Shared eval core for [[DictSumFixed]]: Σ dict(h) over the hash
    * array with `default` for misses, plus the element count — one
    * binary search per element against the sorted literal key table.
    * The generic "fold a plan-literal dictionary over a token stream"
    * primitive behind the streaming NB gate (and any future
    * literal-weight linear model). */
  def dictSumFixed(hs: org.apache.spark.sql.catalyst.util.ArrayData,
                   keys: Array[Long], vals: Array[Long],
                   default: Long): InternalRow = {
    val n = hs.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      val k = java.util.Arrays.binarySearch(keys, hs.getLong(i))
      sum += (if (k >= 0) vals(k) else default)
      i += 1
    }
    InternalRow(sum, n)
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Shared eval core for [[ShingleH60]] — the portable-hash family's
    * hot loop. For each n-token window, md5 of the space-joined window
    * (concat_ws semantics: null elements skipped, no doubled
    * separator) and the top 60 bits of the digest as a long — EXACTLY
    * `conv(substring(md5(concat_ws(' ', w)), 1, 15), 16, 10)`: the
    * first 15 hex chars are digest bytes 0..6 plus the high nibble of
    * byte 7. Fewer than n tokens → empty array (the [[ShingleHashes]]
    * convention). */
  def shingleH60(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      toks(i) =
        if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5Local.get()
    val out = new Array[Long](cnt)
    var s = 0
    while (s < cnt) {
      md.reset()
      var first = true
      var j = s
      while (j < s + n) {
        val t = toks(j)
        if (t != null) {
          if (!first) md.update(' '.toByte)
          md.update(t)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(s) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Shared eval core for [[BloomPositionsExpr]] — the Bloom build's
    * hot loop: for every non-null unit string, the `depth` salted bit
    * positions `pmod(h60(md5("<j>:" ‖ unit)), m)`, flattened
    * unit-major (all depths of unit 0, then unit 1, …). Bit-identical
    * to the per-hash Column chain
    * `pmod(conv(substring(md5(concat(lit("j:"), u)), 1, 15), 16, 10)
    * .cast(long), m)` — the [[graft.ext.SketchOps.h60]] convention —
    * but one compiled loop over raw digest bytes instead of
    * depth × (concat → md5 → hex string → substring → conv parse)
    * interpreted expression chains per unit. */
  def bloomPositions(arr: ArrayData, m: Long,
                     depth: Int): ArrayData = {
    val n = arr.numElements()
    val md = md5Local.get()
    val out = new Array[Long](n * depth)
    var k = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val ub = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < depth) {
          out(k) = bloomPosOf(md, ub, m, j)
          k += 1
          j += 1
        }
      }
      i += 1
    }
    if (k == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** One salted Bloom position — the single-unit face ([[BloomPosExpr]],
    * probe side): same bytes, same salt anatomy as [[bloomPositions]]. */
  def bloomPos(u: org.apache.spark.unsafe.types.UTF8String, m: Long,
               j: Int): Long =
    bloomPosOf(md5Local.get(), u.getBytes, m, j)

  /** Shared eval core for [[MergeDotFixed]] — exact integer dot of two
    * sparse fixed-point vectors held as (term, weight) struct arrays
    * SORTED by term: one merge walk, Σ wa·wb over shared terms. Value-
    * identical to the exploded `sum(_wa * _wb)` grouped aggregate it
    * replaces (exact integer sums are order-free). */
  def mergeDot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val ta = a.getStruct(i, 2).getLong(0)
      val tb = b.getStruct(j, 2).getLong(0)
      if (ta < tb) i += 1
      else if (ta > tb) j += 1
      else {
        s += a.getStruct(i, 2).getLong(1) * b.getStruct(j, 2).getLong(1)
        i += 1
        j += 1
      }
    }
    s
  }

  /** Portable 60-bit md5 hash of one string ([[GraftH60]]) — EXACTLY
    * `conv(substring(md5(s), 1, 15), 16, 10).cast(long)` (the
    * [[graft.ext.SketchOps.h60]] convention) over raw digest bytes. */
  def h60(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(u.getBytes)
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  private def bloomPosOf(md: java.security.MessageDigest,
                         unitBytes: Array[Byte], m: Long, j: Int): Long = {
    md.reset()
    md.update(String.valueOf(j).getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    md.update(':'.toByte)
    md.update(unitBytes)
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (((v << 4) | ((d(7) & 0xf0L) >>> 4)) % m + m) % m
  }

  /** Shared eval core for [[SpanCorruptExpr]] — the span-corruption
    * fold ([[graft.ext.TextOps.spanCorrupt]] contract), compiled: one
    * pass over the token array building encoder input / decoder target
    * with numbered sentinels. The mask is EXACTLY the lambda form's
    * `h60(md5(id ‖ ':' ‖ i)) mod 1000 < rate` (same md5-top-60-bits
    * convention as [[shingleH60]]; `String.valueOf(i)` matches Spark's
    * int→string cast), and items join with single spaces exactly as
    * the ltrimmed fold emitted them — CodegenHealthSpec pins value
    * equality against the retained lambda twin. */
  def spanCorrupt(arr: ArrayData,
                  id: org.apache.spark.unsafe.types.UTF8String,
                  rate: Int): InternalRow = {
    val m = arr.numElements()
    val md = md5Local.get()
    val idb = id.getBytes
    val inp = new java.lang.StringBuilder
    val tgt = new java.lang.StringBuilder
    var k = 0
    var nm = 0
    var prev = false
    var i = 0
    while (i < m) {
      md.reset()
      md.update(idb)
      md.update(':'.toByte)
      md.update(String.valueOf(i).getBytes
        (java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val h = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      val masked = (h % 1000L) < rate
      val tk = arr.getUTF8String(i)
      if (!masked) {
        if (inp.length > 0) inp.append(' ')
        inp.append(tk.toString)
      } else {
        if (!prev) {
          if (inp.length > 0) inp.append(' ')
          inp.append("<extra_id_").append(k).append('>')
          if (tgt.length > 0) tgt.append(' ')
          tgt.append("<extra_id_").append(k).append("> ")
            .append(tk.toString)
          k += 1
        } else {
          tgt.append(' ').append(tk.toString)
        }
        nm += 1
      }
      prev = masked
      i += 1
    }
    new GenericInternalRow(Array[Any](
      org.apache.spark.unsafe.types.UTF8String.fromString(inp.toString),
      org.apache.spark.unsafe.types.UTF8String.fromString(tgt.toString),
      k, nm))
  }

  /** Shared eval core for [[MinWindows]]: per-window minima over a
    * long array via the monotonic-deque algorithm — O(n) amortized vs
    * the O(n·w) of per-window `array_min(slice(...))`, and compiled vs
    * interpreted. Windows follow the slice convention of the lambda
    * form it replaces: for i in 0..max(n−w, 0), min of
    * `arr[i .. min(i+w, n)−1]` — full w-windows when n ≥ w, ONE ragged
    * whole-array window when 0 < n < w, empty output for empty input.
    * Input must be null-free (`graft_shingle_h60` /
    * `graft_hash_tokens` output). */
  def minWindows(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val cnt = math.max(n - w, 0) + 1
    val out = new Array[Long](cnt)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(dq(head))
      i += 1
    }
    if (n < w) out(0) = arr.getLong(dq(head))
    new GenericArrayData(out)
  }
}

/** Distinct hashed word-n-gram shingles straight from token hashes
  * (`array<long>` → sorted distinct `array<long>`): the MinHash pipeline
  * never needs shingle STRINGS, so this skips the per-shingle
  * `slice`+`concat_ws` string assembly (O(n²) interpreted work per doc)
  * entirely. Output order is canonical (sorted), which set operations and
  * MinHash are insensitive to. Fewer than n tokens → empty array. */
/** Unicode NFC normalization (UAX #15) as a codegen'd scalar — the
  * canonical-composition pass a multilingual ingest runs before any
  * hashing/dedup step, so that `café` composed and decomposed fingerprint
  * identically (a decomposed clone otherwise sails through exact AND
  * near dedup: different bytes, different shingles). Spark ships no
  * normalizer; the JDK's `java.text.Normalizer` implements the same
  * Unicode algorithm as DuckDB's `nfc_normalize` (utf8proc), which the
  * oracle twin leans on. Already-normalized strings return the input
  * object unchanged (see [[NativeExprs.nfc]]). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects string, got $dt")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.nfc(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Portable 60-bit md5 hashes of every n-token window
  * (`array<string>` → `array<long>`): semantically identical to
  * `transform(shingles(toks, n), g => h60(g))` — the winnowing /
  * portable-sketch hot path — but the string assembly AND the md5 run
  * in one compiled loop instead of two interpreted lambda walks per
  * element (the r11 sf1 probe measured the lambda form at ~8× compute
  * for 10× data on `x_text_winnow`). The hash VALUES are unchanged
  * (`conv(substring(md5(g),1,15),16,10)` over the space-joined gram),
  * so every DuckDB twin reproduces them bit-for-bit. */
case class ShingleH60(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_h60 expects array<string>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_h60"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.shingleH60(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.shingleH60($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Flattened salted Bloom bit positions of every unit in an array
  * (`array<string>` → `array<long>`, unit-major): the build side of
  * [[graft.ext.SketchOps.bloomWords]], compiled — replaces the
  * per-unit string explode followed by a depth-way
  * concat/md5/hex/substring/conv Column chain with ONE loop over
  * digest bytes ([[NativeExprs.bloomPositions]] for the exact value
  * contract). Null units contribute nothing. */
case class BloomPositionsExpr(child: Expression, m: Long, depth: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_positions expects array<string>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_positions"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.bloomPositions(input.asInstanceOf[ArrayData], m, depth)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.bloomPositions($c, ${m}L, $depth)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Exact integer dot product of two SORTED sparse fixed-point vectors
  * (`array<struct<t:long, w:long>>` ×2 → `long`) — the APSS
  * verification kernel ([[NativeExprs.mergeDot]]): one compiled merge
  * walk per candidate pair instead of exploding both posting lists
  * through a (pair, term)-keyed join and re-aggregating. */
case class MergeDotFixed(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fs), _) =>
      fs.length == 2 && fs.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_merge_dot expects two array<struct<long, long>>, got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_merge_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    NativeExprs.mergeDot(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.NativeExprs.mergeDot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Portable 60-bit md5 hash (`string` → `long`) — the compiled
  * [[graft.ext.SketchOps.h60]]: identical values to the interpreted
  * `conv(substring(md5(s), 1, 15), 16, 10).cast(long)` chain, one
  * digest-byte loop instead of four expression nodes and two string
  * materializations per row. */
case class GraftH60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_h60 expects string, got $dt")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.h60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.h60($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** One salted Bloom position of one unit (`string` → `long`): the
  * probe side's per-salt hash ([[graft.ext.SketchOps
  * .bloomPositionsFor]]), same value contract as
  * [[BloomPositionsExpr]]. */
case class BloomPosExpr(child: Expression, m: Long, salt: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_pos expects string, got $dt")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_pos"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.bloomPos(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      m, salt)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.bloomPos($c, ${m}L, $salt)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Compiled span-corruption fold (`graft_span_corrupt`): token array +
  * stringified doc id + mask rate → struct(inp, tgt, k, nm) — see
  * [[NativeExprs.spanCorrupt]] for the exact mask/sentinel convention
  * it shares with the interpreted `functions.aggregate` twin it
  * replaces (measured 72.6 s → single-pass compiled loop on the sf10
  * probe's 500k docs). */
case class SpanCorruptExpr(toks: Expression, idStr: Expression,
                           rate: Int)
    extends BinaryExpression {

  override def left: Expression = toks
  override def right: Expression = idStr

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, idStr.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_span_corrupt expects (array<string>, string), got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("inp", StringType, nullable = false),
    StructField("tgt", StringType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("nm", IntegerType, nullable = false)))

  override def prettyName: String = "graft_span_corrupt"

  override def nullSafeEval(a: Any, id: Any): Any =
    NativeExprs.spanCorrupt(a.asInstanceOf[ArrayData],
      id.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], rate)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, id) =>
      s"graft.expressions.NativeExprs.spanCorrupt($a, $id, $rate)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(toks = newLeft, idStr = newRight)
}

/** Sliding-window minima over `array<long>` (`graft_min_windows`):
  * the window-selection half of winnowing, compiled — see
  * [[NativeExprs.minWindows]] for the exact window convention it
  * shares with the `transform(sequence, i => array_min(slice))`
  * lambda form it replaces. */
case class MinWindows(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_min_windows expects array<bigint>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_min_windows"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.minWindows(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.minWindows($c, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-row gram-multiset stats (`graft_gram_stats`): `array<bigint>`
  * hashed grams → `[n, d, mx]` — see [[NativeExprs.gramStats]]. The
  * static-helper call stays inside whole-stage codegen (one virtual
  * call per row, primitive in/out), like [[SpanCorruptExpr]]. */
case class GramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_stats expects array<bigint>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_stats"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.gramStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NativeExprs.gramStats($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes expects array<bigint>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](len)
    var i = 0
    while (i < len) { hs(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i); i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) { out(i) = NativeExprs.combineWindow(hs, i, n); i += 1 }
    java.util.Arrays.sort(out)
    var uniq = 1
    i = 1
    while (i < m) { if (out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }; i += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  // Every local is ctx.freshName'd: two instances of this expression can
  // land in ONE generated method with one nested inside the other's block
  // (e.g. both sides of an AND) — fixed names there violate Java's
  // no-shadowing rule and janino rejects the whole class ("Redefinition of
  // local variable"), silently degrading the query to interpreted eval.
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val len = ctx.freshName("len"); val m = ctx.freshName("m")
      val hs = ctx.freshName("hs"); val out = ctx.freshName("out")
      val uniq = ctx.freshName("uniq"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val z = ctx.freshName("z")
      s"""
         |int $len = $c.numElements();
         |int $m = $len - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util
         |    .GenericArrayData(new long[0]);
         |} else {
         |  long[] $hs = new long[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    $hs[$i] = $c.isNullAt($i) ? 0L : $c.getLong($i);
         |  }
         |  long[] $out = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $acc = 0x2545F4914F6CDD1DL;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $z = $acc ^ ($hs[$i + $j] * 0x9E3779B97F4A7C15L);
         |      $z ^= $z >>> 33; $z *= 0xff51afd7ed558ccdL;
         |      $z ^= $z >>> 33; $z *= 0xc4ceb9fe1a85ec53L;
         |      $z ^= $z >>> 33;
         |      $acc = $z;
         |    }
         |    $out[$i] = $acc;
         |  }
         |  java.util.Arrays.sort($out);
         |  int $uniq = 1;
         |  for (int $i = 1; $i < $m; $i++) {
         |    if ($out[$i] != $out[$i - 1]) { $out[$uniq] = $out[$i]; $uniq++; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util
         |    .GenericArrayData(java.util.Arrays.copyOf($out, $uniq));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-element xxhash64 of a string array (`array<string>` →
  * `array<long>`, seed 42 — bit-identical to Spark's `xxhash64(elem)`):
  * the token-hashing step feeding MinHash/SimHash/shingling. The
  * `transform(toks, t => xxhash64(t))` formulation evaluates the lambda
  * INTERPRETED, one boxed call per token; this loops in generated Java.
  * Null elements hash to the seed, matching `xxhash64(NULL)`. */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_hash_tokens expects array<string>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash_tokens"

  private final val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName'd locals — see ShingleHashes.doGenCode for why.
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $c.isNullAt($i) ? ${Seed}L :
         |    org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($c.getUTF8String($i), ${Seed}L);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** MinHash signature over pre-hashed shingles (`array<long>` → k minima of
  * k seeded permutations). Empty input → null (no shingles to match on). */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig expects array<bigint>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  private lazy val seedArr: Array[Long] = NativeExprs.seeds(numPerm)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var p = 0
        while (p < numPerm) {
          val z = NativeExprs.mix(h ^ seedArr(p))
          if (z < sig(p)) sig(p) = z
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val seedsRef = ctx.addReferenceObj("seeds", seedArr, "long[]")
      // freshName'd locals — see ShingleHashes.doGenCode for why.
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val p = ctx.freshName("p"); val z = ctx.freshName("z")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $sig = new long[$numPerm];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$c.isNullAt($i)) {
         |      long $h = $c.getLong($i);
         |      for (int $p = 0; $p < $numPerm; $p++) {
         |        long $z = $h ^ $seedsRef[$p];
         |        $z ^= $z >>> 33; $z *= 0xff51afd7ed558ccdL;
         |        $z ^= $z >>> 33; $z *= 0xc4ceb9fe1a85ec53L;
         |        $z ^= $z >>> 33;
         |        if ($z < $sig[$p]) $sig[$p] = $z;
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** SimHash over pre-hashed tokens (`array<long>` → 64-bit fingerprint):
  * bit b of the result is the majority vote of bit b across the token
  * hashes. Empty input → 0L. */
case class SimHashBits(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<bigint>, got $dt")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        total += 1
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2 > total) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName'd locals — see ShingleHashes.doGenCode for why.
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val total = ctx.freshName("total"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[64];
         |int $total = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    $total++;
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] * 2 > $total) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Double-precision dot product of two `array<float|double>` columns
  * (float elements are widened per element, exactly like
  * `CAST(x AS DOUBLE)`). Sequential accumulation in array order — the
  * exact summation order the DuckDB oracle uses, so scores stay
  * bit-identical. Null if either array or any touched element is null, or
  * lengths differ (strict, matching zip_with semantics). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double>, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def get(a: ArrayData, i: Int, t: DataType): Double =
    if (t == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName'd locals — see ShingleHashes.doGenCode for why.
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull"); val i = ctx.freshName("i")
      def getter(v: String, t: DataType): String =
        if (t == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val ga = getter(a, elemType(left).get)
      val gb = getter(b, elemType(right).get)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    $acc += $ga * $gb;
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
      : Expression = copy(left = newLeft, right = newRight)
}

/** Deletion neighborhood of a string: `[s] ∪ del1(s)` deduplicated,
  * original first then deletions left-to-right — the SymSpell blocking
  * key set for edit-distance-1 matching ([[graft.ext.DedupOps
  * .fuzzyPairsEdit1]]). Code-point aware (a deletion removes a full
  * code point, matching Spark's `length`/`substr` semantics on
  * supplementary characters).
  *
  * Why native: the HOF formulation (`transform(sequence(1, length(s)),
  * i -> concat(substr...))`) pays one interpreted boxed lambda call per
  * character per row. Here both eval paths call ONE compiled helper —
  * the same single-allocation loop — via a static call from generated
  * code (the XXH64 pattern above), so the op stays inside whole-stage
  * codegen. */
case class DeletionVariants(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_del_variants expects string, got $dt")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_del_variants"

  override def nullSafeEval(input: Any): Any =
    DeletionVariants.variants(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.DeletionVariants.variants($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object DeletionVariants {
  import org.apache.spark.unsafe.types.UTF8String

  /** Shared compiled kernel for both eval paths. */
  def variants(u: UTF8String): ArrayData = {
    val s = u.toString
    val out = new java.util.LinkedHashSet[UTF8String]()
    out.add(u)
    var i = 0
    while (i < s.length) {
      val end = s.offsetByCodePoints(i, 1)
      val sb = new java.lang.StringBuilder(s.length)
      sb.append(s, 0, i).append(s, end, s.length)
      out.add(UTF8String.fromString(sb.toString))
      i = end
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** True iff ANY element of the child `array<long>` is a member of the
  * SORTED literal set (binary search per element — O(|arr| · log |set|),
  * vs `arrays_overlap` against an array literal which linearly probes
  * the whole set per row). The set rides along as a plan constant
  * (`ctx.addReferenceObj`), so a million-gram benchmark set costs one
  * driver-side array, not a per-row rebuild. Used by the stateless
  * streaming decontamination predicate. */
case class AnyInSortedSet(child: Expression, set: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_any_in_set expects array<bigint>, got $dt")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_any_in_set"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0)
        return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val setRef = ctx.addReferenceObj("graftSortedSet", set, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      s"""
         |int $n = $c.numElements();
         |boolean $found = false;
         |for (int $i = 0; $i < $n && !$found; $i++) {
         |  if (!$c.isNullAt($i) &&
         |      java.util.Arrays.binarySearch($setRef, $c.getLong($i)) >= 0)
         |    $found = true;
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-document bigram-LM NLL in one pass over the token-hash array —
  * the STREAM-SAFE form of `TextOps.lmScore`: the add-one-smoothed
  * count tables ride along as sorted literal arrays (hash → count,
  * `ctx.addReferenceObj`, same contract as [[AnyInSortedSet]]'s
  * benchmark set), each bigram costs two binary searches plus the
  * identical `floor(−ln(p)·2³⁰)` fixed-point arithmetic, and the
  * result is a `struct(sfx, n_bigrams)` — a pure projection with no
  * join, no shuffle, no state, so it runs unchanged on a structured
  * stream. Docs with fewer than two tokens yield NULL (absent in the
  * batch op). Same honest caveat as the streaming decontamination
  * probe: 64-bit hash collisions can alias a count lookup; the
  * string-keyed batch op remains the authority. */
case class LmNllFixed(child: Expression, uniKeys: Array[Long],
                      uniVals: Array[Long], biKeys: Array[Long],
                      biVals: Array[Long], v: Double)
    extends UnaryExpression {

  require(uniKeys.length == uniVals.length &&
    biKeys.length == biVals.length,
    "graft_lm_nll: key/value arrays must align")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_lm_nll expects array<bigint> token hashes, got $dt")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("sfx", LongType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm_nll"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.lmNllFixed(input.asInstanceOf[ArrayData],
      uniKeys, uniVals, biKeys, biVals, v)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val uk = ctx.addReferenceObj("graftLmUk", uniKeys, "long[]")
      val uv = ctx.addReferenceObj("graftLmUv", uniVals, "long[]")
      val bk = ctx.addReferenceObj("graftLmBk", biKeys, "long[]")
      val bv = ctx.addReferenceObj("graftLmBv", biVals, "long[]")
      val r = ctx.freshName("lmRow")
      s"""
         |InternalRow $r = graft.expressions.NativeExprs.lmNllFixed(
         |  $c, $uk, $uv, $bk, $bv, $v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Sign random projection compiled: dOut fixed-point components from a
  * dIn-dim double vector in ONE pass — quantize once, then dIn·dOut
  * ±1-weighted long MACs against a reference sign matrix (the portable
  * md5 convention, derived at construction — deterministic, nothing
  * shipped but the expression). The compositional forms paid dearly at
  * scale: per-(i, j) in-plan md5 ran 216.8 s at sf10, literal-sign
  * expression trees still evaluated interpreted at 31.7 s; this
  * compiled loop is the arithmetic and nothing else. Contract of
  * `SimilarityOps.signProject` unchanged — values bit-identical. */
case class SignProjectFx(child: Expression, dOut: Int, dIn: Int)
    extends UnaryExpression {

  require(dOut >= 1 && dIn >= 1, s"bad dims $dOut/$dIn")

  // flattened (j*dIn + i) sign matrix from h60("sp:j:i") — the exact
  // convention the DuckDB twin reproduces
  @transient private lazy val signs: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut * dIn) { f =>
      val (j, i) = (f / dIn, f % dIn)
      val hex = md.digest(s"sp:$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      1L - 2L * (java.lang.Long.parseLong(hex, 16) % 2L)
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_sign_project expects array<double>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "graft_sign_project"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.signProjectFx(input.asInstanceOf[ArrayData],
      signs, dOut, dIn)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.addReferenceObj("graftSpSigns", signs, "long[]")
      s"""
         |${ev.value} = graft.expressions.NativeExprs.signProjectFx(
         |  $c, $s, $dOut, $dIn);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Fold a plan-literal (hash → long) dictionary over a token-hash
  * array: `struct(sum, n)` where `sum = Σ dict(h)` with `default` for
  * misses — one binary search per element, pure projection, no join,
  * no shuffle, no state, so it is stream-legal by construction. The
  * primitive behind `TextOps.streamNbScore` (per-token fixed-point
  * log-odds summed per document) and generically any literal-weight
  * linear model over hashed features. Same literal-table discipline as
  * [[LmNllFixed]]; same honest caveat — 64-bit collisions can alias a
  * lookup, the string-keyed batch op stays the authority. */
case class DictSumFixed(child: Expression, keys: Array[Long],
                        vals: Array[Long], default: Long)
    extends UnaryExpression {

  require(keys.length == vals.length,
    "graft_dict_sum: key/value arrays must align")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_dict_sum expects array<bigint> hashes, got $dt")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("sum", LongType, nullable = false),
    StructField("n", IntegerType, nullable = false)))
  override def prettyName: String = "graft_dict_sum"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.dictSumFixed(input.asInstanceOf[ArrayData],
      keys, vals, default)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ks = ctx.addReferenceObj("graftDictKs", keys, "long[]")
      val vs = ctx.addReferenceObj("graftDictVs", vals, "long[]")
      s"""
         |${ev.value} = graft.expressions.NativeExprs.dictSumFixed(
         |  $c, $ks, $vs, ${default}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Membership probe against a serialized Bloom filter riding in the
  * plan as a binary literal — the tier-1 gate of incremental dedup
  * against a huge history ([[graft.ext.DedupOps.incrementalDedup]]):
  * the filter is MB-sized REGARDLESS of history size, so "have I seen
  * this fingerprint among 10¹¹ others" becomes a pure projection with
  * NO false negatives (a `false` here is definitely new; `true` means
  * "verify with the exact join"). Deserialized once per plan reference
  * (`addReferenceObj`), probed per row. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects string, got $dt")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainString(input.toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // The DESERIALIZED filter is the reference object — one readFrom at
    // plan setup, not per row (and not per generated-class instance:
    // the lazy val above is per-expression-instance, shared).
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Order-preserving total-order LONG encoding of a double — the classic
  * sortable-bits trick: non-negative doubles keep their raw IEEE bits
  * (which already sort correctly), negative ones flip the magnitude
  * bits so more-negative sorts lower. `encoded(a) < encoded(b)` iff
  * `a < b` under Spark's total ordering (−0.0 < 0.0, NaN greatest).
  *
  * Exists so ARGMIN-style aggregates can ride a HASH aggregate: a
  * `min(struct(score, id))` buffer is not mutable-fixed-width, so Spark
  * silently plans a SortAggregate that SORTS the whole input (the r10
  * SemDeDup sf10 probe stalled exactly there). Packing
  * `dbits(score) · k + id` into a DECIMAL(38,0) makes the argmin a
  * plain `min` with a fixed-width buffer — hash-aggregated, map-side
  * partials intact. */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_dbits expects double, got $dt")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dbits"

  override def nullSafeEval(x: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    if (b >= 0L) b else b ^ 0x7fffffffffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""long $b = Double.doubleToLongBits($c);
         |${ev.value} = $b >= 0L ? $b : ($b ^ 0x7fffffffffffffffL);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Natural log via `java.lang.Math.log` — the HotSpot intrinsic that (on
  * this JVM/libm pairing, bit-asserted by NativeExprsSpec) agrees with
  * glibc's `log` and therefore with DuckDB's `ln`. Spark's own `Log`
  * expression calls `StrictMath.log` (fdlibm), which is 1 ulp off the
  * platform result for some arguments (e.g. `ln(3.0)`:
  * `...7aad030a` fdlibm vs `...7aad030b` glibc) — enough to break a
  * hash-exact oracle. Every log-scored operator (BM25 idf, LM log-prob)
  * routes through this expression so Spark and the DuckDB twin compute
  * the identical double. Domain edges follow `Math.log`: ln(0) = -Inf,
  * ln(<0) = NaN (no NULL conversion — the caller guards its domain). */
case class GraftLn(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_ln expects double, got $dt")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ln"

  override def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Hilbert-curve index of a 2-D grid cell (the canonical xy2d walk:
  * per bit plane from the top, quadrant digit `(3·rx)⊕ry` joins the
  * index and the frame reflects/swaps so the curve stays continuous —
  * better worst-case locality than the Morton interleave, which jumps
  * at quadrant seams; what lakehouse clustering uses when range scans
  * matter more than code simplicity). Inputs are grid coordinates in
  * [0, 2^bits); the walk is a fixed `bits`-step integer loop — state
  * (x, y, d) per row, O(bits) — which is WHY this is a native
  * expression: the Column-fold formulation duplicates the (x, y)
  * expression trees ~4× per step (Catalyst re-inlines projections), a
  * 4^bits blowup. The eval and codegen paths run the identical long
  * arithmetic, and the DuckDB twin unrolls the same steps as
  * materialized CTE columns — two's-complement `&`, so the reflected
  * intermediate values (which may go negative for out-of-range
  * inputs) agree bit-for-bit. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if bits >= 1 && bits <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects (bigint, bigint) with bits in [1,31], " +
          s"got $other bits=$bits")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long]
    var y = r.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |long $s = 1L << ${bits - 1};
         |while ($s > 0L) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |  $s >>= 1;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** POSITIONAL hashed word-n-gram windows (`array<long>` token hashes →
  * `array<long>` of length `len − n + 1`, element i = the window hash
  * starting at token i) — [[ShingleHashes]] minus the sort/dedup, for the
  * span-level operators that need window IDENTITY AND POSITION
  * (`TextOps.repeatedSpans` / `removeRepeatedSpans`): grouping and
  * joining on these 8-byte longs instead of reassembled gram STRINGS
  * keeps the corpus-sized exchanges fixed-width (the strings are
  * re-attached once, per surviving gram, from a representative doc).
  * Same Horner window combine as ShingleHashes, so the two families
  * agree on window identity. Fewer than n tokens → empty array. */
case class WindowHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_window_hashes expects array<bigint>, got $dt")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashes.windows(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WindowHashes.windows($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WindowHashes {
  /** Shared compiled kernel for both eval paths. */
  def windows(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](len)
    var i = 0
    while (i < len) { hs(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i); i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) { out(i) = NativeExprs.combineWindow(hs, i, n); i += 1 }
    new GenericArrayData(out)
  }
}

/** Tokens surviving span removal: given a token array and the SORTED
  * 0-based start positions of its duplicated n-windows, drop every token
  * position covered by some window `[st, st+n−1]` and return the
  * survivors in order. One two-pointer sweep, O(tokens + starts) — the
  * set-algebra this replaces (explode every covered `(doc, pos)` pair ×n,
  * global `distinct`, token-level anti-join) shuffled n× the corpus's
  * positions; here coverage never leaves the row. Starts sorted ⇒ window
  * ENDS are sorted too (fixed width), so "covered" is just `pos ≤ last
  * seen start + n − 1`. */
case class StripCovered(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_strip_covered expects (array<string>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = left.dataType
  override def prettyName: String = "graft_strip_covered"

  override def nullSafeEval(toks: Any, starts: Any): Any =
    StripCovered.strip(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.expressions.StripCovered.strip($t, $s, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StripCovered {
  /** Shared compiled kernel for both eval paths. */
  def strip(toks: ArrayData, starts: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val k = starts.numElements()
    val out = new Array[AnyRef](len)
    var kept = 0
    var p = 0            // next unconsumed start
    var hi = -1          // end of the furthest coverage seen so far
    var pos = 0
    while (pos < len) {
      while (p < k && starts.getInt(p) <= pos) {
        val h = starts.getInt(p) + n - 1
        if (h > hi) hi = h
        p += 1
      }
      if (pos > hi) { out(kept) = toks.getUTF8String(pos); kept += 1 }
      pos += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, kept))
  }
}

/** Nearest-candidate index against a literal matrix: the argmin over
  * `j` of `d²(v[offset..offset+len), cands(j))` with the exact
  * `dot(v,v) − 2·dot(v,c) + dot(c,c)` left-to-right accumulation of
  * [[graft.ext.SimilarityOps]]'s compositional `d2ToLit` form, ties to
  * the lowest `j` — the IVF cell / PQ codeword assignment hot loop.
  *
  * Why native: the `element_at(array_sort(structs...), 1)` formulation
  * builds and sorts an nCands-struct array per row through expression
  * trees so large the generated method never JITs — measured 225 µs/row
  * at the sf10 encode (45 s for 200k vectors); this kernel is ~1 µs/row.
  * Doubles compare via `SQLOrderingUtil.compareDoubles` — the exact
  * ordering `array_sort` used (NaN greatest, ±0.0 equal), so results are
  * bit-identical to the compositional form (pinned in NativeExprsSpec).
  *
  * `offset` selects a subspace (PQ: subspace `mi` starts at `mi·sub`);
  * candidate length fixes the window. Null array → null (nullSafeEval);
  * null element in the window or a window extending past the array end →
  * null (the compositional form's null-`d` sort order was unspecified
  * there; callers contract non-null fixed-dim vectors). */
case class NearestIndexLit(child: Expression, cands: Array[Array[Double]],
                           offset: Int)
    extends UnaryExpression {

  require(cands.nonEmpty && cands.forall(_.length == cands(0).length),
    "graft_nearest: need >= 1 equal-length candidate vectors")
  require(offset >= 0, s"graft_nearest: offset must be >= 0: $offset")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest expects array<float|double>, got $dt")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest"

  /** dot(c, c) per candidate, the same sequential accumulation as the
    * plan-literal `dot(cl, cl)` — computed once per (de)serialized
    * expression, never per row. */
  @transient private lazy val cc: Array[Double] = NativeExprs.selfDots(cands)

  override def nullSafeEval(input: Any): Any = {
    val r = NativeExprs.nearestIdx(input.asInstanceOf[ArrayData],
      isFloat, offset, cands, cc)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("graftNearCands", cands, "double[][]")
      val cs = ctx.addReferenceObj("graftNearCc", cc, "double[]")
      val r = ctx.freshName("nearIdx")
      s"""
         |int $r = graft.expressions.NativeExprs.nearestIdx(
         |  $c, $isFloat, $offset, $m, $cs);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Top-2 fixed-point kmeans cells against a literal centroid table in
  * one compiled pass: per centroid `d = Σ_i ⌊(v_i − c_i)²·2³⁰⌋` as
  * BIGINT (the order-free exact distance of
  * [[graft.ext.SimilarityOps.kmeansLloydFx]]'s contract), ranked by
  * `(d, centroid id)`; returns `(c1, d1, c2, d2)` — assignment uses
  * the first pair, the centroid-form silhouette both. Replaces the
  * k·dim-node `array_sort(struct...)` expression tree for the same
  * generated-method-too-large-to-JIT reason as [[NearestIndexLit]];
  * values bit-identical (pinned in NativeExprsSpec).
  *
  * With a single surviving centroid the second pair is the sentinel
  * `(-1, Long.MaxValue)` — [[graft.ext.SimilarityOps.silhouetteFx]]
  * requires >= 2 survivors before building the plan. Null array → null;
  * null element or a vector shorter than the centroid dim → null. */
case class KmeansTop2Fx(child: Expression, ids: Array[Int],
                        cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "graft_kmeans_top2: need >= 1 equal-length centroids")
  require(ids.length == cents.length,
    "graft_kmeans_top2: ids and centroids must align")
  // the kernel's strict-< tie-break is only (d, id)-correct when ids
  // arrive in increasing order — kmeansCentroidsFx sorts them
  require(ids.length < 2 ||
    ids.sliding(2).forall(p => p(0) < p(1)),
    "graft_kmeans_top2: ids must be strictly increasing")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_kmeans_top2 expects array<float|double>, got $dt")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("c1", IntegerType, nullable = false),
    StructField("d1", LongType, nullable = false),
    StructField("c2", IntegerType, nullable = false),
    StructField("d2", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmeans_top2"

  override def nullSafeEval(input: Any): Any =
    NativeExprs.kmeansTop2(input.asInstanceOf[ArrayData], isFloat,
      ids, cents)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val is = ctx.addReferenceObj("graftKmIds", ids, "int[]")
      val m = ctx.addReferenceObj("graftKmCents", cents, "double[][]")
      val r = ctx.freshName("kmRow")
      s"""
         |InternalRow $r = graft.expressions.NativeExprs.kmeansTop2(
         |  $c, $isFloat, $is, $m);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Max-cosine against a LITERAL candidate table in one compiled pass —
  * the screening shape of
  * [[graft.ext.SimilarityOps.semanticDecontaminateLit]]: benchmark/eval
  * sets are small by contract, so the candidates fold into the plan and
  * the corpus streams through a pure projection instead of a
  * BroadcastNestedLoopJoin materializing a corpus-by-B pair row per
  * candidate (the array copies in those joined rows, not the flops,
  * dominated the join form — measured ~20 s vs ~2 s at sf10). Semantics
  * pinned bit-identical to the compositional
  * `max(struct(round(cosine, 6), -bid))` aggregate in NativeExprsSpec:
  * per-candidate rounding BEFORE comparison, SQLOrderingUtil double
  * ordering, ties to the smallest id. Candidate ids must arrive
  * strictly increasing (the strict `>` tie-break depends on it). */
case class MaxCosLit(child: Expression, ids: Array[Long],
                     cands: Array[Array[Double]])
    extends UnaryExpression {

  require(cands.nonEmpty && cands.forall(_.length == cands(0).length),
    "graft_maxcos: need >= 1 equal-length candidate vectors")
  require(ids.length == cands.length,
    "graft_maxcos: ids and candidates must align")
  require(ids.length < 2 || ids.sliding(2).forall(p => p(0) < p(1)),
    "graft_maxcos: ids must be strictly increasing")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_maxcos expects array<float|double>, got $dt")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("bid", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_maxcos"

  /** norm(c) per candidate: sqrt of the same sequential self-dot the
    * plan-literal `norm(cl)` evaluates; once per (de)serialized
    * expression, never per row. */
  @transient private lazy val cnorms: Array[Double] =
    NativeExprs.selfDots(cands).map(Math.sqrt)

  override def nullSafeEval(input: Any): Any =
    NativeExprs.maxCos(input.asInstanceOf[ArrayData], isFloat, ids,
      cands, cnorms)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val is = ctx.addReferenceObj("graftMcIds", ids, "long[]")
      val m = ctx.addReferenceObj("graftMcCands", cands, "double[][]")
      val ns = ctx.addReferenceObj("graftMcNorms", cnorms, "double[]")
      val r = ctx.freshName("mcRow")
      s"""
         |InternalRow $r = graft.expressions.NativeExprs.maxCos(
         |  $c, $isFloat, $is, $m, $ns);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** SparkSessionExtensions installer for all graft native functions —
  * usable via `spark.sql.extensions=graft.expressions.GraftExtensions` or
  * programmatically (Engine does the latter). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    NativeExprs.inject(ext)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
