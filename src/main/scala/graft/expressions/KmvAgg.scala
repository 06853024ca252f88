package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct-count sketch: keep the `k` smallest
  * DISTINCT values of a 60-bit hash column; the k-th minimum estimates
  * the distinct count as `(k−1)·2⁶⁰ / h₍ₖ₎` (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"). The cardinality rung
  * of the sketch family: unlike `COUNT(DISTINCT x)` — whose exact plan
  * must shuffle every distinct value — this aggregate crosses the
  * network with AT MOST `k` longs per (task, group) regardless of
  * corpus size, and the result is a pure function of the input SET
  * (insertion into a sorted distinct array is order- and
  * duplicate-insensitive, merge is a capped sorted-set union), so the
  * estimate is bit-identical across partition layouts and engines. The
  * DuckDB oracle reproduces it verbatim: distinct hashes per group,
  * `ROW_NUMBER` ascending, the k-th value — no approximation slack in
  * the comparison, the ESTIMATOR itself is deterministic.
  *
  * Buffer: `[n | v₀ < v₁ < … < v₍ₙ₋₁₎]`, capacity `k` values — binary
  * search + `System.arraycopy` insert keeps update O(log k + k) worst
  * case, and the common full-buffer case short-circuits on
  * `v ≥ current max` with a single comparison. Runs inside
  * ObjectHashAggregate with full map-side partial aggregation. */
case class KMinDistinct(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"graft_kmin: unreasonable k $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_kmin expects bigint, got $dt")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmin"

  // buf(0) = n; buf(1..n) = sorted distinct minima
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + k)

  /** Insert `v` into the sorted distinct prefix if it belongs among the
    * k smallest; no-op on duplicates and on values above a full
    * buffer's max. */
  private def insert(buf: Array[Long], v: Long): Unit = {
    val n = buf(0).toInt
    if (n == k && v >= buf(n)) return
    // binary search over buf[1..n]
    var lo = 1
    var hi = n // exclusive of hi+1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = buf(mid)
      if (m == v) return
      else if (m < v) lo = mid + 1
      else hi = mid - 1
    }
    // lo = insertion index in [1, n+1]
    val keep = if (n == k) n - lo else n - lo + 1
    if (keep > 0) System.arraycopy(buf, lo, buf, lo + 1, keep)
    buf(lo) = v
    if (n < k) buf(0) = n + 1
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val nb = b(0).toInt
    var i = 1
    // b's values are ascending: once one falls off a full a, the rest do
    while (i <= nb) {
      val v = b(i)
      if (a(0).toInt == k && v >= a(k)) return a
      insert(a, v)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 1, 1 + buf(0).toInt))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bb = java.nio.ByteBuffer.allocate((1 + n) * 8)
    bb.asLongBuffer().put(buf, 0, 1 + n)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](1 + k)
    val lb = java.nio.ByteBuffer.wrap(bytes).asLongBuffer()
    lb.get(out, 0, lb.remaining())
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): KMinDistinct =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KMinDistinct =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression)
      : KMinDistinct = copy(child = newChild)
}
