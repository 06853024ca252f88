package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass Gram-matrix / moment aggregate over an embedding column —
  * the covariance/PCA-whitening foundation of embedding pipelines
  * (cov = G/n − μμᵀ falls out of (n, Σx, Σxxᵀ) in the consuming
  * query). This is the repo's custom TYPED AGGREGATE seam (SURVEY
  * §7.3's ladder: scalar `Expression`s are NativeExprs; whole-operator
  * plans are the KeyedSource DSv2 path; this is the aggregate rung):
  * a `TypedImperativeAggregate[Array[Long]]` whose buffer is the flat
  * `[n | Σ-vector | Σ-outer-product]` long array.
  *
  * Numeric determinism, same contract as the fixed-point scorers: each
  * per-row contribution is `floor(xᵢ·2³⁰)` / `floor(xᵢ·xⱼ·2³⁰)` —
  * exact doubles in (one multiply is correctly rounded), exact longs
  * out — and the merge is integer addition, so the result is identical
  * across partition layouts and engines. Headroom: unit-norm
  * coordinates give |contribution| ≤ 2³⁰, so sums overflow only past
  * ~2³³ rows; larger corpora shard the aggregate by key first.
  *
  * Scale shape: runs inside ObjectHashAggregate with full map-side
  * partial aggregation — each task folds its rows into ONE d²-long
  * buffer, and only dim²+dim+1 longs per task cross the network
  * (for d = 64: 33 KB), never the vectors. The d² work per row is the
  * op's honest cost, same as any Gram computation. */
case class GramMatrixFixed(child: Expression, dim: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(dim >= 1 && dim <= 4096, s"graft_gram: unreasonable dim $dim")

  private final val Scale = 1073741824.0 // 2^30

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_gram expects array<double>, got $dt")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("gram", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"graft_gram: vector of ${arr.numElements()} elements, expected $dim")
    var k = 0
    while (k < dim) {
      require(!arr.isNullAt(k),
        s"graft_gram: null element at index $k — embeddings must be dense")
      k += 1
    }
    buf(0) += 1L
    var i = 0
    while (i < dim) {
      val xi = arr.getDouble(i)
      buf(1 + i) += java.lang.Math.floor(xi * Scale).toLong
      val base = 1 + dim + i * dim
      var j = 0
      while (j < dim) {
        buf(base + j) +=
          java.lang.Math.floor(xi * arr.getDouble(j) * Scale).toLong
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    InternalRow(buf(0),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim)),
      new GenericArrayData(
        java.util.Arrays.copyOfRange(buf, 1 + dim, buf.length)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): GramMatrixFixed =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GramMatrixFixed =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression)
      : GramMatrixFixed = copy(child = newChild)
}
