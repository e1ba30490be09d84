package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst aggregate for the exact integer Gram/covariance
  * moments of a quantized-vector column: ONE pass accumulates
  *   n, sx[d] = Σ qᵢ, tri[d(d+1)/2] = Σ qᵢ·qⱼ (upper triangle, row-major)
  * into a per-task long buffer with map-side partial merge — the
  * 100-TB-correct shape for X^T X. The previous formulation exploded
  * every row into d(d+1)/2 (i, j) cells before a hash aggregate; at
  * d = 512 that is 131,328 rows PER VECTOR (the round-11 dimension-axis
  * study measured 51× wall at 8× dims), i.e. ~10¹⁴ exploded rows per
  * 10⁹ vectors — this aggregate replaces it with d(d+1)/2 long adds per
  * row inside one ObjectHashAggregate, merging 8 KB·d²-ish buffers across
  * tasks. (Preference order honored: no UDF/UDAF — a TypedImperativeAggregate
  * is a native Catalyst Expression like the rest of `graft.expr`.)
  *
  * Exactness + loud overflow: accumulation is JVM long arithmetic via
  * `Math.addExact`/`multiplyExact`, so exceeding 2⁶³ THROWS (loud, the
  * repo's overflow contract) instead of wrapping. Bound: |q| ≤ 10⁴·max|x|
  * (Quantizer scale), so cells hold ≈ n·10⁸ for unit-ish vectors —
  * headroom to ~9·10¹⁰ vectors. The DuckDB mirrors guard the SAME bound
  * with `error()` CASEs where they previously rode HUGEINT silently
  * past it (the tri3 asymmetry lesson, round-10 advice).
  *
  * Output: struct(n LONG, sx ARRAY<LONG>, tri ARRAY<LONG>) — one row;
  * callers unfold it to (i, j) cells with a two-level posexplode over
  * dim-bounded metadata (never the corpus).
  */
case class GramAgg(child: Expression, dim: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val triLen = dim * (dim + 1) / 2
  // buffer layout: [0] = n, [1 .. dim] = sx, [1 + dim ..] = tri
  private val bufLen = 1 + dim + triLen

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"GramAgg: vector of ${arr.numElements()} elements, expected dim=$dim")
      val q = arr.toLongArray()
      buf(0) = Math.addExact(buf(0), 1L)
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        buf(1 + i) = Math.addExact(buf(1 + i), q(i))
        var j = i
        while (j < dim) {
          buf(t) = Math.addExact(buf(t), Math.multiplyExact(q(i), q(j)))
          t += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    InternalRow(buf(0),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim)),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1 + dim, bufLen)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(LongType, containsNull = false)),
    StructField("tri", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}

object GramAgg {

  /** Aggregate Column over a quantized ARRAY<LONG> vector column. */
  def gram(qvec: Column, dim: Int): Column =
    ColumnBridge.column(
      GramAgg(ColumnBridge.expression(qvec), dim).toAggregateExpression())
}
