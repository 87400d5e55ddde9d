package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object VectorAggregates {
  /** Column form: element-wise Σ floor(xᵢ·1e6 + 0.5) over a group's
   *  vectors, as `array<long>` micro-units. */
  def vecSumQ6(vec: Column): Column =
    GraftBridge.column(VectorSumQ6(GraftBridge.expression(vec))
      .toAggregateExpression())
}

/**
 * Element-wise vector sum in integer micro-units — the aggregation half
 * of per-group centroids (k-means recompute, per-label mean embeddings).
 *
 * Why this exists instead of `posexplode → groupBy(group, dim) → avg`:
 * the explode form shuffles rows × dims (group, dim, value) tuples per
 * aggregation — at 100 TB of 768-dim vectors that is a 768× row
 * multiplier through the exchange. This aggregate partial-aggregates
 * per partition (one `Array[Long]` buffer per group), so the shuffle
 * carries exactly groups × dims longs.
 *
 * Why micro-unit LONGS instead of summing doubles: long addition is
 * associative — the result is independent of partition layout and merge
 * order, and any external engine replicates it exactly. A double sum
 * varies in the last ulp with partitioning, which would make every
 * downstream centroid (and k-means assignment near a boundary)
 * layout-dependent. The 1e-6 quantization error per element is far
 * below embedding noise.
 *
 * Vectors in one group must share a length; null vectors are skipped.
 */
case class VectorSumQ6(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_q6 needs array<float|double|int>, got $other")
  }

  // resolved lazily — at construction the child may be an unresolved
  // attribute whose dataType throws
  @transient private lazy val elemType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType // checkInputDataTypes rejects before evaluation
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.length == 0) new Array[Long](n) else buffer
    require(buf.length == n,
      s"vec_sum_q6: vector length $n != group's ${buf.length}")
    var i = 0
    while (i < n) {
      val x = elemType match {
        case FloatType => arr.getFloat(i).toDouble
        case DoubleType => arr.getDouble(i)
        case _ => arr.getInt(i).toDouble
      }
      buf(i) += math.floor(x * 1e6 + 0.5).toLong
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    require(b1.length == b2.length,
      s"vec_sum_q6: merging groups of length ${b1.length} and ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorSumQ6 =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorSumQ6 =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): VectorSumQ6 =
    copy(child = c)
  override def prettyName: String = "vec_sum_q6"
}
