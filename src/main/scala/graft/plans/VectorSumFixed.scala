package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of fixed-length BIGINT vectors — the centroid
  * aggregate for embedding columns, as a custom
  * `TypedImperativeAggregate` with an `Array[Long]` buffer.
  *
  * The relational alternative (posexplode → groupBy(key, position) →
  * collect back in order) inflates the shuffle by the vector dimension:
  * at dim=1024 every row becomes 1024 shuffle rows. Here the partial
  * state per (partition, group) is ONE dim-length long array, partial
  * aggregation combines map-side, and the shuffle carries dim·8 bytes
  * per group — independent of row count, the same contract as Spark's
  * own sum.
  *
  * Inputs are expected PRE-SCALED to integers (e.g.
  * `transform(emb, x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT))`):
  * long sums are exact and reduction-order-invariant, so results are
  * bit-identical across partitionings and engines (floating-point sums
  * are neither). Overflow throws (`Math.addExact`) rather than wrapping;
  * null vectors are skipped, a wrong-length vector throws.
  */
case class VectorSumFixed(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vector_sum_fixed"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"vector_sum_fixed(dim=$dim) got a length-${arr.numElements()} vector")
      var i = 0
      while (i < dim) { buf(i) = Math.addExact(buf(i), arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(dim * 8)
    val out = new DataOutputStream(bytes)
    var i = 0
    while (i < dim) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dim)
    var i = 0
    while (i < dim) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumFixed =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumFixed =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorSumFixed {
  /** Column-API entry point over an `array<bigint>` column. */
  def vectorSum(value: Column, dim: Int): Column =
    Bridge.toColumn(VectorSumFixed(Bridge.toExpression(value), dim)
      .toAggregateExpression())
}
