package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of an array<float|double> column — the centroid
  * aggregate (SURVEY §2.9 clustering surface) as a Catalyst
  * `TypedImperativeAggregate`.
  *
  * Why an aggregate and not `posexplode + avg`: the explode form multiplies
  * the shuffle by the vector dimension (64× here, 1024× for the
  * reference's embeddings). This buffer aggregates map-side — one
  * (count, sums[dim]) buffer per group per partition — so the shuffle
  * carries |groups| × dim doubles once, not |rows| × dim exploded rows.
  * KnnSpec/FunctionsSpec pin equality with the explode formulation.
  *
  * Null/ragged handling: null arrays are skipped; dimension is fixed by
  * the first non-null array per buffer, shorter arrays contribute their
  * prefix (consistent with the engine's fixed-length vector contract —
  * ragged inputs indicate an upstream bug, not data).
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_mean"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>")
  }

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): VectorMean.Buffer = new VectorMean.Buffer(null, 0L)

  override def update(buf: VectorMean.Buffer, input: InternalRow): VectorMean.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      val m = math.min(n, buf.sums.length)
      var i = 0
      while (i < m) {
        buf.sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(a: VectorMean.Buffer, b: VectorMean.Buffer): VectorMean.Buffer = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums.clone(); a.count = b.count }
      else {
        val m = math.min(a.sums.length, b.sums.length)
        var i = 0
        while (i < m) { a.sums(i) += b.sums(i); i += 1 }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: VectorMean.Buffer): Any = {
    if (buf.sums == null || buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(s =>
      java.lang.Double.valueOf(s / buf.count)).toArray[Any])
  }

  override def serialize(buf: VectorMean.Buffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * dim)
    bb.putLong(buf.count)
    bb.putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val dim = bb.getInt()
    val sums = if (dim == 0) null else {
      val a = new Array[Double](dim)
      var i = 0
      while (i < dim) { a(i) = bb.getDouble(); i += 1 }
      a
    }
    new VectorMean.Buffer(sums, count)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorMean =
    copy(child = newChildren.head)
}

object VectorMean {
  final class Buffer(var sums: Array[Double], var count: Long)
}
