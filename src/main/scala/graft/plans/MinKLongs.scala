package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded "k smallest DISTINCT longs per group" aggregate — the
  * in-plan basket cap for pair mining (t_frequent_pairs). The r12 form
  * enforced the cap with a per-group row_number window BEFORE a keyed
  * self-join, which costs a full-data range+sort pass plus the join's
  * second read; this aggregate folds distinct + sort + cap into ONE
  * group-by whose buffer is bounded at k entries through EVERY stage —
  * partial (map-side combine), shuffle payload, and merge — so a
  * pathological million-item basket costs k longs of memory, not a
  * sort of the basket. Deterministic by construction (the k smallest
  * distinct values are order-insensitive), hence partition-layout and
  * retry safe, and bit-identical to the row_number(ORDER BY value)
  * <= k cap it replaces.
  *
  * Buffer: a sorted long array (k is small — binary search + memmove
  * beats a tree for k <= a few hundred). Eval emits the ascending
  * ArrayType(LongType) basket.
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKLongs.Buf] {

  require(k >= 1, s"MinKLongs needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MinKLongs.Buf = new MinKLongs.Buf(k)

  override def update(buf: MinKLongs.Buf, input: InternalRow): MinKLongs.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKLongs.Buf, other: MinKLongs.Buf): MinKLongs.Buf = {
    var i = 0
    while (i < other.size) { buf.insert(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: MinKLongs.Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.size))

  override def serialize(buf: MinKLongs.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKLongs.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKLongs.Buf(k)
    if (n > buf.values.length) buf.values = new Array[Long](n)
    // serialized buffers are already sorted-distinct and <= k long:
    // bulk-restore without per-element search
    var i = 0
    while (i < n) { buf.values(i) = bb.getLong; i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKLongs =
    copy(child = newChildren.head)
}

object MinKLongs {

  /** Sorted-distinct long buffer capped at k entries. `values` grows
    * lazily to min(k, 16·2^g) so an unbounded k (the spec's uncapped
    * twin) never preallocates k slots. */
  final class Buf(k: Int) {
    var values: Array[Long] = new Array[Long](math.min(k, 16))
    var size: Int = 0

    def insert(v: Long): Unit = {
      if (size == k && v >= values(size - 1)) return
      val pos = java.util.Arrays.binarySearch(values, 0, size, v)
      if (pos >= 0) return // already present
      val ins = -pos - 1
      if (size == values.length && size < k) // grow (capped at k)
        values = java.util.Arrays.copyOf(values,
          math.min(k.toLong, values.length * 2L).toInt)
      val last = math.min(size, k - 1) // drop the max when full
      System.arraycopy(values, ins, values, ins + 1, last - ins)
      values(ins) = v
      if (size < k) size += 1
    }
  }

  /** `k` smallest distinct values of `c` per group, ascending. */
  def column(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinKLongs(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
