package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact distinct count over a bounded non-negative integer domain as
  * a custom `TypedImperativeAggregate`: the state is a fixed-width
  * bitmap, `update` sets a bit, `merge` ORs two bitmaps, `eval` sums
  * popcounts.
  *
  * Why a custom aggregate: `countDistinct` expands to a two-shuffle
  * expand+aggregate plan (partial distinct per key, then merge), with
  * per-distinct-value rows crossing the wire. For dense bounded id
  * domains (user ids, shard-local doc ids) the bitmap state is
  * constant-size per group, the shuffle carries one buffer per
  * (partition, group) regardless of cardinality, and merge is
  * word-wise OR — the classic precomputed-distinct pattern at
  * warehouse scale. Production systems use compressed bitmaps
  * (Roaring) for sparse domains; a fixed dense bitmap keeps this
  * self-contained (no external jars in the image) and is exactly
  * right for dense domains.
  *
  * Values must lie in [0, maxId); out-of-domain input fails loudly
  * (a silent drop would corrupt the count). Nulls are ignored, like
  * `count(DISTINCT x)`. */
case class BitmapDistinctCount(
    child: Expression,
    maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(maxId > 0 && maxId <= (1 << 26),
    s"maxId must be in (0, 2^26] (8 MiB bitmap cap), got $maxId")

  private val words = (maxId + 63) >>> 6

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an integral id column, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      require(id >= 0 && id < maxId,
        s"bitmap_distinct: id $id outside [0, $maxId)")
      buf((id >>> 6).toInt) |= (1L << (id & 63))
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinctCount =
    copy(child = newChildren.head)

  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinctCount {
  /** Column API: exact distinct count of `c` over [0, maxId). */
  def apply(c: Column, maxId: Int): Column =
    ColumnBridge.column(
      BitmapDistinctCount(ColumnBridge.expression(c), maxId)
        .toAggregateExpression())
}
