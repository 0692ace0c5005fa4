package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Top-k rows per group as a custom `TypedImperativeAggregate` with a
  * BOUNDED k-element state: `update` keeps the k best (ord desc,
  * id asc) pairs seen by a task, `merge` folds two k-sets, `eval`
  * emits the sorted array.
  *
  * Why a custom aggregate next to the window spelling (q6/q34): the
  * window shape ranks by sorting — even with Spark's WindowGroupLimit
  * map-side prune, each partition SORTS its group slices and the
  * ranking runs as a separate sort-based operator after the exchange.
  * This aggregate rides the ordinary hash-aggregate pipeline: no sort
  * anywhere, O(n·k) scan work, exactly one k-element buffer per
  * (partition, group) crossing the wire, and the merge side stays
  * k-bounded no matter how skewed a group is — the same
  * constant-state contract as [[BitmapDistinctCount]].
  *
  * Determinism: selection and output use the TOTAL order
  * (ord desc, id asc) — equal ord values tie-break on id — so the
  * result is identical on any partitioning, matching the
  * `row_number() OVER (ORDER BY ord DESC, id)` oracle spelling.
  * Null ord or id inputs are skipped (SQL aggregates ignore nulls);
  * NaN ord is rejected loudly (its sort position would be
  * engine-dependent). */
case class TopKRows(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0 && k <= 1024, s"k must be in (0, 1024], got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_rows expects (double ord, bigint id), got ($o, $i)")
    }

  /** Strict total order: does (ao, ai) outrank (bo, bi)? */
  @inline private def outranks(ao: Double, ai: Long, bo: Double, bi: Long)
      : Boolean = ao > bo || (ao == bo && ai < bi)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k)

  private def insert(buf: ArrayBuffer[(Double, Long)], o: Double, i: Long)
      : Unit = {
    if (buf.length < k) { buf += ((o, i)); () }
    else {
      // linear weakest scan: k is small by contract; no heap needed
      var wk = 0
      var j = 1
      while (j < buf.length) {
        val (wo, wi) = buf(wk)
        val (co, ci) = buf(j)
        if (outranks(wo, wi, co, ci)) wk = j
        j += 1
      }
      val (wo, wi) = buf(wk)
      if (outranks(o, i, wo, wi)) buf(wk) = ((o, i))
    }
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow)
      : ArrayBuffer[(Double, Long)] = {
    val ov = ord.eval(input)
    val iv = id.eval(input)
    if (ov != null && iv != null) {
      val o = ov.asInstanceOf[Double]
      require(!o.isNaN, "top_k_rows: NaN ordering value")
      insert(buf, o, iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)],
                     b: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    b.foreach { case (o, i) => insert(a, o, i) }
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith { case ((ao, ai), (bo, bi)) =>
      outranks(ao, ai, bo, bi)
    }
    new GenericArrayData(sorted.map { case (o, i) =>
      new GenericInternalRow(Array[Any](o, i))
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (o, i) => bb.putDouble(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](math.max(n, k))
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(ord = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_rows"
}

object TopKRows {
  /** Column API: array of the k best (ord desc, id asc) pairs. */
  def of(ord: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(ord), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
