package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded-heap top-k per group: the weakest element sits at the root
  * of a size-k min-heap, so each input row is one compare (+ log k
  * sift when it beats the root).
  *
  * This is the scale-correct alternative to the rank-window pattern
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`): the
  * window form sorts EVERY row of every group and keeps whole groups
  * in the window buffer (spilling on skew), while this aggregate is
  * partial-aggregable — map-side combine reduces each (partition,
  * group) to at most k entries before the shuffle, so a hot key
  * contributes k rows to the exchange instead of its full row count.
  * Total order (value DESC, id ASC) makes ties — and therefore the
  * boundary at rank k — deterministic and engine-reproducible.
  */
final class TopKHeap(val k: Int) {
  val vs = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** (v1,i1) strictly weaker than (v2,i2) in the keep-order. Value
    * comparison mirrors Spark's SQLOrderingUtil.compareDoubles (== short
    * circuit, then java.lang.Double.compare) so NaN sorts as the largest
    * value — a total order, where raw `<`/`==` on NaN is all-false and
    * breaks both heap invariants and sortWith's comparator contract.
    */
  @inline private def weaker(v1: Double, i1: Long, v2: Double, i2: Long): Boolean = {
    val c = if (v1 == v2) 0 else java.lang.Double.compare(v1, v2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def swap(i: Int, j: Int): Unit = {
    val v = vs(i); vs(i) = vs(j); vs(j) = v
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && weaker(vs(i), ids(i), vs((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < n && weaker(vs(l), ids(l), vs(w), ids(w))) w = l
      if (r < n && weaker(vs(r), ids(r), vs(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def offer(v: Double, id: Long): Unit =
    if (n < k) { vs(n) = v; ids(n) = id; n += 1; siftUp(n - 1) }
    else if (weaker(vs(0), ids(0), v, id)) { vs(0) = v; ids(0) = id; siftDown(0) }

  /** Strong-to-weak (value DESC, id ASC) snapshot of the heap. */
  def sorted: Array[(Double, Long)] =
    (0 until n).map(i => (vs(i), ids(i))).toArray
      .sortWith((a, b) => weaker(b._1, b._2, a._1, a._2))
}

case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  /** Analysis-time contract: decimal/float value columns and int id
    * columns are coerced here rather than hitting the unguarded
    * asInstanceOf in update() as a runtime ClassCastException.
    */
  // Return type left inferred (Seq[DataType]): the declared upper bound
  // AbstractDataType is private[sql] in Spark 4 and cannot be named here.
  override def inputTypes = Seq(DoubleType, LongType)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      buffer.offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.n) { buffer.offer(other.vs(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.vs(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val v = bb.getDouble; val id = bb.getLong
      heap.offer(v, id)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column form: per-group top-k (value DESC, id ASC) as
    * `array<struct<value double, id bigint>>`, strongest first.
    */
  def topKByValue(value: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(value), expression(id), k).toAggregateExpression())

  /** Column form of [[TopKVarAgg]]: per-group top-k where k is a
    * PER-ROW column (constant within each group — e.g. a quota joined
    * onto the rows). Heaps are sized at each group's own k, not a
    * global max: one group with quota 1M no longer forces a 1M-entry
    * heap into every other group's partial aggregate.
    */
  def topKByValueVarK(value: Column, id: Column, k: Column): Column =
    column(TopKVarAgg(expression(value), expression(id), expression(k))
      .toAggregateExpression())
}

/** Lazily-sized heap buffer for [[TopKVarAgg]]: capacity is unknown
  * until the first row of the group arrives carrying its k.
  */
final class VarKHeapBuffer {
  var heap: TopKHeap = null
  def ensure(k: Int): TopKHeap = {
    if (heap == null) heap = new TopKHeap(k)
    heap
  }
}

/** [[TopKAgg]] with k read from a third input expression instead of a
  * constructor constant. Contract: k is constant within a group (the
  * first row seen sizes the heap); rows with k <= 0 or null are
  * ignored, and a group whose every row has k <= 0 evaluates to an
  * empty array. Same total order (value DESC, id ASC), same
  * partial-aggregation shape — each (partition, group) sends at most
  * ITS k entries to the shuffle.
  */
case class TopKVarAgg(
    valueExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VarKHeapBuffer] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(valueExpr, idExpr, kExpr)

  override def inputTypes = Seq(DoubleType, LongType, org.apache.spark.sql.types.IntegerType)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): VarKHeapBuffer = new VarKHeapBuffer

  override def update(buffer: VarKHeapBuffer, input: InternalRow): VarKHeapBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    val k = kExpr.eval(input)
    if (v != null && id != null && k != null && k.asInstanceOf[Int] > 0) {
      buffer.ensure(k.asInstanceOf[Int])
        .offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: VarKHeapBuffer, other: VarKHeapBuffer): VarKHeapBuffer = {
    if (other.heap != null) {
      val h = buffer.ensure(other.heap.k)
      var i = 0
      while (i < other.heap.n) { h.offer(other.heap.vs(i), other.heap.ids(i)); i += 1 }
    }
    buffer
  }

  override def eval(buffer: VarKHeapBuffer): Any = {
    val entries =
      if (buffer.heap == null) Array.empty[(Double, Long)] else buffer.heap.sorted
    new GenericArrayData(entries.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    })
  }

  override def serialize(buffer: VarKHeapBuffer): Array[Byte] = {
    val h = buffer.heap
    val n = if (h == null) 0 else h.n
    val bb = ByteBuffer.allocate(8 + n * 16)
    bb.putInt(if (h == null) 0 else h.k)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(h.vs(i)); bb.putLong(h.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VarKHeapBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val buffer = new VarKHeapBuffer
    if (k > 0) {
      val h = buffer.ensure(k)
      var i = 0
      while (i < n) {
        val v = bb.getDouble; val id = bb.getLong
        h.offer(v, id)
        i += 1
      }
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKVarAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKVarAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
