package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

import ApproximatePercentile.PercentileDigest

/** Mergeable quantile-digest STATE columns — the quantile analogue of
  * the HLL distinct-count state (graft.operators.Sketches): Spark's
  * `percentile_approx` computes a quantile in one shot but never exposes
  * its mergeable digest, so per-day quantile state cannot be persisted
  * and folded incrementally. These aggregates expose that same digest
  * (Greenwald-Khanna `QuantileSummaries`, the engine's own
  * ApproximatePercentile machinery — deterministic, unlike the
  * randomized-compaction KLL/REQ sketches in the bundled DataSketches
  * jar) as a BinaryType column: build per-key/per-day states, union new
  * days in with the merge aggregate, read quantiles out at the end.
  *
  * Guarantee: a digest built with `relativeError` answers any quantile
  * within that RANK error, and GK merge preserves the bound — so the
  * maintained state inherits the same contract as a direct
  * `percentile_approx` over the full history (QuantileStateSpec pins the
  * bound for split, chained and direct builds; exact row counts ride
  * along unchanged). Map-side partial aggregation applies as usual: the
  * shuffle carries one digest per (partition, group), not per row.
  */
case class QuantileStateAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(relativeError)

  override def update(buffer: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(buffer: PercentileDigest, other: PercentileDigest): PercentileDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buffer)

  override def serialize(buffer: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Key-wise union of serialized digests (BinaryType in, BinaryType out):
  * `update` folds persisted state rows, `merge` combines partials — both
  * are GK merges, so error bounds compose instead of accumulating.
  */
case class QuantileStateMergeAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(relativeError)

  override def update(buffer: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(ApproximatePercentile.serializer.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: PercentileDigest, other: PercentileDigest): PercentileDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buffer)

  override def serialize(buffer: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileStateMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileStateMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar read of one quantile from a serialized digest. Codegen'd as a
  * static call (house style, HashExpressions.scala:20); the per-row
  * deserialization is fine here because states exist per GROUP — this
  * never runs on data-scale rows.
  */
case class QuantileFromStateExpr(child: Expression, percentage: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    QuantileStateOps.query(input.asInstanceOf[Array[Byte]], percentage)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.QuantileStateOps.query($c, $percentage)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantileStateOps {
  /** Static entry for interpreted eval and codegen alike. */
  def query(bytes: Array[Byte], percentage: Double): Double = {
    val digest = ApproximatePercentile.serializer.deserialize(bytes)
    val out = digest.getPercentiles(Array(percentage))
    if (out.isEmpty) Double.NaN else out.head
  }
}

object QuantileStateAgg {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** `quantile_state(valueCol)` over a group -> binary digest. */
  def quantileState(value: Column, relativeError: Double = 0.0001): Column =
    column(QuantileStateAgg(expression(value), relativeError).toAggregateExpression())

  /** `quantile_state_merge(stateCol)` over a group -> binary digest. */
  def quantileStateMerge(state: Column, relativeError: Double = 0.0001): Column =
    column(QuantileStateMergeAgg(expression(state), relativeError).toAggregateExpression())

  /** One quantile out of a digest column. */
  def quantileFromState(state: Column, percentage: Double): Column = {
    require(percentage >= 0.0 && percentage <= 1.0, s"percentage in [0,1], got $percentage")
    column(QuantileFromStateExpr(expression(state), percentage))
  }
}
