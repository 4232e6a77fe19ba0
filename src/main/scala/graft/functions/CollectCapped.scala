package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard size cap: per-group aggregation state is a
  * lazily-grown buffer that simply STOPS APPENDING once it holds `maxItems`
  * elements (update and merge both respect the cap), so a hot key can never
  * OOM an executor while a group with fewer than `maxItems` rows collects
  * exactly what `collect_list` would (order follows encounter order, which
  * callers must not rely on — same contract as `collect_list`).
  *
  * Why not the bounded-heap `top_k`: `CollectTopK`'s aggregation buffer is
  * a `BoundedPriorityQueue` that PREALLOCATES a k-slot boxed
  * `java.util.PriorityQueue` per group the moment the group is first seen.
  * LSH bucket tables are dominated by millions of near-singleton
  * `(band, bh)` groups — at the default cap (1000) that is a ~1001-slot
  * array plus heap bookkeeping allocated per 1-2-element group, pure
  * allocation/GC churn for state that will hold one value. This buffer
  * starts empty and grows as `ArrayBuffer` does (amortized doubling), so a
  * singleton group costs one small append and a saturated group is bounded
  * at `maxItems` — the exact semantics [[graft.operators.MinHash.bucketPairs]]
  * needs, where the separate exact count (not the collected content) drives
  * the oversize filter and surviving groups must keep ALL their elements.
  *
  * Truncation is NOT flagged by the aggregate itself (a group at exactly
  * `maxItems` is indistinguishable from a truncated one from the array
  * alone) — callers that care pair it with `count(*)` as `bucketPairs`
  * does.
  */
case class CollectCapped(
    child: Expression,
    maxItems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(maxItems > 0, s"maxItems=$maxItems must be positive")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length < maxItems) {
      val value = child.eval(input)
      if (value != null) buffer += convertToBufferElement(value)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = maxItems - buffer.length
    if (room >= other.length) buffer ++= other
    else if (room > 0) buffer ++= other.iterator.take(room)
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)

  override def prettyName: String = "collect_capped"
}
