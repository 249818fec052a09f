package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Catalyst aggregate building a [[CuckooFilter]] over a LongType column —
  * the north rule's "partitioned cuckoo-filter URL-seen set" as a native
  * `TypedImperativeAggregate`: each task builds a partial filter over its
  * partition (update), partials merge by fingerprint re-insertion (merge),
  * and the final value is the serialized filter blob ready to broadcast.
  *
  * This is the Spark-idiomatic replacement for the reference's Mercator
  * sieve front-end (`/root/reference/src/clj/ramper/sieve/mercator_sieve.clj`)
  * — the partial-aggregate tree IS the "per-bucket sort + merge" structure,
  * planned and codegen-scheduled by Catalyst instead of hand-threaded.
  */
case class CuckooFilterAgg(
    child: Expression,
    capacity: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): CuckooFilter = CuckooFilter.forCapacity(capacity)

  override def update(buffer: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CuckooFilter, other: CuckooFilter): CuckooFilter = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: CuckooFilter): Any = CuckooFilter.toBytes(buffer)

  override def serialize(buffer: CuckooFilter): Array[Byte] = CuckooFilter.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): CuckooFilter =
    CuckooFilter.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CuckooFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CuckooFilterAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override protected def withNewChildInternal(newChild: Expression): CuckooFilterAgg =
    copy(child = newChild)
}

object CuckooFilterAgg {
  /** Column API: cuckoo_filter(longCol, capacity) -> binary blob. */
  def apply(c: Column, capacity: Long): Column = {
    import org.apache.spark.sql.GraftInternals
    GraftInternals.toColumn(
      new CuckooFilterAgg(GraftInternals.toExpr(c), capacity).toAggregateExpression())
  }
}
