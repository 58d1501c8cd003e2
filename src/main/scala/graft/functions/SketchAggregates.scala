package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters over a string column as a native Catalyst
  * aggregate wrapping the DataSketches Misra-Gries `ItemsSketch` (the
  * frequent-items sketch that ships with Spark's own jars).
  *
  * Scale contract: the aggregation state is a FIXED-SIZE mergeable sketch
  * (≤ maxMapSize counters per partition, merged pairwise), so corpus-wide
  * heavy hitters cost one map-side pass plus |partitions| sketch merges —
  * no (token → count) shuffle at all, unlike the exact
  * [[graft.text.TextOps.vocabulary]] path whose df table scales with the
  * distinct-token domain. Guarantees (Misra-Gries): NO FALSE NEGATIVES —
  * every item with true count > getMaximumError is returned — and each
  * estimate e satisfies lower ≤ true ≤ upper with upper − lower ≤
  * streamLength/maxMapSize. Exact when the distinct domain fits the map.
  *
  * Approximate by design → spec-gated (ExtensionsSpec), not in the strict
  * DuckDB oracle set, like the HLL/GK aggregates in [[graft.ops.Stats]]. */
case class FrequentItemsAggregate(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  @transient private lazy val serde = new ArrayOfStringsSerDe()

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any = {
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    // deterministic output: estimate desc, then token asc
    val sorted = rows.sortBy(r => (-r.getEstimate, r.getItem))
    new GenericArrayData(sorted.map { r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
        r.getLowerBound, r.getUpperBound)
    }.toArray[Any])
  }

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("estimate", LongType),
    StructField("lower", LongType), StructField("upper", LongType))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): FrequentItemsAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FrequentItemsAggregate =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "frequent_items"
}

object SketchAggregates {
  /** Column API for [[FrequentItemsAggregate]]: aggregates a string column
    * to ARRAY<STRUCT<token, estimate, lower, upper>>. */
  def frequentItems(c: Column, maxMapSize: Int = 1024): Column =
    Bridge.column(FrequentItemsAggregate(Bridge.catalystExpression(c),
      maxMapSize).toAggregateExpression())
}
