package graft.functions

import graft.sketch.{CountMin, FreqSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Sketches as Spark aggregation functions.
  *
  * The reference's FrequencyEstimator contract IS Spark's partial/final
  * aggregation contract (SURVEY.md §3.2): `update` → per-row update on the
  * partial buffer, `merge(other)` + mergeError accumulation
  * (`FrequentItems.java:292-308`) → shuffle-stage buffer merge, byte-image
  * serde (`FrequentItems.java:444-509`) → buffer serialization between
  * stages. `TypedImperativeAggregate` executes exactly that protocol
  * (partial buffers serialized only at shuffle boundaries, not per row).
  */
object SketchAggregates {

  private val hhStructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  /** freq_sketch_topk(keyCol, k, threshold): Misra-Gries heavy hitters.
    * Emits array<struct<key,lb,est,ub>> of keys whose UB >= threshold,
    * sorted by (est desc, key asc). With k > |distinct keys| the sketch
    * never purges and the counts are exact. */
  case class FreqSketchAgg(
      child: Expression,
      k: Int,
      threshold: Long,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {

    override def createAggregationBuffer(): FreqSketch = FreqSketch(k)

    override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
      val v = child.eval(input)
      if (v != null) buffer.update(v.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch =
      buffer.merge(other)

    override def eval(buffer: FreqSketch): Any = {
      val rows = buffer.frequentKeys(threshold).map { case (key, lb, est, ub) =>
        InternalRow(key, lb, est, ub)
      }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

    override def serialize(buffer: FreqSketch): Array[Byte] = buffer.serialize()
    override def deserialize(bytes: Array[Byte]): FreqSketch = FreqSketch.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
      copy(inputAggBufferOffset = newOffset)

    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqSketchAgg =
      copy(child = c.head)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(hhStructType, containsNull = false)
    override def prettyName: String = "graft_freq_sketch_topk"
  }

  /** countmin_sketch(keyCol, eps, delta): CountMin as a mergeable binary
    * buffer (linear sketch: merge = elementwise add, CountMin.java:190-200);
    * query the result with [[CountMinEstimate]]. */
  case class CountMinAgg(
      child: Expression,
      eps: Double,
      delta: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMin] {

    override def createAggregationBuffer(): CountMin = CountMin(eps, delta)

    override def update(buffer: CountMin, input: InternalRow): CountMin = {
      val v = child.eval(input)
      if (v != null) buffer.update(v.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: CountMin, other: CountMin): CountMin = buffer.merge(other)
    override def eval(buffer: CountMin): Any = buffer.serialize()
    override def serialize(buffer: CountMin): Array[Byte] = buffer.serialize()
    override def deserialize(bytes: Array[Byte]): CountMin = CountMin.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
      copy(inputAggBufferOffset = newOffset)

    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
      copy(child = c.head)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_countmin_sketch"
  }

  /** countmin_estimate(sketchBytes, key): point query on a serialized
    * CountMin (CountMin.java:131-141). */
  case class CountMinEstimate(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any, key: Any): Any =
      CountMin.deserialize(sketch.asInstanceOf[Array[Byte]]).estimate(key.asInstanceOf[Long])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
      copy(l, r)
    override def prettyName: String = "graft_countmin_estimate"
  }

  // ------------------------------------------------------------ Column API

  def freq_sketch_topk(c: Column, k: Int, threshold: Long): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(c), k, threshold).toAggregateExpression())

  def countmin_sketch(c: Column, eps: Double, delta: Double): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(c), eps, delta).toAggregateExpression())

  def countmin_estimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CountMinEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
