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

  /** countmin_sketch(keyCol, eps, delta[, conservative]): CountMin as a
    * mergeable binary buffer (linear sketch: merge = elementwise add,
    * CountMin.java:190-200); query the result with [[CountMinEstimate]] /
    * [[CountMinLower]] / [[CountMinUpper]].
    *
    * `conservative = true` applies the Estan-Varghese conservative update
    * (CountMin.java:98-113) on the per-row path: each touched cell rises
    * only to estimate+inc, tightening overestimates. Partial buffers still
    * merge by elementwise add — the merged table can exceed what a
    * single-pass conservative sketch would hold, but never drops below the
    * true count, so the never-underestimate contract and the ±εn bound are
    * preserved under distributed aggregation. */
  case class CountMinAgg(
      child: Expression,
      eps: Double,
      delta: Double,
      conservative: Boolean = false,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMin] {

    override def createAggregationBuffer(): CountMin = CountMin(eps, delta)

    override def update(buffer: CountMin, input: InternalRow): CountMin = {
      val v = child.eval(input)
      if (v != null) {
        if (conservative) buffer.conservativeUpdate(v.asInstanceOf[Long])
        else buffer.update(v.asInstanceOf[Long])
      }
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

  /** Per-task single-entry cache of the decoded sketch. A probe query
    * evaluates the point-estimate expression once per PROBE ROW, but the
    * sketch bytes are almost always the same value (a broadcast aggregate
    * result) — re-parsing 8·rows·cols bytes per row dominated q10-shaped
    * plans. Keyed by (length, two independent 64-bit content hashes):
    * the byte-array INSTANCE differs per row (UnsafeRow.getBinary copies),
    * so identity can't key the cache; a 128-bit content key has collision
    * odds ~2^-64 per distinct-sketch pair (same contract as the documented
    * shingle memo, TextFeatures.scala:224). Hashing is a single multiply-add
    * pass vs deserialize's parse + 2x allocation + GC pressure. */
  private final class DecodedSketchCache extends Serializable {
    @transient private var len: Int = -1
    @transient private var h1: Long = 0L
    @transient private var h2: Long = 0L
    @transient private var value: CountMin = _
    def get(bytes: Array[Byte]): CountMin = {
      val k1 = graft.core.Murmur3.hashBytes(bytes, 0x6a09e667f3bcc908L)
      val k2 = graft.core.Murmur3.hashBytes(bytes, 0xbb67ae8584caa73bL)
      if (value == null || len != bytes.length || h1 != k1 || h2 != k2) {
        value = CountMin.deserialize(bytes)
        len = bytes.length; h1 = k1; h2 = k2
      }
      value
    }
  }

  /** Base for point queries on a serialized CountMin: decode-once semantics
    * via a foldable fast path (literal sketch bytes decode exactly once per
    * task) or the content-keyed [[DecodedSketchCache]]. */
  sealed trait CountMinQuery extends BinaryExpression with CodegenFallback {
    @transient private lazy val cache = new DecodedSketchCache
    @transient private lazy val foldableSketch: CountMin =
      CountMin.deserialize(left.eval(InternalRow.empty).asInstanceOf[Array[Byte]])
    protected def sketchOf(bytes: Any): CountMin =
      if (left.foldable) foldableSketch
      else cache.get(bytes.asInstanceOf[Array[Byte]])
  }

  /** countmin_estimate(sketchBytes, key): point query on a serialized
    * CountMin (CountMin.java:131-141). */
  case class CountMinEstimate(left: Expression, right: Expression)
      extends CountMinQuery {
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any, key: Any): Any =
      sketchOf(sketch).estimate(key.asInstanceOf[Long])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
      copy(l, r)
    override def prettyName: String = "graft_countmin_estimate"
  }

  /** countmin_lower(sketchBytes, key): deterministic lower bound
    * est − ⌈ε·n⌉ clamped at 0 (CountMin.java:143-160). */
  case class CountMinLower(left: Expression, right: Expression)
      extends CountMinQuery {
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any, key: Any): Any =
      sketchOf(sketch).lowerBound(key.asInstanceOf[Long])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinLower =
      copy(l, r)
    override def prettyName: String = "graft_countmin_lower"
  }

  /** countmin_upper(sketchBytes, key): upper bound = the estimate itself
    * (CountMin never underestimates, CountMin.java:162-171). */
  case class CountMinUpper(left: Expression, right: Expression)
      extends CountMinQuery {
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any, key: Any): Any =
      sketchOf(sketch).upperBound(key.asInstanceOf[Long])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinUpper =
      copy(l, r)
    override def prettyName: String = "graft_countmin_upper"
  }

  /** countmin_maxerror(sketchBytes): ⌈ε·streamLength⌉
    * (CountMin.java:173-179). */
  case class CountMinMaxError(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
    @transient private lazy val cache = new DecodedSketchCache
    override def dataType: DataType = LongType
    override def nullSafeEval(sketch: Any): Any =
      cache.get(sketch.asInstanceOf[Array[Byte]]).maxError
    override protected def withNewChildInternal(c: Expression): CountMinMaxError = copy(c)
    override def prettyName: String = "graft_countmin_maxerror"
  }

  private val ssStructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  /** spacesaving_topk(keyCol, s, threshold): SpaceSaving heavy hitters
    * (reference SpaceSaving.java; isomorphic to Misra-Gries per its own
    * comment at :41-42). Emits array<struct<key,lb,est>> of keys whose
    * estimate >= threshold, sorted by (est desc, key asc). With s >
    * |distinct keys| no eviction happens and counts are exact. */
  case class SpaceSavingAgg(
      child: Expression,
      s: Int,
      threshold: Long,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[graft.sketch.SpaceSaving] {

    override def createAggregationBuffer(): graft.sketch.SpaceSaving =
      graft.sketch.SpaceSaving(s)

    override def update(buffer: graft.sketch.SpaceSaving, input: InternalRow): graft.sketch.SpaceSaving = {
      val v = child.eval(input)
      if (v != null) buffer.update(v.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: graft.sketch.SpaceSaving, other: graft.sketch.SpaceSaving): graft.sketch.SpaceSaving =
      buffer.merge(other)

    override def eval(buffer: graft.sketch.SpaceSaving): Any = {
      val rows = buffer.frequentKeys(threshold).map { case (key, lb, est) =>
        InternalRow(key, lb, est)
      }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

    override def serialize(buffer: graft.sketch.SpaceSaving): Array[Byte] = buffer.serialize()
    override def deserialize(bytes: Array[Byte]): graft.sketch.SpaceSaving =
      graft.sketch.SpaceSaving.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
      copy(inputAggBufferOffset = newOffset)

    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingAgg =
      copy(child = c.head)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(ssStructType, containsNull = false)
    override def prettyName: String = "graft_spacesaving_topk"
  }

  /** countmin_topk(keyCol, eps, delta, threshold[, conservative]): CountMin
    * with update-time frequent-key tracking (reference CountMinFastFE
    * `:162-179,370-392`) — heavy-hitter enumeration from a LINEAR sketch
    * without a second pass, for keyspaces too hot for Misra-Gries' O(k)
    * table. Emits array<struct<key,lb,est>> of tracked keys whose estimate
    * >= threshold, sorted by (est desc, key asc). Complete for threshold >=
    * eps*streamLength under any partitioning (CountMinFE's containment
    * guarantee); exact when the sketch geometry avoids full-row collisions
    * at the data's cardinality. */
  case class CountMinTopKAgg(
      child: Expression,
      eps: Double,
      delta: Double,
      threshold: Long,
      conservative: Boolean = false,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[graft.sketch.CountMinFE] {

    override def createAggregationBuffer(): graft.sketch.CountMinFE =
      graft.sketch.CountMinFE(eps, delta)

    override def update(buffer: graft.sketch.CountMinFE, input: InternalRow): graft.sketch.CountMinFE = {
      val v = child.eval(input)
      if (v != null) {
        if (conservative) buffer.conservativeUpdate(v.asInstanceOf[Long])
        else buffer.update(v.asInstanceOf[Long])
      }
      buffer
    }

    override def merge(buffer: graft.sketch.CountMinFE, other: graft.sketch.CountMinFE): graft.sketch.CountMinFE =
      buffer.merge(other)

    override def eval(buffer: graft.sketch.CountMinFE): Any = {
      val rows = buffer.frequentKeys(threshold).map { case (key, lb, est) =>
        InternalRow(key, lb, est)
      }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

    override def serialize(buffer: graft.sketch.CountMinFE): Array[Byte] = buffer.serialize()
    override def deserialize(bytes: Array[Byte]): graft.sketch.CountMinFE =
      graft.sketch.CountMinFE.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): CountMinTopKAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMinTopKAgg =
      copy(inputAggBufferOffset = newOffset)

    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinTopKAgg =
      copy(child = c.head)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(ssStructType, containsNull = false)
    override def prettyName: String = "graft_countmin_topk"
  }

  // ------------------------------------------------------------ Column API

  def countmin_topk(c: Column, eps: Double, delta: Double, threshold: Long,
                    conservative: Boolean = false): Column =
    ColumnBridge.column(
      CountMinTopKAgg(ColumnBridge.expression(c), eps, delta, threshold,
        conservative).toAggregateExpression())

  def spacesaving_topk(c: Column, s: Int, threshold: Long): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(c), s, threshold).toAggregateExpression())

  def freq_sketch_topk(c: Column, k: Int, threshold: Long): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(c), k, threshold).toAggregateExpression())

  def countmin_sketch(c: Column, eps: Double, delta: Double,
                      conservative: Boolean = false): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(c), eps, delta, conservative).toAggregateExpression())

  def countmin_estimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CountMinEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))

  def countmin_lower(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CountMinLower(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))

  def countmin_upper(sketch: Column, key: Column): Column =
    ColumnBridge.column(
      CountMinUpper(ColumnBridge.expression(sketch), ColumnBridge.expression(key)))

  def countmin_maxerror(sketch: Column): Column =
    ColumnBridge.column(CountMinMaxError(ColumnBridge.expression(sketch)))
}
