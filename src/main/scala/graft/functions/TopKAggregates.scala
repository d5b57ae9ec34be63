package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-neighbors aggregation for the ANN lanes.
  *
  * `row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, id ASC)`
  * shuffles EVERY scored candidate row to the window and sorts them all
  * (at 1M vectors / 8 LSH tables: ~160M rows, a ~1.2 GB exchange and the
  * single biggest stage of the lane). A bounded top-k aggregate has the
  * identical output contract — the k best (sim desc, id asc) neighbors per
  * query, ranked — but runs as a hash aggregate with MAP-SIDE PARTIALS:
  * each task reduces its candidates to at most k entries per vec_id before
  * the exchange, so the shuffle carries O(#queries * k) tiny buffers
  * instead of every candidate. Same partial/merge/eval protocol as the
  * sketch aggregates (SURVEY.md §3.2).
  *
  * Comparator parity with the window: an entry beats another iff its sim
  * is greater, or sims are equal (exact double compare — sims here are
  * already rounded to 3 decimals) and its id is smaller. Ties beyond k cut
  * identically; duplicate (query, neighbor) inputs must be deduped
  * upstream, exactly as the window path required. */
object TopKAggregates {

  private val nbStructType = StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim_r3", DoubleType, nullable = false)))

  /** Sorted bounded buffer: parallel arrays in (sim desc, id asc) order. */
  final class TopKBuf(val k: Int) {
    var n: Int = 0
    val ids: Array[Long] = new Array[Long](k)
    val sims: Array[Double] = new Array[Double](k)

    @inline private def beats(s: Double, id: Long, i: Int): Boolean =
      s > sims(i) || (s == sims(i) && id < ids(i))

    def insert(id: Long, s: Double): Unit = {
      if (n == k && !beats(s, id, n - 1)) return
      // find insertion point (k is small — linear scan)
      var pos = if (n == k) n - 1 else n
      while (pos > 0 && beats(s, id, pos - 1)) pos -= 1
      var i = math.min(n, k - 1)
      while (i > pos) { ids(i) = ids(i - 1); sims(i) = sims(i - 1); i -= 1 }
      ids(pos) = id
      sims(pos) = s
      if (n < k) n += 1
    }

    def mergeFrom(other: TopKBuf): TopKBuf = {
      var i = 0
      while (i < other.n) { insert(other.ids(i), other.sims(i)); i += 1 }
      this
    }
  }

  /** topk_neighbors(idCol, simCol, k): array<struct<neighbor_id, sim_r3>>
    * of the k best (sim desc, id asc) input rows, in rank order. */
  case class TopKNeighborsAgg(
      idChild: Expression,
      simChild: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

    override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

    override def update(buffer: TopKBuf, input: InternalRow): TopKBuf = {
      val id = idChild.eval(input)
      val s = simChild.eval(input)
      if (id != null && s != null)
        buffer.insert(id.asInstanceOf[Long], s.asInstanceOf[Double])
      buffer
    }

    override def merge(buffer: TopKBuf, other: TopKBuf): TopKBuf =
      buffer.mergeFrom(other)

    override def eval(buffer: TopKBuf): Any = {
      val rows = new Array[Any](buffer.n)
      var i = 0
      while (i < buffer.n) {
        rows(i) = InternalRow(buffer.ids(i), buffer.sims(i))
        i += 1
      }
      new GenericArrayData(rows)
    }

    override def serialize(buffer: TopKBuf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16 * buffer.n)
      bb.putInt(buffer.k).putInt(buffer.n)
      var i = 0
      while (i < buffer.n) { bb.putLong(buffer.ids(i)).putDouble(buffer.sims(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val buf = new TopKBuf(bb.getInt())
      val n = bb.getInt()
      var i = 0
      // entries arrive already in buffer order — place directly
      while (i < n) { buf.ids(i) = bb.getLong(); buf.sims(i) = bb.getDouble(); i += 1 }
      buf.n = n
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighborsAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighborsAgg =
      copy(inputAggBufferOffset = newOffset)

    override def children: Seq[Expression] = Seq(idChild, simChild)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKNeighborsAgg =
      copy(idChild = c(0), simChild = c(1))
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(nbStructType, containsNull = false)
    override def prettyName: String = "graft_topk_neighbors"
  }

  // ------------------------------------------------------------ Column API

  def topk_neighbors(id: Column, sim: Column, k: Int): Column =
    ColumnBridge.column(
      TopKNeighborsAgg(ColumnBridge.expression(id), ColumnBridge.expression(sim), k)
        .toAggregateExpression())
}
