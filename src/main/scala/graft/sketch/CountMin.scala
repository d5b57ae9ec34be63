package graft.sketch

import graft.core.Murmur3

/** Count-Min sketch over (key: Long, inc: Long) with optional conservative
  * update.
  *
  * Grafted semantics from the reference: rows = ⌈log₂(1/δ)⌉ and
  * columns = 2·⌈1/ε⌉ sizing (`CountMin.java:50-51`), per-row seeded
  * MurmurHash3 cell indexing (`CountMin.java:118-121`), conservative update
  * à la Estan-Varghese (`CountMin.java:98-113`), estimate = min over rows
  * with maxError = ⌈ε·n⌉ (`CountMin.java:131-179`), and elementwise-add merge
  * requiring identical geometry (`CountMin.java:184-200`) — a linear sketch,
  * hence trivially a lawful Spark aggregation buffer.
  */
final class CountMin private (
    val eps: Double,
    val delta: Double,
    val rows: Int,
    val cols: Int,
    private val table: Array[Long], // rows * cols, row-major
    private var _streamLength: Long,
    val seed: Long
) extends Serializable {

  def streamLength: Long = _streamLength
  def isEmpty: Boolean = _streamLength == 0
  def maxError: Long = math.ceil(eps * _streamLength).toLong

  @inline private def cell(key: Long, row: Int): Int =
    row * cols + (java.lang.Long.remainderUnsigned(Murmur3.hashLong(key, seed + row), cols)).toInt

  def update(key: Long, inc: Long = 1L): Unit = {
    require(inc >= 0, "increment must be non-negative")
    _streamLength += inc
    var r = 0
    while (r < rows) { table(cell(key, r)) += inc; r += 1 }
  }

  /** Estan-Varghese conservative update (CountMin.java:98-113): raise each
    * touched cell only up to estimate+inc. */
  def conservativeUpdate(key: Long, inc: Long = 1L): Unit = {
    require(inc >= 0, "increment must be non-negative")
    _streamLength += inc
    var min = Long.MaxValue
    var r = 0
    while (r < rows) { val v = table(cell(key, r)); if (v < min) min = v; r += 1 }
    val target = min + inc
    r = 0
    while (r < rows) {
      val c = cell(key, r)
      if (table(c) < target) table(c) = target
      r += 1
    }
  }

  /** Estimate = min over rows (CountMin.java:131-141). */
  def estimate(key: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < rows) { val v = table(cell(key, r)); if (v < min) min = v; r += 1 }
    min
  }

  def upperBound(key: Long): Long = estimate(key)
  def lowerBound(key: Long): Long = math.max(0L, estimate(key) - maxError)

  /** Elementwise add (CountMin.java:190-200); geometry+seed must match. */
  def merge(other: CountMin): CountMin = {
    require(other.rows == rows && other.cols == cols && other.seed == seed,
      "cannot merge CountMin sketches with different geometry/seed")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    _streamLength += other._streamLength
    this
  }

  /** [magic][ver][rows][cols][eps][delta][seed][streamLength][table...] */
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * 4 + 8 * 4 + 8 * table.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(CountMin.Magic); bb.putInt(CountMin.SerVersion)
    bb.putInt(rows); bb.putInt(cols)
    bb.putDouble(eps); bb.putDouble(delta)
    bb.putLong(seed); bb.putLong(_streamLength)
    var i = 0
    while (i < table.length) { bb.putLong(table(i)); i += 1 }
    bb.array()
  }
}

object CountMin {
  final val Magic = 0x47434d53 // "GCMS"
  final val SerVersion = 1

  def apply(eps: Double, delta: Double, seed: Long = 42L): CountMin = {
    val rows = math.max(1, math.ceil(math.log(1.0 / delta) / math.log(2.0)).toInt)
    val cols = 2 * math.max(1, math.ceil(1.0 / eps).toInt)
    new CountMin(eps, delta, rows, cols, new Array[Long](rows * cols), 0L, seed)
  }

  def deserialize(bytes: Array[Byte]): CountMin = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == Magic, "bad CountMin magic")
    require(bb.getInt() == SerVersion, "bad CountMin version")
    val rows = bb.getInt(); val cols = bb.getInt()
    val eps = bb.getDouble(); val delta = bb.getDouble()
    val seed = bb.getLong(); val n = bb.getLong()
    val table = new Array[Long](rows * cols)
    var i = 0
    while (i < table.length) { table(i) = bb.getLong(); i += 1 }
    new CountMin(eps, delta, rows, cols, table, n, seed)
  }
}
