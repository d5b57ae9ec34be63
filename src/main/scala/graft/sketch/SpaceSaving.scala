package graft.sketch

/** SpaceSaving (Metwally-Agrawal-El Abbadi) heavy-hitter sketch over a
  * stream of (key: Long, inc: Long).
  *
  * Semantics grafted from the reference's SpaceSaving
  * (`SpaceSaving.java:24-27,70-71,91-129`): a bounded table of `s` monitored
  * counters; an untracked key evicts the minimum counter, inheriting its
  * count as overestimation error (est ∈ [true, true + F/s], F = stream
  * length). The reference's own comment (`SpaceSaving.java:41-42`) notes
  * SpaceSaving and Misra-Gries summaries are isomorphic (SS count = MG
  * count + offset); the engine's production heavy-hitter path is
  * [[FreqSketch]] (SURVEY.md §2.1 F19) — this class completes the
  * reference surface and is exact (and therefore DuckDB-oracle-able)
  * whenever `s` exceeds the number of distinct keys.
  *
  * Distributed merge: keys in both tables add counts and errors; a key
  * present in only one side additionally inherits the other side's minimum
  * count as error (the other stream may have counted it up to that many
  * times unseen — the standard overestimate-preserving composition). The
  * merged table then truncates back to the top-s counts. Both the
  * never-underestimate invariant (est >= true) and the per-key lower bound
  * (est - err <= true) survive this composition, so the sketch is a lawful
  * partial/final aggregation buffer like the reference's merge law
  * (`FrequencyEstimator.java:86`).
  */
final class SpaceSaving private (
    val s: Int,
    private var keys: Array[Long],
    private var counts: Array[Long],
    private var errs: Array[Long],
    private var size: Int,
    private var _streamLength: Long
) extends Serializable {

  def this(s: Int) = {
    this(s, new Array[Long](s), new Array[Long](s), new Array[Long](s), 0, 0L)
    require(s > 0, "s must be positive")
  }

  def streamLength: Long = _streamLength
  def numActive: Int = size
  def isEmpty: Boolean = _streamLength == 0

  /** True iff no eviction has ever happened (all counts exact). */
  def isExact: Boolean = {
    var i = 0
    while (i < size) { if (errs(i) != 0) return false; i += 1 }
    true
  }

  private def indexOf(key: Long): Int = {
    var i = 0
    while (i < size) { if (keys(i) == key) return i; i += 1 }
    -1
  }

  private def minIndex: Int = {
    var m = 0
    var i = 1
    while (i < size) { if (counts(i) < counts(m)) m = i; i += 1 }
    m
  }

  def update(key: Long): Unit = update(key, 1L)

  /** Reference SpaceSaving.update (`SpaceSaving.java:91-129`). */
  def update(key: Long, inc: Long): Unit = {
    require(inc >= 0, "increment must be non-negative")
    if (inc == 0) return
    _streamLength += inc
    val i = indexOf(key)
    if (i >= 0) counts(i) += inc
    else if (size < s) {
      keys(size) = key; counts(size) = inc; errs(size) = 0L; size += 1
    } else {
      val m = minIndex
      val err = counts(m)
      keys(m) = key
      errs(m) = err
      counts(m) = err + inc
    }
  }

  /** Overestimate: count if monitored, else the min count (any untracked
    * key may have been absorbed up to that many times). */
  def estimate(key: Long): Long = {
    val i = indexOf(key)
    if (i >= 0) counts(i)
    else if (size < s) 0L
    else counts(minIndex)
  }

  /** Guaranteed lower bound: count - inherited error. */
  def lowerBound(key: Long): Long = {
    val i = indexOf(key)
    if (i >= 0) counts(i) - errs(i) else 0L
  }

  /** Keys whose estimate >= threshold, as (key, lb, est) sorted by
    * (est desc, key asc). */
  def frequentKeys(threshold: Long): Array[(Long, Long, Long)] =
    (0 until size).iterator
      .filter(i => counts(i) >= threshold)
      .map(i => (keys(i), counts(i) - errs(i), counts(i)))
      .toArray
      .sortBy { case (key, _, est) => (-est, key) }

  /** Overestimate-preserving distributed merge (see class doc). */
  def merge(other: SpaceSaving): SpaceSaving = {
    require(other.s == s, "cannot merge sketches of different s")
    if (other.isEmpty) return this
    val myMin = if (size < s) 0L else counts(minIndex)
    val otherMin = if (other.size < other.s) 0L else other.counts(other.minIndex)
    val acc = new java.util.HashMap[Long, Array[Long]](size + other.size)
    var i = 0
    while (i < size) {
      acc.put(keys(i), Array(counts(i) + otherMin, errs(i) + otherMin))
      i += 1
    }
    i = 0
    while (i < other.size) {
      val k = other.keys(i)
      val prev = acc.get(k)
      if (prev != null) {
        // present in both: real counts add; the otherMin padding added
        // above no longer applies to this key
        prev(0) += other.counts(i) - otherMin
        prev(1) += other.errs(i) - otherMin
      } else {
        acc.put(k, Array(other.counts(i) + myMin, other.errs(i) + myMin))
      }
      i += 1
    }
    val entries = new Array[(Long, Long, Long)](acc.size())
    val it = acc.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    val kept = entries.sortBy { case (k, c, _) => (-c, k) }.take(s)
    val out = new SpaceSaving(s)
    i = 0
    while (i < kept.length) {
      out.keys(i) = kept(i)._1
      out.counts(i) = kept(i)._2
      out.errs(i) = kept(i)._3
      i += 1
    }
    out.size = kept.length
    out._streamLength = _streamLength + other._streamLength
    out
  }

  /** Byte image: [s, size, streamLength, keys.., counts.., errs..] —
    * preamble-then-columns like the reference byte layouts
    * (`FrequentItems.java:444-455`). */
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (3 + 3 * size))
    bb.putLong(s.toLong).putLong(size.toLong).putLong(_streamLength)
    var i = 0
    while (i < size) { bb.putLong(keys(i)); i += 1 }
    i = 0
    while (i < size) { bb.putLong(counts(i)); i += 1 }
    i = 0
    while (i < size) { bb.putLong(errs(i)); i += 1 }
    bb.array()
  }
}

object SpaceSaving {
  def apply(s: Int): SpaceSaving = new SpaceSaving(s)

  /** s from the reference's error-tolerance parameterization
    * (`SpaceSaving.java:70-71`): s = floor(1/errTol) + 1. */
  def forTolerance(errTol: Double): SpaceSaving = {
    require(errTol > 0 && errTol < 1, "errTol in (0,1)")
    new SpaceSaving((1.0 / errTol).toInt + 1)
  }

  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = bb.getLong.toInt
    val size = bb.getLong.toInt
    val sl = bb.getLong
    val out = new SpaceSaving(s)
    var i = 0
    while (i < size) { out.keys(i) = bb.getLong; i += 1 }
    i = 0
    while (i < size) { out.counts(i) = bb.getLong; i += 1 }
    i = 0
    while (i < size) { out.errs(i) = bb.getLong; i += 1 }
    out.size = size
    out._streamLength = sl
    out
  }
}
