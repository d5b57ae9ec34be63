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
  * Cost model: the reference ships both an O(s)-probe variant
  * (`SpaceSaving.java`) and the production-shaped O(log s) one
  * (`SpaceSavingGood.java:49-287`, hash index + priority queue). This class
  * follows the latter: counters live in a min-heap keyed by count, with a
  * key→heap-slot hash index — update/evict are O(log s), membership O(1),
  * instead of the r2 implementation's O(s) linear scans per row.
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
    private var keys: Array[Long],   // min-heap order by counts
    private var counts: Array[Long],
    private var errs: Array[Long],
    private var size: Int,
    private var _streamLength: Long
) extends Serializable {

  def this(s: Int) = {
    this(s, new Array[Long](math.max(s, 0)), new Array[Long](math.max(s, 0)),
      new Array[Long](math.max(s, 0)), 0, 0L)
    require(s > 0, "s must be positive")
  }

  /** key → heap slot; rebuilt on deserialize. */
  @transient private var slotOf: java.util.HashMap[java.lang.Long, java.lang.Integer] = _
  private def index: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    var m = slotOf
    if (m == null) {
      m = new java.util.HashMap[java.lang.Long, java.lang.Integer](2 * s)
      var i = 0
      while (i < size) { m.put(keys(i), i); i += 1 }
      slotOf = m
    }
    m
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

  // ------------------------------------------------------- heap maintenance

  private def swap(i: Int, j: Int): Unit = {
    val k = keys(i); keys(i) = keys(j); keys(j) = k
    val c = counts(i); counts(i) = counts(j); counts(j) = c
    val e = errs(i); errs(i) = errs(j); errs(j) = e
    val m = index
    m.put(keys(i), i)
    m.put(keys(j), j)
  }

  /** Restore heap order downward after counts(i) grew. */
  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && counts(l) < counts(m)) m = l
      if (r < size && counts(r) < counts(m)) m = r
      if (m == i) done = true
      else { swap(i, m); i = m }
    }
  }

  /** Restore heap order upward after inserting at slot i. */
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && counts((i - 1) / 2) > counts(i)) {
      swap(i, (i - 1) / 2)
      i = (i - 1) / 2
    }
  }

  /** Establish the heap property + index over arbitrary array content
    * (merge/deserialize rebuild path). */
  private def heapify(): Unit = {
    slotOf = null
    var i = size / 2 - 1
    while (i >= 0) {
      // plain sift-down without index updates first; index built after
      var j = i
      var done = false
      while (!done) {
        val l = 2 * j + 1
        val r = l + 1
        var m = j
        if (l < size && counts(l) < counts(m)) m = l
        if (r < size && counts(r) < counts(m)) m = r
        if (m == j) done = true
        else {
          val k = keys(j); keys(j) = keys(m); keys(m) = k
          val c = counts(j); counts(j) = counts(m); counts(m) = c
          val e = errs(j); errs(j) = errs(m); errs(m) = e
          j = m
        }
      }
      i -= 1
    }
  }

  // --------------------------------------------------------------- updates

  def update(key: Long): Unit = update(key, 1L)

  /** Reference SpaceSaving update semantics (`SpaceSaving.java:91-129`)
    * with `SpaceSavingGood`'s O(log s) mechanics. */
  def update(key: Long, inc: Long): Unit = {
    require(inc >= 0, "increment must be non-negative")
    if (inc == 0) return
    _streamLength += inc
    val slot = index.get(key)
    if (slot != null) {
      val i = slot.intValue()
      counts(i) += inc
      siftDown(i)
    } else if (size < s) {
      keys(size) = key; counts(size) = inc; errs(size) = 0L
      index.put(key, size)
      size += 1
      siftUp(size - 1)
    } else {
      // evict the heap min: the new key inherits its count as error
      val err = counts(0)
      index.remove(keys(0))
      keys(0) = key
      errs(0) = err
      counts(0) = err + inc
      index.put(key, 0)
      siftDown(0)
    }
  }

  /** Overestimate: count if monitored, else the min count (any untracked
    * key may have been absorbed up to that many times). */
  def estimate(key: Long): Long = {
    val slot = index.get(key)
    if (slot != null) counts(slot.intValue())
    else if (size < s) 0L
    else counts(0)
  }

  /** Guaranteed lower bound: count - inherited error. */
  def lowerBound(key: Long): Long = {
    val slot = index.get(key)
    if (slot != null) counts(slot.intValue()) - errs(slot.intValue()) else 0L
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
    val myMin = if (size < s) 0L else counts(0)
    val otherMin = if (other.size < other.s) 0L else other.counts(0)
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
    out.heapify()
    out
  }

  /** Byte image: [s, size, streamLength, keys.., counts.., errs..] —
    * preamble-then-columns like the reference byte layouts
    * (`FrequentItems.java:444-455`). Entry order is the heap layout;
    * deserialize re-heapifies, so images from any version load. */
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

  /** Hard cap on the counter table (512M counters ≈ 12 GB of longs): a
    * mis-parameterized errTol must fail fast, not OOM (ADVICE r2). */
  final val MaxTableSize: Int = 1 << 29

  def apply(s: Int): SpaceSaving = {
    require(s > 0, s"s must be positive, got $s")
    require(s <= MaxTableSize, s"s too large: $s > $MaxTableSize")
    new SpaceSaving(s)
  }

  /** s from the reference's error-tolerance parameterization
    * (`SpaceSaving.java:70-71`): s = floor(1/errTol) + 1. */
  def forTolerance(errTol: Double): SpaceSaving = {
    require(errTol > 0 && errTol < 1, s"errTol in (0,1), got $errTol")
    val sLong = (1.0 / errTol).toLong + 1L
    require(sLong <= MaxTableSize, s"errTol $errTol requests $sLong counters > $MaxTableSize")
    apply(sLong.toInt)
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
    out.heapify()
    out
  }
}
