package graft.sketch

/** CountMin with frequent-key tracking — the "approximate `HAVING count(*)
  * >= t`" surface that enumerates heavy-hitter CANDIDATES from a linear
  * sketch in one pass, without a second scan of the stream.
  *
  * Semantics grafted from the reference's CountMinFastFE
  * (`CountMinFastFE.java:162-179` update-time tracking, `:209-239` purge,
  * `:330-357` merge re-filter, `:370-392` getFrequentKeys): a key enters the
  * candidate set whenever its post-update estimate reaches ε·update_sum; the
  * set is purged back (re-filtered by the current ε·update_sum) when it
  * outgrows 2/ε; merge adds the linear tables, unions the candidate sets and
  * re-filters against the merged threshold. Mechanics are this engine's own
  * (composition over [[CountMin]], boxed hash set, columnar serde).
  *
  * Guarantee (the classic CM-FE containment, and why the distributed
  * aggregation is lawful): any key whose TRUE global count is >= ε·N
  * survives to the final candidate set under an arbitrary merge tree — by
  * the mediant inequality, some leaf partition has the key at local ratio
  * >= its global ratio >= ε (so it enters there, checked at its last local
  * update), and one can pick a root-to-leaf path along which every node's
  * ratio >= ε, so every intermediate re-filter keeps it (estimates never
  * underestimate). `frequentKeys(t)` with t >= ε·N therefore misses nothing;
  * false candidates are killed by the final estimate filter.
  */
final class CountMinFE private (
    val cm: CountMin,
    private val cands: java.util.HashSet[java.lang.Long]
) extends Serializable {

  def this(eps: Double, delta: Double, seed: Long) =
    this(CountMin(eps, delta, seed), new java.util.HashSet[java.lang.Long]())

  /** Candidate-set purge trigger: floor(2/ε) like the reference
    * (`CountMinFastFE.java:118-120`). */
  val freqLimit: Int = {
    val l = 2.0 / cm.eps
    if (l >= Int.MaxValue) Int.MaxValue else math.max(2, l.toInt)
  }

  def streamLength: Long = cm.streamLength
  def isEmpty: Boolean = cm.isEmpty
  def numCandidates: Int = cands.size()
  def estimate(key: Long): Long = cm.estimate(key)
  def maxError: Long = cm.maxError

  private def track(key: Long): Unit = {
    if (cm.estimate(key) >= cm.eps * cm.streamLength) {
      cands.add(key)
      if (cands.size() > freqLimit) purge()
    }
  }

  def update(key: Long, inc: Long = 1L): Unit = {
    cm.update(key, inc)
    track(key)
  }

  /** Estan-Varghese conservative update with the same tracking. */
  def conservativeUpdate(key: Long, inc: Long = 1L): Unit = {
    cm.conservativeUpdate(key, inc)
    track(key)
  }

  /** Drop candidates whose estimate fell below the CURRENT ε·update_sum
    * (`CountMinFastFE.java:209-239`: estimates only grow, but the threshold
    * grows with the stream, so earlier entrants can become spurious). */
  def purge(): Unit = {
    val threshold = (cm.eps * cm.streamLength).toLong
    val it = cands.iterator()
    while (it.hasNext) {
      if (cm.estimate(it.next().longValue()) < threshold) it.remove()
    }
  }

  /** Candidates whose estimate >= threshold, as (key, lb, est) sorted by
    * (est desc, key asc); lb = est - ⌈ε·n⌉ clamped at 0 (the CountMin
    * deterministic bound). Complete for threshold >= ε·n (see class doc). */
  def frequentKeys(threshold: Long): Array[(Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val it = cands.iterator()
    while (it.hasNext) {
      val k = it.next().longValue()
      val est = cm.estimate(k)
      if (est >= threshold) out += ((k, math.max(0L, est - cm.maxError), est))
    }
    out.sortBy { case (key, _, est) => (-est, key) }.toArray
  }

  /** Linear-table add + candidate union re-filtered by the merged
    * ε·update_sum (`CountMinFastFE.java:330-357`). Mutates and returns this. */
  def merge(other: CountMinFE): CountMinFE = {
    cm.merge(other.cm)
    cands.addAll(other.cands)
    val threshold = (cm.eps * cm.streamLength).toLong
    val it = cands.iterator()
    while (it.hasNext) {
      if (cm.estimate(it.next().longValue()) < threshold) it.remove()
    }
    this
  }

  /** [cmLen][cm bytes][nCands][candidate keys...] (little-endian). */
  def serialize(): Array[Byte] = {
    val cmBytes = cm.serialize()
    val bb = java.nio.ByteBuffer.allocate(4 + cmBytes.length + 4 + 8 * cands.size())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(cmBytes.length)
    bb.put(cmBytes)
    bb.putInt(cands.size())
    val it = cands.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }
}

object CountMinFE {
  def apply(eps: Double, delta: Double, seed: Long = 42L): CountMinFE =
    new CountMinFE(eps, delta, seed)

  def deserialize(bytes: Array[Byte]): CountMinFE = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val cmLen = bb.getInt()
    val cmBytes = new Array[Byte](cmLen)
    bb.get(cmBytes)
    val cm = CountMin.deserialize(cmBytes)
    val n = bb.getInt()
    val cands = new java.util.HashSet[java.lang.Long](math.max(16, 2 * n))
    var i = 0
    while (i < n) { cands.add(bb.getLong()); i += 1 }
    new CountMinFE(cm, cands)
  }
}
