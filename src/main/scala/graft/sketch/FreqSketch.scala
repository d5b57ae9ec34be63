package graft.sketch

import graft.core.Murmur3

/** Misra-Gries frequent-items sketch over a stream of (key: Long, inc: Long).
  *
  * Semantics grafted from the reference's FrequencyEstimator contract
  * (`FrequencyEstimator.java:26-119`) and FrequentItems implementation
  * (`FrequentItems.java:235-332`): bounded state of ~k counters; when the
  * table exceeds capacity, every counter is decremented by (approximately)
  * the median of a sample and non-positive counters are purged
  * (`FrequentItems.java:268-289`), the total decrement tracked in `offset`;
  * estimates are counter+offset with deterministic containment bounds; merge
  * replays the other sketch's counters and accumulates its max error
  * (`FrequentItems.java:292-308`) — the error-composition law that makes the
  * sketch a lawful Spark partial/final aggregation buffer.
  *
  * The counter table is an open-addressing long→long map with linear probing
  * and backward-shift deletion, modeled on the production variant the
  * reference uses (`HashMapReverseEfficient.java:42-118`,
  * chosen at `FrequentItems.java:104`), structure-of-arrays layout
  * (`HashMap.java:32-34`).
  */
final class FreqSketch private (
    val k: Int,
    private var keys: Array[Long],
    private var values: Array[Long],
    private var occupied: Array[Boolean],
    private var mask: Int,
    private var size: Int,
    private var _offset: Long,
    private var _mergeError: Long,
    private var _streamLength: Long
) extends Serializable {

  import FreqSketch._

  def this(k: Int) = {
    this(k, null, null, null, 0, 0, 0L, 0L, 0L)
    require(k > 0, "k must be positive")
    val cap = tableCapFor(k)
    keys = new Array[Long](cap)
    values = new Array[Long](cap)
    occupied = new Array[Boolean](cap)
    mask = cap - 1
  }

  @inline private def maxSize: Int = k

  def streamLength: Long = _streamLength
  def offset: Long = _offset
  def mergeError: Long = _mergeError
  def numActive: Int = size
  def isEmpty: Boolean = _streamLength == 0

  /** Upper bound on |estimate - true| (reference `getMaxError`,
    * FrequencyEstimator.java:63-66): offset + accumulated merge error. */
  def maxError: Long = _offset + _mergeError

  /** update(key, 1) */
  def update(key: Long): Unit = update(key, 1L)

  /** Reference FrequentItems.update (FrequentItems.java:235-260). */
  def update(key: Long, increment: Long): Unit = {
    require(increment >= 0, "increment must be non-negative")
    if (increment == 0) return
    _streamLength += increment
    val idx = find(key)
    if (idx >= 0) {
      values(idx) += increment
    } else {
      insert(key, increment + _offset)
      if (size > maxSize) purge()
    }
  }

  /** Decrement-all by sampled median + drop non-positive
    * (FrequentItems.java:268-289; sample size 256 per `:83`). */
  private def purge(): Unit = {
    val sampleSize = math.min(SampleSize, size)
    val sample = new Array[Long](sampleSize)
    var seen = 0
    var i = 0
    while (i < keys.length && seen < sampleSize) {
      if (occupied(i)) { sample(seen) = values(i); seen += 1 }
      i += 1
    }
    java.util.Arrays.sort(sample, 0, seen)
    val median = sample(seen / 2)
    _offset = median
    // rebuild keeping values > median (backward-shift deletion semantics;
    // rebuild is simpler and equally O(cap))
    val ok = keys; val ov = values; val oo = occupied
    keys = new Array[Long](ok.length)
    values = new Array[Long](ok.length)
    occupied = new Array[Boolean](ok.length)
    size = 0
    i = 0
    while (i < ok.length) {
      if (oo(i) && ov(i) > median) insert(ok(i), ov(i))
      i += 1
    }
  }

  /** Estimated count (FrequentItems.java:193-205): the stored counter
    * (counters store value+offset-at-insert, reference FrequentItems.java:250,
    * and are returned directly, :200). 0 for absent keys. */
  def estimate(key: Long): Long = {
    val idx = find(key)
    if (idx >= 0) values(idx) else 0L
  }

  /** For tracked keys: stored counter + merge error (reference formula,
    * FrequentItems.java:207-213). For ABSENT keys the reference returns
    * 0 + mergeError, which is not a sound bound — an evicted key may have
    * lost up to `offset` mass (MG decrement total); we return
    * offset + mergeError so LB <= true <= UB holds deterministically for
    * EVERY key (documented deviation, verified by the oracle tests). */
  def upperBound(key: Long): Long = {
    val idx = find(key)
    (if (idx >= 0) values(idx) else _offset) + _mergeError
  }

  def lowerBound(key: Long): Long = {
    val lb = estimate(key) - _offset - _mergeError
    if (lb < 0) 0 else lb
  }

  /** Keys whose upper bound ≥ threshold — a superset of the true heavy
    * hitters (FrequentItems.java:311-332). Returned sorted by estimate
    * descending, then key ascending (deterministic). */
  def frequentKeys(threshold: Long): Array[(Long, Long, Long, Long)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](size)
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) {
        val key = keys(i)
        val est = values(i)
        val ub = est + _mergeError
        if (ub >= threshold) {
          val lb = math.max(0L, est - _offset - _mergeError)
          out += ((key, lb, est, ub))
        }
      }
      i += 1
    }
    out.sortBy(t => (-t._3, t._1)).toArray
  }

  /** Merge (FrequentItems.java:292-308): accumulate other's stream length
    * and max error, replay its counters. Associative + commutative up to
    * the documented error bounds. */
  def merge(other: FreqSketch): FreqSketch = {
    require(other.k == k, s"cannot merge sketches of different k: $k vs ${other.k}")
    if (other.isEmpty) return this
    _streamLength += other._streamLength
    _mergeError += other.maxError
    var i = 0
    while (i < other.keys.length) {
      if (other.occupied(i)) {
        val key = other.keys(i)
        val inc = other.values(i)
        val idx = find(key)
        if (idx >= 0) values(idx) += inc
        else {
          insert(key, inc + _offset)
          if (size > maxSize) purge()
        }
      }
      i += 1
    }
    this
  }

  // ------------------------------------------------------------- open table

  @inline private def probeStart(key: Long): Int =
    (Murmur3.fmix64(key).toInt) & mask

  /** Linear probe; returns slot index or -1. */
  private def find(key: Long): Int = {
    var i = probeStart(key)
    while (occupied(i)) {
      if (keys(i) == key) return i
      i = (i + 1) & mask
    }
    -1
  }

  private def insert(key: Long, value: Long): Unit = {
    var i = probeStart(key)
    while (occupied(i)) i = (i + 1) & mask
    keys(i) = key; values(i) = value; occupied(i) = true
    size += 1
  }

  // ------------------------------------------------------------------ serde

  /** Byte image: fixed preamble then keys column then values column —
    * the layout discipline of the reference's preamble serde
    * (`PreambleUtil.java:29-47`, `FrequentItems.java:444-494`):
    * [magic:int][version:int][k:int][size:int]
    * [offset:long][mergeError:long][streamLength:long]
    * [keys:long*size][values:long*size]   (values stored WITH offset) */
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(PreambleBytes + 16 * size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic); bb.putInt(SerVersion); bb.putInt(k); bb.putInt(size)
    bb.putLong(_offset); bb.putLong(_mergeError); bb.putLong(_streamLength)
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) bb.putLong(keys(i))
      i += 1
    }
    i = 0
    while (i < keys.length) {
      if (occupied(i)) bb.putLong(values(i))
      i += 1
    }
    bb.array()
  }

  /** Human-readable exact image (reference F7 debug surface,
    * `FrequentItems.java:382-419` toString / StringToFrequentItems):
    * header of the scalar state, then `key:storedValue` pairs sorted by
    * key (deterministic — the open table's physical order is not).
    * Round-trips exactly through [[FreqSketch.fromString]]. */
  override def toString: String = {
    val sb = new StringBuilder
    sb.append(k).append(',').append(_offset).append(',')
      .append(_mergeError).append(',').append(_streamLength)
      .append(',').append(size)
    val pairs = new scala.collection.mutable.ArrayBuffer[(Long, Long)](size)
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) pairs += ((keys(i), values(i)))
      i += 1
    }
    pairs.sortBy(_._1).foreach { case (kk, v) =>
      sb.append(',').append(kk).append(':').append(v)
    }
    sb.toString()
  }

  private[sketch] def insertRaw(key: Long, storedValue: Long): Unit = {
    insert(key, storedValue)
  }

  private[sketch] def setMeta(offset: Long, mergeError: Long, streamLength: Long): Unit = {
    _offset = offset; _mergeError = mergeError; _streamLength = streamLength
  }
}

object FreqSketch {
  /** Reference samples at most 256 values for the purge median
    * (FrequentItems.java:83). */
  final val SampleSize = 256
  final val Magic = 0x47465153 // "GFQS"
  final val SerVersion = 1
  final val PreambleBytes = 4 * 4 + 3 * 8

  /** Table capacity: next pow2 ≥ k/0.75 (load factor per HashMap.java:26). */
  private[sketch] def tableCapFor(k: Int): Int = {
    var cap = 8
    while (cap * 3 / 4 <= k) cap <<= 1
    cap
  }

  def apply(k: Int): FreqSketch = new FreqSketch(k)

  /** Inverse of [[FreqSketch#toString]] (reference
    * `FrequentItems.StringToFrequentItems`, FrequentItems.java:397-419). */
  def fromString(s: String): FreqSketch = {
    val tokens = s.split(",")
    require(tokens.length >= 5,
      s"FreqSketch string needs >= 5 header fields, got ${tokens.length}")
    val sk = new FreqSketch(tokens(0).toInt)
    val n = tokens(4).toInt
    require(tokens.length == 5 + n,
      s"FreqSketch string declares $n entries but carries ${tokens.length - 5}")
    var i = 0
    while (i < n) {
      val kv = tokens(5 + i).split(":")
      sk.insertRaw(kv(0).toLong, kv(1).toLong)
      i += 1
    }
    sk.setMeta(tokens(1).toLong, tokens(2).toLong, tokens(3).toLong)
    sk
  }

  def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic, s"bad FreqSketch magic: $magic")
    val ver = bb.getInt()
    require(ver == SerVersion, s"bad FreqSketch version: $ver")
    val k = bb.getInt()
    val n = bb.getInt()
    val offset = bb.getLong()
    val mergeError = bb.getLong()
    val streamLength = bb.getLong()
    val sk = new FreqSketch(k)
    val ks = new Array[Long](n)
    var i = 0
    while (i < n) { ks(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < n) {
      // insert raw stored values (already offset-adjusted)
      sk.insertRaw(ks(i), bb.getLong())
      i += 1
    }
    sk.setMeta(offset, mergeError, streamLength)
    sk
  }
}
