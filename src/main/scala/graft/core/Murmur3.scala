package graft.core

/** Canonical 64/128-bit hashing for the whole engine.
  *
  * The reference (DataSketches/experimental) outsources hashing to
  * `com.yahoo.datasketches:sketches-core` MurmurHash3 (reference
  * `pom.xml:158-162`, used at `StreamHandler.java:22`,
  * `CountMin.java:118-121`). That dependency is not available offline, and
  * determinism of every signature (MinHash, SimHash, LSH bands, fingerprints)
  * hinges on this file, so we implement the public MurmurHash3 x64 128-bit
  * algorithm (Austin Appleby, public domain) plus the 64-bit avalanche
  * finalizer (same finalizer family as reference `HashMap.java:266-273`).
  *
  * All functions are pure and allocation-free on the hot paths.
  */
object Murmur3 {

  /** MurmurHash3 fmix64 finalizer — full avalanche of a 64-bit value. */
  @inline def fmix64(v: Long): Long = {
    var k = v
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Cheap seeded 64-bit hash of a long (for permutation banks / band seeds). */
  @inline def hashLong(x: Long, seed: Long): Long =
    fmix64(x ^ fmix64(seed ^ 0x9e3779b97f4a7c15L))

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  /** MurmurHash3 x64 128-bit over a byte array; returns the low 64 bits.
    * Standard algorithm; tail and length-mix per the public spec. */
  def hashBytes(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    var i = 0
    while (i < nblocks) {
      val base = i * 16
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    // tail
    var k1 = 0L
    var k2 = 0L
    val tail = nblocks * 16
    val rem = len & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | (data(tail + j) & 0xffL); j -= 1 }
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (data(tail + j) & 0xffL); j -= 1 }
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len; h2 ^= len
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2
    h1
  }

  @inline private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  /** Seeded 64-bit hash of a String (UTF-16 chars folded FNV-style then
    * finalized — used where we don't need the full 128-bit mixer). */
  def hashString(s: String, seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    val n = s.length
    while (i < n) {
      h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    fmix64(h)
  }

  /** Hash of a char range [from, until) of `s` — the shingle hot path:
    * no substring allocation. */
  @inline def hashRange(s: CharSequence, from: Int, until: Int, seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    fmix64(h)
  }
}
