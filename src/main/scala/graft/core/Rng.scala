package graft.core

/** Counter-based deterministic PRNG (SplitMix64, public algorithm).
  *
  * Mirrors the reference's fixed-seed synthetic-data discipline
  * (`HashMapTest.java:37-38` seed=422; `experiment/make_data.py:1-33`):
  * every random draw is a pure function of (seed, stream, counter), so corpus
  * generation is deterministic under any Spark partitioning and any
  * parallelism level — a requirement for the local[8] ≡ local[32] tests.
  */
final class Rng(seed: Long, stream: Long) {
  private var counter: Long = Murmur3.fmix64(seed ^ Murmur3.fmix64(stream))

  @inline def nextLong(): Long = {
    counter += 0x9e3779b97f4a7c15L
    var z = counter
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, bound). */
  @inline def nextInt(bound: Int): Int = {
    require(bound > 0)
    (java.lang.Long.remainderUnsigned(nextLong(), bound)).toInt
  }

  /** Uniform in [0.0, 1.0). */
  @inline def nextDouble(): Double =
    (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform in [lo, hi). */
  @inline def nextDoubleIn(lo: Double, hi: Double): Double =
    lo + nextDouble() * (hi - lo)

  /** Zipf-ish rank sampler over [0, n): P(r) ∝ 1/(r+1)^alpha, via rejection-free
    * inverse-CDF approximation (adequate for cluster-size shaping, mirrors
    * reference make_data.py:15-20 zipfian streams). */
  def nextZipf(n: Int, alpha: Double): Int = {
    // inverse-CDF of the continuous approximation
    val u = nextDouble()
    if (alpha == 1.0) {
      math.min(n - 1, (math.pow(n.toDouble, u) - 1).toInt)
    } else {
      val a1 = 1.0 - alpha
      val x = math.pow(u * (math.pow(n.toDouble, a1) - 1) + 1, 1.0 / a1) - 1
      math.min(n - 1, math.max(0, x.toInt))
    }
  }
}

object Rng {
  def apply(seed: Long, stream: Long*): Rng = {
    var s = seed
    stream.foreach(x => s = Murmur3.fmix64(s ^ Murmur3.fmix64(x)))
    new Rng(s, 0L)
  }
}
