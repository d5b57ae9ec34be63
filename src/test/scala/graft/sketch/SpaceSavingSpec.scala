package graft.sketch

import graft.core.Rng
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-vs-sketch randomized tests for SpaceSaving (reference
  * SpaceSaving.java), same exact-map-in-lockstep method as the reference's
  * MasterFETest. */
class SpaceSavingSpec extends AnyFunSuite {

  private def zipfStream(n: Int, universe: Int, theta: Double, seed: Long): Array[Long] = {
    val rng = Rng(seed, 33)
    Array.fill(n)(rng.nextZipf(universe, theta).toLong)
  }

  private def exactCounts(stream: Array[Long]): Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("exact when s > |distinct|; frequentKeys equals exact top list") {
    val stream = zipfStream(20000, 300, 1.1, 1)
    val ss = SpaceSaving(512)
    stream.foreach(ss.update(_))
    assert(ss.isExact)
    val exact = exactCounts(stream)
    exact.foreach { case (k, c) => assert(ss.estimate(k) == c) }
    val hh = ss.frequentKeys(50L)
    val expected = exact.filter(_._2 >= 50L).toSeq
      .sortBy { case (k, c) => (-c, k) }
    assert(hh.map(t => (t._1, t._3)).toSeq == expected)
  }

  test("never underestimates; est - lb bounds the error; F/s overestimate bound") {
    val stream = zipfStream(100000, 5000, 1.1, 2)
    val s = 100
    val ss = SpaceSaving(s)
    stream.foreach(ss.update(_))
    val exact = exactCounts(stream)
    val bound = stream.length.toLong / s
    exact.foreach { case (k, c) =>
      val est = ss.estimate(k)
      assert(est >= c, s"SS underestimated $k: $est < $c")
      assert(est <= c + bound, s"overestimate above F/s for $k")
      assert(ss.lowerBound(k) <= c, s"lower bound above truth for $k")
    }
  }

  test("merge across random splits keeps the invariants and finds hot keys") {
    val stream = zipfStream(60000, 3000, 1.1, 3)
    val exact = exactCounts(stream)
    val rng = Rng(9, 1)
    val parts = Array.fill(7)(SpaceSaving(200))
    stream.foreach(k => parts(((rng.nextLong() >>> 1) % 7).toInt).update(k))
    val merged = parts.reduce(_ merge _)
    assert(merged.streamLength == stream.length)
    exact.foreach { case (k, c) =>
      assert(merged.estimate(k) >= c, s"merged SS underestimated $k")
    }
    // every true heavy hitter above the merged error mass must surface
    val hot = exact.filter(_._2 >= 2L * stream.length / 200).keySet
    val found = merged.frequentKeys(1L).map(_._1).toSet
    assert(hot.subsetOf(found), s"missing hot keys: ${hot -- found}")
  }

  test("invalid parameters fail fast with IllegalArgumentException") {
    // ADVICE r2: SpaceSaving(-1) used to throw NegativeArraySizeException
    // from the pre-require allocation; validation now runs in the companion
    intercept[IllegalArgumentException](SpaceSaving(-1))
    intercept[IllegalArgumentException](SpaceSaving(0))
    intercept[IllegalArgumentException](SpaceSaving.forTolerance(0.0))
    intercept[IllegalArgumentException](SpaceSaving.forTolerance(1.5))
    // absurdly small tolerance must refuse, not attempt a huge allocation
    intercept[IllegalArgumentException](SpaceSaving.forTolerance(1e-12))
  }

  test("heap-order update matches a sequential linear-scan oracle exactly") {
    // the O(log s) heap must EVICT THE MINIMUM like the O(s) scan did:
    // lockstep against a tiny reference implementation of the same policy
    val stream = zipfStream(30000, 900, 1.0, 7)
    val s = 64
    val ss = SpaceSaving(s)
    // oracle: naive parallel arrays + linear scans (the r2 implementation)
    val ks = new Array[Long](s); val cs = new Array[Long](s); val es = new Array[Long](s)
    var size = 0
    def naiveUpdate(key: Long): Unit = {
      var i = 0; var found = -1
      while (i < size && found < 0) { if (ks(i) == key) found = i; i += 1 }
      if (found >= 0) cs(found) += 1
      else if (size < s) { ks(size) = key; cs(size) = 1; es(size) = 0; size += 1 }
      else {
        var m = 0; i = 1
        while (i < size) { if (cs(i) < cs(m)) m = i; i += 1 }
        val err = cs(m); ks(m) = key; es(m) = err; cs(m) = err + 1
      }
    }
    // NOTE: when several counters tie at the minimum the two policies may
    // evict different victims — the SUMMARIES can then differ on exactly
    // which min-count key is monitored, but the min COUNT (and so every
    // estimate bound) is identical. Assert the bound-level equivalence.
    stream.foreach { k => ss.update(k); naiveUpdate(k) }
    val naiveMin = (0 until size).map(cs(_)).min
    assert(ss.estimate(Long.MinValue) == naiveMin, "untracked estimate = min count must match")
    val exact = exactCounts(stream)
    exact.foreach { case (k, c) =>
      assert(ss.estimate(k) >= c)
    }
  }

  test("serde roundtrip preserves estimates") {
    val stream = zipfStream(5000, 400, 0.7, 4)
    val ss = SpaceSaving(64)
    stream.foreach(ss.update(_))
    val back = SpaceSaving.deserialize(ss.serialize())
    assert(back.streamLength == ss.streamLength)
    exactCounts(stream).keys.foreach { k =>
      assert(back.estimate(k) == ss.estimate(k))
      assert(back.lowerBound(k) == ss.lowerBound(k))
    }
  }
}
