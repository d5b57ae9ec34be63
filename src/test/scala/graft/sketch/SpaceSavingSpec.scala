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
