package graft.sketch

import graft.core.Rng
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-vs-sketch tests for CountMin-FE frequent-key tracking (reference
  * CountMinFastFE.java:162-179,370-392), same exact-map-lockstep method as
  * the reference's MasterFETest. */
class CountMinFESpec extends AnyFunSuite {

  private def zipfStream(n: Int, universe: Int, theta: Double, seed: Long): Array[Long] = {
    val rng = Rng(seed, 44)
    Array.fill(n)(rng.nextZipf(universe, theta).toLong)
  }

  private def exactCounts(stream: Array[Long]): Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("collision-free geometry: frequentKeys equals the exact HAVING list") {
    val stream = zipfStream(20000, 300, 1.1, 1)
    // eps=0.001 -> 2000 cols x 7 rows for 300 distinct keys: no full-row
    // collision at this cardinality -> estimates exact
    val fe = CountMinFE(0.001, 0.01)
    stream.foreach(fe.update(_))
    val exact = exactCounts(stream)
    exact.foreach { case (k, c) => assert(fe.estimate(k) == c, s"estimate off for $k") }
    // threshold 50 >= eps*n = 20: tracking is complete, estimates exact
    val hh = fe.frequentKeys(50L)
    val expected = exact.filter(_._2 >= 50L).toSeq.sortBy { case (k, c) => (-c, k) }
    assert(hh.map(t => (t._1, t._3)).toSeq == expected)
  }

  test("containment guarantee survives distributed merge across random splits") {
    val stream = zipfStream(60000, 1000, 1.05, 2)
    val exact = exactCounts(stream)
    val eps = 0.002
    val rng = Rng(9, 2)
    val parts = Array.fill(7)(CountMinFE(eps, 0.01))
    stream.foreach(k => parts(((rng.nextLong() >>> 1) % 7).toInt).update(k))
    val merged = parts.reduce(_ merge _)
    assert(merged.streamLength == stream.length)
    // every key with true count >= eps*N must be tracked and emitted
    val bound = math.ceil(eps * stream.length).toLong
    val mustHave = exact.filter(_._2 >= bound).keySet
    val found = merged.frequentKeys(bound).map(_._1).toSet
    assert(mustHave.subsetOf(found), s"missing guaranteed keys: ${mustHave -- found}")
    // and nothing it emits underestimates / violates the +eps*N bound
    merged.frequentKeys(bound).foreach { case (k, lb, est) =>
      val c = exact.getOrElse(k, 0L)
      assert(est >= c, s"underestimate for $k")
      assert(lb <= c, s"lower bound above truth for $k")
    }
  }

  test("purge keeps every key above eps*update_sum") {
    // eps=0.01 -> freqLimit=200 < 3000 distinct keys: purges must fire and
    // must never evict a key whose estimate clears the running threshold
    val stream = zipfStream(100000, 3000, 1.1, 3)
    val fe = CountMinFE(0.01, 0.01)
    stream.foreach(fe.update(_))
    assert(fe.numCandidates <= fe.freqLimit + 1)
    val exact = exactCounts(stream)
    val bound = math.ceil(0.01 * stream.length).toLong
    val mustHave = exact.filter(_._2 >= bound).keySet
    val found = fe.frequentKeys(bound).map(_._1).toSet
    assert(mustHave.subsetOf(found), s"purge lost guaranteed keys: ${mustHave -- found}")
  }

  test("serde roundtrip preserves estimates and candidates") {
    val stream = zipfStream(5000, 200, 0.9, 4)
    val fe = CountMinFE(0.005, 0.01)
    stream.foreach(fe.update(_))
    val back = CountMinFE.deserialize(fe.serialize())
    assert(back.streamLength == fe.streamLength)
    assert(back.numCandidates == fe.numCandidates)
    exactCounts(stream).keys.foreach { k =>
      assert(back.estimate(k) == fe.estimate(k))
    }
    assert(back.frequentKeys(25L).toSeq == fe.frequentKeys(25L).toSeq)
  }

  test("conservative update tracks identically and never underestimates") {
    val stream = zipfStream(30000, 500, 1.1, 5)
    val fe = CountMinFE(0.001, 0.01)
    stream.foreach(k => fe.conservativeUpdate(k))
    val exact = exactCounts(stream)
    exact.foreach { case (k, c) => assert(fe.estimate(k) >= c) }
    val bound = math.ceil(0.001 * stream.length).toLong
    val mustHave = exact.filter(_._2 >= math.max(bound, 30L)).keySet
    val found = fe.frequentKeys(math.max(bound, 30L)).map(_._1).toSet
    assert(mustHave.subsetOf(found))
  }
}
