package graft.sketch

import graft.core.Rng
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {

  private def zipfStream(n: Int, universe: Int, theta: Double, seed: Long): Array[Long] = {
    val rng = Rng(seed, 21)
    Array.fill(n)(rng.nextZipf(universe, theta).toLong)
  }

  private def exactCounts(stream: Array[Long]): Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("estimate never underestimates; error within eps*n for most keys") {
    val eps = 0.001; val delta = 0.01
    val stream = zipfStream(100000, 5000, 1.1, 1)
    val exact = exactCounts(stream)
    val cm = CountMin(eps, delta)
    stream.foreach(cm.update(_))
    assert(cm.streamLength == stream.length)
    var violations = 0
    exact.foreach { case (k, c) =>
      assert(cm.estimate(k) >= c, s"CM underestimated $k")
      if (cm.estimate(k) > c + cm.maxError) violations += 1
    }
    // reference acceptance: violations <= delta * #keys (MasterFETest.java:265-275)
    assert(violations <= math.max(1, (delta * exact.size).toInt),
      s"$violations bound violations for ${exact.size} keys")
  }

  test("conservative update estimates <= plain update estimates") {
    val stream = zipfStream(50000, 2000, 0.7, 2)
    val plain = CountMin(0.005, 0.01)
    val cons = CountMin(0.005, 0.01)
    stream.foreach { k => plain.update(k); cons.conservativeUpdate(k) }
    val exact = exactCounts(stream)
    exact.foreach { case (k, c) =>
      assert(cons.estimate(k) >= c)
      assert(cons.estimate(k) <= plain.estimate(k))
    }
  }

  test("merge equals elementwise sum semantics") {
    val a = zipfStream(30000, 2000, 1.1, 3)
    val b = zipfStream(30000, 2000, 1.1, 4)
    def mk(s: Array[Long]) = { val cm = CountMin(0.002, 0.01); s.foreach(cm.update(_)); cm }
    val merged = mk(a).merge(mk(b))
    val single = mk(a ++ b)
    assert(merged.streamLength == single.streamLength)
    exactCounts(a ++ b).keys.foreach { k =>
      assert(merged.estimate(k) == single.estimate(k))
    }
  }

  test("merge rejects different geometry") {
    assertThrows[IllegalArgumentException](CountMin(0.01, 0.01).merge(CountMin(0.001, 0.01)))
  }

  test("serde round-trip") {
    val stream = zipfStream(20000, 1000, 1.1, 5)
    val cm = CountMin(0.005, 0.01)
    stream.foreach(cm.update(_))
    val back = CountMin.deserialize(cm.serialize())
    assert(back.streamLength == cm.streamLength)
    exactCounts(stream).keys.foreach(k => assert(back.estimate(k) == cm.estimate(k)))
  }
}
