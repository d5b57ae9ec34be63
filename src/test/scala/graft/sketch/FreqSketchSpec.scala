package graft.sketch

import graft.core.Rng
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-vs-sketch randomized tests, the reference's signature method
  * (`MasterFETest.java:234-327`: exact PositiveCountersMap in lockstep with
  * the sketch, bound-containment assertions, multi-way merge). */
class FreqSketchSpec extends AnyFunSuite {

  private def zipfStream(n: Int, universe: Int, theta: Double, seed: Long): Array[Long] = {
    val rng = Rng(seed, 11)
    Array.fill(n)(rng.nextZipf(universe, theta).toLong)
  }

  private def exactCounts(stream: Array[Long]): Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("bounds contain exact counts on a zipf stream") {
    val stream = zipfStream(100000, 10000, 1.1, 1)
    val exact = exactCounts(stream)
    val sk = FreqSketch(256)
    stream.foreach(sk.update(_))
    assert(sk.streamLength == stream.length)
    exact.foreach { case (k, c) =>
      assert(sk.upperBound(k) >= c, s"UB(${k}) ${sk.upperBound(k)} < $c")
      assert(sk.lowerBound(k) <= c, s"LB(${k}) ${sk.lowerBound(k)} > $c")
    }
  }

  test("maxError respects the MG bound (~n/k scale)") {
    val stream = zipfStream(200000, 50000, 0.7, 2)
    val k = 512
    val sk = FreqSketch(k)
    stream.foreach(sk.update(_))
    // reference documents UB-est <= (4/3) n/k whp (FrequentItems.java:50-54);
    // allow 2x slack for the sampled median
    assert(sk.maxError <= 2L * stream.length / k * 2,
      s"maxError ${sk.maxError} too large for n=${stream.length} k=$k")
  }

  test("frequentKeys returns a superset of true heavy hitters") {
    val stream = zipfStream(100000, 10000, 1.1, 3)
    val exact = exactCounts(stream)
    val sk = FreqSketch(256)
    stream.foreach(sk.update(_))
    val threshold = stream.length / 100
    val found = sk.frequentKeys(threshold.toLong).map(_._1).toSet
    exact.filter(_._2 >= threshold).keys.foreach { k =>
      assert(found.contains(k), s"true heavy hitter $k missed")
    }
  }

  test("merge equals single-pass semantics (bounds still contain truth)") {
    val streams = (0 until 10).map(i => zipfStream(20000, 5000, 1.1, 100 + i))
    val exact = exactCounts(streams.toArray.flatten)
    val merged = streams.map { s =>
      val sk = FreqSketch(256); s.foreach(sk.update(_)); sk
    }.reduce(_ merge _)
    assert(merged.streamLength == streams.map(_.length).sum)
    exact.foreach { case (k, c) =>
      assert(merged.upperBound(k) >= c)
      assert(merged.lowerBound(k) <= c)
    }
  }

  test("merge order independence of stream length and bound validity") {
    val a = zipfStream(10000, 2000, 1.1, 5)
    val b = zipfStream(10000, 2000, 0.7, 6)
    def mk(s: Array[Long]) = { val sk = FreqSketch(128); s.foreach(sk.update(_)); sk }
    val ab = mk(a).merge(mk(b))
    val ba = mk(b).merge(mk(a))
    assert(ab.streamLength == ba.streamLength)
    val exact = exactCounts(a ++ b)
    exact.foreach { case (k, c) =>
      assert(ab.upperBound(k) >= c && ab.lowerBound(k) <= c)
      assert(ba.upperBound(k) >= c && ba.lowerBound(k) <= c)
    }
  }

  test("serde round-trip preserves estimates, bounds, and metadata") {
    val stream = zipfStream(50000, 5000, 1.1, 7)
    val sk = FreqSketch(256)
    stream.foreach(sk.update(_))
    val back = FreqSketch.deserialize(sk.serialize())
    assert(back.k == sk.k)
    assert(back.streamLength == sk.streamLength)
    assert(back.maxError == sk.maxError)
    exactCounts(stream).keys.foreach { k =>
      assert(back.estimate(k) == sk.estimate(k))
      assert(back.upperBound(k) == sk.upperBound(k))
      assert(back.lowerBound(k) == sk.lowerBound(k))
    }
  }

  test("empty sketch round-trips (reference MasterFETest.java:182-200)") {
    val sk = FreqSketch(64)
    val back = FreqSketch.deserialize(sk.serialize())
    assert(back.isEmpty && back.streamLength == 0 && back.estimate(1) == 0)
    // merging an empty sketch is identity
    val other = FreqSketch(64)
    other.update(5, 3)
    assert(other.merge(back).estimate(5) == 3)
  }

  test("string serde round-trips exactly (reference FrequentItems.java:382-419)") {
    val sk = FreqSketch(32)
    val rng = new scala.util.Random(7)
    val stream = Seq.fill(5000)(rng.nextInt(200).toLong)
    stream.foreach(sk.update(_))
    val s = sk.toString
    val back = FreqSketch.fromString(s)
    assert(back.k == sk.k)
    assert(back.streamLength == sk.streamLength)
    assert(back.offset == sk.offset)
    assert(back.mergeError == sk.mergeError)
    assert(back.numActive == sk.numActive)
    (0L until 200L).foreach { k =>
      assert(back.estimate(k) == sk.estimate(k))
      assert(back.upperBound(k) == sk.upperBound(k))
    }
    // deterministic: same logical state stringifies identically
    assert(back.toString == s)
    // empty sketch
    assert(FreqSketch.fromString(FreqSketch(8).toString).isEmpty)
    assertThrows[IllegalArgumentException](FreqSketch.fromString("1,2"))
  }

  test("weighted updates and invalid arguments") {
    val sk = FreqSketch(64)
    sk.update(1, 100)
    sk.update(1, 50)
    assert(sk.estimate(1) == 150)
    assertThrows[IllegalArgumentException](sk.update(1, -1))
    assertThrows[IllegalArgumentException](FreqSketch(0))
    assertThrows[IllegalArgumentException](FreqSketch(64).merge(FreqSketch(32)))
  }
}
