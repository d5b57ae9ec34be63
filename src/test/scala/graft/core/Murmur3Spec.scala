package graft.core

import org.scalatest.funsuite.AnyFunSuite

class Murmur3Spec extends AnyFunSuite {

  test("fmix64 is a bijection (distinct inputs stay distinct)") {
    val xs = (0L until 10000L).map(Murmur3.fmix64)
    assert(xs.distinct.size == 10000)
  }

  test("fmix64 avalanche: single-bit flips change ~half the output bits") {
    val rng = Rng(1, 1)
    var totalFlips = 0L
    var trials = 0
    (0 until 200).foreach { _ =>
      val x = rng.nextLong()
      (0 until 64).foreach { b =>
        val d = java.lang.Long.bitCount(Murmur3.fmix64(x) ^ Murmur3.fmix64(x ^ (1L << b)))
        totalFlips += d
        trials += 1
      }
    }
    val mean = totalFlips.toDouble / trials
    assert(mean > 28 && mean < 36, s"avalanche mean $mean outside [28,36]")
  }

  test("hashBytes is deterministic and seed-sensitive") {
    val data = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    assert(Murmur3.hashBytes(data, 0) == Murmur3.hashBytes(data.clone(), 0))
    assert(Murmur3.hashBytes(data, 0) != Murmur3.hashBytes(data, 1))
  }

  test("hashBytes handles all tail lengths 0..16") {
    (0 to 33).foreach { n =>
      val data = Array.tabulate(n)(i => (i * 7 + 3).toByte)
      val h1 = Murmur3.hashBytes(data, 42)
      val h2 = Murmur3.hashBytes(data.clone(), 42)
      assert(h1 == h2)
      if (n > 0) {
        val mutated = data.clone(); mutated(n - 1) = (mutated(n - 1) + 1).toByte
        assert(Murmur3.hashBytes(mutated, 42) != h1, s"last-byte change undetected at n=$n")
      }
    }
  }

  test("hashRange equals hashString of the substring") {
    val s = "abcdefghijklmnop"
    (0 until s.length).foreach { i =>
      ((i + 1) to s.length).foreach { j =>
        assert(Murmur3.hashRange(s, i, j, 7) == Murmur3.hashString(s.substring(i, j), 7))
      }
    }
  }

  test("hashString distributes: 100k distinct strings, no collisions") {
    val hs = (0 until 100000).map(i => Murmur3.hashString(s"key-$i", 42))
    assert(hs.distinct.size == 100000)
  }

  test("hashLong seed independence: different seeds give unrelated values") {
    val rng = Rng(9, 9)
    (0 until 10000).foreach { _ =>
      val x = rng.nextLong()
      assert(Murmur3.hashLong(x, 1) != Murmur3.hashLong(x, 2))
    }
  }
}
