package graft.sketch

import graft.core.Murmur3

/** Sketch-level micro-benchmark grid (reference E2/E3 analogue: the
  * reference benches ns/update across its eight buffer variants — this
  * engine has ONE production implementation per sketch, so the grid is
  * sketch × operation instead of sketch × buffer-variant).
  *
  * Pure-JVM (no Spark): measures the per-row cost a Spark aggregate pays
  * inside `TypedImperativeAggregate.update/merge`, which is what the
  * pipeline-level bench cannot isolate. Zipfian keys (the regime heavy-
  * hitter sketches exist for) over a fixed deterministic stream; min-of-k
  * over interleaved rounds, same interference discipline as graft.Bench.
  *
  * Prints ONE JSON line:
  *   {"metric":"sketch_ns_per_op","grid":{"<sketch>.<op>":ns,...},
  *    "n":<streamLen>,"checksum":<xor of estimates>}
  */
object SketchBench {

  private val N = sys.props.getOrElse("graft.sketchBenchN", "2000000").toInt
  private val Rounds = sys.props.getOrElse("graft.sketchBenchRounds", "3").toInt

  /** Deterministic Zipf-ish stream: rank = 2^(h mod 20) bucketing gives a
    * heavy-tailed key distribution without a float pow per draw. */
  private def stream(n: Int): Array[Long] = {
    val a = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = Murmur3.hashLong(i.toLong, 99L)
      val tail = java.lang.Long.numberOfTrailingZeros(h | (1L << 20)) // 0..20, P(k) = 2^-(k+1)
      a(i) = java.lang.Long.remainderUnsigned(Murmur3.hashLong(i.toLong, tail.toLong), 1L << (20 - tail))
      i += 1
    }
    a
  }

  private def time(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val sum = body
    ((System.nanoTime() - t0).toDouble, sum)
  }

  def main(args: Array[String]): Unit = {
    val keys = stream(N)
    val probes = keys.take(100000)
    var check = 0L

    def mgUpdate(): Long = {
      val sk = FreqSketch(4096); keys.foreach(sk.update(_)); sk.streamLength
    }
    def ssUpdate(): Long = {
      val sk = new SpaceSaving(4096); keys.foreach(sk.update(_)); sk.streamLength
    }
    def cmUpdate(): Long = {
      val sk = CountMin(0.0001, 0.01); keys.foreach(sk.update(_, 1L)); sk.streamLength
    }
    def cmCons(): Long = {
      val sk = CountMin(0.0001, 0.01); keys.foreach(sk.conservativeUpdate(_, 1L)); sk.streamLength
    }
    def feUpdate(): Long = {
      val sk = CountMinFE(0.0001, 0.01); keys.foreach(sk.update(_, 1L)); sk.streamLength
    }
    def mgProbe(): Long = {
      val sk = FreqSketch(4096); keys.foreach(sk.update(_))
      var s = 0L; probes.foreach(k => s ^= sk.estimate(k)); s
    }
    def cmProbe(): Long = {
      val sk = CountMin(0.0001, 0.01); keys.foreach(sk.update(_, 1L))
      var s = 0L; probes.foreach(k => s ^= sk.estimate(k)); s
    }
    def mgMerge(): Long = {
      // 32 partial sketches over stream slices, tree-merged — the Spark
      // partial/final aggregation shape
      val parts = keys.grouped(N / 32 + 1).map { sl =>
        val p = FreqSketch(4096); sl.foreach(p.update(_)); p
      }.toArray
      parts.reduce(_.merge(_)).streamLength
    }
    def ssMerge(): Long = {
      val parts = keys.grouped(N / 32 + 1).map { sl =>
        val p = new SpaceSaving(4096); sl.foreach(p.update(_)); p
      }.toArray
      parts.reduce(_.merge(_)).streamLength
    }

    val cells: Seq[(String, () => Long, Int)] = Seq(
      ("misra_gries.update", () => mgUpdate(), N),
      ("space_saving.update", () => ssUpdate(), N),
      ("countmin.update", () => cmUpdate(), N),
      ("countmin.conservative_update", () => cmCons(), N),
      ("countmin_fe.update", () => feUpdate(), N),
      ("misra_gries.estimate", () => mgProbe(), probes.length),
      ("countmin.estimate", () => cmProbe(), probes.length),
      ("misra_gries.merge32", () => mgMerge(), N),
      ("space_saving.merge32", () => ssMerge(), N)
    )
    // warmup every cell once (JIT), then interleaved min-of-k rounds
    cells.foreach { case (_, f, _) => check ^= f() }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to Rounds; (name, f, per) <- cells) {
      val (ns, sum) = time(f())
      check ^= sum
      val nsPer = ns / per
      if (!best.contains(name) || nsPer < best(name)) best(name) = nsPer
    }
    val grid = cells.map { case (name, _, _) => f""""$name":${best(name)}%.1f""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"sketch_ns_per_op","grid":$grid,"n":$N,"checksum":$check}""")
  }
}
