package graft

import graft.audio.{AudioCodec, SpectralSig}
import graft.corpus.CorpusGen
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Scratch diagnostic (not a test): why does the distributed audio lane miss
  * an oracle edge at n=500? Prints the oracle cluster of the divergent clip,
  * the block structure of its mate pairs, and per-block bucket sizes. */
object AudioDiag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val pl = CorpusGen.plan(n, 42L)
    val sigs = new Array[GenericArrayData](n)
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) {
      val spec = CorpusGen.clipSpec(42L, i.toLong, pl)
      val pcm = CorpusGen.referencePcm(spec.params, spec.gain)
      val dec = AudioCodec.decode(AudioCodec.encode(pcm, spec.codec), spec.codec)
      sigs(i) = new GenericArrayData(SpectralSig.sig(dec, spec.params.srHz))
      fps(i) = SpectralSig.fp64(sigs(i))
      i += 1
    }
    // bucket sizes per (blockIdx, value)
    val bsz = scala.collection.mutable.HashMap[(Int, Long), Int]().withDefaultValue(0)
    i = 0
    while (i < n) {
      var b = 0
      while (b < SpectralSig.NumBlocks) {
        val v = (fps(i) >>> (SpectralSig.BlockBits * b)) & ((1L << SpectralSig.BlockBits) - 1)
        bsz((b, v)) += 1
        b += 1
      }
      i += 1
    }
    println("top buckets: " + bsz.toSeq.sortBy(-_._2).take(10)
      .map { case ((b, v), c) => s"blk$b=0x${v.toHexString}:$c" }.mkString(" "))
    println(s"over-cap(64) buckets: ${bsz.valuesIterator.count(_ > 64)}")
    // the divergent clip from the sf0.001 gate
    val target = args.lift(1).map(_.toInt).getOrElse(387)
    // all oracle-predicate edges touching target
    i = 0
    while (i < n) {
      if (i != target && SpectralSig.isDupPair(fps(i), fps(target), sigs(i), sigs(target))) {
        val ham = SpectralSig.hamming(fps(i), fps(target))
        val exactBlocks = (0 until SpectralSig.NumBlocks).filter { b =>
          val m = ((1L << SpectralSig.BlockBits) - 1) << (SpectralSig.BlockBits * b)
          (fps(i) & m) == (fps(target) & m)
        }
        val sizes = exactBlocks.map { b =>
          val v = (fps(i) >>> (SpectralSig.BlockBits * b)) & ((1L << SpectralSig.BlockBits) - 1)
          s"blk$b=0x${v.toHexString}(sz=${bsz((b, v))})"
        }
        println(s"edge $target-$i ham=$ham exactBlocks=${sizes.mkString(",")}")
      }
      i += 1
    }
    println(s"fp($target)=0x${fps(target).toHexString}")
  }
}
