package graft

import graft.audio.{AudioCodec, SpectralSig}
import graft.corpus.CorpusGen
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Scratch tuning harness for the audio fingerprint (not a test):
  * prints mate/cross hamming + cosine distributions over the corpus. */
object AudioTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 400
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
    val mateHam = scala.collection.mutable.ArrayBuffer[Int]()
    val mateCos = scala.collection.mutable.ArrayBuffer[Double]()
    val crossHam = scala.collection.mutable.ArrayBuffer[Int]()
    val crossCos = scala.collection.mutable.ArrayBuffer[Double]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val ham = SpectralSig.hamming(fps(i), fps(j))
        lazy val cos = graft.functions.GraftFunctions.cosineSimData(sigs(i), sigs(j))
        if (pl.clusterOf(i) == pl.clusterOf(j)) { mateHam += ham; mateCos += cos }
        else if (ham <= 8) { crossHam += ham; crossCos += cos }
        else if ((i + j) % 97 == 0) { crossHam += ham; crossCos += cos }
        j += 1
      }
      i += 1
    }
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) Double.NaN else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
    println(s"matePairs=${mateHam.size}")
    println(s"mateHam: max=${if (mateHam.isEmpty) -1 else mateHam.max} " +
      s"p50=${pct(mateHam.map(_.toDouble).toSeq, 0.5)} p99=${pct(mateHam.map(_.toDouble).toSeq, 0.99)} " +
      s"over3=${mateHam.count(_ > 3)}")
    println(s"mateCos: min=${if (mateCos.isEmpty) -1 else mateCos.min} " +
      s"p01=${pct(mateCos.toSeq, 0.01)} under0995=${mateCos.count(_ < 0.995)}")
    println(s"crossSampled=${crossHam.size} crossHamLe3=${crossHam.count(_ <= 3)}")
    val crossDup = crossHam.toSeq.zip(crossCos.toSeq).count { case (h, c) => h <= 3 && c >= 0.995 }
    println(s"crossPredicateTrue=$crossDup")
    println(s"crossCos among ham<=3: ${crossCos.toSeq.zip(crossHam.toSeq).filter(_._2 <= 3).map(_._1).sorted.takeRight(10).mkString(",")}")
    // distribution of mate pairs failing either leg
    val mateFail = mateHam.toSeq.zip(mateCos.toSeq).filter { case (h, c) => h > 3 || c < 0.995 }
    println(s"mateFail=${mateFail.size} sample=${mateFail.take(10).mkString(" ")}")
  }
}
