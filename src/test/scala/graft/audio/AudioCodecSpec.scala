package graft.audio

import graft.core.Rng
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

class AudioCodecSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Double, freq: Double, sr: Int): Array[Short] =
    Array.tabulate(n)(i => (amp * 32767 * math.sin(2 * math.Pi * freq * i / sr)).toShort)

  test("pcm16 round-trip is exact") {
    val rng = Rng(1, 1)
    val samples = Array.fill(10000)((rng.nextInt(65536) - 32768).toShort)
    val back = AudioCodec.decodePcm16(AudioCodec.encodePcm16(samples))
    assert(back.sameElements(samples))
  }

  test("ulaw round-trip SNR >= 30 dB on speech-band sinusoids") {
    val s = sine(16000, 0.5, 440, 8000)
    val decoded = AudioCodec.decode(AudioCodec.encode(s, AudioCodec.Ulaw), AudioCodec.Ulaw)
    val snr = AudioCodec.snrDb(s, decoded)
    assert(snr >= 30, s"ulaw SNR $snr < 30 dB")
  }

  test("alaw round-trip SNR >= 30 dB on speech-band sinusoids") {
    val s = sine(16000, 0.5, 440, 8000)
    val decoded = AudioCodec.decode(AudioCodec.encode(s, AudioCodec.Alaw), AudioCodec.Alaw)
    val snr = AudioCodec.snrDb(s, decoded)
    assert(snr >= 30, s"alaw SNR $snr < 30 dB")
  }

  test("ulaw/alaw single-sample monotone-ish round trip at extremes") {
    Seq[Short](-32768, -16384, -1, 0, 1, 100, 16384, 32767).foreach { v =>
      val u = AudioCodec.ulawDecodeSample(AudioCodec.ulawEncodeSample(v))
      val a = AudioCodec.alawDecodeSample(AudioCodec.alawEncodeSample(v))
      assert(math.abs(u - v) <= math.max(64, math.abs(v / 8)), s"ulaw err at $v: $u")
      assert(math.abs(a - v) <= math.max(64, math.abs(v / 8)), s"alaw err at $v: $a")
    }
  }

  test("snrDb: identical is +inf, tolerates pad/trim via common prefix") {
    val s = sine(8000, 0.4, 300, 8000)
    assert(AudioCodec.snrDb(s, s.clone()).isPosInfinity)
    assert(AudioCodec.snrDb(s, s ++ Array[Short](0, 0, 0)).isPosInfinity)
  }

  test("per-row invariant holds on generated corpus clips (all codecs, gains)") {
    val n = 200
    val pl = CorpusGen.plan(n, 42L)
    (0 until n).foreach { i =>
      val spec = CorpusGen.clipSpec(42L, i.toLong, pl)
      val clip = CorpusGen.renderClip(spec)
      val refPcm = CorpusGen.referencePcm(spec.params, spec.gain)
      val decoded = AudioCodec.decode(clip.bytes, clip.codec)
      val snr = AudioCodec.snrDb(refPcm, decoded)
      assert(snr >= 30, s"clip $i codec=${clip.codec} SNR $snr < 30 dB")
      assert(clip.transcript == spec.transcript)
    }
  }
}
