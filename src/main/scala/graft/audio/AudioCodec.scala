package graft.audio

/** Deterministic audio codecs for the clip corpus: 16-bit little-endian PCM,
  * G.711 µ-law and A-law (public ITU-T spec). Decoded form is Array[Short]
  * mono PCM. The byte-image handling deliberately stays plain
  * Array[Byte]/ByteBuffer — Spark/Tungsten owns memory management, so none
  * of the reference's memory4 layer is ported (SURVEY.md §1.2; reference
  * memory4/Memory.java:36 et al. studied for behavior only).
  *
  * The per-row invariant of BASELINE.json `input_hint` — decoded-PCM
  * allclose (SNR >= 30 dB) vs the reference PCM — is computable offline with
  * these codecs: µ-law/A-law on speech-band sinusoids sit at ~35-38 dB SNR.
  */
object AudioCodec {

  final val PcmS16Le = "pcm_s16le"
  final val Ulaw = "ulaw"
  final val Alaw = "alaw"

  // ------------------------------------------------------------- PCM s16le

  def encodePcm16(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def decodePcm16(bytes: Array[Byte]): Array[Short] = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  // ------------------------------------------------------------ G.711 µ-law

  private final val UlawBias = 0x84
  private final val UlawClip = 32635

  def ulawEncodeSample(pcm: Short): Byte = {
    var sample = pcm.toInt
    val sign = if (sample < 0) { sample = -sample; 0x80 } else 0
    if (sample > UlawClip) sample = UlawClip
    sample += UlawBias
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (sample & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (sample >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  def ulawDecodeSample(b: Byte): Short = {
    val u = (~b) & 0xff
    val sign = u & 0x80
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    var sample = ((mantissa << 3) + UlawBias) << exponent
    sample -= UlawBias
    (if (sign != 0) -sample else sample).toShort
  }

  // ------------------------------------------------------------ G.711 A-law

  def alawEncodeSample(pcm: Short): Byte = {
    var sample = pcm.toInt
    val sign = if (sample >= 0) 0x80 else { sample = -sample - 1; 0 }
    if (sample > 32635) sample = 32635
    var compressed =
      if (sample >= 256) {
        var exponent = 7
        var mask = 0x4000
        while (exponent > 0 && (sample & mask) == 0) { exponent -= 1; mask >>= 1 }
        val mantissa = (sample >> (exponent + 3)) & 0x0f
        (exponent << 4) | mantissa
      } else sample >> 4
    compressed ^= (sign ^ 0x55)
    compressed.toByte
  }

  def alawDecodeSample(b: Byte): Short = {
    var a = (b ^ 0x55) & 0xff
    val sign = a & 0x80
    a &= 0x7f
    val exponent = a >> 4
    var mantissa = a & 0x0f
    var sample =
      if (exponent > 0) ((mantissa | 0x10) << 4 | 0x8) << (exponent - 1)
      else (mantissa << 4) | 0x8
    (if (sign != 0) sample else -sample - 1).toShort
  }

  // --------------------------------------------------------------- dispatch

  def encode(samples: Array[Short], codec: String): Array[Byte] = codec match {
    case PcmS16Le => encodePcm16(samples)
    case Ulaw =>
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = ulawEncodeSample(samples(i)); i += 1 }
      out
    case Alaw =>
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = alawEncodeSample(samples(i)); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  def decode(bytes: Array[Byte], codec: String): Array[Short] = codec match {
    case PcmS16Le => decodePcm16(bytes)
    case Ulaw =>
      val out = new Array[Short](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = ulawDecodeSample(bytes(i)); i += 1 }
      out
    case Alaw =>
      val out = new Array[Short](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = alawDecodeSample(bytes(i)); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** Signal-to-noise ratio in dB of `test` against `ref`, over the common
    * prefix (trailing pad/trim tolerated). +Inf when identical. */
  def snrDb(ref: Array[Short], test: Array[Short]): Double = {
    val n = math.min(ref.length, test.length)
    if (n == 0) return Double.NegativeInfinity
    var sig = 0.0
    var noise = 0.0
    var i = 0
    while (i < n) {
      val r = ref(i).toDouble
      val d = r - test(i)
      sig += r * r
      noise += d * d
      i += 1
    }
    if (noise == 0.0) Double.PositiveInfinity
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / noise)
  }
}
