package graft.audio

import org.apache.spark.sql.catalyst.util.ArrayData

/** Gain-invariant spectral signature + fingerprint of an audio clip — the
  * acoustic analogue of the transcript MinHash lane: dedup driven by the
  * WAVEFORM, catching clips whose audio content matches even when
  * transcript, codec, or gain differ.
  *
  * Method (all public DSP, no FFT library needed):
  *  1. Constant-Q Goertzel: single-bin DFT at [[Bins]] log-spaced probe
  *     frequencies in [[FMin]]..[[FMax]] Hz, each probed over a window of
  *     [[QCycles]] cycles of that frequency (NOT one fixed window — a fixed
  *     long rectangular window makes probe response razor-thin, so a
  *     component between probe centers vanishes by 40 dB; a fixed cycle
  *     count gives every probe ~the same fractional bandwidth, about half
  *     the probe spacing, bounding off-center attenuation to a few dB).
  *     Probe frequencies are absolute Hz — signatures are comparable across
  *     sample rates. Energies are amplitude^2-scaled (|X|^2 / n^2) so bins
  *     with different window lengths compare directly.
  *  2. Bin energies are floored at [[FloorFrac]] x the mean bin energy
  *     (codec quantization noise collapses onto a common deterministic
  *     floor) and L2-normalized — gain scales every bin by gain^2
  *     uniformly, so normalization cancels it exactly. This is the [[sig]]
  *     used for cosine verification.
  *  3. [[fp64]]: one bit per bin — "this band holds dominant signal":
  *     bit_k = (sig_k > [[ThresholdRel]] x max bin). Real components sit
  *     within ~15 dB of the strongest (generator amps 0.1..0.35, capture
  *     loss bounded by the constant-Q design); G.711 companding and
  *     clipping distortion products sit 30+ dB down. The -24 dB threshold
  *     puts ~9 dB of guard band on both sides, so codec/gain perturbations
  *     (sub-dB) flip a bit only when a deterministic leakage skirt lands
  *     within noise of the threshold — rare, and [[MaxHamming]] tolerates a
  *     few.
  *
  * Candidate recall contract: the [[Bins]]-bit fingerprint is bucketed by
  * its [[NumBlocks]] [[BlockBits]]-bit blocks; by pigeonhole any pair
  * within Hamming distance NumBlocks - 1 = [[MaxHamming]] shares at least
  * one exact block. The fingerprint is sparse (dominant bands only), so
  * quiet-band blocks collapse onto value 0 and form Theta(corpus)-sized
  * heterogeneous buckets — those are re-split recursively by the unpinned
  * bits ([[graft.dedup.CandidatePairs.pairsHamming]]), which keeps recall
  * COMPLETE under the bucket cap: the distributed lane and the O(n^2)
  * oracle compute identical edge sets by construction.
  *
  * Determinism: +, *, compare, Math.sqrt (exactly rounded by spec) and
  * StrictMath.cos/pow (bit-identical across JVMs and CPU architectures BY
  * CONTRACT — fdlibm) on doubles, so driver oracle and executor expression
  * produce bit-identical signatures for the same bytes on ANY host mix
  * (ADVICE r4: plain math.cos/pow are not exactly-rounded and may differ
  * across JVM versions/architectures, which would silently break the
  * lane-equals-oracle exact-equality contract on a heterogeneous cluster;
  * both are computed once per bin, so the fdlibm cost is noise).
  */
object SpectralSig {

  final val Bins = 48
  final val FMin = 100.0
  final val FMax = 3500.0
  /** Cycles of the probe frequency each constant-Q window spans. */
  final val QCycles = 24
  /** Noise floor as a fraction of the mean bin energy. */
  final val FloorFrac = 1e-4
  /** Fingerprint bit threshold relative to the max bin (~-24 dB). */
  final val ThresholdRel = 0.004
  /** Verification thresholds (the frozen pair predicate). */
  final val MaxHamming = 3
  final val MinCosine = 0.995
  /** Fingerprint blocks for bucketing: NumBlocks x BlockBits = Bins. */
  final val NumBlocks = 4
  final val BlockBits = 12

  /** Log-spaced probe frequencies (Hz). */
  val probeFreqs: Array[Double] = {
    val ratio = FMax / FMin
    Array.tabulate(Bins)(k => FMin * StrictMath.pow(ratio, k.toDouble / (Bins - 1)))
  }

  /** Normalized floored constant-Q signature of decoded PCM (unit L2,
    * FloatType for columnar storage + the shared codegen cosine kernel). */
  def sig(pcm: Array[Short], srHz: Int): Array[Float] = {
    val out = new Array[Float](Bins)
    if (pcm.isEmpty || srHz <= 0) return out
    val e = new Array[Double](Bins)
    var k = 0
    while (k < Bins) {
      val f = probeFreqs(k)
      if (f < srHz / 2.0) { // skip bins above Nyquist (only possible sr < 7000)
        val n = math.min(pcm.length, math.max(32, (QCycles * srHz / f).toInt))
        val coeff = 2.0 * StrictMath.cos(2.0 * math.Pi * f / srHz)
        var s1 = 0.0
        var s2 = 0.0
        var i = 0
        while (i < n) {
          val s0 = pcm(i) + coeff * s1 - s2
          s2 = s1
          s1 = s0
          i += 1
        }
        // amplitude^2 scale: |X|^2 / n^2 — comparable across window lengths
        e(k) = (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (n.toDouble * n)
      }
      k += 1
    }
    var mean = 0.0
    k = 0
    while (k < Bins) { mean += e(k); k += 1 }
    mean /= Bins
    val floor = mean * FloorFrac + 1e-12
    var l2 = 0.0
    k = 0
    while (k < Bins) { e(k) += floor; l2 += e(k) * e(k); k += 1 }
    val inv = 1.0 / math.sqrt(l2)
    k = 0
    while (k < Bins) { out(k) = (e(k) * inv).toFloat; k += 1 }
    out
  }

  /** Dominant-band bit fingerprint of a signature (bit k set iff bin k is
    * within ThresholdRel of the max bin). Reads straight off columnar
    * [[ArrayData]] so the Catalyst expression and the sequential oracle
    * (wrapping its Array[Float]) run the SAME code on the same bits. */
  def fp64(sig: ArrayData): Long = {
    var mx = 0.0
    var k = 0
    while (k < Bins) {
      val v = sig.getFloat(k).toDouble
      if (v > mx) mx = v
      k += 1
    }
    val t = ThresholdRel * mx
    var fp = 0L
    k = 0
    while (k < Bins) {
      if (sig.getFloat(k).toDouble > t) fp |= (1L << k)
      k += 1
    }
    fp
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** The frozen audio-dup pair predicate (shared by the distributed lane's
    * Column form and the O(n^2) oracle — cosine evaluated by the same
    * [[graft.functions.GraftFunctions.cosineSimData]] kernel in both). */
  def isDupPair(fpA: Long, fpB: Long, sigA: ArrayData, sigB: ArrayData): Boolean =
    hamming(fpA, fpB) <= MaxHamming &&
      graft.functions.GraftFunctions.cosineSimData(sigA, sigB) >= MinCosine
}
