package graft.multimodal

/** Pure-JVM IMA (DVI4) ADPCM — a REAL compressed-audio codec, decoded
  * without any library: 4 bits per sample, adaptive step-size table,
  * the WAV framing of format tag 0x0011 (mono).
  *
  * Algorithm per the public IMA "Recommended Practices for Enhancing
  * Digital Audio Compatibility" spec (the step/index tables below are
  * the normative ones); WAV block framing per the Microsoft WAVE
  * format registry: each block = 4-byte header (predictor int16 LE,
  * step index u8, reserved u8) + packed nibbles, LOW nibble first.
  *
  * The encoder exists to fabricate synthetic test media; the decoder
  * is the library surface ([[Multimodal.extractFeatures]] feeds its
  * samples to the same quarter-RMS featurizer as PCM). Encoder and
  * decoder share one nibble-reconstruction function, so
  * decode(encode(x)) equals the encoder's tracked reconstruction
  * bit-exactly — that property is spec-pinned, alongside a quality
  * bound vs the original waveform.
  */
object Adpcm {

  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Mutable codec state shared by encode and decode: one predicted
    * sample + step index. */
  private final class State(var pred: Int, var index: Int)

  /** Apply one 4-bit code to the state — THE reconstruction rule, used
    * identically on both sides so they can never drift. */
  private def step(s: State, n: Int): Int = {
    val st = stepTable(s.index)
    var diff = st >> 3
    if ((n & 1) != 0) diff += st >> 2
    if ((n & 2) != 0) diff += st >> 1
    if ((n & 4) != 0) diff += st
    s.pred = if ((n & 8) != 0) s.pred - diff else s.pred + diff
    if (s.pred > 32767) s.pred = 32767
    if (s.pred < -32768) s.pred = -32768
    s.index += indexTable(n)
    if (s.index < 0) s.index = 0
    if (s.index > 88) s.index = 88
    s.pred
  }

  /** Quantize one sample against the current state (standard IMA
    * nibble selection), then advance the state by the decode rule. */
  private def encodeNibble(s: State, sample: Int): Int = {
    var diff = sample - s.pred
    var n = 0
    if (diff < 0) { n = 8; diff = -diff }
    var st = stepTable(s.index)
    if (diff >= st) { n |= 4; diff -= st }
    st >>= 1
    if (diff >= st) { n |= 2; diff -= st }
    st >>= 1
    if (diff >= st) n |= 1
    step(s, n)
    n
  }

  private[graft] val BlockAlign = 256           // bytes per block (mono)
  private[graft] val SamplesPerBlock = (BlockAlign - 4) * 2 + 1 // 505

  /** Complete WAV file: fmt tag 0x0011, mono, 4-bit, block-framed,
    * with the cbSize=2 samples-per-block extension field. Returns also
    * the encoder's exact reconstruction for the round-trip spec. */
  private[graft] def encodeWavIma(sampleRate: Int, samples: Array[Short])
      : (Array[Byte], Array[Short]) = {
    val nBlocks = (samples.length + SamplesPerBlock - 1) / SamplesPerBlock
    val dataSz = nBlocks * BlockAlign
    val avgBytesPerSec = (sampleRate.toLong * BlockAlign / SamplesPerBlock).toInt
    val recon = new Array[Short](samples.length)
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 20 + 8 + 4 + 8 + dataSz)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x0011.toShort)                  // IMA ADPCM
      .putShort(1.toShort)                       // mono
      .putInt(sampleRate)
      .putInt(avgBytesPerSec)
      .putShort(BlockAlign.toShort)
      .putShort(4.toShort)                       // bits per sample
      .putShort(2.toShort)                       // cbSize
      .putShort(SamplesPerBlock.toShort)
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    out.put("data".getBytes("US-ASCII")).putInt(dataSz)
    var base = 0
    while (base < samples.length) {
      val s = new State(samples(base), 0)
      recon(base) = samples(base)               // header sample is verbatim
      out.putShort(samples(base)).put(0.toByte).put(0.toByte)
      var i = 1
      var lowNibble = -1
      while (i < SamplesPerBlock) {
        val idx = base + i
        // blocks are fixed-size: past the end, pad by re-encoding the
        // final predictor target (decoder stops at the sample count)
        val sample = if (idx < samples.length) samples(idx).toInt else s.pred
        val n = encodeNibble(s, sample)
        if (idx < samples.length) recon(idx) = s.pred.toShort
        if (lowNibble < 0) lowNibble = n
        else { out.put((lowNibble | (n << 4)).toByte); lowNibble = -1 }
        i += 1
      }
      if (lowNibble >= 0) out.put(lowNibble.toByte)
      base += SamplesPerBlock
    }
    (out.array(), recon)
  }

  /** REAL decode of mono IMA-ADPCM WAV content: (sampleRate, samples)
    * or null when the content is not block-framed mono IMA ADPCM
    * (same refuse-don't-guess contract as the other decoders). The
    * total sample count comes from the `fact` chunk when present,
    * else every full block is decoded. */
  private[graft] def decodeWavIma(b: Array[Byte],
      fmtOff: Int, fmtSz: Long, dataOff: Int, dataSz: Long,
      factSamples: Long): (Int, Array[Short]) = {
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    if (fmtOff < 0 || fmtSz < 16 || fmtOff + 16 > b.length || dataOff < 0) return null
    if (le16(fmtOff) != 0x0011 || le16(fmtOff + 2) != 1 || le16(fmtOff + 14) != 4)
      return null
    val rate = (le16(fmtOff + 4) | (le16(fmtOff + 6) << 16))
    val blockAlign = le16(fmtOff + 12)
    if (rate <= 0 || blockAlign < 5) return null
    val samplesPerBlock =
      if (fmtSz >= 20 && fmtOff + 20 <= b.length) le16(fmtOff + 18)
      else (blockAlign - 4) * 2 + 1
    if (samplesPerBlock < 1 || samplesPerBlock > (blockAlign - 4) * 2 + 1) return null
    val avail = math.min(dataSz, (b.length - dataOff).toLong)
    val nBlocks = (avail / blockAlign).toInt
    if (nBlocks <= 0) return null
    val maxSamples = nBlocks.toLong * samplesPerBlock
    // ~2 samples per data byte: a >1 GB data chunk would overflow the
    // Int sample count below — refuse (contract: null, never a crash)
    if (maxSamples > Int.MaxValue) return null
    val total =
      (if (factSamples > 0 && factSamples <= maxSamples) factSamples else maxSamples).toInt
    val out = new Array[Short](total)
    var blk = 0
    var w = 0
    while (blk < nBlocks && w < total) {
      val off = dataOff + blk * blockAlign
      val s = new State(le16(off).toShort.toInt, b(off + 2) & 0xff)
      if (s.index > 88) return null              // corrupt header
      out(w) = s.pred.toShort; w += 1
      var i = 1
      var p = off + 4
      while (i < samplesPerBlock && w < total) {
        val byte = b(p + ((i - 1) >> 1)) & 0xff
        val n = if (((i - 1) & 1) == 0) byte & 0x0f else byte >> 4
        out(w) = step(s, n).toShort
        w += 1; i += 1
      }
      blk += 1
    }
    (rate, out)
  }
}
