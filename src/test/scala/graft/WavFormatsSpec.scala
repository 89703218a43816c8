package graft

import graft.multimodal.Multimodal

/** multimodal.Multimodal WAV uncompressed-family decode: PCM
  * 8/16/24/32-bit, IEEE float32, G.711 A-law/µ-law, mono and
  * channel-averaged multichannel. G.711 expansion is pinned against
  * the standard's own landmark values (silence codes, extremes,
  * sign symmetry over all 256 codes) — the formulas ARE the spec, so
  * the decode is exact by construction, not approximately tested. */
class WavFormatsSpec extends GraftSpec {

  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Minimal RIFF/WAVE with a 16-byte fmt chunk and raw `data`. */
  private def wav(tag: Int, ch: Int, rate: Int, bits: Int,
                  data: Array[Byte]): Array[Byte] = {
    val bytesPer = bits / 8
    Array.concat(
      "RIFF".getBytes("US-ASCII"), le32(36 + data.length),
      "WAVE".getBytes("US-ASCII"),
      "fmt ".getBytes("US-ASCII"), le32(16),
      le16(tag), le16(ch), le32(rate), le32(rate * bytesPer * ch),
      le16(bytesPer * ch), le16(bits),
      "data".getBytes("US-ASCII"), le32(data.length), data)
  }

  private def decode(b: Array[Byte]): (Int, Array[Short]) =
    Multimodal.decodeWavSamples(b)

  test("8-bit unsigned PCM: offset-binary to signed 16-bit") {
    val (rate, s) = decode(wav(1, 1, 8000, 8,
      Array[Byte](0, 128.toByte, 255.toByte, 129.toByte)))
    assert(rate == 8000)
    assert(s.toSeq == Seq[Short](-32768, 0, 32512, 256))
  }

  test("24-bit and 32-bit PCM keep their top 16 bits") {
    val vals = Seq[Short](0, 1, -1, 1234, -4321, Short.MaxValue, Short.MinValue)
    val d24 = vals.flatMap { v =>
      val x = v.toInt << 8 // 24-bit sample whose top 16 bits are v
      Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte, ((x >> 16) & 0xff).toByte)
    }.toArray
    assert(decode(wav(1, 1, 16000, 24, d24))._2.toSeq == vals)
    val d32 = vals.flatMap(v => le32(v.toInt << 16)).toArray
    assert(decode(wav(1, 1, 16000, 32, d32))._2.toSeq == vals)
  }

  test("float32 scales by 32767, clamps out-of-range, zeroes NaN") {
    val fs = Seq(0f, 0.5f, -1f, 1f, 2f, -3f, Float.NaN)
    val data = fs.flatMap(f => le32(java.lang.Float.floatToIntBits(f))).toArray
    val got = decode(wav(3, 1, 44100, 32, data))._2.toSeq
    assert(got == Seq[Short](0, 16384, -32767, 32767, 32767, -32767, 0))
  }

  test("stereo duplicating a mono master decodes to exactly the master") {
    val mono = Seq[Short](100, -200, 32767, -32768, 7)
    val stereo = mono.flatMap(v => le16(v) ++ le16(v)).toArray
    assert(decode(wav(1, 2, 8000, 16, stereo))._2.toSeq == mono)
  }

  test("multichannel mixdown averages with half-up rounding") {
    // frames: (100,200)→150, (-5,6)→1 (avg 0.5 rounds up), (1,2)→2,
    // (-1,-2)→-1 (avg -1.5 rounds toward +inf)
    val frames = Seq((100, 200), (-5, 6), (1, 2), (-1, -2))
    val data = frames.flatMap { case (l, r) => le16(l) ++ le16(r) }.toArray
    assert(decode(wav(1, 2, 8000, 16, data))._2.toSeq ==
      Seq[Short](150, 1, 2, -1))
  }

  test("G.711 landmark values and full-range sign symmetry") {
    // µ-law: 0xFF is silence (0), 0x00 the negative extreme (-32124),
    // 0x80 the positive extreme (+32124)
    assert(Multimodal.mulawToLinear(0xff) == 0)
    assert(Multimodal.mulawToLinear(0x7f) == 0) // "negative zero"
    assert(Multimodal.mulawToLinear(0x00) == -32124)
    assert(Multimodal.mulawToLinear(0x80) == 32124)
    // A-law: 0x55 is silence (-8, the standard's smallest magnitude),
    // 0x2A the negative extreme (-32256), 0xAA the positive extreme
    assert(Multimodal.alawToLinear(0x55) == -8)
    assert(Multimodal.alawToLinear(0xd5) == 8)
    assert(Multimodal.alawToLinear(0x2a) == -32256)
    assert(Multimodal.alawToLinear(0xaa) == 32256)
    // sign bit flips exactly negate, over every code
    for (c <- 0 until 256) {
      assert(Multimodal.mulawToLinear(c ^ 0x80) == -Multimodal.mulawToLinear(c))
      assert(Multimodal.alawToLinear(c ^ 0x80) == -Multimodal.alawToLinear(c))
    }
  }

  test("G.711 WAV decode routes through the expansion tables") {
    val mu = decode(wav(7, 1, 8000, 8, Array[Byte](0xff.toByte, 0x00, 0x80.toByte)))
    assert(mu._1 == 8000 && mu._2.toSeq == Seq[Short](0, -32124, 32124))
    val al = decode(wav(6, 1, 8000, 8, Array[Byte](0x55, 0x2a, 0xaa.toByte)))
    assert(al._2.toSeq == Seq[Short](-8, -32256, 32256))
  }

  test("mono 16-bit PCM decodes identically through both entry points") {
    val vals = Seq[Short](0, 1, -1, 12345, -12345)
    val bytes = wav(1, 1, 16000, 16, vals.flatMap(v => le16(v.toInt)).toArray)
    assert(decode(bytes)._2.toSeq == vals)
    assert(Multimodal.decodeWavPcm16(bytes)._2.toSeq == vals)
  }

  test("unsupported shapes refuse: bad tag, bad bit depth, zero rate") {
    val d = Array[Byte](0, 0)
    assert(decode(wav(2, 1, 8000, 16, d)) == null)  // MS-ADPCM: not built
    assert(decode(wav(1, 1, 8000, 12, d)) == null)  // 12-bit PCM
    assert(decode(wav(3, 1, 8000, 64, d)) == null)  // float64
    assert(decode(wav(6, 1, 8000, 16, d)) == null)  // 16-bit A-law
    assert(decode(wav(1, 1, 0, 16, d)) == null)     // zero rate
    assert(decode(wav(1, 0, 8000, 16, d)) == null)  // zero channels
  }

  // -- cross-encoding fingerprints over the widened family -----------

  /** The broadband multi-harmonic AM clip from AudioCrossCodecSpec:
    * every Goertzel band carries time-varying signal, so fingerprint
    * bits are signal-dominated, not codec-noise coin flips. */
  private def chirp(rate: Int, seconds: Double): Array[Short] =
    Array.tabulate[Short]((rate * seconds).toInt) { j =>
      val t = j.toDouble / rate
      var s = 0.0
      var h = 1
      while (h <= 10) {
        val env = 0.5 + 0.5 * math.sin(2 * math.Pi * (0.7 + 0.13 * h) * t)
        s += (4500.0 / h) * env * math.sin(2 * math.Pi * 350.0 * h * t)
        h += 1
      }
      math.max(Short.MinValue, math.min(Short.MaxValue, math.rint(s).toLong)).toShort
    }

  private def dist(a: java.lang.Long, b: java.lang.Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Nearest-code G.711 encoder (argmin over all 256 codes) — brute
    * force is fine at test scale and cannot itself be wrong. */
  private def mulawEncode(v: Short): Byte =
    (0 until 256).minBy(c => math.abs(Multimodal.mulawToLinear(c) - v)).toByte

  test("same clip as stereo / 24-bit / µ-law fingerprints with the mono-16 master") {
    val s = chirp(8000, 1.0)
    val master = Multimodal.audioFingerprint64(Multimodal.pcmWavBytes(8000, s))

    val stereo = wav(1, 2, 8000, 16, s.flatMap(v => le16(v) ++ le16(v)))
    assert(dist(master, Multimodal.audioFingerprint64(stereo)) == 0,
      "duplicated-channel stereo must decode bit-identically")

    val d24 = wav(1, 1, 8000, 24, s.flatMap { v =>
      val x = v.toInt << 8
      Seq((x & 0xff).toByte, ((x >> 8) & 0xff).toByte, ((x >> 16) & 0xff).toByte)
    })
    assert(dist(master, Multimodal.audioFingerprint64(d24)) == 0,
      "widened-then-truncated 24-bit must decode bit-identically")

    // µ-law is lossy (~38 dB SNR) but far above ADPCM-at-8k: the
    // fingerprint must stay inside the ≤7 pigeonhole blocking window
    val mu = wav(7, 1, 8000, 8, s.map(mulawEncode))
    val dMu = dist(master, Multimodal.audioFingerprint64(mu))
    info(s"d(pcm16, mulaw) = $dMu")
    assert(dMu <= 7, s"mu-law drifted outside the blocking window: $dMu")
  }
}
