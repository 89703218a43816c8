package graft

import graft.multimodal.{Flac, Multimodal}

/** multimodal.Flac — REAL FLAC sample decode. Contract: FLAC is
  * lossless, so decode is EXACT, and the tests demand bit equality,
  * not tolerance bands:
  *
  *  - encoder→decoder round-trips (independent bit accounting on the
  *    two sides, CRC-8/16 verified in the middle) over constant,
  *    smooth (fixed-predictor), and noise (verbatim-leaning) signals,
  *    mono and mid/side stereo, at off-block-boundary lengths;
  *  - HAND-CRAFTED frames — built bit by bit in this spec with its
  *    own writer and CRC code — pin the decode paths the encoder
  *    doesn't emit: LPC prediction with shift, escaped raw-bit Rice
  *    partitions, wasted-bits shifting, left/side decorrelation,
  *    with expected samples computed from the spec formulas by hand;
  *  - a flipped payload byte must turn the decode into null (CRC
  *    refusal), never into noise;
  *  - the WAV and FLAC encodes of one master produce the IDENTICAL
  *    audioFingerprint64 — the cross-codec dedup contract. */
class FlacSpec extends GraftSpec {

  // ---- spec-local bit writer + CRCs (independent of Flac's own)

  private final class BitW {
    val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = {
      var k = w - 1
      while (k >= 0) { bit(((v >>> k) & 1).toInt); k -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private def crc8(b: Array[Byte]): Int = {
    var c = 0
    for (x <- b) {
      c ^= x & 0xff
      for (_ <- 0 until 8)
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
    }
    c
  }

  private def crc16(b: Array[Byte]): Int = {
    var c = 0
    for (x <- b) {
      c ^= (x & 0xff) << 8
      for (_ <- 0 until 8)
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff
    }
    c
  }

  /** fLaC magic + last-flagged STREAMINFO + the given frame bytes. */
  private def flacFile(rate: Int, channels: Int, bps: Int, total: Long,
                       frames: Array[Byte]): Array[Byte] = {
    val si = new BitW
    si.bits(8, 16); si.bits(8, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(rate, 20)
    si.bits(channels - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(total, 36)
    for (_ <- 0 until 16) si.bits(0, 8)
    val siB = si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length)
    out.write(siB, 0, siB.length)
    out.write(frames, 0, frames.length)
    out.toByteArray
  }

  /** Frame header for blockSize ≤ 256 (bs code 6), STREAMINFO rate,
    * 16-bit samples, frame number 0, + CRC-8. */
  private def frameHeader(chAsgn: Int, blockSize: Int): Array[Byte] = {
    val w = new BitW
    w.bits(0xfff8, 16)
    w.bits(6, 4); w.bits(0, 4)
    w.bits(chAsgn, 4); w.bits(4, 3); w.bit(0)
    w.bits(0, 8) // frame number 0
    w.bits(blockSize - 1, 8)
    val h = w.bytes
    h :+ crc8(h).toByte
  }

  private def withCrc16(frame: Array[Byte]): Array[Byte] = {
    val c = crc16(frame)
    frame ++ Array[Byte](((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
  }

  private def rng(seed: Long): () => Long = {
    var h = seed * 0x9E3779B97F4A7C15L
    () => { h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h }
  }

  // ---- encoder→decoder round-trips

  test("mono round-trip is bit-exact: noise, smooth, constant, off-boundary lengths") {
    val r = rng(7)
    val cases = Seq(
      ("noise", Array.tabulate[Short](5000)(_ => (r() & 0xffff).toShort)),
      ("smooth", Array.tabulate[Short](4096)(i =>
        (8000 * math.sin(i / 40.0) + 2000 * math.sin(i / 7.0)).toShort)),
      ("constant", Array.fill[Short](300)(1234)),
      ("one sample", Array[Short](-32768)),
      ("block+1", Array.tabulate[Short](4097)(i => (i * 13 % 2000).toShort)))
    for ((name, xs) <- cases) {
      val (rate, got) = Flac.decode(Flac.flacBytes(16000, xs))
      assert(rate == 16000, name)
      assert(got.toSeq == xs.toSeq, name)
    }
  }

  test("mid/side stereo round-trip decodes to the channel-averaged mixdown") {
    val r = rng(11)
    val l = Array.tabulate[Short](3000)(i => (6000 * math.sin(i / 23.0)).toShort)
    val rt = Array.tabulate[Short](3000)(i =>
      ((6000 * math.sin(i / 23.0)).toInt + (r() % 97).toInt).toShort)
    val (rate, got) = Flac.decode(Flac.flacBytes(8000, l, rt))
    assert(rate == 8000)
    val want = Array.tabulate[Short](3000)(i =>
      Math.floorDiv(l(i) + rt(i) + 1, 2).toShort)
    assert(got.toSeq == want.toSeq)
  }

  test("stereo file whose channels duplicate a mono master decodes to exactly the master") {
    val xs = Array.tabulate[Short](2500)(i => (4000 * math.cos(i / 31.0)).toShort)
    val (_, got) = Flac.decode(Flac.flacBytes(22050, xs, xs))
    assert(got.toSeq == xs.toSeq)
  }

  // ---- hand-crafted decode paths

  test("LPC subframe: coefficients, shift and Rice residual reconstruct per the spec formula") {
    // order 2, precision 4, shift 2, coeffs [6, -2], warmup [100, 110],
    // residuals [1,-1,2,0,-3,5] rice-coded with k=2
    val w = new BitW
    w.bit(0); w.bits(33, 6); w.bit(0) // LPC order 2 (type 32+order-1)
    w.bits(100, 16); w.bits(110, 16)
    w.bits(3, 4)          // precision − 1
    w.bits(2, 5)          // shift (signed, positive)
    w.bits(6, 4); w.bits(0xE, 4) // 6, −2 in 4-bit two's complement
    w.bits(0, 2); w.bits(0, 4)   // rice method 0, partition order 0
    w.bits(2, 4)                 // rice parameter k=2
    for (res <- Seq(1, -1, 2, 0, -3, 5)) {
      val u = (res << 1) ^ (res >> 31)
      for (_ <- 0 until (u >>> 2)) w.bit(0)
      w.bit(1)
      w.bits(u & 3, 2)
    }
    val frame = withCrc16(frameHeader(0, 8) ++ w.bytes)
    val (rate, got) = Flac.decode(flacFile(8000, 1, 16, 8, frame))
    assert(rate == 8000)
    // x[i] = res[i] + ((6·x[i−1] − 2·x[i−2]) >> 2), computed by hand
    assert(got.toSeq == Seq[Short](100, 110, 116, 118, 121, 122, 119, 122))
  }

  test("escaped Rice partition (raw bits) and wasted-bits shifting") {
    // FIXED order 0, wasted = 3 (flag 1 + unary 2), effective bps 13,
    // escape parameter 15 → 5-bit raw width 4, residuals ±1..8
    val w = new BitW
    w.bit(0); w.bits(8, 6)        // FIXED order 0
    w.bit(1); w.bit(0); w.bit(0); w.bit(1) // wasted flag + unary(2) → 3
    w.bits(0, 2); w.bits(0, 4)    // rice method 0, partition order 0
    w.bits(15, 4)                 // escape
    w.bits(4, 5)                  // raw bit width
    for (v <- Seq(1, -2, 3, -4, 5, -6, 7, -8)) w.bits(v.toLong & 0xf, 4)
    val frame = withCrc16(frameHeader(0, 8) ++ w.bytes)
    val (_, got) = Flac.decode(flacFile(8000, 1, 16, 8, frame))
    assert(got.toSeq == Seq[Short](8, -16, 24, -32, 40, -48, 56, -64))
  }

  test("24-bit samples keep their top 16 bits; a zero-width escape partition is all zeros") {
    // frame: blockSize 4, ss code 6 (24-bit), VERBATIM samples chosen
    // so the >>8 conversion is visible (0x123456 -> 0x1234)
    val w = new BitW
    w.bit(0); w.bits(1, 6); w.bit(0) // VERBATIM
    for (v <- Seq(0x123456, -0x123456, 0x7FFFFF, -0x800000))
      w.bits(v.toLong & 0xffffff, 24)
    val hdr = {
      val h = new BitW
      h.bits(0xfff8, 16)
      h.bits(6, 4); h.bits(0, 4)
      h.bits(0, 4); h.bits(6, 3); h.bit(0) // mono, 24-bit
      h.bits(0, 8); h.bits(3, 8)           // frame 0, blockSize-1 = 3
      val b = h.bytes
      b :+ crc8(b).toByte
    }
    val frame = withCrc16(hdr ++ w.bytes)
    val (_, got) = Flac.decode(flacFile(8000, 1, 24, 4, frame))
    // arithmetic >>8: -0x123456 >> 8 = floor(-1193046 / 256) = -4661
    assert(got.toSeq == Seq[Short](0x1234, -4661, 0x7FFF, -0x8000),
      got.toSeq.toString)
    // zero-width escaped partition: FIXED order 0, escape, raw width 0
    val w2 = new BitW
    w2.bit(0); w2.bits(8, 6); w2.bit(0)
    w2.bits(0, 2); w2.bits(0, 4)
    w2.bits(15, 4); w2.bits(0, 5) // escape, raw = 0 → all-zero residual
    val f2 = withCrc16(frameHeader(0, 8) ++ w2.bytes)
    val (_, z) = Flac.decode(flacFile(8000, 1, 16, 8, f2))
    assert(z.toSeq == Seq.fill[Short](8)(0))
  }

  test("left/side decorrelation: side channel carries the extra bit") {
    // blockSize 4, left = [1000, -1000, 500, 0], side = left − right
    // with right = [900, -1100, 480, -40] → side = [100, 100, 20, 40]
    val left = Seq(1000, -1000, 500, 0)
    val side = Seq(100, 100, 20, 40)
    val w = new BitW
    w.bit(0); w.bits(1, 6); w.bit(0) // VERBATIM, 16-bit left
    for (v <- left) w.bits(v.toLong & 0xffff, 16)
    w.bit(0); w.bits(1, 6); w.bit(0) // VERBATIM, 17-bit side
    for (v <- side) w.bits(v.toLong & 0x1ffff, 17)
    val frame = withCrc16(frameHeader(8, 4) ++ w.bytes)
    val (_, got) = Flac.decode(flacFile(8000, 2, 16, 4, frame))
    // mix = floorDiv(left + (left − side) + 1, 2)
    assert(got.toSeq == Seq[Short](950, -1050, 490, -20))
  }

  test("a flipped byte fails the CRC and nulls the decode — corrupt bits never become samples") {
    val xs = Array.tabulate[Short](1000)(i => (3000 * math.sin(i / 17.0)).toShort)
    val good = Flac.flacBytes(8000, xs)
    assert(Flac.decode(good) != null)
    // flip one byte in the middle of the (single) frame payload
    val bad = good.clone()
    bad(bad.length - 40) = (bad(bad.length - 40) ^ 0x40).toByte
    assert(Flac.decode(bad) == null)
  }

  test("MID-STREAM corruption nulls the WHOLE decode — never a silently shorter clip") {
    // 3 frames; corrupt the SECOND so frame 1 already decoded cleanly
    val xs = Array.tabulate[Short](4096 * 3)(i => (2500 * math.sin(i / 13.0)).toShort)
    val good = Flac.flacBytes(8000, xs)
    assert(Flac.decode(good)._2.length == xs.length)
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x10).toByte
    assert(Flac.decode(bad) == null,
      "a corrupted middle frame must abort, not truncate")
    // a TORN TRAILING frame (clipped download) still keeps the clean prefix
    val torn = good.take(good.length - 200)
    val dec = Flac.decode(torn)
    assert(dec != null && dec._2.length == 4096 * 2, "clean frames survive a torn tail")
  }

  test("frame-number coding stays decodable at every width (the >=0x10000 desync guard)") {
    // spec-local decoder mirroring the frame parser's reader
    def roundTrip(v: Int): Int = {
      val bs = Flac.utf8NumberBytes(v)
      val first = bs(0) & 0xff
      var extra = 0
      var m = first
      while ((m & 0x80) != 0) { extra += 1; m = (m << 1) & 0xff }
      assert(extra != 1 && extra <= 7, s"v=$v bad lead ${first.toHexString}")
      assert(bs.length == math.max(extra, 1), s"v=$v length ${bs.length} vs extra $extra")
      var out = if (extra == 0) first else first & (0x7f >> extra)
      for (i <- 1 until bs.length) {
        assert((bs(i) & 0xc0) == 0x80, s"v=$v continuation ${bs(i).toHexString}")
        out = (out << 6) | (bs(i) & 0x3f)
      }
      out
    }
    for (v <- Seq(0, 1, 0x7f, 0x80, 0x7ff, 0x800, 0xffff, 0x10000, 0x200000,
        0x4000000, Int.MaxValue))
      assert(roundTrip(v) == v, s"v=$v")
  }

  test("a FIXED subframe whose warm-up exceeds the block aborts to null, not a truncated clip") {
    // frame 1 valid (blockSize 8, constant); frame 2 malformed:
    // blockSize 2 with FIXED order 4 — the warm-up alone overruns
    val w1 = new BitW
    w1.bit(0); w1.bits(0, 6); w1.bit(0) // CONSTANT
    w1.bits(7, 16)
    val f1 = withCrc16(frameHeader(0, 8) ++ w1.bytes)
    val w2 = new BitW
    w2.bit(0); w2.bits(12, 6); w2.bit(0) // FIXED order 4
    for (_ <- 0 until 4) w2.bits(1, 16)  // warm-up "samples"
    w2.bits(0, 2); w2.bits(0, 4); w2.bits(0, 4)
    val f2 = withCrc16(frameHeader(0, 2) ++ w2.bytes)
    assert(Flac.decode(flacFile(8000, 1, 16, 10, f1 ++ f2)) == null,
      "mid-stream malformed FIXED frame must abort, not truncate")
  }

  test("non-FLAC and truncated-below-STREAMINFO bytes decode to null") {
    assert(Flac.decode(null) == null)
    assert(Flac.decode(Array[Byte](1, 2, 3)) == null)
    assert(Flac.decode("fLaC".getBytes("US-ASCII")) == null)
    val xs = Array.fill[Short](100)(7)
    assert(Flac.decode(Flac.flacBytes(8000, xs).take(30)) == null)
  }

  // ---- integration: sniff + cross-codec fingerprint

  test("sniffMeta reports audio/flac with STREAMINFO-derived duration") {
    val xs = new Array[Short](16000) // 2 s at 8 kHz
    val (mime, wd, ht, dur) = Multimodal.sniffMeta(Flac.flacBytes(8000, xs))
    assert(mime == "audio/flac")
    assert(wd == null && ht == null)
    assert(dur == 2000L)
  }

  test("WAV and FLAC encodes of one master fingerprint IDENTICALLY (lossless cross-codec dedup)") {
    // broadband, time-varying clip — the fingerprint's home turf
    val xs = Array.tabulate[Short](16000) { j =>
      val t = j / 16000.0
      var s = 0.0
      for (h <- 1 to 10) {
        val env = 0.5 + 0.5 * math.sin(2 * math.Pi * (0.7 + 0.13 * h) * t)
        s += (4500.0 / h) * env * math.sin(2 * math.Pi * 350.0 * h * t)
      }
      math.max(Short.MinValue, math.min(Short.MaxValue, math.rint(s).toLong)).toShort
    }
    val hWav = Multimodal.audioFingerprint64(Multimodal.pcmWavBytes(16000, xs))
    val hFlac = Multimodal.audioFingerprint64(Flac.flacBytes(16000, xs))
    assert(hWav != null && hFlac != null)
    assert(hWav == hFlac, s"wav=$hWav flac=$hFlac")
  }
}
