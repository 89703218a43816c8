package graft.multimodal

/** FLAC (Free Lossless Audio Codec) — REAL sample decode, pure JVM
  * bit arithmetic over the public format (RFC 9639 / xiph.org spec).
  * Lossless means the decode contract is EXACT: bytes → the original
  * PCM, bit for bit — so a clip stored as WAV and as FLAC yields the
  * IDENTICAL [[Multimodal.audioFingerprint64]], closing the
  * cross-codec near-dup case for the archival encoding an LLM audio
  * corpus actually ships in. The reference (naqvis/CrysDA) has no
  * media support; this is scale-extension surface beside the WAV /
  * ADPCM decoders.
  *
  * Decoder coverage: all four subframe types (CONSTANT, VERBATIM,
  * FIXED orders 0–4, LPC orders 1–32), both residual coding methods
  * (4-bit and 5-bit Rice parameters) including escaped raw-bit
  * partitions, all stereo decorrelations (independent, left/side,
  * right/side, mid/side), wasted-bits shifting, 8/12/16/20/24-bit
  * sample sizes (and 32-bit with INDEPENDENT channels — a
  * decorrelated 32-bit side channel needs 33-bit samples, beyond the
  * Int decode path: such rare files null out rather than misdecode),
  * and every block-size / sample-rate header code.
  * Frame-header CRC-8 and whole-frame CRC-16 are VERIFIED — a
  * mismatch aborts the decode (returns null) rather than emitting
  * noise; the CRCs double as an independent check that the decoder's
  * bit accounting matches the encoder's.
  *
  * Multichannel mixes down by channel-averaging with half-up rounding
  * — the same deterministic mixdown as the WAV family decoder, so a
  * stereo FLAC whose channels duplicate a mono master decodes to
  * exactly the master.
  *
  * [[flacBytes]] is the fixture-side encoder (constant / fixed-order
  * / verbatim subframes chosen per block, Rice residuals, mid/side
  * stereo): specs round-trip arbitrary PCM through encode→decode and
  * require bit equality, which exercises the decoder against an
  * independently written bit producer. */
object Flac {

  // ---------------------------------------------------------------- bits

  /** MSB-first bit reader. Throws ArrayIndexOutOfBounds past the end —
    * callers catch and null out (torn download ≡ undecodable). */
  private final class BitReader(b: Array[Byte], var bytePos: Int) {
    var bitPos = 0 // 0..7, consumed bits of the current byte

    def readBit(): Int = {
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }

    /** n ≤ 32 bits, unsigned in an Int (n = 32 may be negative). */
    def readBits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }

    /** n ≤ 64 bits into a Long. */
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }

    /** n-bit two's-complement signed value. */
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val v = readBits(n)
      val shift = 32 - n
      (v << shift) >> shift
    }

    /** Unary: count of 0 bits before the terminating 1. */
    def readUnary(): Int = {
      var n = 0
      while (readBit() == 0) n += 1
      n
    }

    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def aligned: Boolean = bitPos == 0
  }

  /** MSB-first bit writer (encoder side). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0

    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { writeBit(((v >>> k) & 1L).toInt); k -= 1 }
    }

    def writeUnary(n: Int): Unit = {
      var k = 0
      while (k < n) { writeBit(0); k += 1 }
      writeBit(1)
    }

    def alignByte(): Unit = while (nBits != 0) writeBit(0)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ---------------------------------------------------------------- crc

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header checksum. */
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — frame checksum. */
  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------------- meta

  private def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 42 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** STREAMINFO fields needed downstream:
    * (sampleRate, channels, bitsPerSample, totalSamples, firstFrameOff)
    * or null when the magic / mandatory first block is absent. */
  private[multimodal] def streamInfo(b: Array[Byte])
      : (Int, Int, Int, Long, Int) = {
    if (!isFlac(b)) return null
    // metadata blocks: 1 byte (last<<7 | type), 3-byte BE length
    var i = 4
    var rate = -1; var ch = -1; var bps = -1; var total = -1L
    var last = false
    var sawInfo = false
    while (!last && i + 4 <= b.length) {
      val hdr = b(i) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val body = i + 4
      if (typ == 0 && len >= 34 && body + 34 <= b.length) {
        sawInfo = true
        val r = new BitReader(b, body)
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        rate = r.readBits(20)
        ch = r.readBits(3) + 1
        bps = r.readBits(5) + 1
        total = r.readBitsLong(36)
      }
      i = body + len
      if (len < 0 || i < body) return null // corrupt length
    }
    if (!sawInfo || rate <= 0 || i > b.length) return null
    (rate, ch, bps, total, i)
  }

  /** [[Multimodal.sniffMeta]]-shaped: ("audio/flac", null, null,
    * durationMs) — duration from STREAMINFO's total-samples field
    * (null when the encoder wrote 0 = unknown), or null non-FLAC. */
  private[graft] def sniff(b: Array[Byte])
      : (String, Integer, Integer, java.lang.Long) = {
    val si = streamInfo(b)
    if (si == null) null
    else {
      val dur = if (si._4 > 0) java.lang.Long.valueOf(si._4 * 1000 / si._1) else null
      ("audio/flac", null, null, dur)
    }
  }

  // ---------------------------------------------------------------- decode

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -6, -7,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val SampleRates = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -12, -13, -14, -1)
  private val SampleSizes = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Full-stream sample decode: (sampleRate, monoSamples) with the
    * same 16-bit mixdown conventions as the WAV family
    * ([[Multimodal.decodeWavSamples]]), or null for non-FLAC /
    * corrupt / CRC-failing input. Decodes every frame present; a
    * TRAILING torn frame ends the stream cleanly (clipped download),
    * but a CRC mismatch inside a structurally complete frame aborts
    * the whole decode — bad bits must not become "samples". */
  private[graft] def decode(b: Array[Byte]): (Int, Array[Short]) = {
    val si = streamInfo(b)
    if (si == null) return null
    val (rate, chInfo, bpsInfo, totalSamples, firstFrame) = si
    if (chInfo < 1 || chInfo > 8 || bpsInfo < 4) return null
    val out = new java.util.ArrayList[Array[Short]]()
    var pos = firstFrame
    var n = 0L
    try {
      while (pos + 2 <= b.length && (totalSamples <= 0 || n < totalSamples)) {
        decodeFrame(b, pos, rate, chInfo, bpsInfo) match {
          case null =>
            // a structurally complete but CRC-failing / malformed frame
            // ABORTS the whole decode (the object-header contract: bad
            // bits never become samples) — only a TORN TRAILING frame
            // (the catch below) ends the stream cleanly
            return null
          case (samples, nextPos) =>
            out.add(samples)
            n += samples.length
            pos = nextPos
        }
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException =>
        // torn trailing frame (clipped download): keep what fully
        // decoded, unless nothing did
        if (out.isEmpty) return null
    }
    if (out.isEmpty) return null
    var total = 0
    var i = 0
    while (i < out.size) { total += out.get(i).length; i += 1 }
    // STREAMINFO total-samples trims the final block's padding, the
    // same role the WAV `fact` chunk plays for ADPCM
    val keep = if (totalSamples > 0 && totalSamples < total) totalSamples.toInt else total
    val all = new Array[Short](keep)
    var o = 0
    i = 0
    while (i < out.size && o < keep) {
      val part = out.get(i)
      val c = math.min(part.length, keep - o)
      System.arraycopy(part, 0, all, o, c)
      o += c
      i += 1
    }
    (rate, all)
  }

  /** One frame at `pos` → (mixed samples, nextPos), or null on any
    * structural or CRC failure. */
  private def decodeFrame(b: Array[Byte], pos: Int, siRate: Int,
                          siCh: Int, siBps: Int): (Array[Short], Int) = {
    // ---- fixed 4-byte header prefix
    if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xfe) != 0xf8) return null
    val r = new BitReader(b, pos)
    r.readBits(15) // sync + reserved
    r.readBit() // blocking strategy (affects only the coded-number width)
    val bsCode = r.readBits(4)
    val srCode = r.readBits(4)
    val chAsgn = r.readBits(4)
    val ssCode = r.readBits(3)
    if (r.readBit() != 0) return null // reserved
    if (bsCode == 0 || srCode == 15 || chAsgn > 10 || SampleSizes(ssCode) < 0)
      return null
    // coded frame/sample number: UTF-8-shaped, 1..7 bytes — value unused
    val first = r.readBits(8)
    var extra = 0
    var m = first
    while ((m & 0x80) != 0) { extra += 1; m <<= 1 }
    if (extra == 1 || extra > 7) return null
    var k = 1
    while (k < extra) {
      if ((r.readBits(8) & 0xc0) != 0x80) return null
      k += 1
    }
    val blockSize = bsCode match {
      case 6 => r.readBits(8) + 1
      case 7 => r.readBits(16) + 1
      case c => BlockSizes(c)
    }
    srCode match {
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case _ => ()
    }
    val headerCrc = r.readBits(8)
    if (crc8(b, pos, r.bytePos - 1) != headerCrc) return null
    val bps = if (ssCode == 0) siBps else SampleSizes(ssCode)
    val nCh = if (chAsgn < 8) chAsgn + 1 else 2
    if (nCh != siCh) return null // frame must agree with STREAMINFO
    if (blockSize <= 0) return null

    // ---- subframes (side channel carries one extra bit)
    val chans = new Array[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      val sideBit = chAsgn match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + sideBit)
      if (chans(c) == null) return null
      c += 1
    }
    r.alignByte()
    val frameCrc = r.readBits(16)
    if (crc16(b, pos, r.bytePos - 2) != frameCrc) return null

    // ---- stereo decorrelation
    chAsgn match {
      case 8 => // left/side: right = left − side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right/side: left = right + side (decoded order: side, right)
        var i = 0
        while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          var mid = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }

    // ---- 16-bit conversion + channel-average mixdown (WAV conventions)
    val shift = bps - 16
    val mixed = new Array[Short](blockSize)
    var i = 0
    while (i < blockSize) {
      var sum = 0L
      c = 0
      while (c < nCh) {
        val v = chans(c)(i)
        sum += (if (shift >= 0) v >> shift else v << -shift)
        c += 1
      }
      mixed(i) = Math.floorDiv(sum + nCh / 2, nCh).toShort
      i += 1
    }
    (mixed, r.bytePos)
  }

  /** One subframe → reconstructed channel samples, or null. */
  private def decodeSubframe(r: BitReader, blockSize: Int, bpsIn: Int): Array[Int] = {
    if (r.readBit() != 0) return null // mandatory pad bit
    val typ = r.readBits(6)
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1
      else 0
    val bps = bpsIn - wasted
    if (bps <= 0 || bps > 32) return null
    val x = new Array[Int](blockSize)
    val ok = typ match {
      case 0 => // CONSTANT
        val v = r.readSigned(bps)
        java.util.Arrays.fill(x, v)
        true
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { x(i) = r.readSigned(bps); i += 1 }
        true
      case t if t >= 8 && t <= 12 => // FIXED, order = t − 8
        val order = t - 8
        if (order > blockSize) return null // malformed: warm-up > block
        var i = 0
        while (i < order) { x(i) = r.readSigned(bps); i += 1 }
        if (!decodeResidual(r, blockSize, order, x)) false
        else {
          // polynomial predictors (the binomial-coefficient family)
          i = order
          order match {
            case 0 => ()
            case 1 => while (i < blockSize) { x(i) += x(i - 1); i += 1 }
            case 2 => while (i < blockSize) { x(i) += 2 * x(i - 1) - x(i - 2); i += 1 }
            case 3 => while (i < blockSize) { x(i) += 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3); i += 1 }
            case _ => while (i < blockSize) { x(i) += 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4); i += 1 }
          }
          true
        }
      case t if t >= 32 => // LPC, order = t − 31
        val order = t - 31
        if (order > blockSize) false
        else {
          var i = 0
          while (i < order) { x(i) = r.readSigned(bps); i += 1 }
          val precision = r.readBits(4) + 1
          if (precision == 16) return null // 0b1111 is invalid per spec
          val lpShift = r.readSigned(5)
          if (lpShift < 0) return null
          val coefs = new Array[Int](order)
          i = 0
          while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
          if (!decodeResidual(r, blockSize, order, x)) false
          else {
            i = order
            while (i < blockSize) {
              var acc = 0L
              var j = 0
              while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
              x(i) += (acc >> lpShift).toInt
              i += 1
            }
            true
          }
        }
      case _ => false
    }
    if (!ok) return null
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { x(i) <<= wasted; i += 1 }
    }
    x
  }

  /** Rice-coded residual into x(order..blockSize); true on success. */
  private def decodeResidual(r: BitReader, blockSize: Int, order: Int,
                             x: Array[Int]): Boolean = {
    val method = r.readBits(2)
    if (method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partOrder = r.readBits(4)
    val nParts = 1 << partOrder
    if ((blockSize >> partOrder) << partOrder != blockSize) return false // must divide
    var i = order
    var p = 0
    while (p < nParts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) return false
      val param = r.readBits(paramBits)
      if (param == escape) {
        val raw = r.readBits(5)
        var k = 0
        while (k < count) { x(i) = if (raw == 0) 0 else r.readSigned(raw); i += 1; k += 1 }
      } else {
        var k = 0
        while (k < count) {
          val q = r.readUnary()
          val v = (q << param) | r.readBits(param)
          x(i) = (v >>> 1) ^ -(v & 1) // zigzag
          i += 1
          k += 1
        }
      }
      p += 1
    }
    true
  }

  // ---------------------------------------------------------------- encode

  /** Fixture-side FLAC encoder for specs and synthetic corpora:
    * mono (`Array[Short]`) or stereo (two equal-length arrays), fixed
    * 4096-sample blocks, per-block best-of {CONSTANT, FIXED order
    * 0–2 + Rice, VERBATIM} subframes, mid/side stereo. Lossless by
    * construction — decode(flacBytes(x)) == x is the round-trip
    * contract the specs pin. Written independently of [[decode]]
    * (its own bit accounting and CRC computation), so round-trip
    * equality genuinely cross-checks both. */
  private[graft] def flacBytes(sampleRate: Int, left: Array[Short],
                               right: Array[Short] = null): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad rate $sampleRate")
    val stereo = right != null
    if (stereo) require(right.length == left.length, "channel length mismatch")
    val n = left.length
    val block = 4096
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, marked last metadata block
    val si = new BitWriter
    si.writeBits(block, 16); si.writeBits(block, 16) // min/max block size
    si.writeBits(0, 24); si.writeBits(0, 24)         // frame sizes unknown
    si.writeBits(sampleRate, 20)
    si.writeBits(if (stereo) 1 else 0, 3)            // channels − 1
    si.writeBits(15, 5)                              // bps − 1 = 15
    si.writeBits(n.toLong, 36)
    var z = 0
    while (z < 16) { si.writeBits(0, 8); z += 1 }    // MD5 unknown
    val siBytes = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)

    var start = 0
    var frameNo = 0
    while (start < n) {
      val len = math.min(block, n - start)
      val w = new BitWriter
      // header: sync+reserved+fixed-blocking, bs code 7 (16-bit at end),
      // sr code 0 (STREAMINFO), channel assignment, ss code 4 (16-bit)
      w.writeBits(0xfff8, 16)
      w.writeBits(7, 4)
      w.writeBits(0, 4)
      w.writeBits(if (stereo) 10 else 0, 4) // mid/side for stereo
      w.writeBits(4, 3)
      w.writeBit(0)
      writeUtf8Number(w, frameNo)
      w.writeBits(len - 1, 16)
      val hdr = w.toBytes // BitWriter pads to byte — header is byte-aligned here
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(hdr, 0, hdr.length)
      frame.write(crc8immutable(hdr))
      // subframes
      val body = new BitWriter
      if (stereo) {
        val mid = new Array[Int](len)
        val side = new Array[Int](len)
        var i = 0
        while (i < len) {
          val l = left(start + i).toInt
          val r = right(start + i).toInt
          mid(i) = (l + r) >> 1
          side(i) = l - r
          i += 1
        }
        writeSubframe(body, mid, 16)
        writeSubframe(body, side, 17)
      } else {
        val xs = new Array[Int](len)
        var i = 0
        while (i < len) { xs(i) = left(start + i).toInt; i += 1 }
        writeSubframe(body, xs, 16)
      }
      val bodyBytes = body.toBytes // aligned with zero padding per spec
      frame.write(bodyBytes, 0, bodyBytes.length)
      val fb = frame.toByteArray
      val c16 = crc16(fb, 0, fb.length)
      out.write(fb, 0, fb.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      start += len
      frameNo += 1
    }
    out.toByteArray
  }

  private def crc8immutable(b: Array[Byte]): Int = crc8(b, 0, b.length)

  /** Frame/sample number in the header's UTF-8-shaped coding, all
    * widths up to the 31-bit frame-number ceiling (a 2-byte prefix
    * on a ≥ 0x10000 value would desync the whole header parse —
    * caught in review, pinned in FlacSpec via [[utf8NumberBytes]]). */
  private[graft] def utf8NumberBytes(v: Int): Array[Byte] = {
    require(v >= 0, s"frame number must be non-negative, got $v")
    if (v < 0x80) Array(v.toByte)
    else {
      // n continuation bytes carry 6 bits each; the lead byte carries
      // (6 - n) bits under an (n+1)-one-bits prefix
      var nCont = 1
      while (nCont < 6 && (v >>> (6 * nCont)) >= (1 << (6 - nCont))) nCont += 1
      val out = new Array[Byte](nCont + 1)
      val leadPrefix = (0xff << (7 - nCont)) & 0xff
      out(0) = (leadPrefix | (v >>> (6 * nCont))).toByte
      var i = 1
      while (i <= nCont) {
        out(i) = (0x80 | ((v >>> (6 * (nCont - i))) & 0x3f)).toByte
        i += 1
      }
      out
    }
  }

  private def writeUtf8Number(w: BitWriter, v: Int): Unit =
    utf8NumberBytes(v).foreach(b => w.writeBits(b & 0xff, 8))

  /** Best-of subframe encode: CONSTANT when flat, else the cheaper of
    * FIXED order 0/1/2 with a single-partition Rice residual and
    * VERBATIM. */
  private def writeSubframe(w: BitWriter, x: Array[Int], bps: Int): Unit = {
    val n = x.length
    var flat = true
    var i = 1
    while (flat && i < n) { flat = x(i) == x(0); i += 1 }
    if (flat) {
      w.writeBit(0); w.writeBits(0, 6); w.writeBit(0)
      w.writeBits(x(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // candidate residuals for fixed orders 0..2
    var bestOrder = -1
    var bestBits = n.toLong * bps // verbatim cost
    var bestRes: Array[Int] = null
    var bestParam = 0
    var order = 0
    while (order <= math.min(2, n - 1)) {
      val res = new Array[Int](n - order)
      i = order
      while (i < n) {
        res(i - order) = order match {
          case 0 => x(i)
          case 1 => x(i) - x(i - 1)
          case _ => x(i) - 2 * x(i - 1) + x(i - 2)
        }
        i += 1
      }
      // rice parameter from the mean magnitude; cost measured exactly
      var p = 0
      var bestPBits = Long.MaxValue
      var bestP = 0
      while (p < 15) {
        var bits = 0L
        var j = 0
        while (j < res.length && bits < bestBits * 2) {
          val v = res(j)
          val u = (v << 1) ^ (v >> 31) // zigzag
          bits += (u >>> p) + 1 + p
          j += 1
        }
        if (bits < bestPBits) { bestPBits = bits; bestP = p }
        p += 1
      }
      val total = order.toLong * bps + 2 + 4 + 4 + bestPBits
      if (total < bestBits && res.length > 0) {
        bestBits = total
        bestOrder = order
        bestRes = res
        bestParam = bestP
      }
      order += 1
    }
    if (bestOrder < 0) {
      // VERBATIM
      w.writeBit(0); w.writeBits(1, 6); w.writeBit(0)
      i = 0
      while (i < n) { w.writeBits(x(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      return
    }
    w.writeBit(0); w.writeBits(8 + bestOrder, 6); w.writeBit(0)
    i = 0
    while (i < bestOrder) { w.writeBits(x(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    w.writeBits(0, 2) // residual method 0 (4-bit rice)
    w.writeBits(0, 4) // partition order 0
    w.writeBits(bestParam, 4)
    i = 0
    while (i < bestRes.length) {
      val v = bestRes(i)
      val u = (v << 1) ^ (v >> 31)
      w.writeUnary(u >>> bestParam)
      w.writeBits(u & ((1 << bestParam) - 1), bestParam)
      i += 1
    }
  }
}
