package graft.multimodal

/** MPEG audio (MP3) frame-header walk — container METADATA only, no
  * sample decode (perceptual-audio synthesis is explicitly scoped out;
  * see [[Multimodal.fakeDecodeFeature]]'s contract).
  *
  * WHY the scope-out is permanent under this library's constraints,
  * not a deferred TODO: a conforming Layer I–III decoder requires the
  * ISO 11172-3 CONSTANT TABLES — the 512-coefficient synthesis-window
  * D, 34 Huffman code tables (~1,400 codeword/length pairs), and the
  * per-rate scalefactor-band boundaries — none of which are derivable
  * from a formula the way FLAC's whole bitstream layer is
  * ([[Flac]] gets a full decoder precisely because every constant it
  * needs IS formulaic and CRC-cross-checkable). Embedding
  * reconstructed-from-memory tables that no reference data can
  * validate would risk silently wrong samples; the library's
  * refuse-early contract treats "decodes to noise" as strictly worse
  * than "declares no decode". A swap-in codec binding changes only
  * feature VALUES (see fakeDecodeFeature), so the scope-out costs no
  * pipeline shape.
  *
  * Pure JVM byte
  * arithmetic over the public ISO/IEC 11172-3 / 13818-3 header layout:
  * 11-bit sync, version/layer ids, bitrate + sample-rate table indexes,
  * padding bit. The walk chains frame to frame using each header's own
  * computed byte length, so duration and mean bitrate come from the
  * actual frame sequence (correct for VBR streams, where the first
  * frame's bitrate lies), and a leading ID3v2 tag is skipped via its
  * syncsafe size.
  *
  * False-positive control: sync words occur in random bytes about once
  * per 2^11, so sniffing requires [[MinFrames]] CONSECUTIVE parseable
  * frames (each chained header is a fresh ~21-bit check) before
  * claiming `audio/mpeg` — random payloads fall through to null.
  *
  * The reference (naqvis/CrysDA) has no media support at all; this is
  * scale-extension surface alongside the WAV/MP4 sniffers. */
object Mp3 {

  /** Frames required to chain before the bytes count as MP3. */
  val MinFrames = 3

  // sample-rate table, MPEG-1 row; MPEG-2 halves it, MPEG-2.5 quarters
  private val srMpeg1 = Array(44100, 48000, 32000)
  // bitrate tables in kbps, indexed by the 4-bit header field
  // (index 0 = "free format" — size-indeterminate, refused; 15 = bad)
  private val brV1L1  = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
  private val brV1L2  = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)
  private val brV1L3  = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val brV2L1  = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0)
  private val brV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)

  /** Valid frame at offset `i`? Returns
    * (frameBytes, samplesPerFrame, sampleRate, bitrateKbps), else null. */
  private def frameAt(b: Array[Byte], i: Int): (Int, Int, Int, Int) = {
    if (i < 0 || i + 4 > b.length) return null
    val h = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    if ((h & 0xFFE00000) != 0xFFE00000) return null // 11-bit sync
    val ver = (h >>> 19) & 3   // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layer = (h >>> 17) & 3 // 1=III, 2=II, 3=I, 0=reserved
    val brIdx = (h >>> 12) & 15
    val srIdx = (h >>> 10) & 3
    val pad = (h >>> 9) & 1
    if (ver == 1 || layer == 0 || srIdx == 3 || brIdx == 0 || brIdx == 15)
      return null
    val mpeg1 = ver == 3
    val sampleRate = srMpeg1(srIdx) >> (ver match {
      case 3 => 0 // MPEG-1
      case 2 => 1 // MPEG-2
      case _ => 2 // MPEG-2.5
    })
    val kbps = (mpeg1, layer) match {
      case (true, 3)  => brV1L1(brIdx)
      case (true, 2)  => brV1L2(brIdx)
      case (true, _)  => brV1L3(brIdx)
      case (false, 3) => brV2L1(brIdx)
      case (false, _) => brV2L23(brIdx)
    }
    val (samples, frameBytes) = layer match {
      case 3 => (384, (12 * kbps * 1000 / sampleRate + pad) * 4) // Layer I
      case 2 => (1152, 144 * kbps * 1000 / sampleRate + pad)     // Layer II
      case _ =>                                                  // Layer III
        if (mpeg1) (1152, 144 * kbps * 1000 / sampleRate + pad)
        else (576, 72 * kbps * 1000 / sampleRate + pad)
    }
    // the WHOLE frame must fit: a torn trailing frame (truncated
    // download) is not counted toward duration
    if (frameBytes <= 4 || i + frameBytes > b.length) return null
    (frameBytes, samples, sampleRate, kbps)
  }

  /** Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size +
    * 10-byte header, +10 more when the footer flag is set); 0 if none. */
  private def id3v2Skip(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
  }

  /** Full-stream walk: (frames, durationMs, meanBitrateKbps,
    * sampleRate-of-first-frame), or null under [[MinFrames]] chained
    * frames. Scans up to `probe` bytes past the ID3 tag for the first
    * sync (leading junk tolerance), then requires back-to-back frames;
    * trailing bytes (e.g. a 128-byte ID3v1 "TAG" block) end the walk
    * cleanly. */
  private[graft] def walk(b: Array[Byte], probe: Int = 4096)
      : (Int, Long, Int, Int) = {
    if (b == null) return null
    var i = id3v2Skip(b)
    if (i < 0 || i >= b.length) return null
    val scanEnd = math.min(b.length.toLong, i.toLong + probe).toInt
    var first: (Int, Int, Int, Int) = null
    while (i < scanEnd && first == null) {
      first = frameAt(b, i)
      if (first == null) i += 1
    }
    if (first == null) return null
    var frames = 0
    var durMs = 0.0
    var kbpsSum = 0L
    var cur = first
    while (cur != null) {
      val (len, samples, rate, kbps) = cur
      frames += 1
      durMs += samples * 1000.0 / rate
      kbpsSum += kbps
      i += len
      cur = frameAt(b, i)
    }
    if (frames < MinFrames) null
    else (frames, math.round(durMs), (kbpsSum / frames).toInt, first._3)
  }

  /** [[Multimodal.sniffMeta]]-shaped result:
    * ("audio/mpeg", null, null, durationMs), or null. */
  private[graft] def sniff(b: Array[Byte])
      : (String, Integer, Integer, java.lang.Long) = {
    val w = walk(b)
    if (w == null) null
    else ("audio/mpeg", null, null, java.lang.Long.valueOf(w._2))
  }

  /** Synthetic MPEG-1 Layer III stream: valid chained frame headers
    * with deterministic (id-derived) junk payload bytes — headers are
    * REAL and walkable, samples are not meant to decode (no sample
    * decoder exists here). 128 kbps @ 44100 Hz → 417/418-byte frames
    * (padding alternated), `nFrames` × 1152 samples. */
  private[graft] def mp3Bytes(nFrames: Int, id: Long,
                                   withId3: Boolean = false): Array[Byte] = {
    val rate = 44100
    val kbps = 128
    val base = 144 * kbps * 1000 / rate // 417
    val id3 = if (withId3) {
      val tag = new Array[Byte](10 + 32) // empty 32-byte ID3v2.3 body
      tag(0) = 'I'; tag(1) = 'D'; tag(2) = '3'; tag(3) = 3
      tag(9) = 32 // syncsafe size, < 128 so one byte suffices
      tag
    } else Array.empty[Byte]
    val out = new java.io.ByteArrayOutputStream()
    out.write(id3, 0, id3.length)
    var f = 0
    var h = id * 0x9E3779B97F4A7C15L
    while (f < nFrames) {
      val pad = f % 2 // exercise both padded and unpadded lengths
      val len = base + pad
      // sync=11x1, MPEG-1 (11), Layer III (01), no CRC (1) → 0xFF 0xFB
      out.write(0xFF); out.write(0xFB)
      // bitrate idx 9 (128k), sr idx 0 (44100), padding bit, private=0
      out.write((9 << 4) | (0 << 2) | (pad << 1))
      out.write(0x44) // joint stereo, no mode ext/copyright/original
      var j = 4
      while (j < len) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out.write((h & 0xff).toInt)
        j += 1
      }
      f += 1
    }
    out.toByteArray
  }
}
