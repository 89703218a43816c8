package graft.multimodal

/** Pure-JVM ISO BMFF (MP4) container metadata: a box-tree walker for
  * sniffing and a minimal writer for synthetic test media.
  *
  * MP4 metadata does NOT need a codec: the movie header (`mvhd`)
  * carries timescale + duration and the track header (`tkhd`) carries
  * presentation width/height as 16.16 fixed-point, all at fixed
  * offsets defined by ISO/IEC 14496-12. The walker handles the
  * full box framing — 32-bit sizes, 64-bit `largesize` (size==1),
  * size==0 (box extends to EOF) — and both version 0 (32-bit times)
  * and version 1 (64-bit times) of `mvhd`/`tkhd`.
  *
  * The writer emits a structurally valid box tree
  * (`ftyp`/`moov`/`mvhd`/`trak`/`tkhd`/`mdia`/`mdhd`/`hdlr` + `mdat`)
  * with real geometry and duration. It carries no sample tables
  * (`stbl`), so it is NOT playable — the honest tier here is
  * container METADATA, mirroring what the sniffer reads from
  * real-world files; frame pixel decode stays stubbed
  * (reference scope: multimodal plumbing, SURVEY §7.2 step 8).
  */
object Mp4 {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True when the buffer starts with a plausible `ftyp` box — the
    * ISO BMFF signature (size ≥ 16, within the buffer). */
  private[graft] def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 16 && boxType(b, 4) == "ftyp" && {
      val sz = be32(b, 0)
      sz >= 16 && sz % 4 == 0 && sz <= b.length
    }

  /** Walk one box level in [start, end): invokes `f(type, payloadOff,
    * payloadEnd)` per box; `f` returning true stops the walk. Malformed
    * sizes (overlapping, non-advancing, out of range) end the walk —
    * the contract is null-on-anything-not-parseable, never a crash. */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Boolean): Unit = {
    var p = start
    var go = true
    while (go && p + 8 <= end) {
      val sz32 = be32(b, p)
      val t = boxType(b, p + 4)
      var hdr = 8
      var sz = sz32
      if (sz32 == 1) {
        if (p + 16 > end) return
        sz = be64(b, p + 8); hdr = 16
      } else if (sz32 == 0) sz = (end - p).toLong // box extends to EOF
      if (sz < hdr || sz > end - p) return
      go = !f(t, p + hdr, p + sz.toInt)
      p += sz.toInt
    }
  }

  /** Container metadata from the box tree: (mime, width, height,
    * durationMs), nulls for whatever is absent/unparseable. Width and
    * height come from the first video-sized `tkhd` (16.16 fixed point,
    * rounded); duration from `mvhd` timescale+duration. */
  private[graft] def sniff(b: Array[Byte]): (String, Integer, Integer, java.lang.Long) = {
    if (!isMp4(b)) return null
    // brand → mime: audio-only brands exist, but dims decide below too
    val brand = boxType(b, 8)
    var mime = brand match {
      case "M4A " => "audio/mp4"
      case "qt  " => "video/quicktime"
      case _      => "video/mp4"
    }
    var timescale = 0L; var duration = -1L
    var width: Integer = null; var height: Integer = null
    var sawMoov = false
    walkBoxes(b, 0, b.length) { (t, off, end) =>
      if (t == "moov") {
        sawMoov = true
        walkBoxes(b, off, end) { (t2, off2, end2) =>
          if (t2 == "mvhd" && end2 - off2 >= 20) {
            val v = u8(b, off2)
            if (v == 1 && end2 - off2 >= 32) {
              timescale = be32(b, off2 + 20)
              duration = be64(b, off2 + 24)
            } else if (v == 0) {
              timescale = be32(b, off2 + 12)
              duration = be32(b, off2 + 16)
              if (duration == 0xFFFFFFFFL) duration = -1L // "unknown" sentinel
            }
          }
          if (t2 == "trak" && width == null) {
            walkBoxes(b, off2, end2) { (t3, off3, end3) =>
              if (t3 == "tkhd") {
                val v = u8(b, off3)
                // after version+flags: v0 = 2×4B times, v1 = 2×8B;
                // then id(4) reserved(4) duration(4|8) reserved(8)
                // layer(2) altgroup(2) volume(2) reserved(2) matrix(36).
                // Versions beyond 1 have unknown layout — refuse,
                // don't guess with v0 offsets
                val dimOff = off3 + 4 + (if (v == 1) 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4) +
                  8 + 2 + 2 + 2 + 2 + 36
                if (v <= 1 && dimOff + 8 <= end3) {
                  val w = math.round(be32(b, dimOff) / 65536.0).toInt
                  val h = math.round(be32(b, dimOff + 4) / 65536.0).toInt
                  if (w > 0 && h > 0) { width = w; height = h }
                }
                true
              } else false
            }
          }
          false // keep scanning moov children (mvhd and every trak)
        }
        true // moov found — stop the top-level walk
      } else false
    }
    // no video-sized track in a PARSED moov → audio-only file; a torn
    // or absent moov proves nothing, keep the brand's claim
    if (sawMoov && width == null && mime == "video/mp4") mime = "audio/mp4"
    // duration * 1000 must not overflow for hostile 64-bit durations —
    // corrupt values report null, not a negative duration
    val durMs: java.lang.Long =
      if (timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000)
        java.lang.Long.valueOf(duration * 1000 / timescale)
      else null
    (mime, width, height, durMs)
  }

  // -------------------------------------------------------------------
  // writer (synthetic test media)
  // -------------------------------------------------------------------

  private def box(t: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(total)
    out.putInt(total).put(t.getBytes("US-ASCII"))
    payload.foreach(out.put)
    out.array()
  }

  private val identityMatrix: Array[Byte] = {
    val m = java.nio.ByteBuffer.allocate(36)
    m.putInt(0x00010000).putInt(0).putInt(0)
    m.putInt(0).putInt(0x00010000).putInt(0)
    m.putInt(0).putInt(0).putInt(0x40000000)
    m.array()
  }

  /** Structurally valid MP4 with real `mvhd`/`tkhd`/`mdhd` metadata and
    * a deterministic opaque `mdat` payload (no sample tables — see the
    * object doc). timescale fixed at 1000 so duration ticks == ms. */
  private[graft] def mp4Bytes(w: Int, h: Int, durationMs: Long, id: Long): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII"),
      java.nio.ByteBuffer.allocate(4).putInt(0x200).array(),
      "isomiso2mp41".getBytes("US-ASCII"))
    val mvhd = {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0)                     // version 0 + flags
        .putInt(0).putInt(0)          // creation / modification
        .putInt(1000)                 // timescale: 1 tick = 1 ms
        .putInt(durationMs.toInt)     // duration
        .putInt(0x00010000)           // rate 1.0
        .putShort(0x0100.toShort)     // volume 1.0
        .putShort(0)                  // reserved
        .putInt(0).putInt(0)          // reserved
        .put(identityMatrix)
      p.position(p.position() + 24)   // pre_defined[6]
      p.putInt(2)                     // next_track_ID
      p.array()
    }
    val tkhd = {
      val p = java.nio.ByteBuffer.allocate(84)
      p.putInt(7)                     // version 0 + flags: enabled|in_movie|in_preview
        .putInt(0).putInt(0)          // creation / modification
        .putInt(1)                    // track_ID
        .putInt(0)                    // reserved
        .putInt(durationMs.toInt)     // duration (movie timescale)
        .putInt(0).putInt(0)          // reserved
        .putShort(0).putShort(0)      // layer, alternate_group
        .putShort(0).putShort(0)      // volume (video: 0), reserved
        .put(identityMatrix)
        .putInt(w << 16)              // width, 16.16
        .putInt(h << 16)              // height, 16.16
      p.array()
    }
    val mdhd = {
      val p = java.nio.ByteBuffer.allocate(24)
      p.putInt(0).putInt(0).putInt(0)
        .putInt(1000).putInt(durationMs.toInt)
        .putShort(0x55C4.toShort)     // language: 'und'
        .putShort(0)
      p.array()
    }
    val hdlr = {
      val name = "graft synthetic video".getBytes("US-ASCII")
      val p = java.nio.ByteBuffer.allocate(24 + name.length + 1)
      p.putInt(0).putInt(0)
        .put("vide".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0)
        .put(name).put(0.toByte)
      p.array()
    }
    val mdat = {
      val n = 64 + (id % 192).toInt
      val bs = new Array[Byte](n)
      var hsh = id * 0x9E3779B97F4A7C15L
      var i = 0
      while (i < n) { hsh ^= hsh << 13; hsh ^= hsh >>> 7; hsh ^= hsh << 17; bs(i) = hsh.toByte; i += 1 }
      bs
    }
    ftyp ++ box("moov", box("mvhd", mvhd),
      box("trak", box("tkhd", tkhd),
        box("mdia", box("mdhd", mdhd), box("hdlr", hdlr)))) ++
      box("mdat", mdat)
  }
}
