package graft.multimodal

/** Minimal AVI (RIFF) container support — enough to make video FRAME
  * decode REAL for the one codec this library can decode pure-JVM:
  * MJPEG, where every '00dc' chunk is a complete baseline/progressive
  * JPEG that [[Jpeg.decode]] already handles. Geometry and timing come
  * from the main 'avih' header; frames from the 'movi' list. No codec
  * library anywhere; hostile bytes refuse with null.
  *
  * Layout written/read (the common single-video-stream shape):
  * {{{
  * RIFF <size> 'AVI '
  *   LIST 'hdrl' [ 'avih'(56) , LIST 'strl' [ 'strh'(56), 'strf'(40) ] ]
  *   LIST 'movi' [ '00dc' <jpeg bytes> ... ]
  * }}}
  */
object Avi {

  /** Hard cap on INDEXED frames — a hostile header cannot make the
    * walker allocate unboundedly. A container with more movi chunks is
    * still valid: the walk keeps parsing (headers, geometry, duration)
    * and simply stops RECORDING frame offsets, so an over-long but
    * well-formed video sniffs/decodes normally with only frames past
    * the cap unaddressable — rejecting the whole file would silently
    * turn "large" into "undecodable". */
  private val MaxFrames = 100000

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")

  private[graft] def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  /** (usPerFrame, totalFrames, width, height, frame (offset,size) list)
    * or null for anything that is not a walkable AVI. */
  private def parse(b: Array[Byte]): (Long, Long, Int, Int, Vector[(Int, Int)]) = {
    if (!isAvi(b)) return null
    val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    var usPerFrame = 0L
    var totalFrames = 0L
    var w = 0
    var h = 0
    var frames = Vector.empty[(Int, Int)]

    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val cc = fourcc(b, i)
        val sz = le32(b, i + 4)
        if (sz < 0 || sz > to - i - 8) return false // corrupt size
        val dataOff = i + 8
        if (cc == "LIST") {
          if (sz < 4) return false
          val listType = fourcc(b, dataOff)
          if (!walk(dataOff + 4, dataOff + sz.toInt,
            inMovi || listType == "movi")) return false
        } else if (cc == "avih") {
          if (sz < 40) return false
          usPerFrame = le32(b, dataOff)
          totalFrames = le32(b, dataOff + 16)
          w = le32(b, dataOff + 32).toInt
          h = le32(b, dataOff + 36).toInt
        } else if (inMovi && cc.length == 4 &&
          Character.isDigit(cc(0)) && Character.isDigit(cc(1)) &&
          (cc.endsWith("dc") || cc.endsWith("db"))) {
          if (frames.size < MaxFrames) // past the cap: parse on, index off
            frames :+= ((dataOff, sz.toInt))
        }
        i = dataOff + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
      true
    }

    if (!walk(12, end, inMovi = false)) return null
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535) return null
    (usPerFrame, totalFrames, w, h, frames)
  }

  /** Container metadata in [[Multimodal.sniffMeta]]'s shape:
    * (mime, width, height, durationMs), or null. */
  private[graft] def sniff(b: Array[Byte])
      : (String, Integer, Integer, java.lang.Long) = {
    val p = parse(b)
    if (p == null) return null
    val (usPerFrame, totalFrames, w, h, frames) = p
    val n = if (totalFrames > 0) totalFrames else frames.size.toLong
    val dur =
      if (usPerFrame > 0 && n > 0) java.lang.Long.valueOf(usPerFrame * n / 1000)
      else null
    ("video/x-msvideo", Integer.valueOf(w), Integer.valueOf(h), dur)
  }

  /** Number of stored video frames (movi chunks), 0 if not an AVI. */
  private[graft] def frameCount(b: Array[Byte]): Int = {
    val p = parse(b)
    if (p == null) 0 else p._5.size
  }

  /** The k-th stored video frame's payload (for MJPEG: a complete
    * JPEG), or null when out of range / not an AVI. */
  private[graft] def frame(b: Array[Byte], k: Int): Array[Byte] = {
    val p = parse(b)
    if (p == null || k < 0 || k >= p._5.size) return null
    val (off, sz) = p._5(k)
    java.util.Arrays.copyOfRange(b, off, off + sz)
  }

  /** Complete MJPEG AVI from per-frame JPEG payloads — decodable by
    * [[frame]] + [[Jpeg.decode]] and by external players. */
  private[graft] def mjpegAvi(w: Int, h: Int, fps: Int,
                              frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty, "bad MJPEG AVI args")
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(cc.getBytes("US-ASCII")).putInt(data.length).put(data)
      out.array()
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)

    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h) // + 16 reserved bytes of zeros
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps).putInt(0).putInt(frames.size)
      .putInt(0).putInt(-1).putInt(0) // bufSize, quality, sampleSize
    val strf = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }
}
