package graft

import graft.multimodal.Multimodal
import java.awt.Color
import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode
import org.apache.spark.sql.functions._

/** multimodal.Multimodal animated-GIF decode: frames composed with
  * GIF89a semantics (offsets, disposal methods), fixtures written by
  * the JDK's own GIF encoder — an independent implementation, the same
  * golden legitimacy as the ImageIO JPEG/PNG pins. Colors are pure
  * primaries so palette quantization is exact by construction. */
class GifAnimSpec extends GraftSpec {

  import spark.implicits._

  // -- fixture writer (ImageIO sequence with per-frame metadata) ------

  private def node(parent: IIOMetadataNode, name: String): IIOMetadataNode = {
    var i = 0
    while (i < parent.getLength) {
      val c = parent.item(i)
      if (c.getNodeName == name) return c.asInstanceOf[IIOMetadataNode]
      i += 1
    }
    val fresh = new IIOMetadataNode(name)
    parent.appendChild(fresh)
    fresh
  }

  /** frames: (image, delay in centiseconds, disposal method name,
    * (left, top) canvas offset). */
  private def animGif(frames: Seq[(BufferedImage, Int, String, (Int, Int))]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for ((img, delayCs, disposal, (left, top)) <- frames) {
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), null)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = node(root, "GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      val desc = node(root, "ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", img.getWidth.toString)
      desc.setAttribute("imageHeight", img.getHeight.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  private def solid(w: Int, h: Int, c: Color): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    val g = img.createGraphics()
    g.setColor(c); g.fillRect(0, 0, w, h); g.dispose()
    img
  }

  /** (r, g, b) of canvas pixel (x, y) — the decoder stores BGR. */
  private def px(canvas: Array[Byte], sw: Int, x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * sw + x) * 3
    ((canvas(o + 2) & 0xff), (canvas(o + 1) & 0xff), (canvas(o) & 0xff))
  }

  private val RED = (255, 0, 0)
  private val GREEN = (0, 255, 0)
  private val BLUE = (0, 0, 255)
  private val WHITE = (255, 255, 255)

  test("full-canvas frames: count, dims, delays, exact colors") {
    val gif = animGif(Seq(
      (solid(20, 16, Color.RED), 10, "none", (0, 0)),
      (solid(20, 16, Color.GREEN), 20, "none", (0, 0)),
      (solid(20, 16, Color.BLUE), 30, "none", (0, 0))))
    val (sw, sh, frames) = Multimodal.decodeGifFrames(gif)
    assert((sw, sh) == (20, 16))
    assert(frames.map(_._1).toSeq == Seq(10, 20, 30))
    for (((want, (_, canvas)), i) <- Seq(RED, GREEN, BLUE).zip(frames).zipWithIndex;
         (x, y) <- Seq((0, 0), (10, 8), (19, 15)))
      assert(px(canvas, sw, x, y) == want, s"frame $i at ($x,$y)")
  }

  test("sub-frame updates compose onto the prior canvas at their offset") {
    val gif = animGif(Seq(
      (solid(20, 16, Color.WHITE), 5, "none", (0, 0)),
      (solid(8, 6, Color.RED), 5, "none", (5, 4))))
    val (sw, _, frames) = Multimodal.decodeGifFrames(gif)
    assert(frames.length == 2)
    val canvas = frames(1)._2
    assert(px(canvas, sw, 5, 4) == RED)     // inside the overlay
    assert(px(canvas, sw, 12, 9) == RED)    // overlay far corner
    assert(px(canvas, sw, 4, 4) == WHITE)   // left of it: prior frame
    assert(px(canvas, sw, 13, 9) == WHITE)  // right of it
    assert(px(canvas, sw, 0, 0) == WHITE)
  }

  test("restoreToPrevious disposal reverts the overlay before the next frame") {
    val gif = animGif(Seq(
      (solid(20, 16, Color.WHITE), 5, "none", (0, 0)),
      (solid(8, 6, Color.RED), 5, "restoreToPrevious", (0, 0)),
      (solid(4, 4, Color.BLUE), 5, "none", (12, 10))))
    val (sw, _, frames) = Multimodal.decodeGifFrames(gif)
    assert(frames.length == 3)
    assert(px(frames(1)._2, sw, 2, 2) == RED,
      "the overlay must be VISIBLE in its own frame")
    assert(px(frames(2)._2, sw, 2, 2) == WHITE,
      "restoreToPrevious must revert the overlay region afterwards")
    assert(px(frames(2)._2, sw, 13, 11) == BLUE)
  }

  test("doNotDispose leaves the overlay; restoreToBackgroundColor clears it") {
    def build(disposal: String) = animGif(Seq(
      (solid(20, 16, Color.WHITE), 5, "none", (0, 0)),
      (solid(8, 6, Color.RED), 5, disposal, (0, 0)),
      (solid(4, 4, Color.BLUE), 5, "none", (12, 10))))
    val keep = Multimodal.decodeGifFrames(build("doNotDispose"))
    assert(px(keep._3(2)._2, keep._1, 2, 2) == RED,
      "doNotDispose must leave the overlay in place")
    val clear = Multimodal.decodeGifFrames(build("restoreToBackgroundColor"))
    assert(px(clear._3(2)._2, clear._1, 2, 2) != RED,
      "restoreToBackgroundColor must clear the overlay region")
  }

  test("gifAnimInfo counts frames and sums delays without pixel work") {
    val gif = animGif(Seq(
      (solid(20, 16, Color.RED), 10, "none", (0, 0)),
      (solid(20, 16, Color.GREEN), 20, "none", (0, 0)),
      (solid(20, 16, Color.BLUE), 30, "none", (0, 0))))
    assert(Multimodal.gifAnimInfo(gif) == ((3, 60L)))
    // the sniffer surfaces it as a duration (centiseconds → ms)
    val (mime, w, h, dur) = Multimodal.sniffMeta(gif)
    assert(mime == "image/gif" && w == 20 && h == 16)
    assert(dur == 600L)
    // a single-frame GIF stays a still: no duration
    val still = animGif(Seq((solid(20, 16, Color.RED), 10, "none", (0, 0))))
    assert(Multimodal.sniffMeta(still)._4 == null)
  }

  test("mid-file corruption truncates to the decoded frames, not null") {
    val gif = animGif(Seq(
      (solid(20, 16, Color.RED), 10, "none", (0, 0)),
      (solid(20, 16, Color.GREEN), 20, "none", (0, 0)),
      (solid(20, 16, Color.BLUE), 30, "none", (0, 0))))
    // chop inside the final frame's data: earlier frames must survive
    val chopped = java.util.Arrays.copyOfRange(gif, 0, gif.length - 20)
    val got = Multimodal.decodeGifFrames(chopped)
    assert(got != null && got._3.nonEmpty && got._3.length < 3,
      s"expected a truncated prefix, got ${if (got == null) "null" else got._3.length}")
    assert(px(got._3(0)._2, got._1, 10, 8) == RED)
  }

  test("sampleVideoFrames explodes animated GIFs as PNG-encoded canvases") {
    val anim = animGif(Seq(
      (solid(20, 16, Color.RED), 10, "none", (0, 0)),
      (solid(20, 16, Color.GREEN), 20, "none", (0, 0)),
      (solid(20, 16, Color.BLUE), 30, "none", (0, 0))))
    val still = animGif(Seq((solid(20, 16, Color.RED), 10, "none", (0, 0))))
    val media = Seq((1L, anim), (2L, still)).toDF("media_id", "content")
    val rows = Multimodal.sampleVideoFrames(media)
      .orderBy("media_id", "frame_index").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (1L, 1L), (1L, 2L)), "static GIFs must yield no frames")
    // each emitted content is a decodable PNG of the composed canvas
    for ((r, want) <- rows.zip(Seq(RED, GREEN, BLUE))) {
      val (w, h, bgr) = Multimodal.decodePng(r.getAs[Array[Byte]](2))
      assert((w, h) == (20, 16))
      assert(px(bgr, w, 10, 8) == want)
    }
    // stride skips frames
    val strided = Multimodal.sampleVideoFrames(media, everyK = 2)
      .orderBy("frame_index").collect().map(_.getLong(1)).toSeq
    assert(strided == Seq(0L, 2L))
  }

  /** Splice single-frame GIFs (whose palettes ImageIO preserves
    * exactly) into one animated GIF with per-frame LOCAL color tables.
    * The JDK SEQUENCE writer instead dithers frames through its
    * default web-safe palette — i.e. it stores a visibly different
    * clip — so cross-container fixtures must splice. Also exercises
    * the decoder's local-table path. */
  private def spliceAnimGif(singles: Seq[Array[Byte]], delayCs: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(singles.head, 6, 4) // screen w,h from the first frame
    out.write(0x70); out.write(0); out.write(0) // no global table
    for (g <- singles) {
      val packed = u8(g, 10)
      assert((packed & 0x80) != 0, "single-frame fixture must carry a palette")
      val tableSz = 3 * (1 << ((packed & 7) + 1))
      var p = 13 + tableSz
      while (u8(g, p) == 0x21) { // skip extensions
        p += 2
        while (u8(g, p) != 0) p += 1 + u8(g, p)
        p += 1
      }
      assert(u8(g, p) == 0x2C, "expected an image descriptor")
      out.write(Array[Byte](0x21, 0xF9.toByte, 4, 0,
        (delayCs & 0xff).toByte, ((delayCs >> 8) & 0xff).toByte, 0, 0))
      out.write(g, p, 9) // descriptor up to the packed byte
      out.write(0x80 | (packed & 7)) // local table, same size bits
      out.write(g, 13, tableSz) // the single's global table, now local
      p += 10
      if ((u8(g, p - 1) & 0x80) != 0) { // single had a local table: copy it instead
        throw new IllegalStateException("unexpected local table in fixture")
      }
      val dataStart = p
      p += 1 // min-code byte
      while (u8(g, p) != 0) p += 1 + u8(g, p)
      p += 1
      out.write(g, dataStart, p - dataStart)
    }
    out.write(0x3B)
    out.toByteArray
  }

  test("the same clip as MJPEG-AVI and animated GIF collapses per frame") {
    // cross-CONTAINER video near-dup: identical frames packaged as a
    // JPEG-in-AVI (lossy DCT) and as an animated GIF (palette), both
    // exploded by sampleVideoFrames, must land within the perceptual
    // blocking window frame by frame — while distinct frames stay far
    // smooth sinusoidal luminance on an exact 256-gray palette: every
    // dHash neighbor comparison is signal-dominated (flat blocks would
    // make in-block signs codec-noise coin flips — the same lesson as
    // the audio fingerprint's stationary-tone failure mode), and the
    // per-frame phase shift flips about half the signs between frames
    def frameImg(phase: Double): BufferedImage = {
      val grays = Array.tabulate[Byte](256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      val img = new BufferedImage(40, 32, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 32; x <- 0 until 40) {
        val v = (128 + 90 * math.sin(2 * math.Pi * x / 20.0 + phase)).toInt
        img.setRGB(x, y, new Color(v, v, v).getRGB)
      }
      img
    }
    val imgs = Seq(0.0, 2 * math.Pi / 3, 4 * math.Pi / 3).map(frameImg)
    val jpegs = imgs.map { img =>
      val o = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", o)
      o.toByteArray
    }
    val avi = graft.multimodal.Avi.mjpegAvi(40, 32, 1, jpegs)
    val gif = spliceAnimGif(imgs.map { img =>
      val o = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "gif", o)
      o.toByteArray
    }, delayCs = 10)
    val media = Seq((1L, avi), (2L, gif)).toDF("media_id", "content")
    val frames = Multimodal.sampleVideoFrames(media).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Array[Byte]](2))).toMap
    assert(frames.size == 6)
    def d(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.bitCount(a ^ b)
    for (k <- 0L to 2L) {
      val dk = d(Multimodal.dHash64(frames((1L, k))), Multimodal.dHash64(frames((2L, k))))
      info(s"frame $k: d(avi, gif) = $dk")
      assert(dk <= 7, s"frame $k drifted outside the blocking window: $dk")
    }
    // discriminative: the first and last frames differ by the split
    // moving half the canvas — far outside the window in BOTH containers
    for (id <- 1L to 2L) {
      val far = d(Multimodal.dHash64(frames((id, 0L))), Multimodal.dHash64(frames((id, 2L))))
      assert(far > 7, s"container $id: distinct frames too close ($far)")
    }
  }
}
