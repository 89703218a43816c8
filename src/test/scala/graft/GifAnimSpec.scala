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
}
