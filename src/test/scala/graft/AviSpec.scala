package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Avi, Jpeg, Multimodal}

/** MJPEG AVI: real container walk + real per-frame JPEG decode, and
  * the frame-sampling composition into the image ops. */
class AviSpec extends GraftSpec {

  private def jpegFrames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Multimodal.jpegBytes(32, 24, i.toLong))

  test("writer round-trips: sniffed geometry, duration, frame count") {
    val frames = jpegFrames(6)
    val avi = Avi.mjpegAvi(32, 24, fps = 10, frames)
    val (mime, w, h, dur) = Multimodal.sniffMeta(avi)
    assert(mime == "video/x-msvideo" && w == 32 && h == 24)
    assert(dur == 600L, s"dur $dur") // 6 frames at 10 fps
    assert(Avi.frameCount(avi) == 6)
  }

  test("stored frames decode pixel-identically to their source JPEGs") {
    val frames = jpegFrames(3)
    val avi = Avi.mjpegAvi(32, 24, fps = 5, frames)
    for (k <- 0 until 3) {
      val got = Avi.frame(avi, k)
      assert(java.util.Arrays.equals(got, frames(k)), s"frame $k bytes differ")
      val (w, h, px) = Jpeg.decode(got)
      val (w2, h2, px2) = Jpeg.decode(frames(k))
      assert(w == w2 && h == h2 && java.util.Arrays.equals(px, px2))
    }
    assert(Avi.frame(avi, 3) == null && Avi.frame(avi, -1) == null)
  }

  test("hostile bytes refuse with null, never throw") {
    assert(Multimodal.sniffMeta("RIFFjunk".getBytes)._1 == null)
    assert(Avi.frameCount(null) == 0)
    assert(Avi.frameCount("not an avi".getBytes) == 0)
    val frames = jpegFrames(2)
    val avi = Avi.mjpegAvi(32, 24, 5, frames)
    // truncations anywhere must not throw
    for (cut <- Seq(4, 11, 20, 60, avi.length / 2, avi.length - 1)) {
      val t = java.util.Arrays.copyOf(avi, cut)
      Multimodal.sniffMeta(t); Avi.frameCount(t); Avi.frame(t, 0)
    }
  }

  test("over-MaxFrames AVI truncates the frame index but stays valid") {
    // 100_001 one-byte '00dc' chunks: well-formed, just long. The walk
    // must keep the container VALID (sniff geometry + duration, frames
    // up to the cap addressable) rather than rejecting the whole file —
    // a large-but-valid video is not hostile input
    val tiny = Array[Byte](0x42)
    val avi = Avi.mjpegAvi(32, 24, fps = 30, Seq.fill(100001)(tiny))
    val (mime, w, h, dur) = Multimodal.sniffMeta(avi)
    assert(mime == "video/x-msvideo" && w == 32 && h == 24)
    assert(dur == 100001L * (1000000 / 30) / 1000, s"dur $dur") // avih count, not index size
    assert(Avi.frameCount(avi) == 100000)              // capped index
    assert(Avi.frame(avi, 0) != null && Avi.frame(avi, 99999) != null)
    assert(Avi.frame(avi, 100000) == null)             // past the cap: unaddressable
  }

  test("sampleVideoFrames composes into image ops: frame dHash finds the video's source image") {
    import spark.implicits._
    val frames = jpegFrames(4)
    val avi = Avi.mjpegAvi(32, 24, fps = 2, frames)
    val media = Seq((7L, avi), (8L, "not video".getBytes))
      .toDF("media_id", "content")
    val sampled = Multimodal.sampleVideoFrames(media, everyK = 2)
    val got = sampled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 0L), (7L, 2L)), got.toString) // every 2nd frame, non-AVI silent
    // the sampled frame hashes identically to the standalone source
    // JPEG — video near-dup against stills needs nothing new
    val hashed = Multimodal.withPerceptualHash(sampled)
      .filter(col("frame_index") === 0L)
      .select("phash").collect()(0).getLong(0)
    val direct = Multimodal.dHash64(frames(0))
    assert(direct != null && hashed == direct.longValue())
    // featurizer takes the REAL frame-0 decode path for AVI rows
    val feats = Multimodal.extractFeatures(
      Seq((7L, "video", avi)).toDF("media_id", "kind", "content"), dim = 8)
      .select("feature").collect()(0).getSeq[Float](0)
    val (w, h, px) = Jpeg.decode(frames(0))
    val expect = Multimodal.bmpQuadrantMeans(w, h, px, 8).toSeq
    assert(feats == expect, s"$feats vs $expect")
  }
}
