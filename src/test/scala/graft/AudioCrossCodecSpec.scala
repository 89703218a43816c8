package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Adpcm, Multimodal}

/** Cross-encoding audio near-dup: the SAME clip stored at different
  * sample rates, or IMA-ADPCM-encoded, must fingerprint within the
  * dedup blocking window — the "same clip, different PCM encoding"
  * ingest case the rate-canonicalized fingerprint closes. */
class AudioCrossCodecSpec extends GraftSpec {

  private def d(a: java.lang.Long, b: java.lang.Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Time-domain square wave: value depends on t seconds, not the
    * sample index, so the same clip can be rendered at any rate. */
  private def sqAtRate(rate: Int, seconds: Double, hz: Double, amp: Short): Array[Short] =
    Array.tabulate[Short]((rate * seconds).toInt) { j =>
      val t = j.toDouble / rate
      if (math.floor(t * hz * 2).toLong % 2 == 0) amp else (-amp).toShort
    }

  /** Non-stationary BROADBAND band-limited clip: nine harmonics of
    * 210 Hz (up to 1890 Hz — inside every Goertzel band), each under
    * its own slow amplitude modulation. Real audio is broadband and
    * varies over time — that is what makes the fingerprint's
    * inter-frame band differences signal-dominated. A stationary or
    * instantaneously-narrowband clip leaves bands at the noise floor,
    * turning their bits into coin flips on codec noise; those
    * degenerate cases stay out of scope, like hard-edged squares. */
  private def chirpAtRate(rate: Int, seconds: Double): Array[Short] =
    Array.tabulate[Short]((rate * seconds).toInt) { j =>
      val t = j.toDouble / rate
      var s = 0.0
      var h = 1
      // harmonics of 350 Hz up to 3.5 kHz: every Goertzel band
      // (667..3333 Hz at the canonical 8 kHz) carries real signal
      while (h <= 10) {
        val env = 0.5 + 0.5 * math.sin(2 * math.Pi * (0.7 + 0.13 * h) * t)
        s += (4500.0 / h) * env * math.sin(2 * math.Pi * 350.0 * h * t)
        h += 1
      }
      math.max(Short.MinValue, math.min(Short.MaxValue, math.rint(s).toLong)).toShort
    }

  test("same clip at 8k / 16k / 44.1k PCM fingerprints within the blocking window") {
    val h8 = Multimodal.audioFingerprint64(
      Multimodal.pcmWavBytes(8000, chirpAtRate(8000, 1.0)))
    val h16 = Multimodal.audioFingerprint64(
      Multimodal.pcmWavBytes(16000, chirpAtRate(16000, 1.0)))
    val h44 = Multimodal.audioFingerprint64(
      Multimodal.pcmWavBytes(44100, chirpAtRate(44100, 1.0)))
    info(s"d(8k,16k)=${d(h8, h16)} d(8k,44.1k)=${d(h8, h44)} d(16k,44.1k)=${d(h16, h44)}")
    // integer-ratio conversion decimates exactly (16k grid ⊃ 8k grid)
    assert(d(h8, h16) == 0, s"8k vs 16k: ${d(h8, h16)}")
    assert(d(h8, h44) <= 2, s"8k vs 44.1k: ${d(h8, h44)}")
    assert(d(h16, h44) <= 2, s"16k vs 44.1k: ${d(h16, h44)}")
  }

  test("IMA-ADPCM drift tracks codec SNR; high-fidelity encodes land in the pigeonhole window") {
    // 4-bit IMA-ADPCM SNR rises with sample rate (smaller per-sample
    // deltas): measured ~10 dB at 8 k, ~20 dB at 16 k, ~32 dB at
    // 44.1 k on this clip. The fingerprint distance follows — at
    // 44.1 k the lossy re-encode sits INSIDE the maxDist ≤ 7 blocking
    // guarantee (cross-codec dedup works for high-fidelity encodes);
    // at 8 k the codec destroys near-Nyquist content and the honest
    // contract stays out-of-scope. Pinning the gradient keeps both
    // claims checkable.
    val dists = Seq(8000, 16000, 44100).map { rate =>
      val s = chirpAtRate(rate, 1.0)
      val pcm = Multimodal.audioFingerprint64(Multimodal.pcmWavBytes(rate, s))
      val adp = Multimodal.audioFingerprint64(Adpcm.encodeWavIma(rate, s)._1)
      rate -> d(pcm, adp)
    }.toMap
    info(s"d(pcm,adpcm) by rate: $dists")
    assert(dists(44100) <= 7, s"44.1k adpcm out of window: ${dists(44100)}")
    assert(dists(16000) < dists(8000), s"drift not SNR-monotonic: $dists")
    assert(dists(44100) < dists(16000), s"drift not SNR-monotonic: $dists")
    assert(dists(8000) > 7, // the pinned out-of-scope bound — if codec or
      s"8k adpcm unexpectedly in-window (${dists(8000)}): tighten the contract")
  }

  test("cross-codec AND cross-rate: high-fidelity ADPCM at 44.1k matches PCM at 8k") {
    // the full "same clip, different PCM encoding" composition: lossy
    // codec + different sample rate, one canonical fingerprint
    val pcm8 = Multimodal.audioFingerprint64(
      Multimodal.pcmWavBytes(8000, chirpAtRate(8000, 1.0)))
    val adp44 = Multimodal.audioFingerprint64(
      Adpcm.encodeWavIma(44100, chirpAtRate(44100, 1.0))._1)
    info(s"d(pcm8k, adpcm44.1k)=${d(pcm8, adp44)}")
    assert(d(pcm8, adp44) <= 7, s"pcm 8k vs adpcm 44.1k: ${d(pcm8, adp44)}")
  }

  test("resampleAudioPcm: rate tag, length, identity, null passthrough") {
    import spark.implicits._
    val s16 = chirpAtRate(16000, 0.5)
    val frame = Seq(
      (1L, Multimodal.pcmWavBytes(16000, s16)),
      (2L, "not audio".getBytes)).toDF("media_id", "content")
    val out = Multimodal.resampleAudioPcm(frame, 8000).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resampled")).toMap
    assert(out(2L) == null)
    val (rate, dec) = Multimodal.decodeWavPcm16(out(1L))
    assert(rate == 8000)
    assert(math.abs(dec.length - s16.length / 2) <= 1, s"len ${dec.length}")
    // same-rate resample is the identity on the samples
    val same = Multimodal.resampleAudioPcm(frame, 16000).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resampled")).toMap
    assert(Multimodal.decodeWavPcm16(same(1L))._2.toSeq == s16.toSeq)
  }

  test("q_audio_dedup rate-copy scenario pinned: EVERY syntheticMedia audio row is within 2 bits of its 8k resample") {
    // the exact frame the driver query unions (n = 90): each decodable
    // audio row must collapse onto its rate-converted re-ingest at the
    // query's maxDist = 2, else q_audio_dedup silently keeps a copy
    val aud = Multimodal.syntheticMedia(spark, 90).filter(col("kind") === "audio")
    val rows = Multimodal.resampleAudioPcm(aud, 8000)
      .select(col("media_id"), col("content"), col("resampled")).collect()
    var checked = 0
    rows.foreach { r =>
      val orig = Multimodal.audioFingerprint64(r.getAs[Array[Byte]]("content"))
      val copy =
        if (r.isNullAt(2)) null
        else Multimodal.audioFingerprint64(r.getAs[Array[Byte]]("resampled"))
      assert((orig == null) == (copy == null), s"id ${r.getLong(0)}")
      if (orig != null) {
        val dist = d(orig, copy)
        assert(dist <= 2, s"id ${r.getLong(0)} drifted $dist bits")
        checked += 1
      }
    }
    assert(checked >= 20, s"only $checked decodable audio rows — scenario too thin")
  }

  test("e2e: rate-converted re-ingest dedups via withAudioFingerprint + hammingPairs") {
    import spark.implicits._
    val base = Seq(
      (1L, Multimodal.pcmWavBytes(16000, sqAtRate(16000, 1.0, 100.0, 4000))),
      (4L, Multimodal.pcmWavBytes(16000, sqAtRate(16000, 1.0, 173.0, 9000))),
      (9L, "junk".getBytes)).toDF("media_id", "content")
    // re-ingest the same clips resampled to 8k under new ids
    val copies = Multimodal.resampleAudioPcm(base, 8000)
      .filter(col("resampled").isNotNull)
      .select((col("media_id") + 100L).as("media_id"), col("resampled").as("content"))
    val hashed = Multimodal.withAudioFingerprint(base.unionByName(copies))
      .filter(col("audio_fp").isNotNull)
    val pairs = graft.ml.Dedup.hammingPairs(hashed, "media_id", "audio_fp", maxDist = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L), (4L, 104L)), pairs.toString)
  }
}
