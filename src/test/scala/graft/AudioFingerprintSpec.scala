package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Adpcm, Multimodal}

/** Audio fingerprint: exact gain-scaling invariance, content
  * separation, refusals, and the e2e dedup composition with
  * hammingPairs. */
class AudioFingerprintSpec extends GraftSpec {

  private def d(a: java.lang.Long, b: java.lang.Long): Int =
    java.lang.Long.bitCount(a ^ b)

  private def sq(n: Int, id: Long): Array[Short] = {
    val period = 20 + (id % 30).toInt
    val amp = (4000 + (id % 7) * 2000).toShort
    Array.tabulate[Short](n)(j => if ((j / period) % 2 == 0) amp else (-amp).toShort)
  }

  test("power-of-two gain edits leave the fingerprint bit-identical") {
    for (id <- Seq(1L, 4L, 7L, 10L)) {
      val s = sq(8000, id)
      val h = Multimodal.audioFingerprint64(Multimodal.pcmWavBytes(8000, s))
      assert(h != null)
      for (den <- Seq(2, 4)) {
        val hs = Multimodal.audioFingerprint64(
          Multimodal.pcmWavBytes(8000, s.map(x => (x / den).toShort)))
        assert(d(h, hs) == 0, s"id=$id den=$den dist=${d(h, hs)}")
      }
    }
  }

  test("distinct content separates; same content in ADPCM drifts beyond the dedup window") {
    val ids = Seq(1L, 4L, 7L, 10L)
    val hs = ids.map(id =>
      id -> Multimodal.audioFingerprint64(Multimodal.pcmWavBytes(8000, sq(8000, id)))).toMap
    for (a <- ids; b <- ids if a < b)
      assert(d(hs(a), hs(b)) >= 16, s"$a vs $b: ${d(hs(a), hs(b))}")
    // lossy ADPCM of a hard-edged signal: well beyond maxDist<=7 —
    // the documented out-of-scope case, pinned so the contract is honest
    val s = sq(8000, 1L)
    val ha = Multimodal.audioFingerprint64(Adpcm.encodeWavIma(8000, s)._1)
    assert(d(hs(1L), ha) > 7, s"adpcm dist=${d(hs(1L), ha)}")
  }

  test("undecodable or too-short audio hashes to null") {
    assert(Multimodal.audioFingerprint64(null) == null)
    assert(Multimodal.audioFingerprint64("junk".getBytes) == null)
    assert(Multimodal.audioFingerprint64(
      Multimodal.pcmWavBytes(8000, new Array[Short](64))) == null) // < 17*8
  }

  test("scaleAudioPcm: exact integer scaling, PCM round-trip, null passthrough") {
    import spark.implicits._
    val s = sq(4000, 4L)
    val frame = Seq(
      (1L, Multimodal.pcmWavBytes(8000, s)),
      (2L, "not audio".getBytes)).toDF("media_id", "content")
    val out = Multimodal.scaleAudioPcm(frame, 1, 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("scaled")).toMap
    assert(out(2L) == null)
    val (rate, dec) = Multimodal.decodeWavPcm16(out(1L))
    assert(rate == 8000)
    assert(dec.toSeq == s.map(x => (x / 2).toShort).toSeq)
  }

  test("q_audio_dedup scenario pinned: EVERY syntheticMedia audio row is within 2 bits of its half-gain copy") {
    import org.apache.spark.sql.functions._
    // the exact frame the driver query uses (n = 90) — every decodable
    // audio row (PCM and ADPCM sub-cycles, all rates) must sit within
    // the query's maxDist = 2 of its scaled copy, else the rows-only
    // q_audio_dedup result would silently keep an undeduped copy
    val aud = Multimodal.syntheticMedia(spark, 90).filter(col("kind") === "audio")
    val rows = Multimodal.scaleAudioPcm(aud, 1, 2)
      .select(col("media_id"), col("content"), col("scaled")).collect()
    var checked = 0
    rows.foreach { r =>
      val orig = Multimodal.audioFingerprint64(r.getAs[Array[Byte]]("content"))
      val copy =
        if (r.isNullAt(2)) null
        else Multimodal.audioFingerprint64(r.getAs[Array[Byte]]("scaled"))
      assert((orig == null) == (copy == null), s"id ${r.getLong(0)}")
      if (orig != null) {
        val dist = d(orig, copy)
        assert(dist <= 2, s"id ${r.getLong(0)} drifted $dist bits")
        checked += 1
      }
    }
    assert(checked >= 20, s"only $checked decodable audio rows — scenario too thin")
  }

  test("q_audio_dedup scenario pinned: EVERY audio row fingerprints IDENTICALLY to its FLAC transcode") {
    import org.apache.spark.sql.functions._
    // lossless transcode ⇒ exact distance 0, not a tolerance band
    val aud = Multimodal.syntheticMedia(spark, 90).filter(col("kind") === "audio")
    val rows = Multimodal.transcodeAudioFlac(aud)
      .select(col("media_id"), col("content"), col("flac")).collect()
    var checked = 0
    rows.foreach { r =>
      val orig = Multimodal.audioFingerprint64(r.getAs[Array[Byte]]("content"))
      val copy =
        if (r.isNullAt(2)) null
        else Multimodal.audioFingerprint64(r.getAs[Array[Byte]]("flac"))
      assert((orig == null) == (copy == null), s"id ${r.getLong(0)}")
      if (orig != null) {
        assert(orig == copy, s"id ${r.getLong(0)}: FLAC transcode drifted the fingerprint")
        checked += 1
      }
    }
    assert(checked >= 20, s"only $checked decodable audio rows — scenario too thin")
  }

  test("transcodeAudioFlac nulls a WAV whose rate exceeds FLAC's 20-bit field, never throws") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hostile = Multimodal.pcmWavBytes(2000000, Array.fill[Short](100)(5))
    val ok = Multimodal.pcmWavBytes(16000, Array.fill[Short](100)(5))
    val out = graft.multimodal.Multimodal.transcodeAudioFlac(
        Seq((1L, hostile), (2L, ok)).toDF("media_id", "content"))
      .select(col("media_id"), col("flac").isNull.as("n")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("e2e: gain-edited re-ingest dedups via withAudioFingerprint + hammingPairs") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.pcmWavBytes(8000, sq(8000, 1L))),
      (4L, Multimodal.pcmWavBytes(8000, sq(8000, 4L))),
      (7L, Adpcm.encodeWavIma(8000, sq(8000, 7L))._1),
      (9L, "junk".getBytes))
    val base = rows.toDF("media_id", "content")
    val copies = Multimodal.scaleAudioPcm(base, 1, 2)
      .filter(col("scaled").isNotNull)
      .select((col("media_id") + 100L).as("media_id"), col("scaled").as("content"))
    val hashed = Multimodal.withAudioFingerprint(base.unionByName(copies))
      .filter(col("audio_fp").isNotNull)
    val pairs = graft.ml.Dedup.hammingPairs(hashed, "media_id", "audio_fp", maxDist = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every decodable original pairs with exactly its own gain-edited
    // copy — including the ADPCM row, whose copy is a PCM re-encode of
    // ITS OWN decoded samples (same samples, so in scope)
    assert(pairs == Set((1L, 101L), (4L, 104L), (7L, 107L)), pairs.toString)
  }
}
