package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AvCodecSpec extends AnyFunSuite {

  test("WAV roundtrip: decoder inverts the real encoder; javax.sound agrees") {
    val samples = Array.tabulate(4410)(k => ((k * 37) % 32768 - 16384).toShort)
    val bytes = AvCodec.encodeWav(44100, 1, samples)
    // independent JDK decoder agrees the container is real
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(ais.getFormat.getSampleRate == 44100f)
    assert(ais.getFormat.getChannels == 1)
    assert(ais.getFrameLength == 4410L)
    val got = AvCodec.decodeAudio(bytes).get
    assert(got == AvCodec.AudioInfo("wav", 1, 44100, 16, 4410))
    assert(got.durationMs == 100L)
    // PCM sample decode is exact — no codec between bytes and samples
    assert(AvCodec.pcm16Samples(bytes).toSeq == samples.toSeq)
    val (rms, peak) = AvCodec.pcmRmsPeak(samples)
    assert(peak == samples.map(s => math.abs(s.toInt)).max)
    assert(rms > 0 && rms <= peak)
  }

  test("WAV stereo frame count divides by block align") {
    val bytes = AvCodec.encodeWav(8000, 2, new Array[Short](2000))
    assert(AvCodec.decodeAudio(bytes).get ==
      AvCodec.AudioInfo("wav", 2, 8000, 16, 1000)) // 1000 frames × 2 ch
  }

  test("FLAC STREAMINFO bit-fields roundtrip across the byte boundaries") {
    for ((sr, ch, bits, n) <- Seq((44100, 2, 16, 123456789L), (8000, 1, 8, 1L),
        (192000, 8, 24, (1L << 35) + 7))) {
      val got = AvCodec.decodeAudio(AvCodec.encodeFlacHeader(sr, ch, bits, n)).get
      assert(got == AvCodec.AudioInfo("flac", ch, sr, bits, n), s"($sr,$ch,$bits,$n) -> $got")
    }
  }

  test("MP4 box walk finds mvhd duration and tkhd fixed-point dimensions") {
    val bytes = AvCodec.encodeMp4Header(1920, 1080, 600, 3600)
    assert(AvCodec.decodeVideo(bytes).get ==
      AvCodec.VideoInfo("mp4", 1920, 1080, 0L, 6000L)) // 3600/600 s = 6000 ms
  }

  test("AVI avih carries frames, dimensions and frame rate") {
    val bytes = AvCodec.encodeAviHeader(640, 480, 250, 40000) // 25 fps, 10 s
    assert(AvCodec.decodeVideo(bytes).get ==
      AvCodec.VideoInfo("avi", 640, 480, 250, 10000L))
  }

  test("junk, truncation and cross-kind payloads are rejected, not misparsed") {
    assert(AvCodec.decodeAudio("random noise bytes here".getBytes).isEmpty)
    assert(AvCodec.decodeVideo("random noise bytes here".getBytes).isEmpty)
    assert(AvCodec.decodeAudio(null).isEmpty)
    assert(AvCodec.decodeVideo(null).isEmpty)
    assert(AvCodec.decodeAudio(Array[Byte]('R', 'I', 'F', 'F')).isEmpty)
    // an AVI is RIFF but not WAVE; a WAV is RIFF but not AVI
    val avi = AvCodec.encodeAviHeader(10, 10, 1, 1000)
    val wav = AvCodec.encodeWav(8000, 1, new Array[Short](8))
    assert(AvCodec.decodeAudio(avi).isEmpty)
    assert(AvCodec.decodeVideo(wav).isEmpty)
    // image bytes parse as neither
    assert(AvCodec.decodeAudio(ImageCodec.encodePng(4, 4)).isEmpty)
    assert(AvCodec.decodeVideo(ImageCodec.encodePng(4, 4)).isEmpty)
  }

  test("extractFeatures surfaces real audio/video metadata distributed") {
    val spark = graft.TestSession.spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.Media(1L, "audio", AvCodec.encodeWav(16000, 1,
        Array.tabulate(1600)(k => (k % 100).toShort)), None, None, None, None),
      Multimodal.Media(2L, "audio", AvCodec.encodeFlacHeader(22050, 2, 16, 22050L),
        None, None, None, None),
      Multimodal.Media(3L, "video", AvCodec.encodeMp4Header(320, 240, 1000, 2500),
        None, None, None, None),
      Multimodal.Media(4L, "video", AvCodec.encodeAviHeader(160, 120, 50, 20000),
        None, None, None, None),
      Multimodal.Media(5L, "audio", "not audio".getBytes, None, None, None, None))
    val out = Multimodal.extractFeatures(spark.createDataset(rows).repartition(3))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).format.contains("wav") && out(1L).sample_rate.contains(16000)
      && out(1L).duration_ms.contains(100L))
    assert(out(1L).feature(1) > 0f, "wav feature must carry real peak")
    assert(out(2L).format.contains("flac") && out(2L).duration_ms.contains(1000L))
    assert(out(3L).format.contains("mp4") && out(3L).width.contains(320)
      && out(3L).duration_ms.contains(2500L))
    assert(out(4L).format.contains("avi") && out(4L).height.contains(120)
      && out(4L).duration_ms.contains(1000L))
    assert(out(5L).format.isEmpty && out(5L).sample_rate.isEmpty) // stub fallback, row kept
  }
}
