package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM audio/video CONTAINER codecs — the real decode paths behind
  * the multimodal `audio` and `video` kinds, closing the two arms that
  * were documented stubs behind [[ImageCodec]]. Same design point:
  * everything a curation pipeline's filter/bucket stages need — sample
  * rate, channel count, duration, frame dimensions, format dispatch —
  * comes straight from container headers without decoding media frames;
  * at 100 TB that is a metadata pass, not a decode pass.
  *
  * Formats:
  *  - WAV (RIFF chunk walk → fmt/data; PCM16 payloads additionally get
  *    a REAL sample decode — [[pcm16Samples]]/[[pcmRmsPeak]] — there is
  *    no codec in PCM, so the audio feature path is fully real here)
  *  - FLAC (STREAMINFO bit-fields: sample rate, channels, bits, total
  *    samples)
  *  - MP4/ISO-BMFF (recursive box walk → mvhd timescale+duration,
  *    tkhd 16.16-fixed width/height)
  *  - AVI (RIFF/LIST walk → avih frame count, dimensions, frame rate)
  *
  * The encoders write spec-conformant containers (fixture generators
  * for specs/gates — the decoders invert real encoders, they don't
  * pattern-match their own fakes). Compressed codec payloads (AAC,
  * H.264, vorbis…) stay out of scope: parsing their FRAMES needs codec
  * libraries this environment doesn't ship, and header-only is the
  * correct scale shape anyway.
  */
object AvCodec {

  final case class AudioInfo(format: String, channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Long) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nSamples * 1000L / sampleRate
  }

  final case class VideoInfo(format: String, width: Int, height: Int,
      nFrames: Long, durationMs: Long)

  private def u8(b: Byte): Int = b & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b(i)) | (u8(b(i + 1)) << 8) | (u8(b(i + 2)) << 16) | (u8(b(i + 3)).toLong << 24)) & 0xffffffffL
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b(i)).toLong << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))) & 0xffffffffL
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

  // ---------------- audio ----------------

  def decodeAudio(b: Array[Byte]): Option[AudioInfo] =
    if (b == null || b.length < 12) None
    else if (tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") decodeWav(b)
    else if (tag(b, 0) == "fLaC") decodeFlac(b)
    else None

  /** RIFF chunk walk: any chunk order, word-aligned sizes. */
  private def decodeWav(b: Array[Byte]): Option[AudioInfo] = {
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val id = tag(b, i); val len = le32(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length)
        fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt, le16(b, i + 22)))
      else if (id == "data") dataLen = len
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    fmt.collect { case (ch, rate, bits) if ch > 0 && bits > 0 =>
      val blockAlign = ch * bits / 8
      val n = if (dataLen < 0 || blockAlign == 0) 0L else dataLen / blockAlign
      AudioInfo("wav", ch, rate, bits, n)
    }
  }

  /** FLAC STREAMINFO (always the first metadata block): 20-bit sample
    * rate, 3-bit channels−1, 5-bit bps−1, 36-bit total samples. */
  private def decodeFlac(b: Array[Byte]): Option[AudioInfo] = {
    if (b.length < 8 + 34 || (u8(b(4)) & 0x7f) != 0) return None // not STREAMINFO
    val s = 8 // STREAMINFO payload offset
    val rate = (u8(b(s + 10)) << 12) | (u8(b(s + 11)) << 4) | (u8(b(s + 12)) >> 4)
    val channels = ((u8(b(s + 12)) >> 1) & 0x7) + 1
    val bits = (((u8(b(s + 12)) & 0x1) << 4) | (u8(b(s + 13)) >> 4)) + 1
    val total = ((u8(b(s + 13)) & 0xf).toLong << 32) | be32(b, s + 14)
    Some(AudioInfo("flac", channels, rate, bits, total))
  }

  /** Real PCM16 WAV writer (fixture generator and genuine sink shape). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad wav params")
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * channels * 2); w16(channels * 2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    samples.foreach(v => w16(v & 0xffff))
    out.toByteArray
  }

  /** Header-only FLAC (fLaC magic + last-flagged STREAMINFO). */
  def encodeFlacHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    require(sampleRate < (1 << 20) && channels <= 8 && bitsPerSample <= 32, "bad flac params")
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last block, type 0, len 34
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // min/max blocksize 4096
    si(10) = (sampleRate >> 12).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) | ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
    (0 until 4).foreach(k => si(14 + k) = ((totalSamples >> (8 * (3 - k))) & 0xff).toByte)
    out.write(si)
    out.toByteArray
  }

  /** Real PCM16 sample decode of a WAV payload — not a stub: PCM has
    * no codec, the bytes ARE the samples. */
  def pcm16Samples(b: Array[Byte]): Array[Short] = {
    var i = 12
    while (i + 8 <= b.length && tag(b, i) != "data") i += 8 + le32(b, i + 4).toInt
    if (i + 8 > b.length) Array.emptyShortArray
    else {
      val len = math.min(le32(b, i + 4).toInt, b.length - i - 8) / 2
      Array.tabulate(len)(k => (u8(b(i + 8 + 2 * k)) | (b(i + 9 + 2 * k) << 8)).toShort)
    }
  }

  /** (rms, peak) over PCM16 samples — the real audio feature pair. */
  def pcmRmsPeak(samples: Array[Short]): (Double, Int) = {
    if (samples.isEmpty) return (0.0, 0)
    var sq = 0.0; var peak = 0
    samples.foreach { s => sq += s.toDouble * s; peak = math.max(peak, math.abs(s.toInt)) }
    (math.sqrt(sq / samples.length), peak)
  }

  // ---------------- video ----------------

  def decodeVideo(b: Array[Byte]): Option[VideoInfo] =
    if (b == null || b.length < 16) None
    else if (tag(b, 4) == "ftyp") decodeMp4(b)
    else if (tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ") decodeAvi(b)
    else None

  /** ISO-BMFF recursive box walk to moov/mvhd + moov/trak/tkhd. */
  private def decodeMp4(b: Array[Byte]): Option[VideoInfo] = {
    var timescale = 0L; var duration = 0L; var w = 0; var h = 0
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(b, i).toInt; val typ = tag(b, i + 4)
        if (size < 8 || i + size > to) return // malformed: stop cleanly
        typ match {
          case "moov" | "trak" => walk(i + 8, i + size)
          case "mvhd" if i + 8 + 20 <= to =>
            val v = u8(b(i + 8))
            if (v == 0) { timescale = be32(b, i + 20); duration = be32(b, i + 24) }
            else { timescale = be32(b, i + 28); duration = (be32(b, i + 32) << 32) | be32(b, i + 36) }
          case "tkhd" if i + size >= i + 8 + 84 =>
            val v = u8(b(i + 8))
            val dimOff = i + 8 + (if (v == 0) 76 else 88)
            if (dimOff + 8 <= to) {
              w = (be32(b, dimOff) >> 16).toInt    // 16.16 fixed point
              h = (be32(b, dimOff + 4) >> 16).toInt
            }
          case _ => ()
        }
        i += size
      }
    }
    walk(0, b.length)
    if (timescale > 0 || w > 0)
      Some(VideoInfo("mp4", w, h, 0L,
        if (timescale > 0) duration * 1000L / timescale else 0L))
    else None
  }

  /** AVI avih: µs/frame, total frames, dimensions. */
  private def decodeAvi(b: Array[Byte]): Option[VideoInfo] = {
    var i = 12
    while (i + 8 <= b.length) {
      val id = tag(b, i); val len = le32(b, i + 4).toInt
      if (id == "LIST" && tag(b, i + 8) == "hdrl") { i += 12 }
      else if (id == "avih" && i + 8 + 40 <= b.length) {
        val usPerFrame = le32(b, i + 8)
        val frames = le32(b, i + 24)
        val w = le32(b, i + 40).toInt; val h = le32(b, i + 44).toInt
        return Some(VideoInfo("avi", w, h, frames, frames * usPerFrame / 1000L))
      } else i += 8 + len + (len & 1)
    }
    None
  }

  /** Minimal spec-shaped MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  def encodeMp4Header(width: Int, height: Int, timescale: Int, duration: Long): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val size = payload.length + 8
      Array((size >>> 24).toByte, (size >>> 16).toByte, (size >>> 8).toByte, size.toByte) ++
        typ.getBytes("US-ASCII") ++ payload
    }
    def be(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be(512) ++ "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd", be(0) ++ be(0) ++ be(0) ++ be(timescale.toLong) ++ be(duration) ++
      be(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ new Array[Byte](8) ++
      (Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).flatMap(be).toArray) ++
      new Array[Byte](24) ++ be(2))
    val tkhd = box("tkhd", be(7) ++ be(0) ++ be(0) ++ be(1) ++ be(0) ++ be(duration) ++
      new Array[Byte](8) ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
      (Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).flatMap(be).toArray) ++
      be(width.toLong << 16) ++ be(height.toLong << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Minimal spec-shaped AVI: RIFF(AVI ) + LIST(hdrl) + avih. */
  def encodeAviHeader(width: Int, height: Int, nFrames: Long, usPerFrame: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val avihLen = 56
    val hdrlLen = 4 + 8 + avihLen
    ascii("RIFF"); w32(4L + 8 + hdrlLen); ascii("AVI ")
    ascii("LIST"); w32(hdrlLen.toLong); ascii("hdrl")
    ascii("avih"); w32(avihLen.toLong)
    w32(usPerFrame); w32(0); w32(0); w32(0x10) // µs/frame, maxbps, padding, flags
    w32(nFrames); w32(0); w32(1); w32(0)       // frames, initial, streams, bufsize
    w32(width.toLong); w32(height.toLong)
    w32(0); w32(0); w32(0); w32(0)             // reserved
    out.toByteArray
  }
}
