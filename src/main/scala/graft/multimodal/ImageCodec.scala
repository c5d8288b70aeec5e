package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Pure-JVM image header codec — the real decode path behind the
  * multimodal `image` kind (audio/video stay stubbed: no codec libs in
  * this environment). Dimensions + format come straight from the
  * container headers, which is exactly what a curation pipeline's
  * filter/bucket stages need (aspect-ratio gates, resolution floors,
  * format dispatch) without decompressing pixel data — at 100 TB of
  * images, header-only decode is the difference between a metadata
  * pass and a full decode pass.
  *
  * Formats: PNG (IHDR), JPEG (SOF0/1/2/3/5-7/9-11/13-15 frame header,
  * skipping tables/APPn segments), GIF87a/89a (logical screen
  * descriptor), BMP (BITMAPINFOHEADER). [[encodePng]] writes a real,
  * spec-conformant grayscale PNG (deflated scanlines, CRC'd chunks) —
  * fixture generator for specs/gates, and proof the decoder inverts a
  * real encoder rather than pattern-matching its own fakes.
  */
object ImageCodec {

  final case class ImageInfo(format: String, width: Int, height: Int)

  def decode(b: Array[Byte]): Option[ImageInfo] =
    if (b == null || b.length < 16) None
    else if (isPng(b)) decodePng(b)
    else if (isJpeg(b)) decodeJpeg(b)
    else if (isGif(b)) decodeGif(b)
    else if (isBmp(b)) decodeBmp(b)
    else None

  private def u8(b: Byte): Int = b & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b(i)) << 8) | u8(b(i + 1))
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b(i)) << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))
  private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b(i)) | (u8(b(i + 1)) << 8) | (u8(b(i + 2)) << 16) | (u8(b(i + 3)) << 24)

  private def isPng(b: Array[Byte]) =
    b.length >= 24 && u8(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b(4)) == 0x0d && u8(b(5)) == 0x0a && u8(b(6)) == 0x1a && u8(b(7)) == 0x0a

  private def decodePng(b: Array[Byte]): Option[ImageInfo] =
    // sig(8) + IHDR length(4) + "IHDR"(4) → width/height at 16/20, BE
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R' && b.length >= 24)
      Some(ImageInfo("png", be32(b, 16), be32(b, 20)))
    else None

  private def isJpeg(b: Array[Byte]) = u8(b(0)) == 0xff && u8(b(1)) == 0xd8

  private def decodeJpeg(b: Array[Byte]): Option[ImageInfo] = {
    // walk marker segments to the first start-of-frame; every non-SOF
    // segment (APPn, DQT, DHT, COM, ...) carries a 2-byte BE length
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b(i)) != 0xff) return None // desynced
      var marker = u8(b(i + 1))
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b(i + 1)) } // fill bytes
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOFn: length(2) precision(1) height(2) width(2)
        return if (i + 8 < b.length) Some(ImageInfo("jpeg", be16(b, i + 7), be16(b, i + 5))) else None
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else if (marker == 0xd9 || marker == 0xda) return None           // EOI / scan data before SOF
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  private def isGif(b: Array[Byte]) =
    b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def decodeGif(b: Array[Byte]): Option[ImageInfo] =
    Some(ImageInfo("gif", le16(b, 6), le16(b, 8)))

  private def isBmp(b: Array[Byte]) = b(0) == 'B' && b(1) == 'M'

  private def decodeBmp(b: Array[Byte]): Option[ImageInfo] =
    // BITMAPINFOHEADER at offset 14: size(4) width(4) height(4), LE;
    // height may be negative (top-down rows)
    if (b.length >= 26) Some(ImageInfo("bmp", le32(b, 18), math.abs(le32(b, 22)))) else None

  /** Real grayscale 8-bit PNG: IHDR + one deflated IDAT of
    * filter-0-prefixed scanlines + IEND, CRC32 per chunk. `gray(x, y)`
    * supplies pixel values. */
  def encodePng(width: Int, height: Int, gray: (Int, Int) => Int = (_, _) => 128): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val typed = typ.getBytes("US-ASCII") ++ data
      out.write(typed)
      val crc = new CRC32(); crc.update(typed)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // compression 0, filter 0, interlace 0 already zeroed
    chunk("IHDR", ihdr)
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raw(y * (width + 1) + 1 + x) = gray(x, y).toByte; x += 1 }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal JPEG header bytes (SOI + APP0/JFIF + SOF0) carrying the
    * given dimensions — enough container to exercise the marker walk;
    * not a decodable image (no scan data). */
  def jpegHeaderBytes(width: Int, height: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8,
      (height >>> 8).toByte, height.toByte, (width >>> 8).toByte, width.toByte, 1, 1, 0x11, 0)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0
  }
}
