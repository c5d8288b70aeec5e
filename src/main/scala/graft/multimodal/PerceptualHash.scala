package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

/** Pixel-level (perceptual) image fingerprints over REAL rasters —
  * the dedup modality the header-only codecs stop short of. Two
  * pure-JVM raster paths exist end-to-end:
  *
  *  - PNG grayscale-8: [[ImageCodec.encodePng]] writes a
  *    spec-conformant file; [[decodePngGray]] inflates IDAT and undoes
  *    all five PNG row filters (None/Sub/Up/Average/Paeth) — a real
  *    decoder, not a fixture parser;
  *  - BMP 24-bit: [[encodeBmpGray]] / [[decodeBmpGray]] with the
  *    classic bottom-up rows and 4-byte row padding.
  *
  * On top: integer-exact perceptual hashes. [[dHashBands]] is the
  * standard difference hash (pool to a 9×8 grid, bit = right cell >
  * left cell) packed as FOUR 16-BIT BAND VALUES rather than one
  * 64-bit word — the band layout IS the LSH blocking key (near-dup
  * candidates share at least one identical band; the q_dd2/q_ann6
  * banding discipline), and 16-bit values keep every arithmetic
  * reconstruction inside BIGINT for cross-engine gates. [[aHash64]]
  * is the average hash (8×8 pool, bit = cell > global mean).
  * Pooling is integer floor division over exact cell sums, so a
  * cell-aligned synthetic raster pools to exactly its generator
  * values and the whole pipeline (encode → decode → pool → hash →
  * band join) gates arithmetically against a SQL oracle.
  */
object PerceptualHash {

  /** Row-major 8-bit grayscale raster. */
  final case class Raster(width: Int, height: Int, gray: Array[Int]) {
    def apply(x: Int, y: Int): Int = gray(y * width + x)
  }

  private def u8(b: Byte): Int = b & 0xff
  /** Defensive dimension cap for header-declared sizes: keeps every
    * size product (`height*(width+1)`, `rowSize*height`) well inside
    * Int and bounds the allocation a hostile header can demand. */
  private val MaxDim = 8192

  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b(i)) << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))
  private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b(i)) | (u8(b(i + 1)) << 8) | (u8(b(i + 2)) << 16) | (u8(b(i + 3)) << 24)

  // ---- PNG grayscale-8 raster decode (filters 0–4, non-interlaced) ----

  def decodePngGray(b: Array[Byte]): Option[Raster] = {
    if (b.length < 8 || u8(b(0)) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G')
      return None
    var pos = 8
    var width = -1; var height = -1
    var ok = true
    val idat = new ByteArrayOutputStream()
    while (ok && pos + 8 <= b.length) {
      val len = be32(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val dataAt = pos + 8
      if (len < 0 || dataAt + len + 4 > b.length) ok = false
      else {
        typ match {
          case "IHDR" =>
            width = be32(b, dataAt); height = be32(b, dataAt + 4)
            val bitDepth = u8(b(dataAt + 8)); val colorType = u8(b(dataAt + 9))
            val interlace = u8(b(dataAt + 12))
            // this decoder handles exactly the gray-8 non-interlaced
            // profile the encoder writes; anything else is not ours
            if (bitDepth != 8 || colorType != 0 || interlace != 0) ok = false
          case "IDAT" => idat.write(b, dataAt, len)
          case _ => ()
        }
        pos = dataAt + len + 4 // skip CRC
      }
    }
    if (!ok || width <= 0 || height <= 0 ||
      width > MaxDim || height > MaxDim) return None
    // inflate to height filtered rows of (1 filter byte + width samples)
    val raw = new Array[Byte](height * (width + 1))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (off != raw.length) return None
    // undo per-row filters; bpp = 1 for gray-8
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val filter = u8(raw(y * (width + 1)))
      var x = 0
      while (x < width) {
        val cur = u8(raw(y * (width + 1) + 1 + x))
        val left = if (x > 0) out(y * width + x - 1) else 0
        val up = if (y > 0) out((y - 1) * width + x) else 0
        val upLeft = if (x > 0 && y > 0) out((y - 1) * width + x - 1) else 0
        val rec = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            cur + pred
          case _ => return None
        }
        out(y * width + x) = rec & 0xff
        x += 1
      }
      y += 1
    }
    Some(Raster(width, height, out))
  }

  // ---- BMP 24-bit raster encode/decode (uncompressed, bottom-up) ----

  def encodeBmpGray(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowSize = (3 * width + 3) & ~3
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def putLe16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte }
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, fileSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, width); putLe32(22, height)
    putLe16(26, 1); putLe16(28, 24); putLe32(30, 0); putLe32(34, dataSize)
    var y = 0
    while (y < height) {
      val rowAt = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val g = (gray(x, y) & 0xff).toByte
        out(rowAt + 3 * x) = g; out(rowAt + 3 * x + 1) = g; out(rowAt + 3 * x + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmpGray(b: Array[Byte]): Option[Raster] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataAt = le32(b, 10)
    val width = le32(b, 18); val height = le32(b, 22)
    val bpp = le16(b, 28); val compression = le32(b, 30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0 ||
      width > MaxDim || height > MaxDim) return None
    val rowSize = (3 * width + 3) & ~3
    // size arithmetic in Long: header-controlled width/height would
    // otherwise overflow Int, pass the check, and crash the pixel loop
    // instead of honoring the Option invalid-input contract
    if (dataAt < 54 || dataAt.toLong + rowSize.toLong * height > b.length) return None
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowAt = dataAt + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        // equal-channel gray was written; average reconstructs exactly
        val v = (u8(b(rowAt + 3 * x)) + u8(b(rowAt + 3 * x + 1)) + u8(b(rowAt + 3 * x + 2))) / 3
        out(y * width + x) = v
        x += 1
      }
      y += 1
    }
    Some(Raster(width, height, out))
  }

  // ---- integer pooling + hashes ----

  /** Average-pool to a gw×gh grid: exact cell sums, floor division.
    * Cell x-range is [cx·W/gw, (cx+1)·W/gw) — the standard integer
    * partition, exact when the raster is cell-aligned. */
  def avgPool(r: Raster, gw: Int, gh: Int): Array[Int] = {
    val out = new Array[Int](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * r.height / gh; val y1 = (cy + 1) * r.height / gh
      var cx = 0
      while (cx < gw) {
        val x0 = cx * r.width / gw; val x1 = (cx + 1) * r.width / gw
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += r(x, y); n += 1; x += 1 }
          y += 1
        }
        out(cy * gw + cx) = if (n == 0) 0 else (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Difference hash as four 16-bit bands: pool to 9×8, bit(cx,cy) =
    * cell(cx+1,cy) > cell(cx,cy), band = cy/2, local bit index =
    * (cy%2)·8 + cx. Bands double as the LSH blocking key. */
  def dHashBands(r: Raster): Array[Int] = {
    val p = avgPool(r, 9, 8)
    val bands = new Array[Int](4)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (p(cy * 9 + cx + 1) > p(cy * 9 + cx))
          bands(cy / 2) |= 1 << ((cy % 2) * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bands
  }

  /** Average hash: pool to 8×8, bit = cell > floor(mean); packed
    * row-major into one long (bit index cy·8 + cx). */
  def aHash64(r: Raster): Long = {
    val p = avgPool(r, 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += p(i); i += 1 }
    val mean = sum / 64
    var h = 0L
    i = 0
    while (i < 64) { if (p(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Hamming distance between two band fingerprints. */
  def hamming(a: Array[Int], b: Array[Int]): Int = {
    var d = 0; var i = 0
    while (i < a.length) { d += Integer.bitCount(a(i) ^ b(i)); i += 1 }
    d
  }

  /** Synthetic cell value for the q_mm5 fixture images: md5-mixed per
    * (group, cell) — the repo's standard cross-engine hash
    * (`Sketches.md5Long56` semantics: first 14 md5 hex chars as an
    * integer), mod a prime, with member `m` re-mapping the first m
    * cells of row 0. md5 (not a polynomial) because any polynomial in
    * cx has structured first differences — the dHash bits then
    * near-collide GLOBALLY and candidate pairs grow quadratically in
    * the synthetic duplication rather than the planted one (the
    * ScalingProbe shard lesson, round 9). */
  def synthCellValue(gid: Long, m: Long, cx: Int, cy: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pc:$gid:$cx:$cy".getBytes("UTF-8"))
    // first 14 hex chars = first 7 bytes, big-endian (md5Long56 semantics)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (((v % 241) + (if (cy == 0 && cx < m) 101L else 0L)) % 241).toInt
  }

  /** The q_mm5 image's 9×8 cell grid, computed ONCE per image — the
    * encoder samples gray(x, y) PER PIXEL (1,152 calls for 36×32), so
    * hashing inside the sampler costs 16× the cell count (measured:
    * 40 s for 5,000 images); build the 72-cell grid first and let the
    * sampler index it. */
  def synthCellGrid(gid: Long, m: Long): (Int, Int) => Int = {
    val grid = Array.tabulate(8, 9)((cy, cx) => synthCellValue(gid, m, cx, cy))
    (x, y) => grid(y / 4)(x / 4)
  }

  /** The q_mm5b SPANNING fixture: member `m` re-maps the first m cells
    * of row 0 (dHash band 0, the low half-block) AND row 4 (band 2,
    * the high half-block) — planted near-dup pairs whose differing
    * bits span BOTH 32-bit halves. The pigeonhole recall of the
    * narrow 4×16-bit blocking still covers them (bands 1 and 3 are
    * untouched), while the wide 2×32-bit production blocking — whose
    * guarantee only covers pairs confined to one half — misses
    * exactly this class. The gate turns that documented trade into a
    * cross-engine fact. */
  def synthCellValueSpan(gid: Long, m: Long, cx: Int, cy: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pc:$gid:$cx:$cy".getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    val bump = (if (cy == 0 && cx < m) 101L else 0L) +
      (if (cy == 4 && cx < m) 101L else 0L)
    (((v % 241) + bump) % 241).toInt
  }

  /** Memoized grid for the spanning fixture (same per-pixel-sampler
    * discipline as [[synthCellGrid]]). */
  def synthCellGridSpan(gid: Long, m: Long): (Int, Int) => Int = {
    val grid = Array.tabulate(8, 9)((cy, cx) => synthCellValueSpan(gid, m, cx, cy))
    (x, y) => grid(y / 4)(x / 4)
  }
}
