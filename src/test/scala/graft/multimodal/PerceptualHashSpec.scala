package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Perceptual-hash unit surface: real PNG/BMP raster roundtrips
  * (including the non-trivial PNG filter reconstructions), integer
  * pooling exactness, hand-traced dHash/aHash values, and the planted
  * near-dup bit-flip bound the q_mm5 gate's banding relies on. */
class PerceptualHashSpec extends AnyFunSuite {

  private def gen(seed: Long, w: Int, h: Int): (Int, Int) => Int = {
    val r = new Random(seed)
    val px = Array.fill(h, w)(r.nextInt(256))
    (x, y) => px(y)(x)
  }

  test("PNG gray-8 roundtrip: encode → real decode (inflate + unfilter) is identity") {
    for (seed <- 1L to 5L) {
      val (w, h) = (17 + seed.toInt, 11 + 2 * seed.toInt)
      val g = gen(seed, w, h)
      val r = PerceptualHash.decodePngGray(ImageCodec.encodePng(w, h, g))
        .getOrElse(fail(s"decode failed for seed $seed"))
      assert(r.width == w && r.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(r(x, y) == g(x, y), s"pixel ($x,$y) seed $seed")
    }
  }

  test("PNG decoder reconstructs all five row filters, not just filter 0") {
    // hand-build a 3-row image whose rows use Sub(1), Up(2), Average(3)
    // and Paeth(4) filters; reference values computed per the PNG spec
    val w = 4
    val rows = Seq[(Int, Array[Int])](
      (1, Array(10, 5, 5, 5)),   // Sub:  10, 15, 20, 25
      (2, Array(1, 1, 1, 1)),    // Up:   11, 16, 21, 26
      (3, Array(0, 0, 0, 0)),    // Avg:  5, 10, 15, 20  (floor((l+u)/2))
      (4, Array(0, 0, 0, 0)))    // Paeth: predictor-reconstructed
    val raw = rows.flatMap { case (f, data) => f +: data.toSeq }.map(_.toByte).toArray
    // deflate and wrap in a minimal PNG by reusing the encoder's
    // chunk layout: encode a dummy, then splice our IDAT
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf); deflater.end()
    val idat = buf.take(n)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val typed = typ.getBytes("US-ASCII") ++ data
      out.write(typed)
      val crc = new java.util.zip.CRC32(); crc.update(typed)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = rows.size.toByte; ihdr(8) = 8
    chunk("IHDR", ihdr); chunk("IDAT", idat); chunk("IEND", Array.emptyByteArray)
    val r = PerceptualHash.decodePngGray(out.toByteArray).getOrElse(fail("decode failed"))
    assert(r.gray.toSeq.take(4) == Seq(10, 15, 20, 25), "Sub filter")
    assert(r.gray.toSeq.slice(4, 8) == Seq(11, 16, 21, 26), "Up filter")
    assert(r.gray.toSeq.slice(8, 12) == Seq(5, 10, 15, 20), "Average filter")
    // Paeth row: left,up,upLeft all known; p = l+u-ul picks nearest
    val y3 = (0 until 4).map { x =>
      val left = if (x > 0) r.gray(12 + x - 1) else 0
      val up = r.gray(8 + x); val ul = if (x > 0) r.gray(8 + x - 1) else 0
      val p = left + up - ul
      val (pa, pb, pc) = (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
      if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
    }
    assert(r.gray.toSeq.slice(12, 16) == y3, "Paeth filter")
  }

  test("BMP 24-bit roundtrip is identity; dHash is format-invariant (PNG ≡ BMP)") {
    for (seed <- 1L to 3L) {
      val (w, h) = (36, 32)
      val g = gen(seed, w, h)
      val bmp = PerceptualHash.decodeBmpGray(PerceptualHash.encodeBmpGray(w, h, g))
        .getOrElse(fail("bmp decode failed"))
      for (y <- 0 until h; x <- 0 until w) assert(bmp(x, y) == g(x, y))
      val png = PerceptualHash.decodePngGray(ImageCodec.encodePng(w, h, g)).get
      assert(PerceptualHash.dHashBands(png).toSeq == PerceptualHash.dHashBands(bmp).toSeq,
        "same raster through two container formats must fingerprint identically")
      assert(PerceptualHash.aHash64(png) == PerceptualHash.aHash64(bmp))
    }
  }

  test("hand-traced dHash: cell-aligned raster pools to its generator; known bit pattern") {
    // 9×8 grid of 4×4 cells; cell value 10·cx → every right neighbor
    // is larger → all 64 bits set → each 16-bit band = 0xffff
    val all1 = PerceptualHash.decodePngGray(
      ImageCodec.encodePng(36, 32, (x, _) => 10 * (x / 4))).get
    assert(PerceptualHash.dHashBands(all1).toSeq == Seq(0xffff, 0xffff, 0xffff, 0xffff))
    // decreasing → no bit set
    val all0 = PerceptualHash.decodePngGray(
      ImageCodec.encodePng(36, 32, (x, _) => 100 - 10 * (x / 4))).get
    assert(PerceptualHash.dHashBands(all0).toSeq == Seq(0, 0, 0, 0))
    // single bright cell at (cx=4, cy=0): row 0 pools to
    // [40,40,40,40,50,40,...] → only bit(3) = p(4)>p(3) is set
    val one = PerceptualHash.decodePngGray(ImageCodec.encodePng(36, 32,
      (x, y) => if (y / 4 == 0 && x / 4 == 4) 50 else 40)).get
    assert(PerceptualHash.dHashBands(one).toSeq == Seq(1 << 3, 0, 0, 0))
  }

  test("hand-traced aHash: half-bright raster sets exactly the bright half") {
    // left 4 cell-columns 0, right 4 cell-columns 200 → mean 100;
    // bits set exactly where cell > 100
    val r = PerceptualHash.decodePngGray(
      ImageCodec.encodePng(32, 32, (x, _) => if (x / 4 < 4) 0 else 200)).get
    val h = PerceptualHash.aHash64(r)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val bit = (h >>> (cy * 8 + cx)) & 1L
      assert(bit == (if (cx >= 4) 1L else 0L), s"cell ($cx,$cy)")
    }
  }

  test("planted near-dups flip ≤4 bits, all in band 0 (the q_mm5 banding guarantee)") {
    // members m1 < m2 differ only in row-0 cells [m1, m2) — the
    // affected dHash comparisons are bits [m1-1, m2-1], at most 4,
    // all in band 0 (cy = 0 → band cy/2 = 0)
    def img(gid: Long, m: Int) = PerceptualHash.decodePngGray(
      ImageCodec.encodePng(36, 32, PerceptualHash.synthCellGrid(gid, m))).get
    for (gid <- 0L to 20L; m1 <- 0 to 3; m2 <- 0 to 3 if m1 < m2) {
      val (a, b) = (PerceptualHash.dHashBands(img(gid, m1)), PerceptualHash.dHashBands(img(gid, m2)))
      val ham = PerceptualHash.hamming(a, b)
      assert(ham <= 4, s"group $gid members $m1/$m2: hamming $ham > 4")
      assert(a(1) == b(1) && a(2) == b(2) && a(3) == b(3),
        "perturbation must stay inside band 0 so bands 1-3 still collide")
    }
    // and the fingerprint space is DIVERSE across groups: distinct
    // base images must not near-collide (the polynomial-base lesson —
    // structured cell values made every image a near-dup of every
    // other and the candidate count went quadratic)
    val bases = (0L until 60L).map(g => PerceptualHash.dHashBands(img(g, 0)))
    val crossDups = (for {
      i <- bases.indices; j <- bases.indices if i < j
      if PerceptualHash.hamming(bases(i), bases(j)) <= 6
    } yield (i, j)).size
    assert(crossDups == 0, s"$crossDups cross-group near-collisions among 60 base images")
  }

  test("hostile BMP header dimensions return None, never crash") {
    def le32(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
      b(at + 2) = (v >> 16).toByte; b(at + 3) = (v >> 24).toByte
    }
    def header(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](64)
      b(0) = 'B'; b(1) = 'M'
      le32(b, 10, 54); le32(b, 18, w); le32(b, 22, h)
      b(28) = 24 // bpp le16
      le32(b, 30, 0)
      b
    }
    // 65536x65536: rowSize*height overflows Int — the Int-arithmetic
    // check used to pass and the pixel loop crashed with AIOOBE
    assert(PerceptualHash.decodeBmpGray(header(0x10000, 0x10000)).isEmpty)
    // in-cap dims but not enough data
    assert(PerceptualHash.decodeBmpGray(header(100, 100)).isEmpty)
    // negative data offset
    val neg = header(4, 4); le32(neg, 10, -8)
    assert(PerceptualHash.decodeBmpGray(neg).isEmpty)
  }
}
