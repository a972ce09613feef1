package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pdf, Tiff}

/** Golden cross-pin of the TIFF/PDF early-change LZW codecs against
  * the JDK's built-in ImageIO TIFF plugin (a libtiff-convention
  * reference implementation shipped with Java 9+).
  *
  * The point: a round-trip spec through our own encoder+decoder pair
  * cannot catch a mirrored off-by-one in the early-change width
  * switch (both sides desync identically). These tests pin each side
  * independently against a foreign producer/consumer, across the
  * 9→10 (511-entry) and 10→11 (1023-entry) code-width boundaries and
  * through a dictionary reset.
  */
class LzwGoldenSpec extends AnyFunSuite {

  /** Deterministic noisy-but-structured gray pixels: noise forces
    * roughly one new dictionary entry per code so a few KB crosses
    * every width boundary; the gradient stripe exercises runs.
    */
  private def testPixels(w: Int, h: Int): Array[Int] = {
    val pix = new Array[Int](w * h)
    var s = 0x2545f4914f6cdd1dL
    var i = 0
    while (i < pix.length) {
      val y = i / w
      if (y % 8 == 7) pix(i) = (i % w) & 0xff // gradient rows
      else {
        s = s * 6364136223846793005L + 1442695040888963407L
        pix(i) = ((s >>> 33) & 0xff).toInt
      }
      i += 1
    }
    pix
  }

  private def imageioWriteLzw(w: Int, h: Int,
      pix: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, pix(y * w + x)); x += 1 }
      y += 1
    }
    val it = ImageIO.getImageWritersByFormatName("tiff")
    assert(it.hasNext, "JDK TIFF writer missing")
    val wr = it.next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  private def imageioReadGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(b))
    assert(img != null, "ImageIO could not read the TIFF")
    val (w, h) = (img.getWidth, img.getHeight)
    val pix = new Array[Int](w * h)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { pix(y * w + x) = r.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, pix)
  }

  /** Minimal IFD walk pulling the concatenated strip bytes out of a
    * TIFF — used to lift ImageIO's raw LZW bitstream for the PDF
    * /LZWDecode pin (TIFF strips and PDF EarlyChange=1 streams share
    * the exact code layout: 256 Clear, 257 EOD, MSB-first).
    */
  private def tiffStrips(b: Array[Byte]): Array[Byte] = {
    val le = b(0) == 'I'
    def u16(p: Int) =
      if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (le) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    val ifd = u32(4).toInt
    val n = u16(ifd)
    var offs: Array[Long] = null
    var cnts: Array[Long] = null
    for (i <- 0 until n) {
      val e = ifd + 2 + i * 12
      val tag = u16(e)
      if (tag == 273 || tag == 279) {
        val typ = u16(e + 2)
        val cnt = u32(e + 4).toInt
        val vals = new Array[Long](cnt)
        val valSize = if (typ == 3) 2 else 4
        val base =
          if (cnt * valSize <= 4) e + 8 else u32(e + 8).toInt
        for (j <- 0 until cnt)
          vals(j) =
            if (typ == 3) u16(base + j * 2).toLong
            else u32(base + j * 4)
        if (tag == 273) offs = vals else cnts = vals
      }
    }
    assert(offs != null && cnts != null, "no strips in TIFF")
    val out = new ByteArrayOutputStream()
    for (j <- offs.indices)
      out.write(b, offs(j).toInt, cnts(j).toInt)
    out.toByteArray
  }

  test("ImageIO-written LZW TIFF decodes bit-exactly " +
    "(9→10→11-bit boundaries)") {
    val (w, h) = (160, 72) // ~11.5 KB noise: thousands of entries
    val pix = testPixels(w, h)
    val bytes = imageioWriteLzw(w, h, pix)
    val got = Tiff.decodeLuma(bytes)
    assert(got.isDefined, "decodeLuma refused an ImageIO LZW TIFF")
    val (gw, gh, gp) = got.get
    assert(gw == w && gh == h)
    assert(gp.sameElements(pix),
      "pixel mismatch vs ImageIO-encoded LZW — early-change desync")
  }

  test("our LZW TIFF reads bit-exactly in ImageIO " +
    "(single strip crossing all boundaries + dict reset)") {
    val (w, h) = (160, 72)
    val pix = testPixels(w, h)
    // one big strip so the dictionary crosses 9→10→11 uninterrupted
    val ours = Tiff.tiffEncodeGray(w, h, pix, compression = 5,
      bigEndian = false, rowsPerStrip = h)
    val (gw, gh, gp) = imageioReadGray(ours)
    assert(gw == w && gh == h)
    assert(gp.sameElements(pix),
      "ImageIO cannot read our LZW — encoder early-change desync")
  }

  test("our LZW TIFF with predictor 2 reads bit-exactly in ImageIO") {
    val (w, h) = (160, 40)
    val pix = testPixels(w, h)
    val ours = Tiff.tiffEncodeGray(w, h, pix, compression = 5,
      bigEndian = true, rowsPerStrip = h, predictor = 2)
    val (gw, gh, gp) = imageioReadGray(ours)
    assert(gw == w && gh == h)
    assert(gp.sameElements(pix))
  }

  // ---------------------------------------------------------------
  // PDF /LZWDecode vs the same reference bitstream
  // ---------------------------------------------------------------

  /** Reference-encode arbitrary bytes with ImageIO's LZW by shipping
    * them as the pixels of a one-row gray TIFF and lifting the strip.
    */
  private def refLzwEncode(data: Array[Byte]): Array[Byte] = {
    val pix = data.map(_ & 0xff)
    tiffStrips(imageioWriteLzw(data.length, 1, pix))
  }

  /** Hand-built single-page classic-xref PDF whose content stream is
    * the given pre-encoded bytes under /Filter /LZWDecode.
    */
  private def pdfWithLzwContent(enc: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = new Array[Long](6)
    put("%PDF-1.4\n")
    offsets(1) = out.size.toLong
    put("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size.toLong
    put("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets(3) = out.size.toLong
    put("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> " +
      "/Contents 4 0 R >>\nendobj\n")
    offsets(4) = out.size.toLong
    put(s"4 0 obj\n<< /Length ${enc.length} /Filter /LZWDecode >>\n" +
      "stream\n")
    out.write(enc)
    put("\nendstream\nendobj\n")
    offsets(5) = out.size.toLong
    put("5 0 obj\n<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >>\nendobj\n")
    val xrefOff = out.size.toLong
    put("xref\n0 6\n0000000000 65535 f \n")
    for (i <- 1 to 5) put(f"${offsets(i)}%010d 00000 n \n")
    put("trailer\n<< /Size 6 /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  test("PDF /LZWDecode decodes a reference-encoded stream " +
    "crossing the 511-entry boundary") {
    // ~6 KB of varied words: far past 511 and 1023 dictionary adds
    val words = (0 until 900).map { i =>
      val s = java.lang.Long.toString(i * 2654435761L & 0x7fffffff, 36)
      s"w$s"
    }
    val text = words.mkString(" ")
    val ops = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    val enc = refLzwEncode(ops.getBytes(StandardCharsets.UTF_8))
    val pdf = pdfWithLzwContent(enc)
    val got = Pdf.pdfText(pdf)
    assert(got.isDefined, "pdfText refused the reference LZW stream")
    assert(got.get.text == text,
      "extracted text mismatch — /LZWDecode early-change desync")
  }

  test("our /LZWDecode fixture encoder round-trips long text " +
    "through the full extractor") {
    val text = (0 until 1200).map { i =>
      java.lang.Long.toString((i * 40503L + 17) & 0x7fffffff, 32)
    }.mkString(" ")
    val pdf = Pdf.pdfWrite(text, variant = 5, xrefKind = 0)
    val got = Pdf.pdfText(pdf)
    assert(got.isDefined && got.get.text == text)
  }
}
