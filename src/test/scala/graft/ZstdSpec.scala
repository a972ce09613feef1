package graft

import org.apache.spark.sql.functions._
import graft.operators.Zstd

/** Zstd container walk: header-field widths, raw/RLE subset decode,
  * skippable frames, honest classification of entropy-compressed
  * blocks, malformed refusal.
  */
class ZstdSpec extends SparkSpec {
  import spark.implicits._

  private val text = "zstd frame walk fixture payload " * 8

  test("every header layout reads back its planted fields") {
    val data = text.getBytes("UTF-8")
    val sum = Zstd.xxhash64(data, 0, data.length) & 0xffffffffL
    for (sel <- 0 until 4) {
      val f = Zstd.encodeFrame(data,
        blockSize = 96, singleSegment = sel == 0, fcsSel = sel,
        dictSel = sel, dictId = if (sel == 0) 0L else 77L,
        withChecksum = sel % 2 == 1, checksum = sum)
      val m = Zstd.frameMeta(f).get
      assert(m.length == 1, s"sel=$sel")
      val fr = m.head
      assert(!fr.skippable && fr.contentSize == text.length,
        s"sel=$sel")
      assert(fr.dictId == (if (sel == 0) 0L else 77L), s"sel=$sel")
      assert(fr.hasChecksum == (sel % 2 == 1), s"sel=$sel")
      if (sel % 2 == 1) assert(fr.checksum == sum)
      assert(fr.nRaw == fr.nBlocks && fr.nRle == 0)
      // and the stored-block decode is exact
      assert(new String(Zstd.decompress(f).get, "UTF-8") == text)
    }
    // a planted checksum LIE still walks (surfaced) but the decode
    // path verifies and refuses
    val lie = Zstd.encodeFrame(data, withChecksum = true,
      checksum = sum ^ 0x10000L)
    assert(Zstd.frameMeta(lie).get.head.checksum == (sum ^ 0x10000L))
    assert(Zstd.decompress(lie).isEmpty)
  }

  test("rle blocks decode and empty input round-trips") {
    val run = Array.fill[Byte](40)('q')
    val f = Zstd.encodeFrame(run, blockSize = 256)
    val m = Zstd.frameMeta(f).get.head
    assert(m.nRle == 1 && m.nRaw == 0 && m.nBlocks == 1)
    assert(Zstd.decompress(f).get.sameElements(run))
    val empty = Zstd.encodeFrame(Array.emptyByteArray)
    assert(Zstd.decompress(empty).get.isEmpty)
    assert(Zstd.frameMeta(empty).get.head.contentSize == 0L)
  }

  test("skippable frames skip; multi-frame streams concatenate") {
    val s = Zstd.encodeSkippable(Array.fill[Byte](12)(9), nibble = 3)
    val f1 = Zstd.encodeFrame("one,".getBytes)
    val f2 = Zstd.encodeFrame("two".getBytes)
    val all = s ++ f1 ++ f2
    val m = Zstd.frameMeta(all).get
    assert(m.length == 3)
    assert(m(0).skippable && m(0).skipSize == 12L)
    assert(new String(Zstd.decompress(all).get) == "one,two")
  }

  test("a raw block relabeled compressed walks but fails decode") {
    // raw text bytes are not a valid entropy block, so the decode
    // path (which now really decodes FSE/Huffman — ZstdEntropySpec)
    // must classify the damage while the walk still counts it
    val f = Zstd.encodeFrame(text.getBytes("UTF-8"), blockSize = 96)
    // default layout: magic(4) fhd(1) window(1) fcs(4) -> block at 10
    val patched = f.clone()
    patched(10) = (patched(10) | 0x04).toByte // type raw -> compressed
    val m = Zstd.frameMeta(patched).get.head
    assert(m.nCompressed == 1)
    assert(Zstd.decompress(patched).isEmpty)
    // reserved block type: corrupt for both surfaces
    val bad = f.clone()
    bad(10) = (bad(10) | 0x06).toByte
    assert(Zstd.frameMeta(bad).isEmpty)
  }

  test("malformed input classifies as None") {
    assert(Zstd.frameMeta(null).isEmpty)
    assert(Zstd.frameMeta("not zstd".getBytes).isEmpty)
    val f = Zstd.encodeFrame(text.getBytes("UTF-8"))
    assert(Zstd.frameMeta(f.dropRight(5)).isEmpty)
    assert(Zstd.decompress(f.take(6)).isEmpty)
    // reserved descriptor bit refuses
    val bad = f.clone()
    bad(4) = (bad(4) | 0x08).toByte
    assert(Zstd.frameMeta(bad).isEmpty)
  }

  test("spark frame rows + text decode plumbing") {
    val df = Seq((1L, "alpha beta", 0, 0, 8),
      (2L, "gamma delta", 1, 1, 12)).toDF("doc_id", "text", "sel",
      "skip", "run")
    val z = Zstd.synthZstd(df, "doc_id", "text", "sel", "skip",
      "run", "content")
    val rows = Zstd.zstdFrameRows(z, "doc_id", "content")
      .select("doc_id", "frame_idx", "skippable", "n_rle")
      .as[(Long, Int, Boolean, Int)].collect().sortBy(r => (r._1, r._2))
    // doc 1: text frame + rle frame; doc 2: skippable + both
    assert(rows.map(_._1).count(_ == 1L) == 2)
    assert(rows.map(_._1).count(_ == 2L) == 3)
    assert(rows.filter(_._1 == 2L).head._3) // first frame skippable
    val texts = graft.operators.Multimodal.decodeBatches(z,
      "content", Zstd.zstdTextSchema)(Zstd.decodeZstdText)
      .select("doc_id", "zstd_text").as[(Long, String)].collect()
      .sortBy(_._1)
    assert(texts(0)._2 == "alpha beta" + "z" * 8)
    assert(texts(1)._2 == "gamma delta" + "z" * 12)
  }
}
