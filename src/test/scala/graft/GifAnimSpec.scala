package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.GifFrame

/** Animated GIF: full compositing semantics — partial rects,
  * transparency, disposal 0-3 — pinned frame by frame, plus the
  * frame-hash plumbing and malformed classification.
  */
class GifAnimSpec extends SparkSpec {
  import spark.implicits._

  private def flat(v: Int, w: Int, h: Int) = Array.fill(w * h)(v)

  test("full-rect frames snapshot one canvas per frame") {
    val frames = Seq(
      GifFrame(0, 0, 8, 6, flat(10, 8, 6), disposal = 1),
      GifFrame(0, 0, 8, 6, flat(200, 8, 6), disposal = 1))
    val gif = Multimodal.gifEncodeAnimated(8, 6, frames)
    val (w, h, out) = Multimodal.gifDecodeFrames(gif).get
    assert(w == 8 && h == 6 && out.length == 2)
    assert(out(0).forall(_ == 10) && out(1).forall(_ == 200))
  }

  test("partial rect composites onto the previous canvas") {
    val frames = Seq(
      GifFrame(0, 0, 8, 8, flat(50, 8, 8), disposal = 1),
      GifFrame(2, 2, 4, 4, flat(250, 4, 4), disposal = 1))
    val gif = Multimodal.gifEncodeAnimated(8, 8, frames)
    val out = Multimodal.gifDecodeFrames(gif).get._3
    assert(out(1)(0) == 50) // outside the rect: untouched
    assert(out(1)(2 * 8 + 2) == 250) // inside: overwritten
    assert(out(1)(6 * 8 + 6) == 50)
  }

  test("transparent pixels leave the canvas unchanged") {
    val patch = Array.tabulate(16)(i => if (i % 2 == 0) 99 else 250)
    val frames = Seq(
      GifFrame(0, 0, 8, 8, flat(50, 8, 8), disposal = 1),
      GifFrame(2, 2, 4, 4, patch, disposal = 1,
        transparentIndex = 99))
    val gif = Multimodal.gifEncodeAnimated(8, 8, frames)
    val out = Multimodal.gifDecodeFrames(gif).get._3
    assert(out(1)(2 * 8 + 2) == 50) // transparent -> old value
    assert(out(1)(2 * 8 + 3) == 250) // opaque -> new value
  }

  test("disposal 2 clears the rect to background, 3 restores") {
    // disposal 2 on frame 0: frame 1's unwritten area shows bg
    val d2 = Seq(
      GifFrame(0, 0, 8, 8, flat(200, 8, 8), disposal = 2),
      GifFrame(0, 0, 2, 2, flat(250, 2, 2), disposal = 1))
    val g2 = Multimodal.gifEncodeAnimated(8, 8, d2, background = 7)
    val o2 = Multimodal.gifDecodeFrames(g2).get._3
    assert(o2(0).forall(_ == 200))
    assert(o2(1)(0) == 250 && o2(1)(7 * 8 + 7) == 7)
    // disposal 3: frame 2 sees frame 0's canvas, not frame 1's
    val d3 = Seq(
      GifFrame(0, 0, 8, 8, flat(60, 8, 8), disposal = 1),
      GifFrame(0, 0, 8, 8, flat(200, 8, 8), disposal = 3),
      GifFrame(1, 1, 2, 2, flat(250, 2, 2), disposal = 1))
    val g3 = Multimodal.gifEncodeAnimated(8, 8, d3)
    val o3 = Multimodal.gifDecodeFrames(g3).get._3
    assert(o3(1).forall(_ == 200))
    assert(o3(2)(0) == 60 && o3(2)(1 * 8 + 1) == 250)
  }

  test("interlaced frames and the still decoder agree with frames") {
    val pix = Array.tabulate(24 * 16)(i => (i * 7 + 13) % 256)
    val gif = Multimodal.gifEncodeAnimated(24, 16,
      Seq(GifFrame(0, 0, 24, 16, pix, 1, interlaced = true)))
    val (w, h, out) = Multimodal.gifDecodeFrames(gif).get
    assert(out.length == 1 && out(0).sameElements(pix))
    // single-frame animated decode == the still first-frame decoder
    // on a plain still GIF of the same pixels
    val still = Multimodal.gifEncodeGray(24, 16, pix)
    assert(Multimodal.gifDecodeFrames(still).get._3.head
      .sameElements(Multimodal.gifDecodeLuma(still).get._3))
  }

  test("gifFrameHashes emits one row per frame") {
    val mk = (phase: Int) => Array.tabulate(16 * 16) { i =>
      if (((i % 16) / 2 + (i / 16) / 2 + phase) % 2 == 0) 60 else 200
    }
    val gif = Multimodal.gifEncodeAnimated(16, 16, Seq(
      GifFrame(0, 0, 16, 16, mk(0), 1),
      GifFrame(0, 0, 16, 16, mk(1), 1)))
    val df = Seq((5L, gif)).toDF("doc_id", "content")
    val rows = Multimodal.gifFrameHashes(df, "doc_id", "content")
      .select("doc_id", "frame_idx", "ahash")
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(rows.length == 2)
    assert(rows(0)._3 == ~rows(1)._3) // phase flip complements
  }

  test("malformed animations classify as None") {
    assert(Multimodal.gifDecodeFrames(null).isEmpty)
    assert(Multimodal.gifDecodeFrames("GIF89a".getBytes).isEmpty)
    val good = Multimodal.gifEncodeAnimated(8, 8,
      Seq(GifFrame(0, 0, 8, 8, flat(9, 8, 8), 1)))
    assert(Multimodal.gifDecodeFrames(good.dropRight(4)).isEmpty)
    // a frame rect escaping the logical screen refuses
    val bad = good.clone()
    // image descriptor is after header(13)+GCT(768)+NETSCAPE(19)+GCE(8)
    val desc = 13 + 768 + 19 + 8
    assert((bad(desc) & 0xff) == 0x2c)
    bad(desc + 1) = 6 // left=6 -> 6+8 > 8
    assert(Multimodal.gifDecodeFrames(bad).isEmpty)
  }
}
