package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DeletionVectors
import graft.operators.DeletionVectors._

/** Delta deletion vectors (round 18): the hand-written portable
  * roaring parser/writer is pinned BOTH directions against the
  * classpath org.roaringbitmap reference implementation (the same
  * reference-writer method the ORC/parquet bloom tiers use), the
  * DV blob frame's CRC32 must verify, the planted census replays
  * closed-form, and both layers are total under mutation.
  */
class DeletionVectorSpec extends AnyFunSuite {

  private def refBitmap(values: Seq[Int])
      : org.roaringbitmap.RoaringBitmap = {
    val rb = new org.roaringbitmap.RoaringBitmap()
    values.foreach(rb.add)
    rb.runOptimize()
    rb
  }

  private def refSerialize(rb: org.roaringbitmap.RoaringBitmap)
      : Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(rb.serializedSizeInBytes())
    buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rb.serialize(buf)
    buf.array()
  }

  // a value set that forces all three container kinds after
  // runOptimize: sparse array (key 0), two dense runs (key 1),
  // alternating bits (key 2 — runs don't pay, stays bitmap)
  private val allKinds: Seq[Int] =
    (0 until 100).filter(_ % 7 == 3).map(p => p) ++
    (200 to 249).map(p => (1 << 16) | p) ++
    (400 to 449).map(p => (1 << 16) | p) ++
    (0 until 65536 by 2).map(p => (2 << 16) | p)

  test("the reference library's serialize() parses to the same " +
      "set (library → ours)") {
    val ref = refBitmap(allKinds)
    val bytes = refSerialize(ref)
    // wrap as a single-high-key Rb64 by hand: magic + count + key
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    le32(DeletionVectors.PortableMagic); le32(1); le32(0); le32(0)
    o.write(bytes, 0, bytes.length)
    val parsed = parseRb64(o.toByteArray)
    assert(parsed.isDefined)
    val rb = parsed.get
    assert(rb.cardinality == allKinds.length)
    allKinds.foreach(v => assert(rb.contains(v.toLong & 0xffffffffL),
      s"member $v"))
    Seq(5, (1 << 16) | 300, (3 << 16) | 7).foreach(v =>
      assert(!rb.contains(v.toLong), s"absent $v"))
    // the three kinds all appeared
    val cs = rb.maps.head._2.containers
    assert(cs.exists(_.isInstanceOf[ArrayC]))
    assert(cs.exists(_.isInstanceOf[RunC]))
    assert(cs.exists(_.isInstanceOf[BitmapC]))
  }

  test("our writer's bytes deserialize in the reference library " +
      "to the same set (ours → library)") {
    val id = 4L
    val blob = dvWrite(id)
    val rb64 = parseDvBlob(blob).get
    // strip the frame, strip the Rb64 header (magic + i64 + key),
    // hand the bare 32-bit map to the reference deserializer
    val inner = blob.drop(1 + 4).dropRight(4) // frame: ver+size / crc
    val bare = inner.drop(4 + 8 + 4)
    val ref = new org.roaringbitmap.RoaringBitmap()
    ref.deserialize(java.nio.ByteBuffer.wrap(bare)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN))
    assert(ref.getLongCardinality == rb64.cardinality)
    // every planted value agrees between the two implementations
    val base = 0L // high key contributes nothing to the 32-bit map
    (0 until 100).foreach { p =>
      val want = p % 7 == (id % 7).toInt
      assert(ref.contains(p) == want, s"array $p")
      assert(rb64.maps.head._2.contains(p) == want)
    }
    val a = (id % 1000).toInt
    Seq(a, a + 49, a + 100, a + 149).foreach(p =>
      assert(ref.contains((1 << 16) | p), s"run $p"))
    assert(!ref.contains((1 << 16) | (a + 50)))
    assert(ref.contains((2 << 16) | 1000)) // even → bitmap member
    assert(!ref.contains((2 << 16) | 1001))
  }

  test("planted census replays closed-form; probes are the MOR " +
      "decision") {
    for (id <- 0L to 12L) {
      val base = (id % 3) << 32
      val a = id % 1000
      val r = decodeDv(dvWrite(id), base | (1L << 16) | (a + 10),
        base | (3L << 16) | 5L, base)
      val r7 = (id % 7).toInt
      val even = id % 2 == 0
      assert(r(0) == 1, s"id $id high keys")
      assert(r(1) == (if (r7 <= 1) 15L else 14L) + 100L +
        (if (even) 32768L else 0L), s"id $id cardinality")
      assert(r(2) == 1 && r(4) == 1, s"id $id array/run")
      assert(r(3) == (if (even) 1 else 0), s"id $id bitmap")
      assert(r(5) == (base | r7.toLong), s"id $id min")
      assert(r(6) == (base | (if (even) (2L << 16) | 65534L
        else (1L << 16) | (a + 149))), s"id $id max")
      assert(r(7) == true && r(8) == false, s"id $id probes")
      assert(r(9) == 40 - (if (r7 <= 4) 6 else 5), s"id $id live")
    }
  }

  test("an empty 32-bit map (legal roaring, empty set) censuses " +
      "as a refusal, not an executor throw") {
    // magic + count 1 + key 0 + an empty no-run bitmap
    val empty = writeDvBlob(writeRb64(Seq((0, Seq.empty))))
    assert(parseDvBlob(empty).isDefined) // the PARSE is fine...
    assert(decodeDv(empty, 0L, 1L, 0L).head == null) // ...census refuses
  }

  test("frame refusals: bad version, lying CRC, size lies, " +
      "truncation; totality under mutation") {
    val good = dvWrite(6L)
    assert(parseDvBlob(null).isEmpty)
    assert(parseDvBlob(Array[Byte](2)).isEmpty)
    val badVer = good.clone(); badVer(0) = 2
    assert(parseDvBlob(badVer).isEmpty)
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 1).toByte
    assert(parseDvBlob(badCrc).isEmpty)
    assert(parseDvBlob(good.take(good.length - 3)).isEmpty)
    val rnd = new scala.util.Random(1817)
    for (_ <- 0 until 300) {
      val b = good.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      parseDvBlob(b) // must not throw
    }
  }
}
