package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.DeletionVectors
import graft.operators.DeletionVectors._

/** Property-based invariants for the hand-written portable roaring
  * serialization (the Delta deletion-vector payload): on ARBITRARY
  * value sets, our writer's bytes deserialize in the classpath
  * org.roaringbitmap reference implementation to exactly the input
  * set, and the reference's own serialize() parses back through
  * our reader to the same set — membership agreeing on members and
  * a sampled absent set both ways.
  */
object RoaringProps extends Properties("RoaringProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  // value sets spanning container shapes: a sparse tail, a dense
  // run, and sometimes a >4096-cardinality region (bitmap)
  private val valuesGen: Gen[Set[Int]] = for {
    sparse <- Gen.listOf(Gen.chooseNum(0, 300000))
    runStart <- Gen.chooseNum(0, 60000)
    runLen <- Gen.chooseNum(0, 300)
    dense <- Gen.oneOf(true, false)
  } yield {
    val run = (runStart until runStart + runLen).toSet
    val big = if (dense)
      ((1 << 17) until ((1 << 17) + 9000)).toSet else Set.empty[Int]
    sparse.toSet ++ run ++ big
  }

  private def refFrom(values: Set[Int])
      : org.roaringbitmap.RoaringBitmap = {
    val rb = new org.roaringbitmap.RoaringBitmap()
    values.foreach(rb.add)
    rb.runOptimize()
    rb
  }

  private def wrapAsRb64(rb32: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    le32(DeletionVectors.PortableMagic); le32(1); le32(0); le32(0)
    o.write(rb32, 0, rb32.length)
    o.toByteArray
  }

  property("reference serialize() parses through our reader to " +
      "the same set") =
    Prop.forAll(valuesGen) { values =>
      val nonEmpty = if (values.isEmpty) Set(42) else values
      val ref = refFrom(nonEmpty)
      val buf = java.nio.ByteBuffer
        .allocate(ref.serializedSizeInBytes())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ref.serialize(buf)
      val parsed = parseRb64(wrapAsRb64(buf.array()))
      parsed.exists { rb =>
        rb.cardinality == nonEmpty.size &&
        nonEmpty.forall(v => rb.contains(v.toLong & 0xffffffffL)) &&
        (0 until 50).forall { i =>
          val probe = 400000 + i * 7
          rb.contains(probe.toLong) == nonEmpty.contains(probe)
        }
      }
    }

  property("our container writer round-trips through the " +
      "reference deserializer") =
    Prop.forAll(valuesGen) { values =>
      val nonEmpty = if (values.isEmpty) Set(7) else values
      // build containers by u16 key, choosing the kind the way the
      // format demands (array <= 4096 < bitmap); runs are exercised
      // by the fixed dvWrite fixture and the property above
      val byKey = nonEmpty.groupBy(v => (v >>> 16) & 0xffff)
      val cs = byKey.toSeq.sortBy(_._1).map { case (k, vs) =>
        val lows = vs.map(_ & 0xffff).toSeq.sorted
        if (lows.length > 4096) {
          val bits = new Array[Long](1024)
          lows.foreach(l => bits(l >>> 6) |= 1L << (l & 63))
          BitmapC(k, bits, lows.length)
        } else ArrayC(k, lows.map(_.toChar).toArray)
      }
      val bytes = writeRb32(cs)
      val ref = new org.roaringbitmap.RoaringBitmap()
      ref.deserialize(java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN))
      ref.getLongCardinality == nonEmpty.size &&
        nonEmpty.forall(ref.contains)
    }
}
