package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Avro

/** Avro object-container reading: metadata map, zigzag varints,
  * both codecs, the nullable-union idiom, per-block sync checks,
  * honest refusals on complex schemas and unsupported codecs.
  */
class AvroSpec extends AnyFunSuite {

  private val rows = Seq(
    (1L, "first body", true, None),
    (-2L, "second é Ω", false, Some("note a")),
    (300L, "", true, None))

  test("null-codec round-trip: values, blocks, unions") {
    val doc = Avro.avroRead(Avro.avroWrite(rows, 0)).get
    assert(doc.codec == "null")
    assert(doc.nBlocks == 2) // 2 + 1 records
    assert(doc.rows.length == 3)
    assert(doc.rows(0) == IndexedSeq(1L, "first body",
      java.lang.Boolean.TRUE, null))
    assert(doc.rows(1) == IndexedSeq(-2L, "second é Ω",
      java.lang.Boolean.FALSE, "note a"))
    assert(doc.rows(2)(1) == "")
  }

  test("deflate-codec round-trip") {
    val doc = Avro.avroRead(Avro.avroWrite(rows, 1)).get
    assert(doc.codec == "deflate")
    assert(doc.rows.map(_(1)) == rows.map(_._2))
  }

  test("zigzag extremes survive") {
    val extreme = Seq((Long.MaxValue, "a", true, None),
      (Long.MinValue, "b", false, None),
      (0L, "c", true, None))
    val doc = Avro.avroRead(Avro.avroWrite(extreme, 0)).get
    assert(doc.rows.map(_(0)) ==
      Seq(Long.MaxValue, Long.MinValue, 0L))
  }

  test("a lying block sync refuses the file") {
    val good = Avro.avroWrite(rows, 0)
    // the final 16 bytes are the last block's sync: corrupt one
    val bad = good.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x55).toByte
    assert(Avro.avroRead(bad).isEmpty)
  }

  test("complex schemas and unsupported codecs refuse") {
    assert(Avro.avroRead(null).isEmpty)
    assert(Avro.avroRead("Obj but not really".getBytes).isEmpty)
    // hand-build headers with a nested-record schema / snappy codec
    def header(schema: String, codec: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
      def zl(v: Long): Unit = {
        var z = (v << 1) ^ (v >> 63)
        while ((z & ~0x7fL) != 0) {
          out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7
        }
        out.write((z & 0x7f).toInt)
      }
      def ws(s: String): Unit = {
        val u = s.getBytes("UTF-8"); zl(u.length.toLong)
        out.write(u, 0, u.length)
      }
      zl(2L); ws("avro.schema"); ws(schema)
      ws("avro.codec"); ws(codec); zl(0L)
      out.write(new Array[Byte](16), 0, 16)
      out.toByteArray
    }
    val nested = """{"type": "record", "name": "r", "fields": [
      {"name": "inner", "type": {"type": "record", "name": "i",
       "fields": []}}]}"""
    // the FLAT api refuses complex tops (decodeAvroComplex owns them)
    assert(Avro.avroRead(header(nested, "null")).isEmpty)
    val flat = """{"type": "record", "name": "r", "fields": [
      {"name": "x", "type": "long"}]}"""
    // snappy AND zstandard are supported codecs since round 15
    assert(Avro.avroRead(header(flat, "snappy")).isDefined)
    assert(Avro.avroRead(header(flat, "zstandard")).isDefined)
    assert(Avro.avroRead(header(flat, "bzip2")).isEmpty)
    assert(Avro.avroRead(header(flat, "null")).isDefined) // sanity
  }

  test("complex schemas decode: nested/array/map/enum/fixed/union " +
      "across all four codecs (incl. zstandard)") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 7L, 10L, 11L, 23L)) {
      val b = Avro.avroWriteComplex(id)
      val r = Avro.decodeAvroComplex(b)
      assert(r(0) == 2, s"id $id n_records")
      assert(r(1) == 6 * id + 3, s"id $id meta_a_sum")
      assert(r(2) == "m" + (id % 100), s"id $id meta_b")
      val len = id % 4 + 1
      assert(r(3) == 2 * (len * id + len * (len - 1) / 2),
        s"id $id vals_sum")
      assert(r(4) == 2 * len.toInt, s"id $id n_vals")
      assert(r(5) == 6 * id, s"id $id tags_sum")
      val kinds = Seq("ALPHA", "BETA", "GAMMA")
      assert(r(6) == kinds((id % 3).toInt), s"id $id kind")
      assert(r(7) == (0 until 8).map(i => (id + i) % 251).sum,
        s"id $id fp_sum")
      val wantU = (id % 3) match {
        case 0 => null
        case 1 => "l:" + (id * 7)
        case _ => "s:u" + (id % 10)
      }
      assert(r(8) == wantU, s"id $id u_repr")
    }
    // zstandard frames decode through the full Zstd path (id 3/7/11
    // select it above); snappy CRC damage refuses (id 2)
    val b = Avro.avroWriteComplex(2L)
    val m = b.clone()
    // flip a byte in the first block payload region (after header)
    m(m.length - 20) = (m(m.length - 20) ^ 0x10).toByte
    val r = Avro.decodeAvroComplex(m)
    assert(r(0) == null || r != Avro.decodeAvroComplex(b))
  }

  test("decoder is total under mutation") {
    val base = Avro.avroWrite(rows, 1)
    val rnd = new scala.util.Random(6060)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Avro.avroRead(b) // must not throw
    }
  }
}
