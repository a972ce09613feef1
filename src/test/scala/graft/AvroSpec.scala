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
    // the full six-codec matrix is supported since round 17; a
    // genuinely unknown codec still refuses up front
    assert(Avro.avroRead(header(flat, "snappy")).isDefined)
    assert(Avro.avroRead(header(flat, "zstandard")).isDefined)
    assert(Avro.avroRead(header(flat, "bzip2")).isDefined)
    assert(Avro.avroRead(header(flat, "xz")).isDefined)
    assert(Avro.avroRead(header(flat, "lzma")).isEmpty)
    assert(Avro.avroRead(header(flat, "null")).isDefined) // sanity
  }

  test("named-type references decode across the six-codec matrix; " +
      "forward and recursive references refuse") {
    for (id <- 0L to 13L) {
      val r = Avro.decodeAvroNamed(Avro.avroWriteNamed(id))
      val codecs = Seq("null", "deflate", "snappy", "zstandard",
        "bzip2", "xz")
      assert(r(0) == codecs((id % 6).toInt), s"id $id codec")
      assert(r(1) == 2, s"id $id n_records")
      assert(r(2) == 8 * id + 2, s"id $id px_sum")
      assert(r(3) == 4 * id + 2 * (id % 7) + 2, s"id $id py_sum")
      val sym = Seq("R", "G", "B")
      assert(r(4) == sym((id % 3).toInt) + "/" +
        sym(((id + 1) % 3).toInt), s"id $id c_pair")
      val wantH = (0 until 4).map(i => 2 * ((id + i) % 199) +
        (2 * id + i) % 211 + (2 * id + i + 1) % 211).sum
      assert(r(5) == wantH, s"id $id h_sum")
      val len = (id % 3 + 1).toInt
      assert(r(6) == 2 * len, s"id $id pts_n")
      assert(r(7) == 2 * (len * id + len * (len - 1) / 2),
        s"id $id pts_x_sum")
      assert(r(8) == 2 * (len * id - len * (len - 1) / 2),
        s"id $id pts_y_sum")
    }
    // a FORWARD reference (use before definition) must refuse: the
    // registry only holds completed definitions
    def headerOnly(schema: String): Array[Byte] = {
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
      ws("avro.codec"); ws("null"); zl(0L)
      out.write(new Array[Byte](16), 0, 16)
      out.toByteArray
    }
    val forward = """{"type": "record", "name": "r", "fields": [
      {"name": "a", "type": "pt"},
      {"name": "b", "type": {"type": "record", "name": "pt",
       "fields": [{"name": "x", "type": "long"}]}}]}"""
    assert(Avro.containerFieldNames(headerOnly(forward)).isEmpty)
    // a RECURSIVE type (legal Avro, unbounded data depth) refuses
    val recursive = """{"type": "record", "name": "node", "fields": [
      {"name": "next", "type": ["null", "node"]}]}"""
    assert(Avro.containerFieldNames(headerOnly(recursive)).isEmpty)
    // a reuse AFTER definition parses (the registry's whole point),
    // by short name or namespace-qualified
    val reuse = """{"type": "record", "name": "r",
      "namespace": "nsx", "fields": [
      {"name": "b", "type": {"type": "record", "name": "pt",
       "namespace": "nsx",
       "fields": [{"name": "x", "type": "long"}]}},
      {"name": "a", "type": "pt"},
      {"name": "c", "type": "nsx.pt"}]}"""
    assert(Avro.containerFieldNames(headerOnly(reuse)) ==
      Some(Seq("b", "a", "c")))
    // an unqualified reference resolves against the ENCLOSING
    // namespace only (Avro spec "Names"): `pt` referenced from
    // namespace nsb when pt is defined only as nsa.pt is a schema
    // real Avro rejects — it must refuse, not silently bind the
    // other namespace's type
    val crossNs = """{"type": "record", "name": "r",
      "namespace": "nsb", "fields": [
      {"name": "b", "type": {"type": "record", "name": "pt",
       "namespace": "nsa",
       "fields": [{"name": "x", "type": "long"}]}},
      {"name": "a", "type": "pt"}]}"""
    assert(Avro.containerFieldNames(headerOnly(crossNs)).isEmpty)
    // …while the fully-qualified reference to the same type parses
    val crossQual = crossNs.replace("\"type\": \"pt\"",
      "\"type\": \"nsa.pt\"")
    assert(Avro.containerFieldNames(headerOnly(crossQual)) ==
      Some(Seq("b", "a")))
    // redefining an existing fullname refuses (invalid Avro; the
    // old registry silently overwrote)
    val dup = """{"type": "record", "name": "r", "fields": [
      {"name": "a", "type": {"type": "record", "name": "pt",
       "fields": [{"name": "x", "type": "long"}]}},
      {"name": "b", "type": {"type": "record", "name": "pt",
       "fields": [{"name": "y", "type": "long"}]}}]}"""
    assert(Avro.containerFieldNames(headerOnly(dup)).isEmpty)
  }

  test("logical types are interpreted: decimal scale from the " +
      "annotation, ISO date/instant, time, uuid, duration") {
    for (id <- Seq(0L, 1L, 2L, 7L, 99L, 1234L)) {
      val r = Avro.decodeAvroLogical(Avro.avroWriteLogical(id))
      assert(r(0) == "date,decimal(10,2),duration,time-millis," +
        "timestamp-micros,uuid", s"id $id inventory")
      val sign = if (id % 2 == 0) "" else "-"
      val a = 12345 + id
      assert(r(1) == f"$sign${a / 100}.${a % 100}%02d",
        s"id $id decimal")
      assert(r(2) == java.time.LocalDate
        .ofEpochDay(19000 + id % 1000).toString, s"id $id date")
      // spot-pin one instant absolutely (id 0 → the planted epoch)
      if (id == 0L) assert(r(3) == "2023-11-14T22:13:20.000000Z")
      val v = (id * 37) % 86400000
      assert(r(4) == f"${v / 3600000}%02d:${v / 60000 % 60}%02d:" +
        f"${v / 1000 % 60}%02d.${v % 1000}%03d", s"id $id time")
      assert(r(6) == true, s"id $id uuid_ok")
      assert(r(7) == s"${id % 12}:${id % 30}:${id % 1000}",
        s"id $id duration")
    }
    // a flat file whose fields carry logical annotations still
    // reads through the FLAT api (wire format is the base's)
    val doc = Avro.avroRead(Avro.avroWriteLogical(5L))
    assert(doc.isEmpty) // fixed top-level field → complex, refuses
  }

  test("schema resolution: field drop, numeric promotion, " +
      "defaults; narrowing and missing-without-default refuse " +
      "(round 18)") {
    import Avro.ReaderField
    for (id <- 0L to 8L) {
      val r = Avro.decodeEvolve(Avro.avroWriteEvolve(id))
      val n = (id % 3 + 1).toInt
      assert(r(0) == n, s"id $id rows")
      assert(r(1) == s"s${id % 10}-0", s"id $id b_first")
      assert(r(2) == (n * 100 * id + n.toLong * (n - 1) / 2)
        .toDouble, s"id $id c_sum")
      assert(r(3) == 7L * n, s"id $id d_sum")
    }
    val b = Avro.avroWriteEvolve(4L)
    // identity + widening resolve
    assert(Avro.resolveRead(b, Seq(ReaderField("a", 'l', None)))
      .isDefined) // int → long widens
    assert(Avro.resolveRead(b, Seq(ReaderField("a", 'd', None)))
      .isDefined) // int → double widens
    // a reader field missing from the writer with NO default
    assert(Avro.resolveRead(b, Seq(ReaderField("z", 'l', None)))
      .isEmpty)
    // cross-domain: a string can never feed a number (or back)
    assert(Avro.resolveRead(b, Seq(ReaderField("b", 'l', None)))
      .isEmpty)
    assert(Avro.resolveRead(b, Seq(ReaderField("c", 's', None)))
      .isEmpty)
    // damage refuses
    assert(Avro.decodeEvolve(null).head == null)
    assert(Avro.decodeEvolve("junk".getBytes).head == null)
    // totality under mutation
    val rnd = new scala.util.Random(1821)
    for (_ <- 0 until 200) {
      val m = b.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Avro.decodeEvolve(m) // must not throw
    }
  }

  test("logical decoder is total under mutation") {
    val base = Avro.avroWriteLogical(11L)
    val rnd = new scala.util.Random(719)
    for (_ <- 0 until 250) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Avro.decodeAvroLogical(b) // must not throw
    }
  }

  test("named decoder is total under mutation") {
    val base = Avro.avroWriteNamed(9L) // deflate-coded variant
    val rnd = new scala.util.Random(171)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Avro.decodeAvroNamed(b) // must not throw
    }
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
