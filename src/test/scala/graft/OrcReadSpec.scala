package graft

import java.nio.file.Files

import graft.operators.OrcRead

/** ORC stripe DATA decode vs the reference implementation, two
  * ways: (1) every committed fixture column cross-checks
  * value-for-value against a live `spark.read.orc` of the same
  * bytes (the C228 pin pattern); (2) the RLEv2 integer decoder is
  * pinned against orc-core's own RunLengthIntegerWriterV2 — the
  * reference ENCODER on this classpath — across all four
  * sub-encodings, including patched-base sequences Spark's column
  * writers rarely emit.
  */
class OrcReadSpec extends SparkSpec {

  private def fixtureBytes(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/orc/fx$i.orc")
    try in.readAllBytes() finally in.close()
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case s: java.lang.Short => s.longValue()
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
    case b: java.lang.Byte => b.longValue()
    case x => x
  }

  private def crossCheck(idx: Int, cols: Seq[String]): Unit = {
    val bytes = fixtureBytes(idx)
    val tmp = Files.createTempFile(s"orcread$idx", ".orc")
    Files.write(tmp, bytes)
    val rows = spark.read.orc(tmp.toString)
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    cols.zipWithIndex.foreach { case (c, ci) =>
      val house = OrcRead.readOrcColumn(bytes, c)
      assert(house.isDefined, s"fx$idx $c refused")
      val hv = house.get.values
      assert(hv.length == rows.length,
        s"fx$idx $c length ${hv.length} vs ${rows.length}")
      var i = 0
      while (i < rows.length) {
        val want = norm(rows(i).get(ci))
        val got = norm(hv(i))
        assert(got == want, s"fx$idx $c row $i: $got vs $want")
        i += 1
      }
    }
  }

  test("fx0 (uncompressed): long + direct string decode " +
      "bit-equal to the reference reader") {
    crossCheck(0, Seq("id", "name"))
  }

  test("fx1 (zlib): long + double + string") {
    crossCheck(1, Seq("id", "v", "s"))
  }

  test("fx3 (zstd, multiple stripes): decode concatenates " +
      "stripes in order") {
    crossCheck(3, Seq("id", "txt"))
    val c = OrcRead.readOrcColumn(fixtureBytes(3), "id").get
    assert(c.nStripes > 1)
  }

  test("fx4 (lz4): boolean + short") {
    crossCheck(4, Seq("id", "flag", "sm"))
  }

  test("fx5 (zlib, 5 stripes): the dictionary string column " +
      "decodes per stripe") {
    crossCheck(5, Seq("id", "s"))
    val c = OrcRead.readOrcColumn(fixtureBytes(5), "s").get
    assert(c.encodings.contains("DICTIONARY_V2"))
  }

  test("fx7 (snappy, nulls): PRESENT streams weave nulls back " +
      "into both a dictionary string and a double column") {
    crossCheck(7, Seq("id", "tag", "dbl"))
    val tag = OrcRead.readOrcColumn(fixtureBytes(7), "tag").get
    assert(tag.nNulls == (0 until 400).count(_ % 7 == 0))
    val dbl = OrcRead.readOrcColumn(fixtureBytes(7), "dbl").get
    assert(dbl.nNulls == (0 until 400).count(_ % 11 == 0))
  }

  test("nested columns refuse; unknown names refuse; junk never " +
      "throws") {
    assert(OrcRead.readOrcColumn(fixtureBytes(2), "info").isEmpty)
    assert(OrcRead.readOrcColumn(fixtureBytes(2), "arr").isEmpty)
    assert(OrcRead.readOrcColumn(fixtureBytes(2), "id").isDefined)
    assert(OrcRead.readOrcColumn(fixtureBytes(0), "nope").isEmpty)
    assert(OrcRead.readOrcColumn(null, "id").isEmpty)
    val rnd = new scala.util.Random(7)
    val base = fixtureBytes(5)
    (0 until 40).foreach { _ =>
      OrcRead.readOrcColumn(base.take(rnd.nextInt(base.length)),
        "id")
      val junk = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(junk)
      OrcRead.readOrcColumn(junk, "id")
      val flip = base.clone()
      val at = rnd.nextInt(flip.length)
      flip(at) = (flip(at) ^ (1 << rnd.nextInt(8))).toByte
      OrcRead.readOrcColumn(flip, "s")
    }
  }

  // ----- the reference-encoder pin: orc-core writes, house reads

  /** Encode with orc-core's own RunLengthIntegerWriterV2 (no
    * compression), returning the raw stream bytes.
    */
  private def referenceRleV2(values: Seq[Long], signed: Boolean)
      : Array[Byte] = {
    val acc = new java.io.ByteArrayOutputStream()
    val receiver = new org.apache.orc.PhysicalWriter.OutputReceiver {
      def output(buffer: java.nio.ByteBuffer): Unit = {
        val a = new Array[Byte](buffer.remaining())
        buffer.get(a)
        acc.write(a, 0, a.length)
      }
      def suppress(): Unit = ()
    }
    val out = new org.apache.orc.impl.OutStream("pin",
      new org.apache.orc.impl.writer.StreamOptions(64 * 1024),
      receiver)
    val w = new org.apache.orc.impl.RunLengthIntegerWriterV2(
      out, signed, true)
    values.foreach(w.write)
    w.flush()
    acc.toByteArray
  }

  private def pinAgainstReference(values: Seq[Long],
      signed: Boolean, wantEnc: Int): Unit = {
    val bytes = referenceRleV2(values, signed)
    // prove the sequence really exercised the intended
    // sub-encoding (first byte's top 2 bits)
    assert(((bytes(0) & 0xff) >>> 6) == wantEnc,
      s"expected sub-encoding $wantEnc, got ${(bytes(0) & 0xff) >>> 6}")
    val got = OrcRead.intRleV2(bytes, values.length, signed)
    assert(got.toSeq == values,
      s"mismatch: ${got.take(10).toSeq} vs ${values.take(10)}")
  }

  test("RLEv2 vs orc-core's own writer: SHORT_REPEAT, DIRECT, " +
      "PATCHED_BASE and DELTA all decode bit-equal") {
    // SHORT_REPEAT (enc 0): a small repeated run
    pinAgainstReference(Seq.fill(8)(10000L), signed = false, 0)
    pinAgainstReference(Seq.fill(5)(-7L), signed = true, 0)
    // DIRECT (enc 1): incompressible distinct values
    val rnd = new scala.util.Random(11)
    pinAgainstReference(
      Seq.fill(64)(rnd.nextLong() & 0xffffffffL), signed = false, 1)
    pinAgainstReference(Seq(23713L, 43806L, 57005L, 48879L),
      signed = false, 1)
    // PATCHED_BASE (enc 2): 90% small with huge outliers
    val pb = (0 until 100).map(i =>
      if (i == 7 || i == 63) 10000000L + i else (i % 190).toLong)
    pinAgainstReference(pb, signed = false, 2)
    val pbSigned = (0 until 100).map(i =>
      if (i == 13) 9999999L else (i % 150).toLong - 70)
    pinAgainstReference(pbSigned, signed = true, 2)
    // DELTA (enc 3): monotonic
    pinAgainstReference((0 until 300).map(i => 100L + 3 * i),
      signed = false, 3)
    pinAgainstReference(Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L,
      23L, 29L), signed = false, 3)
    // irregular ascending deltas (packed delta section)
    pinAgainstReference(
      (0 until 64).scanLeft(5L)((a, i) => a + 1 + (i * 7) % 23),
      signed = true, 3)
  }

  test("RLEv1 decodes the spec's own examples: a run of 100 " +
      "sevens and the literal group [2,3,6,7,11]") {
    val run = Array[Byte](0x61, 0x00, 0x07)
    assert(OrcRead.intRleV1(run, 100, signed = false).toSeq ==
      Seq.fill(100)(7L))
    val lits = Array[Byte](0xfb.toByte, 0x02, 0x03, 0x06, 0x07,
      0x0b)
    assert(OrcRead.intRleV1(lits, 5, signed = false).toSeq ==
      Seq(2L, 3L, 6L, 7L, 11L))
    // delta run: 0x22 = 37 values, delta +1 from 100
    val delta = Array[Byte](0x22, 0x01, 0x64)
    assert(OrcRead.intRleV1(delta, 37, signed = false).toSeq ==
      (100L to 136L))
  }

  test("byte-RLE and boolean streams: runs, literals, MSB-first " +
      "bits") {
    // run of 100 bytes 0xff → 100*8 true bits
    val run = Array[Byte](0x61, 0xff.toByte)
    assert(OrcRead.boolRle(run, 800).forall(identity))
    // literal 0x80 = 1 literal byte 0b10100000
    val lit = Array[Byte](0xff.toByte, 0xa0.toByte)
    assert(OrcRead.boolRle(lit, 4).toSeq ==
      Seq(true, false, true, false))
    assert(OrcRead.byteRle(Array[Byte](0x00, 0x2a), 3).toSeq ==
      Seq[Byte](42, 42, 42))
  }
}
