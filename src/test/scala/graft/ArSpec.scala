package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ar

/** ar/.deb walk: binutils-written fixtures (GNU long-name table
  * included) list and extract byte-exactly, the real deb shape
  * resolves its nested reference-CLI tars, the BSD name scheme
  * parses, the in-repo writer round-trips (and lists identically
  * under binutils `ar t` — recorded at generation time), damage
  * refuses.
  */
class ArSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/ar/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("binutils short-name archive lists and extracts") {
    val es = Ar.arEntries(resource("ref_short.a")).get
    assert(es.map(_.name) == Seq("a.txt", "b.txt"))
    assert(es(0).data.sameElements(resource("a.txt")))
    assert(es(1).data.sameElements(resource("b.txt")))
  }

  test("binutils long names resolve through the GNU // table") {
    val es = Ar.arEntries(resource("ref_long.a")).get
    assert(es.map(_.name) == Seq("a.txt",
      "a_very_long_member_name_beyond_fifteen.dat", "b.txt"))
    assert(es(1).data.sameElements(
      resource("a_very_long_member_name_beyond_fifteen.dat")))
    assert(es(1).size == 800)
  }

  test("the real deb shape resolves nested reference-CLI tars " +
      "(gzip control, xz data)") {
    val b = resource("ref.deb")
    val es = Ar.arEntries(b).get
    assert(es.map(_.name) ==
      Seq("debian-binary", "control.tar.gz", "data.tar.xz"))
    assert(Ar.isDeb(es))
    val rows = Ar.debEntries(b).get
    val files = rows.filter(_.name.endsWith(".txt"))
    assert(files.map(r => (r.member, r.codec, r.name, r.size)).toSet
      == Set(
        ("data.tar.xz", "xz", "usr/share/one.txt", 12L),
        ("data.tar.xz", "xz", "usr/share/two.txt", 22L)))
    assert(rows.exists(r => r.member == "control.tar.gz" &&
      r.codec == "gzip" && r.name == "control"))
  }

  test("BSD #1/N names parse with the data prefix consumed") {
    val name = "bsd_style_long_name.txt"
    val payload = "bsd payload".getBytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("!<arch>\n".getBytes)
    val sz = name.length + payload.length
    out.write((s"#1/${name.length}".padTo(16, ' ') +
      "0           " + "0     " + "0     " + "100644  " +
      sz.toString.padTo(10, ' ') + "`\n").getBytes)
    out.write(name.getBytes)
    out.write(payload)
    if ((sz & 1) == 1) out.write('\n')
    val es = Ar.arEntries(out.toByteArray).get
    assert(es.map(_.name) == Seq(name))
    assert(es.head.data.sameElements(payload))
  }

  test("writer round-trips, long names included (binutils-pinned " +
      "at generation time)") {
    val members = Seq(
      ("short.txt", "one".getBytes),
      ("a_name_well_beyond_the_fifteen_limit.bin",
        Array.tabulate[Byte](501)(_.toByte)),
      ("z.dat", Array.emptyByteArray))
    val es = Ar.arEntries(Ar.arWrite(members)).get
    assert(es.map(_.name) == members.map(_._1))
    for ((e, (_, want)) <- es.zip(members))
      assert(e.data.sameElements(want), e.name)
  }

  test("debWrite round-trips through every codec") {
    for (codec <- 0 to 2) {
      val b = Ar.debWrite(
        Seq(("./control", "Package: x\n".getBytes)),
        Seq(("./usr/d0.txt", "zero".getBytes),
          ("./usr/d1.txt", "one!".getBytes)), codec)
      val rows = Ar.debEntries(b).get
      val want = Seq("gzip", "xz", "zstd")(codec)
      assert(rows.forall(_.codec == want), codec.toString)
      assert(rows.map(_.name).toSet ==
        Set("./control", "./usr/d0.txt", "./usr/d1.txt"))
      assert(rows.filter(_.name == "./usr/d1.txt").head.size == 4)
    }
  }

  test("damage refuses: magic, header terminator, size lies, " +
      "missing name table") {
    val good = Ar.arWrite(Seq(("f.txt", "data".getBytes)))
    assert(Ar.arEntries(good).isDefined)
    assert(Ar.arEntries(null).isEmpty)
    assert(Ar.arEntries("!<arch>".getBytes).isEmpty)
    assert(Ar.arEntries("not an archive at all".getBytes).isEmpty)
    val badTerm = good.clone()
    badTerm(8 + 58) = 'X'
    assert(Ar.arEntries(badTerm).isEmpty)
    // size field lying past the buffer
    val badSize = good.clone()
    badSize(8 + 48) = '9'; badSize(8 + 49) = '9'
    assert(Ar.arEntries(badSize).isEmpty)
    // a /N reference without a // table
    val orphan = new java.io.ByteArrayOutputStream()
    orphan.write("!<arch>\n".getBytes)
    orphan.write(("/0".padTo(16, ' ') + "0           0     0     " +
      "100644  " + "2".padTo(10, ' ') + "`\n").getBytes)
    orphan.write("ab".getBytes)
    assert(Ar.arEntries(orphan.toByteArray).isEmpty)
    // deb: wrong first member
    assert(Ar.debEntries(good).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Ar.debWrite(
      Seq(("./control", "Package: m\n".getBytes)),
      Seq(("./usr/f.txt", ("pay " * 200).getBytes)), 0)
    val rnd = new scala.util.Random(0xA7)
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Ar.arEntries(m) // must never throw
      Ar.debEntries(m)
    }
    for (cut <- Seq(4, 8, 60, 70, base.length - 3)) {
      Ar.arEntries(base.take(cut))
      Ar.debEntries(base.take(cut))
    }
  }
}
