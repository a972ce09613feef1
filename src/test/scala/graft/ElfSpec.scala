package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Elf

/** ELF triage: the committed gcc-produced fixtures (PIE
  * executable, relocatable object, shared library) parse to the
  * exact facts readelf reported at generation time; the writer
  * round-trips planted values in both classes; damage refuses;
  * the walk is total.
  */
class ElfSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/elf/$name")
    assert(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("the gcc PIE executable parses to readelf's facts") {
    val m = Elf.elfMeta(resource("exe")).get
    assert(m.is64 && m.littleEndian)
    assert(m.eType == "DYN") // PIE
    assert(m.machine == "x86_64")
    assert(m.nSections == 29) // readelf: 30 incl. the null section
    assert(m.hasInterp &&
      m.interp == "/lib64/ld-linux-x86-64.so.2")
    assert(m.sectionNames.contains(".text"))
    assert(m.sectionNames.contains(".dynsym"))
  }

  test("the relocatable object and shared library classify") {
    val o = Elf.elfMeta(resource("obj.o")).get
    assert(o.eType == "REL" && !o.hasInterp)
    assert(o.nSections == 10) // readelf: 11 incl. null
    assert(o.sectionNames.contains(".text"))
    val so = Elf.elfMeta(resource("libfix.so")).get
    assert(so.eType == "DYN" && !so.hasInterp)
    assert(so.nSections == 23) // readelf: 24 incl. null
  }

  test("writer round-trips planted values in both classes") {
    for (is64 <- Seq(true, false)) {
      val b = Elf.elfWrite(is64, 183, Seq(".alpha", ".beta"))
      val m = Elf.elfMeta(b).get
      assert(m.is64 == is64)
      assert(m.eType == "REL" && m.machine == "aarch64")
      assert(m.nSections == 3) // .alpha, .beta, .shstrtab
      assert(m.sectionNames == Seq(".alpha", ".beta", ".shstrtab"),
        is64.toString)
    }
  }

  test("refusals and degradation: magic, class, truncation; a " +
      "torn string table degrades names, not the file") {
    assert(Elf.elfMeta(null).isEmpty)
    assert(Elf.elfMeta("not elf".getBytes).isEmpty)
    val good = Elf.elfWrite(is64 = true, 62, Seq(".one"))
    assert(Elf.elfMeta(good).isDefined)
    val badCls = good.clone()
    badCls(4) = 9
    assert(Elf.elfMeta(badCls).isEmpty)
    // section table truncated away -> refusal
    assert(Elf.elfMeta(good.take(70)).isEmpty)
  }

  test("walk is total under mutation") {
    val base = Elf.elfWrite(is64 = true, 62,
      (0 until 6).map(i => s".s$i"))
    val rnd = new scala.util.Random(0xE1F)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Elf.elfMeta(m) // must never throw
    }
    val exe = resource("exe")
    for (cut <- Seq(10, 52, 64, 200, exe.length / 2))
      Elf.elfMeta(exe.take(cut))
  }
}
