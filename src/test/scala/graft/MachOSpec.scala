package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JavaClass, MachO, Sniff}

/** Mach-O triage: the writer round-trips thin and fat layouts;
  * the CAFEBABE collision resolves per file(1)'s rule — a real
  * two-slice fat classifies mach-binary while every javac class
  * (major ≥ 45) stays java-vm; damage refuses; the walk is total.
  */
class MachOSpec extends AnyFunSuite {

  test("a thin 64-bit dylib round-trips its planted facts") {
    val b = MachO.machWrite(0x01000007, 6, 2,
      Seq("/usr/lib/libSystem.B.dylib", "/usr/lib/libc++.dylib"))
    val m = MachO.machMeta(b).get
    assert(m.container == "thin" && m.is64)
    assert(m.cpu == "x86_64" && m.fileType == "dylib")
    assert(m.nCmds == 5 && m.nSegments == 2)
    assert(m.dylibs == Seq("/usr/lib/libSystem.B.dylib",
      "/usr/lib/libc++.dylib"))
    assert(m.hasUuid && m.nArchs == 0)
  }

  test("a two-slice fat binary parses slices and arch list") {
    val fat = MachO.fatWrite(Seq(
      (0x01000007, MachO.machWrite(0x01000007, 2, 1,
        Seq("/usr/lib/libSystem.B.dylib"))),
      (0x0100000C, MachO.machWrite(0x0100000C, 2, 1,
        Seq("/usr/lib/libSystem.B.dylib")))))
    val m = MachO.machMeta(fat).get
    assert(m.container == "fat" && m.nArchs == 2)
    assert(m.archs == Seq("x86_64", "arm64"))
    assert(m.cpu == "x86_64" && m.fileType == "execute")
  }

  test("the CAFEBABE collision resolves: fat is mach, class is " +
      "java") {
    val fat = MachO.fatWrite(Seq((0x0100000C,
      MachO.machWrite(0x0100000C, 2, 1, Seq.empty))))
    assert(Sniff.sniff(fat) == "application/x-mach-binary")
    val cls = JavaClass.classWrite("corpus.Collide", Seq("m"), 0)
    assert((cls(0) & 0xff) == 0xca && (cls(1) & 0xff) == 0xfe)
    assert(MachO.machMeta(cls).isEmpty) // major 61 ≥ 30 archs
    assert(Sniff.sniff(cls) == "application/java-vm")
    // and the system javac fixture agrees
    val in = getClass.getResourceAsStream("/javaclass/Fixture.class")
    val fixture = in.readAllBytes(); in.close()
    assert(Sniff.sniff(fixture) == "application/java-vm")
  }

  test("damage refuses: truncated commands, slice out of bounds") {
    val good = MachO.machWrite(0x01000007, 2, 1, Seq("/l.dylib"))
    assert(MachO.machMeta(null).isEmpty)
    assert(MachO.machMeta(good.take(20)).isEmpty)
    assert(MachO.machMeta(good.dropRight(3)).isEmpty)
    // a fat whose slice lies past the file refuses
    val fat = MachO.fatWrite(Seq((7, good)))
    val lying = fat.clone()
    lying(20) = 0x7f // arch size (BE) huge → slice past the file
    assert(MachO.machMeta(lying).isEmpty)
  }

  test("the walk is total over mutated bytes") {
    val bases = Seq(
      MachO.machWrite(0x0100000C, 2, 3,
        Seq("/usr/lib/a.dylib", "/usr/lib/b.dylib")),
      MachO.fatWrite(Seq(
        (0x01000007, MachO.machWrite(0x01000007, 2, 1, Seq.empty)),
        (0x0100000C, MachO.machWrite(0x0100000C, 2, 1,
          Seq.empty)))))
    val rnd = new scala.util.Random(241)
    bases.foreach { base =>
      (0 until 150).foreach { _ =>
        val m = base.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        }
        MachO.machMeta(m) // must not throw
      }
      (0 until 30).foreach { _ =>
        MachO.machMeta(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
