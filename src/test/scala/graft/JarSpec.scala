package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jar

/** JAR triage: manifest main attributes parse with spec line
  * folding (a continuation line starts with one space), class and
  * package censuses count, a manifest-less jar still counts
  * members, damage refuses at the ZIP layer, the walk is total.
  */
class JarSpec extends AnyFunSuite {

  test("a planted jar replays manifest and censuses") {
    val b = Jar.jarWrite("com.corpus.Main7",
      "long-toolchain-vendor-string-that-is-folded-across-the-" +
        "boundary", 2, 3)
    val m = Jar.jarMeta(b).get
    assert(m.hasManifest && m.manifestVersion == "1.0")
    assert(m.mainClass == "com.corpus.Main7")
    // the folded Created-By unfolds back to the full string
    assert(m.createdBy == "long-toolchain-vendor-string-that-is-" +
      "folded-across-the-boundary")
    assert(m.nClasses == 6 && m.nPackages == 2 && m.nMembers == 8)
  }

  test("manifest folding follows the spec: one leading space") {
    val parsed = Jar.parseManifest(
      "Manifest-Version: 1.0\r\nKey: first-part\r\n and-rest\r\n" +
        "\r\nName: section-two\r\nIgnored: yes\r\n")
    assert(parsed("Key") == "first-partand-rest")
    // per-entry sections after the blank line are not main attrs
    assert(!parsed.contains("Name"))
  }

  test("a manifest-less jar still counts members") {
    val b = graft.operators.Archive.zipWrite(Seq(
      ("a/B.class", Array[Byte](1, 2, 3), false),
      ("readme.txt", "x".getBytes, false)))
    val m = Jar.jarMeta(b).get
    assert(!m.hasManifest && m.mainClass == "")
    assert(m.nClasses == 1 && m.nPackages == 1 && m.nMembers == 2)
  }

  test("damage refuses at the zip layer; the walk is total") {
    assert(Jar.jarMeta(null).isEmpty)
    assert(Jar.jarMeta("PK then garbage".getBytes).isEmpty)
    val base = Jar.jarWrite("M", "cb", 1, 2)
    val rnd = new scala.util.Random(239)
    (0 until 150).foreach { _ =>
      val m = base.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      Jar.jarMeta(m) // must not throw
    }
  }
}
