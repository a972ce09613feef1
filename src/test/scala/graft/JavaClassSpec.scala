package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JavaClass

/** .class triage: the javac-compiled fixture parses to javap's
  * recorded facts (two-slot Long/Double pool entries included in
  * the grammar), the writer round-trips planted values (and javap
  * disassembles its output — JavaClassPinGen records the run),
  * damage refuses, the walk is total.
  */
class JavaClassSpec extends AnyFunSuite {

  private def fixture: Array[Byte] = {
    val in = getClass
      .getResourceAsStream("/javaclass/Fixture.class")
    assert(in != null)
    try in.readAllBytes() finally in.close()
  }

  test("the javac fixture parses to javap's facts") {
    val m = JavaClass.classMeta(fixture).get
    assert(m.major == 61) // javac 17
    assert(m.className == "corpus.pin.Fixture")
    assert(m.superName == "java.lang.Object")
    assert(m.nInterfaces == 2) // Serializable, Runnable
    assert(m.nFields == 2) // counter, label
    assert(m.nMethods == 3) // <init>, run, get
    assert(m.methodNames.toSet == Set("<init>", "run", "get"))
    assert(m.sourceFile == "Fixture.java")
  }

  test("writer round-trips planted values") {
    val b = JavaClass.classWrite("corpus.Doc7",
      Seq("alpha", "beta"), 3)
    val m = JavaClass.classMeta(b).get
    assert(m.className == "corpus.Doc7")
    assert(m.superName == "java.lang.Object")
    assert(m.nFields == 3 && m.nMethods == 2)
    assert(m.methodNames == Seq("alpha", "beta"))
  }

  test("refusals: magic, bad tag, torn pool, truncation") {
    val good = JavaClass.classWrite("A", Seq("m"), 0)
    assert(JavaClass.classMeta(good).isDefined)
    assert(JavaClass.classMeta(null).isEmpty)
    assert(JavaClass.classMeta("not a class file foo"
      .getBytes).isEmpty)
    val badTag = good.clone()
    badTag(10) = 99 // first pool entry's tag
    assert(JavaClass.classMeta(badTag).isEmpty)
    for (cut <- Seq(4, 10, 20, good.length - 3))
      assert(JavaClass.classMeta(good.take(cut)).isEmpty,
        s"cut $cut")
  }

  test("walk is total under mutation") {
    val base = fixture
    val rnd = new scala.util.Random(0x1AC)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      JavaClass.classMeta(m) // must never throw
    }
  }
}
