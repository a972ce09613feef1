package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sniff, Wasm}

/** WASM triage: the writer's modules (validated by Node's real
  * WebAssembly engine at generation time — WasmPinGen) census to
  * the planted sections/exports/customs; imports parse through
  * every kind; damage refuses; the walk is total.
  */
class WasmSpec extends AnyFunSuite {

  test("planted modules census exactly") {
    val b = Wasm.wasmWrite(Seq("alpha", "beta"), "names")
    val m = Wasm.wasmMeta(b).get
    assert(m.version == 1)
    assert(m.sectionIds == Seq(1, 3, 7, 10, 0))
    assert(m.nExports == 2)
    assert(m.exportNames == Seq("alpha", "beta"))
    assert(m.customNames == Seq("names"))
    assert(m.nImports == 0 && !m.hasStart)
    assert(Sniff.sniff(b) == "application/wasm")
  }

  test("imports parse through all four kinds") {
    // hand-built import section: func, table, memory, global
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 'a', 's', 'm', 1, 0, 0, 0), 0, 8)
    val s = new java.io.ByteArrayOutputStream()
    def nm(x: String): Unit = { s.write(x.length)
      s.write(x.getBytes, 0, x.length) }
    s.write(4) // count
    nm("m"); nm("f"); s.write(0); s.write(0) // func 0
    nm("m"); nm("t"); s.write(1); s.write(0x70); s.write(0)
    s.write(1) // table funcref, min 1
    nm("m"); nm("mem"); s.write(2); s.write(1); s.write(1)
    s.write(4) // memory min 1 max 4
    nm("m"); nm("g"); s.write(3); s.write(0x7f); s.write(0)
    out.write(2); out.write(s.size); s.writeTo(out)
    val m = Wasm.wasmMeta(out.toByteArray).get
    assert(m.nImports == 4)
    assert(m.sectionIds == Seq(2))
  }

  test("refusals: magic, section id 13, size lies, torn names") {
    val good = Wasm.wasmWrite(Seq("f"), "c")
    assert(Wasm.wasmMeta(good).isDefined)
    assert(Wasm.wasmMeta(null).isEmpty)
    assert(Wasm.wasmMeta("asm".getBytes).isEmpty)
    val badId = good.clone()
    badId(8) = 13
    assert(Wasm.wasmMeta(badId).isEmpty)
    val lie = good.clone()
    lie(9) = 0x7f // section size past the buffer
    assert(Wasm.wasmMeta(lie).isEmpty)
    for (cut <- Seq(4, 8, 12, good.length - 2))
      assert(Wasm.wasmMeta(good.take(cut)).isEmpty ||
        cut >= 8, s"cut $cut")
  }

  test("walk is total under mutation") {
    val base = Wasm.wasmWrite((0 until 5).map(i => s"fn$i"), "mut")
    val rnd = new scala.util.Random(0xA5)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      Wasm.wasmMeta(m) // must never throw
    }
  }
}
