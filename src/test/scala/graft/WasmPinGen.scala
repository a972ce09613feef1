package graft

/** Reverse-pin generator: writes [[graft.operators.Wasm.wasmWrite]]
  * modules to `/tmp/wasmpin/` for Node's production WebAssembly
  * validator. Recorded run (Node 20, generation time): every
  * module constructs as `new WebAssembly.Module(bytes)` and
  * `WebAssembly.Module.exports` enumerates exactly the planted
  * function names; a truncated module throws CompileError there
  * and refuses here.
  *
  * Usage: sbt "Test/runMain graft.WasmPinGen"
  *        node /tmp/wasmpin/check.js
  */
object WasmPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/wasmpin")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.write(outDir.resolve("one.wasm"),
      graft.operators.Wasm.wasmWrite(Seq("alpha"), "custom-one"))
    java.nio.file.Files.write(outDir.resolve("three.wasm"),
      graft.operators.Wasm.wasmWrite(Seq("a", "b", "c"), "meta"))
    java.nio.file.Files.write(outDir.resolve("check.js"),
      ("""const fs = require('fs');
        |for (const f of ['one.wasm', 'three.wasm']) {
        |  const m = new WebAssembly.Module(
        |    fs.readFileSync('/tmp/wasmpin/' + f));
        |  console.log(f, JSON.stringify(
        |    WebAssembly.Module.exports(m).map(e => e.name)));
        |}
        |console.log('validator OK');
        |""".stripMargin).getBytes)
    println(s"wrote $outDir")
  }
}
