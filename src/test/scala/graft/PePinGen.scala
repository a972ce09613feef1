package graft

/** Reverse-pin generator: writes [[graft.operators.Pe.peWrite]]
  * images to `/tmp/pepin/` for binutils' independent BFD PE
  * backend. Recorded run (objdump 2.40, generation time):
  * `objdump -f -h` reports format pei-x86-64 / pei-i386 with the
  * planted section list on both images. No Windows toolchain
  * exists here for a forward fixture (probe recorded).
  *
  * Usage: sbt "Test/runMain graft.PePinGen"
  *        objdump -f -h /tmp/pepin/a64.exe /tmp/pepin/a32.dll
  */
object PePinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/pepin")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.write(outDir.resolve("a64.exe"),
      graft.operators.Pe.peWrite(is64 = true, isDll = false,
        Seq(".text", ".data")))
    java.nio.file.Files.write(outDir.resolve("a32.dll"),
      graft.operators.Pe.peWrite(is64 = false, isDll = true,
        Seq(".text", ".rdata", ".reloc")))
    println(s"wrote $outDir")
  }
}
