package graft

/** Reverse-pin generator: writes [[graft.operators.JavaClass
  * .classWrite]] outputs to `/tmp/jcpin/` for the JDK's javap to
  * disassemble. Recorded run (javap 17.0.20, generation time):
  * `javap -p` lists the planted class, fields f0..fN and abstract
  * methods by name — the minimal writer's pool/member layout is
  * readable by the reference toolchain.
  *
  * Usage: sbt "Test/runMain graft.JavaClassPinGen"
  *        javap -p /tmp/jcpin/Doc.class
  */
object JavaClassPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/jcpin")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.write(outDir.resolve("Doc.class"),
      graft.operators.JavaClass.classWrite("corpus.Doc",
        Seq("first", "second"), 2))
    println(s"wrote $outDir")
  }
}
