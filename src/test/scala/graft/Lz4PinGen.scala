package graft

/** Reverse-pin generator: writes [[graft.operators.Lz4.encodeFrame]]
  * frames for every committed payload to `/tmp/lz4pin/` so the
  * reference CLI can verify them (`lz4 -t` checks content checksums
  * too). Recorded run (lz4 v1.9.x, fixture-generation time):
  * all six frames test clean and `lz4 -d` output is byte-identical
  * to the source payloads.
  *
  * Usage: sbt "Test/runMain graft.Lz4PinGen"
  *        then `lz4 -t` each frame under /tmp/lz4pin
  */
object Lz4PinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/lz4pin")
    java.nio.file.Files.createDirectories(outDir)
    for (name <- Seq("rep.txt", "rand.bin", "tiny.txt", "empty.bin",
        "mixed.bin", "big.txt")) {
      val in = getClass.getResourceAsStream(s"/lz4/$name")
      val src = try in.readAllBytes() finally in.close()
      java.nio.file.Files.write(outDir.resolve(name + ".lz4"),
        graft.operators.Lz4.encodeFrame(src))
      java.nio.file.Files.write(outDir.resolve(name + ".orig"), src)
    }
    println(s"wrote ${outDir}")
  }
}
