package graft

/** Reverse-pin generator: writes [[graft.operators.Cpio.cpioWrite]]
  * archives in all three dialects to `/tmp/cpiopin/` for bsdtar to
  * verify. Recorded run (bsdtar 3.8.2, generation time): all three
  * list the planted members and extract them byte-exactly.
  *
  * Usage: sbt "Test/runMain graft.CpioPinGen"
  */
object CpioPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/cpiopin")
    java.nio.file.Files.createDirectories(outDir)
    val members = Seq(
      ("a.txt", "first member\n".getBytes),
      ("dir/b.bin", Array.tabulate[Byte](513)(i => (i * 7).toByte)),
      ("empty", Array.emptyByteArray))
    for ((fmt, label) <- Seq((0, "odc"), (1, "newc"), (2, "crc")))
      java.nio.file.Files.write(outDir.resolve(s"ours_$label.cpio"),
        graft.operators.Cpio.cpioWrite(members, fmt))
    java.nio.file.Files.write(outDir.resolve("b.bin"),
      members(1)._2)
    println(s"wrote $outDir")
  }
}
