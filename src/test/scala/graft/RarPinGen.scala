package graft

/** Reverse-pin generator: writes [[graft.operators.Rar.rarWrite]]
  * archives to `/tmp/rarpin/` for libarchive's independent rar5
  * reader (bsdtar 3.8.2) to verify. Recorded run (generation
  * time): the archive lists all planted members and extracts them
  * byte-exactly, data CRC32s included. No rar/unrar binary exists
  * in this environment (probed; recorded) — this independent-
  * reader pin is the strongest available.
  *
  * Usage: sbt "Test/runMain graft.RarPinGen"
  */
object RarPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/rarpin")
    java.nio.file.Files.createDirectories(outDir)
    val members = Seq(
      ("alpha.txt", "first stored member\n".getBytes),
      ("dir_like_name.bin",
        Array.tabulate[Byte](2000)(i => (i * 11).toByte)),
      ("empty.dat", Array.emptyByteArray))
    java.nio.file.Files.write(outDir.resolve("ours.rar"),
      graft.operators.Rar.rarWrite(members))
    java.nio.file.Files.write(outDir.resolve("b.bin"),
      members(1)._2)
    println(s"wrote $outDir")
  }
}
