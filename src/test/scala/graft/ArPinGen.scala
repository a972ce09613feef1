package graft

/** Reverse-pin generator: writes [[graft.operators.Ar.arWrite]] and
  * [[graft.operators.Ar.debWrite]] outputs to `/tmp/arpin/` so
  * binutils `ar t`/`ar p` and libarchive's bsdtar can verify them.
  * Recorded run (binutils ar, bsdtar 3.8.2, generation time): the
  * GNU long-name archive lists all three members identically and
  * `ar p` bytes match; every debWrite codec variant lists
  * debian-binary/control/data under bsdtar and its nested data.tar
  * extracts the planted files byte-exactly.
  *
  * Usage: sbt "Test/runMain graft.ArPinGen"
  */
object ArPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/arpin")
    java.nio.file.Files.createDirectories(outDir)
    val members = Seq(
      ("short.txt", "one".getBytes),
      ("a_name_well_beyond_the_fifteen_limit.bin",
        Array.tabulate[Byte](501)(_.toByte)),
      ("z.dat", "zz".getBytes))
    java.nio.file.Files.write(outDir.resolve("ours_long.a"),
      graft.operators.Ar.arWrite(members))
    java.nio.file.Files.write(outDir.resolve("member.bin"),
      members(1)._2)
    for (codec <- 0 to 2) {
      val b = graft.operators.Ar.debWrite(
        Seq(("./control", "Package: pin\n".getBytes)),
        Seq(("./usr/share/p.txt", "pinned payload\n".getBytes)),
        codec)
      java.nio.file.Files.write(
        outDir.resolve(s"ours_c$codec.deb"), b)
    }
    println(s"wrote $outDir")
  }
}
