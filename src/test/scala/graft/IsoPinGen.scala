package graft

/** Reverse-pin generator: writes [[graft.operators.Iso.isoWrite]]
  * images to `/tmp/isopin/` for bsdtar to verify. Recorded run
  * (bsdtar 3.8.2, generation time): the image lists all planted
  * paths with their Rock Ridge names and every file extracts
  * byte-exactly, subdirectory included.
  *
  * Usage: sbt "Test/runMain graft.IsoPinGen"
  */
object IsoPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/isopin")
    java.nio.file.Files.createDirectories(outDir)
    val files = Seq(
      ("readme_with_a_long_name.txt", "root file\n".getBytes),
      ("docs/nested_file.md", "# nested\ncontent\n".getBytes),
      ("big.dat", Array.tabulate[Byte](5000)(i => (i * 3).toByte)))
    java.nio.file.Files.write(outDir.resolve("ours.iso"),
      graft.operators.Iso.isoWrite(files))
    java.nio.file.Files.write(outDir.resolve("big.dat"),
      files(2)._2)
    println(s"wrote $outDir")
  }
}
