package graft

/** Reverse-pin generator: writes [[graft.operators.GitPack
  * .packWrite]] packs (plain and OFS_DELTA variants) to
  * `/tmp/gitpackpin/` for the real git to verify. Recorded run
  * (git 2.39.5, generation time): both packs pass
  * `git index-pack --strict` and `git verify-pack -v` lists the
  * delta variant's chain; `git cat-file` on the produced ids
  * returns the planted bytes.
  *
  * Usage: sbt "Test/runMain graft.GitPackPinGen"
  */
object GitPackPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/gitpackpin")
    java.nio.file.Files.createDirectories(outDir)
    val blobs = Seq(
      "pin blob content with a decently long shared prefix tail",
      "pin blob content with a decently long shared prefix HERE",
      "standalone small blob").map(_.getBytes("UTF-8"))
    java.nio.file.Files.write(outDir.resolve("plain.pack"),
      graft.operators.GitPack.packWrite(blobs, useDeltas = false))
    java.nio.file.Files.write(outDir.resolve("delta.pack"),
      graft.operators.GitPack.packWrite(blobs, useDeltas = true))
    graft.operators.GitPack.packObjects(
      java.nio.file.Files.readAllBytes(
        outDir.resolve("delta.pack"))).get.foreach(o =>
      println(s"${o.id} ${o.objType} ${o.size} ${o.deltaDepth}"))
    println(s"wrote $outDir")
  }
}
