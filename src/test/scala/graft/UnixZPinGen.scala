package graft

/** Reverse-pin generator: writes [[graft.operators.UnixZ.compress]]
  * streams to `/tmp/zpin/` for the system `uncompress` (gzip 1.12)
  * to verify. Recorded run (generation time): every payload —
  * including ones large enough to cross the 9→10→11-bit width
  * changes, where the 8-code-group realignment must match the
  * reference bit-exactly — decompresses byte-identically.
  *
  * Usage: sbt "Test/runMain graft.UnixZPinGen"
  */
object UnixZPinGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("/tmp/zpin")
    java.nio.file.Files.createDirectories(outDir)
    val payloads = Seq(
      ("tiny", "hi".getBytes),
      ("rep", ("the quick brown fox jumps over the lazy dog. " *
        400).getBytes),
      ("growth", Array.tabulate[Byte](200000)(i =>
        ((i * 131) ^ (i >> 7)).toByte)), // crosses several widths
      ("empty", Array.emptyByteArray))
    for ((name, data) <- payloads) {
      java.nio.file.Files.write(outDir.resolve(s"$name.Z"),
        graft.operators.UnixZ.compress(data))
      java.nio.file.Files.write(outDir.resolve(s"$name.orig"), data)
    }
    println(s"wrote $outDir")
  }
}
