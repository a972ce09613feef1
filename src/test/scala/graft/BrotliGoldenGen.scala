package graft

/** One-shot generator for the pinned own-encoder golden resources
  * (run manually: `sbt "Test/runMain graft.BrotliGoldenGen"`); the
  * outputs must then be verified against the reference brotli
  * decoder before committing.
  */
object BrotliGoldenGen {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("src/test/resources/brotli")
    java.nio.file.Files.write(dir.resolve("own_text_entropy.br"),
      graft.operators.Brotli.encodeEntropy(BrotliSpec.pinnedText))
    java.nio.file.Files.write(dir.resolve("own_runs_entropy.br"),
      graft.operators.Brotli.encodeEntropy(BrotliSpec.pinnedRuns))
    java.nio.file.Files.write(dir.resolve("own_text.bin"),
      BrotliSpec.pinnedText)
    java.nio.file.Files.write(dir.resolve("own_runs.bin"),
      BrotliSpec.pinnedRuns)
    println("written")
  }
}
