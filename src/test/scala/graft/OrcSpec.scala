package graft

import graft.operators.Orc

/** ORC footer triage: every committed fixture (written by Spark's
  * own ORC writer, the reference implementation) replays exactly
  * across all five codec layouts AND cross-checks live against what
  * spark.read.orc reports on the same bytes; the stripe row counts
  * must sum to the footer's total; damage refuses; the walk is
  * total.
  */
class OrcSpec extends SparkSpec {

  private def fixture(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/orc/fx$i.orc")
    assert(in != null, s"missing fx$i")
    try in.readAllBytes() finally in.close()
  }

  test("fixtures replay the reference writer's footer exactly") {
    val want = Seq(
      ("none", 100L, 1, 3, "id,name", "long,string"),
      ("zlib", 250L, 1, 4, "id,v,s", "long,double,string"),
      ("snappy", 50L, 1, 7, "id,info,arr", "long,struct,list"),
      ("zstd", 20000L, 2, 3, "id,txt", "long,string"),
      ("lz4", 300L, 1, 4, "id,flag,sm", "long,boolean,short"))
    for ((w, i) <- want.zipWithIndex) {
      val m = Orc.orcMeta(fixture(i)).get
      assert((m.compression, m.numRows, m.nStripes, m.nTypes,
        m.colNames.mkString(","), m.kinds.mkString(",")) == w,
        s"fx$i")
      assert(m.stripeRows == m.numRows, s"fx$i stripe sum")
    }
  }

  test("live cross-check: rows and root columns match what " +
      "spark.read.orc reports on the same bytes") {
    for (i <- 0 until 5) {
      val tmp = java.nio.file.Files.createTempFile("orc", ".orc")
      java.nio.file.Files.write(tmp, fixture(i))
      val df = spark.read.orc(tmp.toString)
      val m = Orc.orcMeta(fixture(i)).get
      assert(m.numRows == df.count(), s"fx$i rows")
      assert(m.colNames == df.schema.fieldNames.toSeq, s"fx$i cols")
      java.nio.file.Files.delete(tmp)
    }
  }

  test("damage refuses: magic, ps length lies, torn protobuf") {
    val good = fixture(1)
    assert(Orc.orcMeta(null).isEmpty)
    assert(Orc.orcMeta("ORC".getBytes).isEmpty)
    val noMagic = good.clone()
    noMagic(noMagic.length - 2) = 'X' // last magic byte
    assert(Orc.orcMeta(noMagic).isEmpty)
    val lyingPs = good.clone()
    lyingPs(lyingPs.length - 1) = 3
    assert(Orc.orcMeta(lyingPs).isEmpty)
    assert(Orc.orcMeta(good.take(20)).isEmpty)
    // a corrupt zlib chunk refuses rather than half-decodes
    val tornChunk = good.clone()
    val psLen = tornChunk(tornChunk.length - 1) & 0xff
    tornChunk(tornChunk.length - 1 - psLen - 10) =
      (tornChunk(tornChunk.length - 1 - psLen - 10) ^ 0x5a).toByte
    Orc.orcMeta(tornChunk) // may refuse or still parse; never throw
  }

  test("footer walk is total under mutation (all codecs)") {
    val rnd = new scala.util.Random(0x0C)
    for (i <- 0 until 5) {
      val base = fixture(i)
      for (_ <- 0 until 150) {
        val m = base.clone()
        val at = base.length - 1 - rnd.nextInt(
          math.min(base.length, 400))
        m(at) = (rnd.nextInt(256) - 128).toByte
        Orc.orcMeta(m) // must never throw
      }
      for (_ <- 0 until 30) {
        Orc.orcMeta(base.take(rnd.nextInt(base.length)))
      }
    }
  }
}
