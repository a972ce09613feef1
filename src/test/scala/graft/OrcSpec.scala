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

  test("stripe/column statistics replay the writer's stats and " +
      "pin against a live spark.read.orc aggregate") {
    val fx = fixture(5)
    // footer meta: exactly five 1000-row stripes
    val meta = Orc.orcMeta(fx).get
    assert(meta.numRows == 5000 && meta.nStripes == 5)
    val st = Orc.orcStats(fx).get
    assert(st.stripes.length == 5)
    // per-stripe long-column intervals are the known closed form
    // (the writer rounds orc.stripe.row.count=1000 up to its
    // 1024-row vector batches, so stripe k covers 1024k..)
    val ivs = st.stripes.map(s => (s(1).intMin.get, s(1).intMax.get))
    assert(ivs == (0 until 5).map(k =>
      (1024L * k, math.min(1024L * k + 1023L, 4999L))).toVector)
    // file-level stats
    val id = st.fileCols(1)
    assert(id.intMin.contains(0L) && id.intMax.contains(4999L))
    assert(id.intSum.contains(12497500L))
    assert(id.nVals == 5000L && !id.hasNull)
    val s2 = st.fileCols(2)
    assert(s2.strMin.contains("s0") && s2.strMax.contains("s9"))
    assert(s2.strLenSum.contains(10000L))
    // live pin: the real reader's aggregates agree with the stats
    val tmp = java.nio.file.Files.createTempFile("orcst", ".orc")
    java.nio.file.Files.write(tmp, fx)
    val agg = spark.read.orc(tmp.toString)
      .selectExpr("min(id)", "max(id)", "sum(id)", "count(*)",
        "min(s)", "max(s)", "sum(length(s))")
      .collect()(0)
    assert(agg.getLong(0) == id.intMin.get)
    assert(agg.getLong(1) == id.intMax.get)
    assert(agg.getLong(2) == id.intSum.get)
    assert(agg.getLong(3) == id.nVals)
    assert(agg.getString(4) == s2.strMin.get)
    assert(agg.getString(5) == s2.strMax.get)
    assert(agg.getLong(6) == s2.strLenSum.get)
    java.nio.file.Files.delete(tmp)
    // the decode kernel surfaces the same facts
    val row = Orc.decodeOrcStats(fx)
    assert(row(0) == 5 && row(1) == 0L && row(2) == 4999L &&
      row(3) == 12497500L && row(9) == "0,1024,2048,3072,4096")
  }

  test("orcStats is total under mutation and refuses schema " +
      "mismatches") {
    val base = fixture(5)
    val rnd = new scala.util.Random(417)
    for (_ <- 0 until 200) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Orc.orcStats(b) // must not throw
      Orc.decodeOrcStats(b)
    }
    // a fixture whose column layout isn't (long, string) null-rows
    // in the kernel rather than mis-mapping stats
    assert(Orc.decodeOrcStats(fixture(4)).head == null)
    assert(Orc.decodeOrcStats(null).head == null)
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
