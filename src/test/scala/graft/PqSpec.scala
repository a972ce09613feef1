package graft

import graft.operators.ParquetMeta

/** Parquet footer triage: every committed fixture (written by
  * Spark's parquet-mr, the reference implementation) replays
  * exactly AND cross-checks live against what spark.read reports
  * on the same bytes; damage refuses; the walk is total.
  */
class PqSpec extends SparkSpec {

  private def fixture(i: Int): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/parquet/fx$i.parquet")
    assert(in != null, s"missing fx$i")
    try in.readAllBytes() finally in.close()
  }

  test("fixtures replay the reference writer's footer exactly") {
    val want = Seq(
      (100L, 1, 2, "id,name", "uncompressed"),
      (250L, 1, 3, "id,v,s", "snappy"),
      (50L, 1, 4, "id,_1,_2,element", "gzip"),
      (20000L, 151, 2, "id,txt", "zstd"),
      (300L, 1, 2, "id,grp", "lz4"))
    for ((w, i) <- want.zipWithIndex) {
      val m = ParquetMeta.parquetMeta(fixture(i)).get
      assert(m.version == 1, s"fx$i")
      assert((m.numRows, m.nRowGroups, m.nLeafColumns,
        m.leafNames.mkString(","), m.codecs.mkString(",")) == w,
        s"fx$i")
      assert(m.createdBy.startsWith("parquet-mr"), s"fx$i")
    }
  }

  test("live cross-check: num_rows and leaf count match what " +
      "spark.read reports on the same bytes") {
    for (i <- 0 until 5) {
      val tmp = java.nio.file.Files.createTempFile("pq", ".parquet")
      java.nio.file.Files.write(tmp, fixture(i))
      val df = spark.read.parquet(tmp.toString)
      val m = ParquetMeta.parquetMeta(fixture(i)).get
      assert(m.numRows == df.count(), s"fx$i rows")
      def leaves(dt: org.apache.spark.sql.types.DataType): Int =
        dt match {
          case s: org.apache.spark.sql.types.StructType =>
            s.fields.map(f => leaves(f.dataType)).sum
          case a: org.apache.spark.sql.types.ArrayType =>
            leaves(a.elementType)
          case _ => 1
        }
      assert(m.nLeafColumns == leaves(df.schema), s"fx$i leaves")
      java.nio.file.Files.delete(tmp)
    }
  }

  test("column statistics replay the reference writer's zone maps") {
    val s0 = ParquetMeta.parquetColumnStats(fixture(0)).get
    assert(s0.map(s => (s.rowGroup, s.path, s.ptype, s.numValues,
      s.nullCount)) == Seq((0, "id", "int64", 100L, 0L),
      (0, "name", "byte_array", 100L, 0L)))
    assert(s0(0).minLong.contains(0L) && s0(0).maxLong.contains(99L))
    assert(s0(1).minStr.contains("name-0") &&
      s0(1).maxStr.contains("name-99"))
    // the 151-row-group zstd file: stats rows for every rg
    val s3 = ParquetMeta.parquetColumnStats(fixture(3)).get
    assert(s3.length == 151 * 2)
    assert(s3.head.path == "id" && s3.head.minLong.contains(0L))
    assert(s3.map(_.rowGroup).distinct.length == 151)
    // per-rg min/max tile the full 0..19999 range
    val idStats = s3.filter(_.path == "id")
    assert(idStats.map(_.numValues).sum == 20000L)
    assert(idStats.last.maxLong.contains(19999L))
    // stats walk is total under footer mutation
    val base = fixture(1)
    val rnd = new scala.util.Random(238)
    for (_ <- 0 until 150) {
      val m = base.clone()
      val at = base.length - 1 - rnd.nextInt(
        math.min(base.length, 600))
      m(at) = (rnd.nextInt(256) - 128).toByte
      ParquetMeta.parquetColumnStats(m) // must never throw
    }
  }

  test("damage refuses: magic, footer length lies, torn thrift") {
    val good = fixture(0)
    assert(ParquetMeta.parquetMeta(null).isEmpty)
    assert(ParquetMeta.parquetMeta("PAR1".getBytes).isEmpty)
    val noTail = good.clone()
    noTail(noTail.length - 1) = 'X'
    assert(ParquetMeta.parquetMeta(noTail).isEmpty)
    val lyingLen = good.clone()
    lyingLen(lyingLen.length - 5) = 0x7f
    assert(ParquetMeta.parquetMeta(lyingLen).isEmpty)
    assert(ParquetMeta.parquetMeta(good.take(20)).isEmpty)
  }

  test("footer walk is total under mutation") {
    val base = fixture(1)
    val rnd = new scala.util.Random(0xFA)
    for (_ <- 0 until 300) {
      val m = base.clone()
      // bias mutations into the footer where the thrift lives
      val at = base.length - 1 - rnd.nextInt(
        math.min(base.length, 600))
      m(at) = (rnd.nextInt(256) - 128).toByte
      ParquetMeta.parquetMeta(m) // must never throw
    }
  }
}
