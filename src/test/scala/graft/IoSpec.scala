package graft

import java.nio.file.Files

import graft.core.GraftDataset
import graft.operators.FillNA
import graft.sources.Io

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("readCsv: all-string schema, empty cells -> null") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f   = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath, "a,b\n1,x\n,y\n2,\n")
    val df = Io.readCsv(spark, f.getPath).get
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1))))
    assert(rows.toSet == Set(Some("1") -> Some("x"), None -> Some("y"),
      Some("2") -> None))
  }

  test("readCsv on a missing file is a Failure, not an exception") {
    assert(Io.readCsv(spark, "/tmp/definitely_missing_xyz.csv")
      .isFailure)
  }

  test("datasetFromCsv casts numeric-classified strings") {
    val dir = Files.createTempDirectory("graft_csv2").toFile
    val f   = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath, "num,mix,s\n1.5,x1,a\n2.5,2,b\n")
    val ds = Io.datasetFromCsv(spark, f.getPath).get
    assert(ds.data.schema("num").dataType.typeName == "double")
    assert(ds.data.schema("mix").dataType.typeName == "string")
  }

  test("dataset round-trip preserves data, metadata cols and history") {
    val dir = Files.createTempDirectory("graft_ds").toFile.getPath + "/out"
    val ds  = FillNA(Seq("c"), "x")(
      GraftDataset(Seq(Some("a"), None).toDF("c"), Set("c")))
    Io.writeDataset(ds, dir)
    val back = Io.readDataset(spark, dir)
    assert(back.data.select("c").as[String].collect().sorted.toSeq ==
      Seq("a", "x"))
    assert(back.metadataCols == Set("c"))
    // the REAL op objects round-trip, value-equal (S4)
    assert(back.history.size == 1)
    assert(back.history(0) == FillNA(Seq("c"), "x"))
    assert(back.history.forColumn("c") == Vector(FillNA(Seq("c"), "x")))
    // refuses to overwrite unless asked
    intercept[IllegalArgumentException] { Io.writeDataset(ds, dir) }
    Io.writeDataset(ds, dir, overwrite = true)
  }

  test("datasetFromJson: primitives stay strings, mixed survives") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f   = new java.io.File(dir, "in.json")
    Files.writeString(f.toPath,
      """{"num": 1.5, "mix": "x1", "s": "a"}
        |{"num": 2.5, "mix": 2, "s": "b"}
        |""".stripMargin)
    val ds = Io.datasetFromJson(spark, f.getPath).get
    assert(ds.data.schema("num").dataType.typeName == "double")
    assert(ds.data.schema("mix").dataType.typeName == "string")
    assert(ds.classification.mixedCols == Set("mix"))
  }

  test("writeDataset partitionBy lays out hive-style directories") {
    val dir = Files.createTempDirectory("graft_part").toFile.getPath +
      "/out"
    val ds = GraftDataset(
      Seq(("a", 1), ("b", 2), ("a", 3)).toDF("part", "v"))
    Io.writeDataset(ds, dir, partitionBy = Seq("part"))
    val parts = new java.io.File(s"$dir/data.parquet").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("part=a", "part=b"))
    assert(Io.readDataset(spark, dir).data.count() == 3)
  }

  test("writeCsv single-file mode") {
    val dir = Files.createTempDirectory("graft_out").toFile.getPath + "/csv"
    Io.writeCsv(Seq(("a", 1)).toDF("c", "n"), dir, single = true)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
  }
}

/** Sidecar trust model: lineage.json is parsed with a real JSON parser
  * (malformed input throws typed), and the executable `ops_jvm` payload
  * only deserializes under a strict class allowlist AND when the caller
  * declares the directory trusted.
  */
class SidecarSpec extends SparkSpec {
  import spark.implicits._
  import graft.core.{GraftDataset, MalformedSidecarException}
  import graft.operators.FillNA
  import graft.sources.Io

  private def freshDataset(): (String, GraftDataset) = {
    val dir = Files.createTempDirectory("graft_side").toFile.getPath +
      "/out"
    val ds = FillNA(Seq("c"), "x")(
      GraftDataset(Seq(Some("a"), None).toDF("c")))
    Io.writeDataset(ds, dir)
    (dir, ds)
  }

  private def rewriteSidecar(dir: String, body: String): Unit =
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/lineage.json"), body)

  test("malformed sidecar JSON throws the typed exception") {
    val (dir, _) = freshDataset()
    rewriteSidecar(dir, """{"metadata_cols": [unclosed""")
    intercept[MalformedSidecarException] { Io.readDataset(spark, dir) }
  }

  test("signed \\u escape (\\u+0ab) in sidecar is rejected, valid hex parses") {
    val (dir, _) = freshDataset()
    // Integer.parseInt(hex,16) accepts a leading sign — the parser must
    // require 4 strict hex digits, not just "parseable"
    // "\u" split across concat — the Scala lexer would otherwise treat
    // it as a unicode escape even inside a triple-quoted literal
    rewriteSidecar(dir,
      """{"metadata_cols":["a\""" + """u+0ab"],"derived_cols":[]}""")
    intercept[MalformedSidecarException] { Io.readDataset(spark, dir) }
    rewriteSidecar(dir,
      """{"metadata_cols":["c"],"derived_cols":[]}""")
    assert(Io.readDataset(spark, dir, trusted = false)
      .metadataCols == Set("c"))
  }

  test("non-base64 ops_jvm throws the typed exception") {
    val (dir, _) = freshDataset()
    rewriteSidecar(dir,
      """{"metadata_cols":[],"derived_cols":[],"ops_jvm":"!!!not-b64"}""")
    intercept[MalformedSidecarException] { Io.readDataset(spark, dir) }
  }

  test("ops_jvm with a class outside the allowlist is rejected") {
    val (dir, _) = freshDataset()
    // a serialized java.io.File stands in for a gadget-chain payload:
    // serializable, resolvable, NOT in the graft/scala/java.lang/util
    // allowlist — must be rejected before instantiation
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new java.io.File("/tmp/gadget")); oos.close()
    val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    rewriteSidecar(dir,
      s"""{"metadata_cols":[],"derived_cols":[],"ops_jvm":"$b64"}""")
    val e = intercept[MalformedSidecarException] {
      Io.readDataset(spark, dir)
    }
    assert(e.getMessage.contains("allowlist"))
  }

  test("trusted=false loads data but skips executable history") {
    val (dir, _) = freshDataset()
    val back = Io.readDataset(spark, dir, trusted = false)
    assert(back.data.count() == 2)
    assert(back.history.size == 0)
  }

  test("nested sidecar values parse instead of regex-misparsing") {
    val (dir, _) = freshDataset()
    rewriteSidecar(dir,
      """{"metadata_cols":["mA"],"derived_cols":[],
        |"extra":{"nested":["metadata_cols","decoy"]},"ops_jvm":""}"""
        .stripMargin)
    val back = Io.readDataset(spark, dir)
    assert(back.metadataCols == Set("mA")) // escape decoded, decoy ignored
  }
}
