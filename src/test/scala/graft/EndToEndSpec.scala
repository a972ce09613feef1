package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.GraftDataset
import graft.operators._
import graft.sources.Io

/** The full reference user journey in one flow: messy CSV → wrap +
  * classify → repair the mixed column → encode the categorical →
  * anonymize → persist → reload — asserting data, lineage, and that
  * the whole transformation chain stays ONE lazy Catalyst plan until
  * the sink.
  */
class EndToEndSpec extends SparkSpec {

  test("csv -> classify -> fix -> encode -> anonymize -> persist") {
    val dir = Files.createTempDirectory("graft_e2e").toFile
    val csv = new java.io.File(dir, "in.csv")
    Files.writeString(csv.toPath,
      """name,city,reading,category
        |Alice,Rome,12.5,red
        |Bob,Milan,"13,1",Red
        |Carol,Rome,>20,blue
        |Dave,Turin,---,RED
        |Alice,Rome,14.0,blue
        |""".stripMargin)

    // 1. read + classify: reading is 3/4-castable -> mixed (repair
    //    target); city/category are categorical strings
    val ds = Io.datasetFromCsv(spark, csv.getPath).get
    assert(ds.classification.mixedCols == Set("reading"))
    assert(ds.classification.strCategoricalCols
      .contains("category"))

    // 2. repair the mixed column
    val fixed = RowFix.fixCommonErrors(ds)
    assert(fixed.data.schema("reading").dataType.typeName == "double")
    val readings = fixed.data.select("reading").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(readings.toSet ==
      Set(Some(12.5), Some(13.1), Some(20 * 1.02), None, Some(14.0)))

    // 3. encode the categorical with case folding + lineage
    val encoded = EncodeSingleCategorical("category", "ordinal")(fixed)
    val codes = encoded.data.select("category", "category_enc")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(codes("red") == codes("Red") && codes("red") == codes("RED"))
    assert(codes("blue") != codes("red"))
    val op = encoded.history.operationsFromDerived("category_enc").head
      .asInstanceOf[EncodeSingleCategorical]
    assert(op.encodedValuesMap.values.toSet == Set("Blue", "Red"))

    // 4. anonymize the name column (same person -> same pseudonym)
    val anonymized = AnonymizeColumns(Seq("name"), Seq("name"))(encoded)
    assert(!anonymized.data.columns.contains("name"))
    val ids = anonymized.data.select("city", "ID_OWNER").collect()
    assert(ids.length == 5)
    assert(anonymized.data.select("ID_OWNER").distinct().count() == 4)

    // 5. persist + reload: data, metadata, real op objects
    val out = dir.getPath + "/persisted"
    Io.writeDataset(anonymized, out)
    val back = Io.readDataset(spark, out)
    assert(back.data.count() == 5)
    assert(back.history.size == anonymized.history.size)
    assert(back.history.ops.contains(op))
  }
}
