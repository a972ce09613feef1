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

  test("corpus journey: quality -> redact -> dedup -> split -> chunk") {
    import spark.implicits._
    val spam = "buy now " * 8
    def body(seed: Long): String = {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(14)(
        rnd.alphanumeric.filter(_.isLetter).take(6).mkString.toLowerCase)
      s"the ${words.take(7).mkString(" ")} and " +
        s"the ${words.drop(7).mkString(" ")}"
    }
    val docs = ((1L to 40L).map(i => (i, body(i))) ++ Seq(
      (100L, spam),                        // fails quality (repetition)
      (101L, "tiny"),                      // fails quality (word_count)
      (102L, "call me on +1 555 010 4455 about the pipeline design " +
        "for the analytics engine we discussed the other day ok"),
      (103L, body(7))))                    // byte-identical dup of 7
      .toDF("doc_id", "text")

    // 1. annotate + filter on quality
    val kept = docs
      .withColumn("keep", graft.functions.TextFunctions
        .qualityKeep(col("text")))
      .filter(col("keep")).drop("keep")
    assert(kept.filter(col("doc_id").isin(100L, 101L)).isEmpty)
    assert(kept.count() == 42) // the 40 clean docs + 102 + 103

    // 2. redact PII
    val clean = kept.withColumn("text",
      graft.functions.TextFunctions.redactPii(col("text")))
    assert(clean.filter(col("text").contains("555")).isEmpty)

    // 3. near-dup delete (doc 103 duplicates doc 7 -> 103 dropped)
    val pairs = Dedup.minhashDupPairs(clean, "doc_id", "text")
      .select("id_a", "id_b")
    val deduped = Dedup.dedupCorpus(clean, "doc_id", pairs)
    assert(deduped.filter(col("doc_id") === 103L).isEmpty)
    assert(!deduped.filter(col("doc_id") === 7L).isEmpty)

    // 4. deterministic split, stable under repartitioning
    val split = Sampling.deterministicSplit(deduped, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2))
    val again = Sampling.deterministicSplit(
      deduped.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.2))
    assert(split.select("doc_id", "split").as[(Long, String)]
      .collect().toSet ==
      again.select("doc_id", "split").as[(Long, String)]
        .collect().toSet)

    // 5. chunk for the tokenizer; every surviving doc is covered
    val chunks = Chunking.chunkByTokens(split, "doc_id", "text",
      maxTokens = 8, overlap = 2)
    assert(chunks.select("doc_id").distinct().count() ==
      split.count())
    assert(chunks.filter(col("chunk_tokens") > 8).isEmpty)
  }
}
