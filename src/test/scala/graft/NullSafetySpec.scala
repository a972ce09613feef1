package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.operators._

/** Pins the null-input contract of every curation entry point: scalar
  * signals are null-propagating (SQL semantics), row-generating and
  * hash-keyed operators DROP null rows — documented behavior, not
  * accident.
  */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String)](
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, null),
    (null, "an orphan row with text but no id"))
    .toDF("doc_id", "text")

  test("scalar text signals propagate null") {
    val r = df.filter(col("doc_id") === 2L).select(
      T.redactPii(col("text")).as("a"),
      T.qualityKeep(col("text")).as("b"),
      T.qualityReasons(col("text")).as("c"),
      T.topBigramCharFraction(col("text")).as("d"),
      T.duplicateLineFraction(col("text")).as("e"),
      T.langId(col("text")).as("f"),
      T.fingerprint(col("text")).as("g")).collect()(0)
    (0 until 7).foreach(i => assert(r.isNullAt(i), s"field $i"))
  }

  test("chunking drops null-text rows (explode semantics)") {
    val out = Chunking.chunkByTokens(df, "doc_id", "text", 4)
    assert(out.filter(col("doc_id") === 2L).isEmpty)
    assert(!out.filter(col("doc_id") === 1L).isEmpty)
  }

  test("hash sampling and splits drop null-id rows") {
    assert(Sampling.sampleByHash(df, "doc_id", 1.0)
      .filter(col("doc_id").isNull).isEmpty)
    // null id hashes to null score -> otherwise-branch (last split)
    val split = Sampling.deterministicSplit(df, "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
    assert(split.count() == 3) // withColumn keeps all rows
    assert(split.filter(col("doc_id").isNull)
      .select("split").as[String].collect()(0) == "test")
  }

  test("dedup and quantiles ignore null keys/values cleanly") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(
      df.select("doc_id"), "doc_id", pairs)
    assert(clusters.count() == 3) // null id still labels itself (null)
    val q = ColumnStats.exactQuantiles(
      Seq[java.lang.Double](1.0, null, 3.0).toDF("x"), "x", Seq(0.5))
      .as[(Double, Double, Long)].collect()
    assert(q.toSeq == Seq((0.5, 2.0, 2L)))
  }
}
