package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.operators.{Chunking, CorpusScrub, Sampling}

/** Property-based invariants for the curation operators. */
object CurationProps extends Properties("CurationProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def spark = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 25).map(i => s"w$i")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  // every token lands in at least one chunk, no chunk exceeds the
  // budget, and consecutive chunks share exactly `overlap` tokens
  // until the final (possibly short) window
  property("chunking covers all tokens within budget") =
    Prop.forAll(docGen, Gen.chooseNum(2, 10), Gen.chooseNum(0, 1)) {
      (doc, maxT, ov) =>
        val s = spark
        import s.implicits._
        val chunks = Chunking.chunkByTokens(
            Seq((1L, doc)).toDF("id", "text"), "id", "text", maxT, ov)
          .orderBy("chunk_id")
          .as[(Long, Int, String, Int)].collect()
        val toks = doc.trim.split("\\s+").toSeq
        val stride = maxT - ov
        val covered = chunks.flatMap(c =>
          c._3.split(" ").filter(_.nonEmpty)).length >=
          toks.count(_.nonEmpty)
        val budget = chunks.forall(_._4 <= maxT)
        val starts = chunks.map(_._2.toLong * stride)
        val coverage = starts.lastOption
          .forall(s0 => s0 < toks.length || toks.length <= maxT)
        covered && budget && coverage
    }

  // reassembled text with an infinite cap is the identity
  property("scrub with an unreachable cap is the identity") =
    Prop.forAll(Gen.listOfN(8, docGen)) { docs =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("id", "text")
      val out = CorpusScrub.removeRepeatedSegments(df, "id", "text",
          sep = " ", maxRepeats = 1000000L)
        .select("id", "clean_text").as[(Long, String)].collect().toMap
      docs.zipWithIndex.forall { case (d, i) => out(i.toLong) == d }
    }

  // split assignment is exhaustive and respects the weights' support
  property("deterministicSplit assigns every row a declared split") =
    Prop.forAll(Gen.chooseNum(2, 4), Gen.chooseNum(1L, 500L)) {
      (nSplits, seed) =>
        val s = spark
        import s.implicits._
        val names = (0 until nSplits).map(i => s"s$i")
        val splits = names.map(_ -> 1.0)
        val ids = (seed until seed + 300L).toDF("id")
        val got = Sampling.deterministicSplit(ids, "id", splits)
          .select("split").as[String].collect()
        got.forall(names.contains) && got.length == 300
    }

  // stratified sampling is a per-stratum subset of the full sample
  property("stratified sample == per-stratum hash filter") =
    Prop.forAll(Gen.chooseNum(1, 9).map(_ / 10.0)) { f =>
      val s = spark
      import s.implicits._
      val df = (0L until 400L).toDF("id")
        .withColumn("g", (col("id") % 2 === 0).cast("string"))
      val strat = Sampling.stratifiedSampleByHash(df, "id", "g",
          Map("true" -> f), default = 0.0)
        .select("id").as[Long].collect().toSet
      val direct = Sampling.sampleByHash(
          df.filter(col("g") === "true"), "id", f)
        .select("id").as[Long].collect().toSet
      strat == direct
    }
}
