package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(nTokens: Int): String =
    (0 until nTokens).map(i => s"t$i").mkString(" ")

  test("short doc yields exactly itself as chunk 0") {
    val df = Seq((1L, doc(5))).toDF("id", "text")
    val out = Chunking.chunkByTokens(df, "id", "text", maxTokens = 8)
      .as[(Long, Int, String, Int)].collect()
    assert(out.toSeq == Seq((1L, 0, doc(5), 5)))
  }

  test("windows advance by maxTokens - overlap and cover every token") {
    val df = Seq((1L, doc(10))).toDF("id", "text")
    val out = Chunking.chunkByTokens(df, "id", "text",
        maxTokens = 4, overlap = 1)
      .orderBy("chunk_id").as[(Long, Int, String, Int)].collect()
    // stride 3, 10 tokens: ceil((10-4)/3) extra windows -> starts
    // 0,3,6; the last window reaches t9 so no 4th window is needed
    assert(out.length == 3)
    assert(out(0)._3 == "t0 t1 t2 t3")
    assert(out(1)._3 == "t3 t4 t5 t6")
    assert(out(2)._3 == "t6 t7 t8 t9")
    assert(out.map(_._4).toSeq == Seq(4, 4, 4))
    // consecutive chunks share exactly `overlap` tokens
    assert(out(0)._3.split(" ").last == out(1)._3.split(" ").head)
  }

  test("exact multiple of stride produces no empty trailing chunk") {
    // 8 tokens, maxTokens 4, no overlap -> exactly 2 chunks
    val df = Seq((1L, doc(8))).toDF("id", "text")
    val out = Chunking.chunkByTokens(df, "id", "text", maxTokens = 4)
      .as[(Long, Int, String, Int)].collect()
    assert(out.length == 2)
    assert(out.forall(_._4 == 4))
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "id", "text", maxTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "id", "text", maxTokens = 4, overlap = 4)
    }
  }

  test("packChunks fills contiguously with bounded overflow") {
    val chunks = (0L until 50L).map(i => (1L, i, 40))
      .toDF("id", "chunk_id", "chunk_tokens")
    val packed = Chunking.packChunks(chunks, "id", "chunk_id",
        "chunk_tokens", budgetTokens = 100, nShards = 1)
      .orderBy("chunk_id")
      .select("chunk_id", "pack_id").as[(Long, Long)].collect()
    // cum before chunk k = 40k; pack = floor(40k/100): 0,0,0,1,1,2,2,2...
    packed.foreach { case (k, p) => assert(p == 40 * k / 100) }
    // each pack holds <= budget + one chunk
    val perPack = packed.groupBy(_._2).view.mapValues(_.length * 40)
    assert(perPack.values.forall(_ <= 100 + 40))
    // packs are contiguous chunk ranges
    val byPack = packed.groupBy(_._2).view
      .mapValues(_.map(_._1).sorted).toMap
    byPack.values.foreach(ids =>
      assert(ids.zip(ids.tail).forall(p => p._2 == p._1 + 1)))
  }

  test("packChunks is deterministic under repartitioning") {
    val chunks = (0L until 300L).map(i => (i % 40, i / 40, 7 + (i % 5)))
      .toDF("id", "chunk_id", "chunk_tokens")
    def run(parts: Int) = Chunking.packChunks(
        chunks.repartition(parts), "id", "chunk_id", "chunk_tokens",
        budgetTokens = 30, nShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("chunking is a shuffle-free scan (no Exchange in the plan)") {
    val df = Seq((1L, doc(100))).toDF("id", "text")
    val plan = Chunking.chunkByTokens(df, "id", "text", maxTokens = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
