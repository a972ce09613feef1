package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuant
import graft.operators.ProductQuant.PqCodebook

class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus: 40 vectors, dim 8
  private def synth(n: Int = 40, d: Int = 8): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      (i.toLong, (0 until d).map { j =>
        (((i * 31 + j * 17) % 23) - 11) / 10.0f
      })
    }

  private lazy val corpus = synth().toDF("vec_id", "embedding")

  // driver-side reference: quantize + per-subspace argmin (ties low)
  private def refQuantize(v: Seq[Float]): Array[Long] =
    v.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray

  private def refEncode(qv: Array[Long], cb: PqCodebook): Array[Int] =
    Array.tabulate(cb.m) { s =>
      val off = s * cb.dsub
      cb.codebook(s).zipWithIndex.minBy { case (c, j) =>
        (c.zipWithIndex.map { case (cv, i) =>
          val diff = qv(off + i) - cv; diff * diff
        }.sum, j)
      }._2
    }

  private def refAdc(qv: Array[Long], codes: Array[Int],
      cb: PqCodebook): Long =
    (0 until cb.m).map { s =>
      val c = cb.codebook(s)(codes(s))
      c.zipWithIndex.map { case (cv, i) =>
        val diff = qv(s * cb.dsub + i) - cv; diff * diff
      }.sum
    }.sum

  private val pinned = PqCodebook(Seq.fill(2)(
    Seq(-800L, -200L, 200L, 800L).map(c => Seq.fill(4)(c))))

  test("pqEncode matches the driver-side argmin reference") {
    val got = ProductQuant
      .pqEncode(corpus, "vec_id", "embedding", pinned)
      .as[(Long, Seq[Int])].collect().toMap
    synth().foreach { case (id, v) =>
      assert(got(id).toArray.toSeq ==
        refEncode(refQuantize(v), pinned).toSeq, s"vec $id")
    }
  }

  test("pqEncode is map-only (no shuffle)") {
    val plan = ProductQuant
      .pqEncode(corpus, "vec_id", "embedding", pinned)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("pqTopK ranking equals the driver-side ADC reference") {
    val got = ProductQuant
      .pqTopK(corpus, corpus.filter(col("vec_id") < 3), "vec_id",
        "embedding", pinned, k = 5)
      .select("query_id", "neighbor_id", "adist2", "rank")
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    val data = synth()
    val codes = data.map { case (id, v) =>
      id -> refEncode(refQuantize(v), pinned)
    }.toMap
    (0L until 3L).foreach { q =>
      val qv = refQuantize(data(q.toInt)._2)
      val want = data.filter(_._1 != q)
        .map { case (id, _) => (id, refAdc(qv, codes(id), pinned)) }
        .sortBy { case (id, d2) => (d2, id) }.take(5)
      val gotQ = got(q).map(r => (r._2, r._3)).toSeq
      assert(gotQ == want, s"query $q")
    }
  }

  test("pqTopK broadcasts the query side") {
    val plan = ProductQuant
      .pqTopK(corpus, corpus.filter(col("vec_id") < 3), "vec_id",
        "embedding", pinned, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("pqFit is deterministic and partitioning-invariant") {
    val a = ProductQuant.pqFit(corpus.repartition(1), "vec_id",
      "embedding", m = 2, ksub = 3, iters = 3)
    val b = ProductQuant.pqFit(corpus.repartition(7), "vec_id",
      "embedding", m = 2, ksub = 3, iters = 3)
    assert(a.codebook == b.codebook)
    assert(a.m == 2 && a.ksub == 3 && a.dsub == 4)
  }

  test("pqFit with zero iters returns the md5-keyed seed subvectors") {
    val cb = ProductQuant.pqFit(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, iters = 0)
    val seeds = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(2)
      .select(graft.operators.Similarity.quantize(col("embedding")))
      .as[Seq[Long]].collect()
    (0 until 2).foreach { s =>
      (0 until 2).foreach { j =>
        assert(cb.codebook(s)(j) == seeds(j).slice(s * 4, (s + 1) * 4))
      }
    }
  }

  test("pqFit iterations reduce (or keep) total ADC distortion") {
    def distortion(cb: PqCodebook): Long = {
      val data = synth()
      val codes = data.map { case (_, v) =>
        val qv = refQuantize(v)
        refAdc(qv, refEncode(qv, cb), cb)
      }
      codes.sum
    }
    val d0 = distortion(ProductQuant.pqFit(corpus, "vec_id",
      "embedding", m = 2, ksub = 4, iters = 0))
    val d3 = distortion(ProductQuant.pqFit(corpus, "vec_id",
      "embedding", m = 2, ksub = 4, iters = 3))
    assert(d3 <= d0, s"distortion grew: $d0 -> $d3")
  }

  test("ivfPqTopK with every list probed equals pqTopK exactly") {
    val full = ProductQuant.pqTopK(corpus,
        corpus.filter(col("vec_id") < 3), "vec_id", "embedding",
        pinned, k = 5)
      .select("query_id", "neighbor_id", "adist2", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    val ivf = ProductQuant.ivfPqTopK(corpus,
        corpus.filter(col("vec_id") < 3), "vec_id", "embedding",
        pinned, k = 5, nCentroids = 4, nProbe = 4, kmeansIters = 1)
      .select("query_id", "neighbor_id", "adist2", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    assert(ivf.toSeq == full.toSeq)
  }

  test("ivfPqTopK partial probe returns correctly-ADC-scored rows " +
      "ranked without gaps") {
    val rows = ProductQuant.ivfPqTopK(corpus,
        corpus.filter(col("vec_id") < 3), "vec_id", "embedding",
        pinned, k = 5, nCentroids = 4, nProbe = 2, kmeansIters = 1)
      .select("query_id", "neighbor_id", "adist2", "rank")
      .as[(Long, Long, Long, Int)].collect()
    val data  = synth()
    val codes = data.map { case (id, v) =>
      id -> refEncode(refQuantize(v), pinned)
    }.toMap
    rows.foreach { case (q, n, d2, _) =>
      assert(d2 == refAdc(refQuantize(data(q.toInt)._2), codes(n),
        pinned), s"ADC mismatch for ($q, $n)")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length).toSeq,
        s"rank gaps for query $q")
      // ranks follow (adist2, neighbor_id) order within the survivors
      val byRank = rs.sortBy(_._4).map(r => (r._3, r._2)).toSeq
      assert(byRank == byRank.sorted, s"rank order broken for $q")
    }
  }

  test("length-mismatched vectors fail loudly: no padded codes, no " +
      "silently ignored trailing dims") {
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      ProductQuant.pqEncode(short, "vec_id", "embedding", pinned)
        .collect()
    }
    val long = Seq((1L, Seq.fill(12)(1.0f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      ProductQuant.pqEncode(long, "vec_id", "embedding", pinned)
        .collect()
    }
  }

  test("codebook constructor rejects ragged shapes") {
    intercept[IllegalArgumentException] {
      PqCodebook(Seq(Seq(Seq(1L, 2L)), Seq(Seq(1L, 2L), Seq(3L, 4L))))
    }
    intercept[IllegalArgumentException] {
      PqCodebook(Seq(Seq(Seq(1L, 2L), Seq(3L))))
    }
  }
}
