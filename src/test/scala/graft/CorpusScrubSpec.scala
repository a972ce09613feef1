package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusScrub

class CorpusScrubSpec extends SparkSpec {
  import spark.implicits._

  test("removeRepeatedSegments drops corpus-frequent paragraphs only") {
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"unique alpha\n\n$boiler\n\nunique beta"),
      (2L, s"$boiler\n\nsomething else"),
      (3L, s"all mine\n\nstill mine"),
      (4L, boiler) // becomes empty, must survive as a row
    ).toDF("doc_id", "text")
    val out = CorpusScrub
      .removeRepeatedSegments(df, "doc_id", "text", maxRepeats = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "unique alpha\n\nunique beta")
    assert(out(1L)._3 == 2 && out(1L)._4 == 1)
    assert(out(2L)._2 == "something else")
    assert(out(3L)._2 == "all mine\n\nstill mine")
    assert(out(3L)._4 == 0)
    assert(out(4L)._2 == "" && out(4L)._3 == 0 && out(4L)._4 == 1)
  }

  test("removeRepeatedSegments: null text rows get consistent zero accounting") {
    val df = Seq((1L, Some("keep me\n\nkeep me too")), (2L, None))
      .toDF("doc_id", "text")
    val out = CorpusScrub
      .removeRepeatedSegments(df, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // null doc: clean='' / n_kept=0 / n_removed=0 — not a null n_removed
    assert(out(2L) == ((2L, "", 0L, 0L)))
    assert(out(1L)._3 == 2L && out(1L)._4 == 0L)
  }

  test("removeRepeatedSegments preserves order under repartitioning") {
    val df = (1L to 50L)
      .map(i => (i, (0 until 20).map(j => s"w${(i * 7 + j) % 13}")
        .mkString(" ")))
      .toDF("doc_id", "text")
    def run(parts: Int) = CorpusScrub
      .removeRepeatedSegments(df.repartition(parts), "doc_id", "text",
        sep = " ", maxRepeats = 60)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(11))
    // kept segments keep their relative order
    val r = run(4)
    r.foreach { case (id, clean, kept, removed) =>
      assert(kept + removed == 20)
      if (clean.nonEmpty) {
        val orig = df.filter(col("doc_id") === id)
          .as[(Long, String)].collect()(0)._2.split(" ").toSeq
        val keptSeq = clean.split(" ").toSeq
        // subsequence check
        var oi = 0
        keptSeq.foreach { w =>
          oi = orig.indexOf(w, oi)
          assert(oi >= 0, s"$w out of order for doc $id")
          oi += 1
        }
      }
    }
  }

  test("topTerms returns exact counts with deterministic ties") {
    val df = Seq("b a a", "c b a", "d c b a").toDF("text")
    val out = CorpusScrub.topTerms(df, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 4L), ("b", 3L), ("c", 2L)))
  }

  test("topTfidfTerms surfaces rare terms over common ones") {
    // 'rare' appears once in doc 1 only; 'common' is in every doc
    // (df=4 of N=4 -> smoothed idf exactly 1 in the log form, 1.0 in
    // the rational form, so rare's higher idf dominates equal tf and
    // common's tf=2 dominates mid-df 'other')
    val df = Seq(
      (1L, "common rare"),
      (2L, "common common other"),
      (3L, "common other zz"),
      (4L, "common zz yy")).toDF("doc_id", "text")
    for (log <- Seq(true, false)) {
      val top1 = CorpusScrub
        .topTfidfTerms(df, "doc_id", "text", k = 1, logIdf = log)
        .as[(Long, String, Long, Double)].collect()
        .map(r => r._1 -> r._2).toMap
      assert(top1(1L) == "rare", s"logIdf=$log")
      assert(top1(2L) == "common", s"logIdf=$log") // tf 2 beats df-3 'other'
    }
  }

  test("topTfidfTerms exact variant is partitioning-invariant") {
    val df = (1L to 60L).map(i =>
      (i, (0 until 30).map(j => s"w${(i + j * j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    def run(parts: Int) = CorpusScrub
      .topTfidfTerms(df.repartition(parts), "doc_id", "text", k = 3,
        logIdf = false)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(run(1) == run(9))
  }

  test("unigramLogProb ranks typical text above rare-token salad") {
    val typical = "the engine runs the query over the data every day"
    val salad   = "qqxz wvrk jjpl mmty zzbn hhgd"
    val df = (1L to 20L).map(i => (i, typical)) :+ (99L, salad)
    val out = CorpusScrub
      .unigramLogProb(df.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) > out(99L)) // typical text closer to 0
    assert(out(1L) == out(2L)) // identical docs score identically
    assert(out.values.forall(_ < 0.0))
  }

  test("topTerms plan uses partial aggregation and a top-k sort") {
    val df = Seq("a b c").toDF("text")
    val plan = CorpusScrub.topTerms(df, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("templateScore: boilerplate-heavy docs score high, original " +
      "prose low; exact milli arithmetic") {
    val docs = Seq(
      (1L, "one two three four unique ending alpha"),
      (2L, "one two three four unique ending beta"),
      (3L, "completely different words nowhere else found here")
    ).toDF("doc_id", "text")
    val out = CorpusScrub.templateScore(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1/2: 5 distinct 3-grams each; only the final gram
    // ('unique ending alpha/beta') diverges — 4 shared at df 2,
    // 1 at df 1: mean_df = 9/5 = 1800 milli, shared 4/5 = 800
    assert(out(1L) == ((5L, 1800L, 800L)))
    assert(out(2L) == ((5L, 1800L, 800L)))
    // doc 3: every gram unique -> mean_df exactly 1000, shared 0
    assert(out(3L) == ((5L, 1000L, 0L)))
  }

  test("langMix: per-segment id, dominance with lexicographic " +
      "tie-break, blank segments dropped") {
    val docs = Seq(
      (1L, "the cat and the dog is in of that for\n\n" +
        "el perro y la casa de los del que\n\n" +
        "the end of the story and that is that"),
      (2L, "der hund und die katze ist nicht ein zu\n\n\n\n" +
        "le chat est sur une table et les autres"),
      (3L, "zzz qqq vvv")
    ).toDF("doc_id", "text")
    val out = CorpusScrub.langMix(docs, "doc_id", "text")
      .as[(Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: en, es, en -> dominant en at 2/3
    assert(out(1L) == ((3L, 2L, "en", 666L)))
    // doc 2: de + fr, 1 each -> tie breaks to 'de'; the \n\n\n\n gap
    // yields a blank segment that must not count
    assert(out(2L) == ((2L, 2L, "de", 500L)))
    // doc 3: no markers -> und at 1000
    assert(out(3L) == ((1L, 1L, "und", 1000L)))
  }

  test("oovRate: df-threshold vocabulary, token repeats count per " +
      "occurrence, all-OOV doc hits 1000 milli") {
    // 'the' df=3, 'cat' df=2, 'dog'/'zx'/'qq' df=1
    val docs = Seq(
      (1L, "the cat the cat"),      // all in vocab at minDf=2
      (2L, "the dog"),              // dog OOV -> 1/2
      (3L, "zx qq cat the")         // 2/4 OOV
    ).toDF("doc_id", "text")
    val out = CorpusScrub.oovRate(docs, "doc_id", "text", minDf = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 0L, 0L)))
    assert(out(2L) == ((2L, 1L, 500L)))
    assert(out(3L) == ((4L, 2L, 500L)))
    // minDf above every df: everything OOV, exact 1000
    val all = CorpusScrub.oovRate(docs, "doc_id", "text", minDf = 9L)
      .as[(Long, Long, Long, Long)].collect()
    assert(all.forall(r => r._3 == r._2 && r._4 == 1000L))
  }

  test("corpusReport: exact counts on a hand corpus (dups, nulls, " +
      "langs, quality fails)") {
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "keeps running for a while longer across the field " +
      "with steady calm strides toward the distant river " +
      "bank where it finally rests in the warm afternoon sun " +
      "and watches the water flow gently past the old stones")
    val docs = Seq(
      (1L, good, "en"),
      (2L, good + "!", "en"),            // same fingerprint as 1 (punct)
      (3L, "x 1 2 3", "de"),             // fails quality (word count)
      (4L, null.asInstanceOf[String], "en"), // null text
      (5L, good + " unique tail words", "fr")
    ).toDF("doc_id", "text", "lang")
    val r = CorpusScrub.corpusReport(docs, "doc_id", "text", "lang")
      .collect()(0)
    def f(n: String) = r.getLong(r.fieldIndex(n))
    assert(f("n_docs") == 5L)
    assert(f("n_null_text") == 1L)
    assert(f("n_langs") == 3L)
    assert(f("dup_docs") == 1L)          // doc 2 duplicates doc 1
    assert(f("dup_frac_milli") == 250L)  // 1 of 4 non-null
    // null text and the degenerate doc fail; rest pass
    assert(f("quality_fail_milli") == 2L * 1000L / 5L)
    val tok = docs.filter($"text".isNotNull)
      .select(sum(size(split(trim($"text"), "\\s+"))))
      .collect()(0).getLong(0)
    assert(f("total_tokens") == tok)
  }
}
