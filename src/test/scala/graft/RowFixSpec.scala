package graft

import org.apache.spark.sql.functions._
import graft.operators.RowFix

class RowFixSpec extends SparkSpec {
  import spark.implicits._

  private def fix(vals: Seq[String]): Seq[Option[Double]] = {
    val df = vals.map(Option(_)).toDF("c")
    df.select(RowFix.fixExpr(col("c")).as("f")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("cascade order: cast, char repair, percent, out-of-scale, words") {
    assert(fix(Seq("1.5")) == Seq(Some(1.5)))
    assert(fix(Seq("1,5")) == Seq(Some(1.5)))       // comma -> dot
    assert(fix(Seq("12°")) == Seq(Some(12.0)))      // degree deleted
    assert(fix(Seq("45%")) == Seq(None))            // percent -> null
    assert(fix(Seq(">50")) == Seq(Some(50 * 1.02))) // +2%
    assert(fix(Seq("<50")) == Seq(Some(50 * 0.98))) // -2%
    assert(fix(Seq(">1,5")) == Seq(Some(1.5 * 1.02))) // char repair first
    assert(fix(Seq("---")) == Seq(None))            // whole-word token
    assert(fix(Seq("NV")) == Seq(None))
    assert(fix(Seq("garbage")) == Seq(None))
    assert(fix(Seq(null)) == Seq(None))
  }

  test("unfixableExpr flags only true give-ups") {
    val df = Seq("garbage", "1.5", "1,5", ">50", "45%", "---", "NV")
      .toDF("c")
    val flags = df.select(RowFix.unfixableExpr(col("c")).as("u"))
      .as[Boolean].collect().toSeq
    // only 'garbage' survives every repair AND is not a known null token
    assert(flags == Seq(true, false, false, false, false, false, false))
  }

  test("fixTypos returns repaired frame + audit counts") {
    val df = Seq("1.5", "1,5", "garbage", "NV").toDF("c")
    val (fixed, audit) = RowFix.fixTypos(df, Seq("c"))
    assert(fixed.schema("c").dataType.typeName == "double")
    val a = audit.collect()(0)
    assert(a.getAs[String]("column") == "c")
    assert(a.getAs[Long]("errors_before") == 3L) // 1,5 garbage NV
    assert(a.getAs[Long]("errors_after") == 1L)  // garbage
  }

  test("datasim round-trip: fix(inject(clean)) == expected") {
    // The reference's signature test idea (tests/datasim.py:59-488):
    // corrupt clean numeric values while recording the expected
    // post-repair value, then assert the cascade recovers exactly that.
    val rnd = new scala.util.Random(42)
    val cases: Seq[(String, Option[Double])] =
      (1 to 300).map { _ =>
        val v = math.round(rnd.nextDouble() * 1e5).toDouble / 100.0
        val s = v.toString
        rnd.nextInt(7) match {
          case 0 => (s, Some(v))                          // clean
          case 1 => (s.replace(".", ","), Some(v))        // comma typo
          case 2 => (s + "°", Some(v))               // degree
          case 3 => (">" + s, Some(v * 1.02))             // out of scale
          case 4 => ("<" + s, Some(v * 0.98))
          case 5 => (s + "%", None)                       // percentage
          case 6 => (Seq("---", "NV", "None")(rnd.nextInt(3)), None)
        }
      }
    val got = fix(cases.map(_._1))
    cases.map(_._2).zip(got).zipWithIndex.foreach {
      case ((exp, act), i) =>
        assert(exp == act, s"case $i: '${cases(i)._1}' -> $act, want $exp")
    }
  }

  test("castBackIntegers picks the smallest exact integer type") {
    val df = Seq(
      (1.0, 1.0, 40000.0, 3.0e12, 1.5, Double.NaN),
      (2.0, -5.0, -40000.0, -3.0e12, 2.0, 1.0))
      .toDF("small", "small2", "mid", "big", "frac", "nan")
      .select(col("small"), col("small2"), col("mid"), col("big"),
        col("frac"), col("nan"),
        lit(null).cast("double").as("allnull"))
    val out = RowFix.castBackIntegers(df,
      Seq("small", "small2", "mid", "big", "frac", "nan", "allnull"))
    def tpe(c: String) = out.schema(c).dataType.typeName
    assert(tpe("small") == "short" && tpe("small2") == "short")
    assert(tpe("mid") == "integer")
    assert(tpe("big") == "long")
    assert(tpe("frac") == "double")   // fractional part
    assert(tpe("nan") == "double")    // NaN can't be integral
    assert(tpe("allnull") == "double") // no evidence -> unchanged
    val row = out.orderBy("small").collect()(0)
    assert(row.getShort(0) == 1 && row.getInt(2) == 40000 &&
      row.getLong(3) == 3000000000000L)
  }

  test("fixCommonErrors casts whole-number repaired columns to int") {
    // "2,5"-style values repair to wholes here: 10 / 2 000 / null
    val df = Seq(("10", "a"), ("2000,0", "b"), ("garbage", "c"))
      .toDF("num_ish", "str")
    val out = RowFix.fixCommonErrors(core.GraftDataset(df))
    assert(out.data.schema("num_ish").dataType.typeName == "short")
    val vals = out.data.select("num_ish").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getShort(0)))
    assert(vals.toSet == Set(Some(10.toShort), Some(2000.toShort), None))
  }

  test("fixCommonErrors repairs mixed columns end-to-end") {
    val df = Seq(("1.5", "a"), ("2,5", "b"), ("garbage", "c"))
      .toDF("num_ish", "str")
    val ds  = core.GraftDataset(df)
    val out = RowFix.fixCommonErrors(ds)
    assert(out.data.schema("num_ish").dataType.typeName == "double")
    assert(out.data.schema("str").dataType.typeName == "string")
    val vals = out.data.select("num_ish").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.toSet == Set(Some(1.5), Some(2.5), None))
  }
}
