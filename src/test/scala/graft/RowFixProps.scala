package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.operators.RowFix

/** Property-based datasim round-trip (the reference's signature testing
  * idea, tests/datasim.py:59-488): generators INJECT corruption into
  * clean numeric values while recording the value the repair cascade
  * must recover; the property asserts `fix(inject(clean)) == expected`
  * for arbitrary batches.
  */
object RowFixProps extends Properties("RowFixDatasim") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each trial runs a real Spark job

  final case class Injection(raw: String, expected: Option[Double])

  private val clean: Gen[Double] =
    Gen.chooseNum(0L, 10000000L).map(_ / 100.0)

  private val injector: Gen[Double => Injection] = Gen.oneOf(
    (v: Double) => Injection(v.toString, Some(v)),
    (v: Double) => Injection(v.toString.replace(".", ","), Some(v)),
    (v: Double) => Injection(v.toString + "°", Some(v)),
    (v: Double) => Injection(">" + v.toString, Some(v * 1.02)),
    (v: Double) => Injection("<" + v.toString, Some(v * 0.98)),
    (v: Double) => Injection(v.toString + "%", None),
    (_: Double) => Injection("---", None),
    (_: Double) => Injection("NV", None),
    (_: Double) => Injection("None", None))

  private val injectedBatch: Gen[List[Injection]] =
    Gen.listOfN(40, for { v <- clean; inj <- injector } yield inj(v))

  property("fix(inject(clean)) == expected") =
    Prop.forAll(injectedBatch) { batch =>
      val spark = TestSpark.spark
      import spark.implicits._
      spark.sparkContext.setLogLevel("ERROR")
      val df = batch.map(_.raw).toDF("c")
      val got = df.select(RowFix.fixExpr(col("c")).as("f")).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        .toList
      got == batch.map(_.expected)
    }
}
